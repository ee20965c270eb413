"""hbase11xreader/writer against an in-process fake HBase REST
(Stargate) gateway speaking the real JSON+base64 protocol.

The fake implements the surface the plugins use — ``/{table}/regions``,
stateful scanners (PUT create → Location, GET drain → 204, DELETE),
and multi-row ``PUT /{table}/fakerow`` with cell timestamps — enough
to drive the reference flow end to end: region-intersection split,
typed Bytes encode/decode, rowkey concatenation, constants, nullMode,
versionColumn and multi-version reads.
"""

from __future__ import annotations

import base64
import json
import threading
from datetime import datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.hbase import (
    decode_value,
    encode_value,
    hbase_read,
    hbase_split,
    hbase_write,
    to_bytes_binary,
    to_string_binary,
)
from datax_spark.sinks.writers import write_sink
from datax_spark.sources.readers import read_source


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _unb64(s: str) -> bytes:
    return base64.b64decode(s)


class FakeHBase:
    def __init__(self):
        # table -> {rowkey bytes -> {col bytes -> [(ts, val bytes)]}}
        self.tables: dict[str, dict[bytes, dict[bytes, list]]] = {}
        self.regions: dict[str, list[tuple[bytes, bytes]]] = {}
        self.scanners: dict[str, dict] = {}
        self.lock = threading.Lock()
        self._ts = 1000
        self._sid = 0

    def put_rows(self, table: str, rows: list[dict]) -> None:
        with self.lock:
            t = self.tables.setdefault(table, {})
            for r in rows:
                key = _unb64(r["key"])
                cells = t.setdefault(key, {})
                for c in r.get("Cell", []):
                    col = _unb64(c["column"])
                    val = _unb64(c.get("$", "") or "")
                    ts = c.get("timestamp")
                    if ts is None:
                        self._ts += 1
                        ts = self._ts
                    versions = cells.setdefault(col, [])
                    versions.append((int(ts), val))
                    versions.sort(key=lambda x: -x[0])  # newest first

    def open_scanner(self, table: str, spec: dict) -> str:
        with self.lock:
            self._sid += 1
            sid = f"s{self._sid}"
            start = _unb64(spec.get("startRow", "")) if spec.get("startRow") else b""
            stop = _unb64(spec.get("endRow", "")) if spec.get("endRow") else b""
            cols = {_unb64(c) for c in spec.get("column", [])} or None
            maxv = int(spec.get("maxVersions", 1))
            t = self.tables.get(table, {})
            keys = sorted(
                k for k in t
                if (not start or k >= start) and (not stop or k < stop)
            )
            self.scanners[sid] = {
                "table": table, "keys": keys, "pos": 0,
                "cols": cols, "maxv": maxv,
                "batch": int(spec.get("batch", 1000)),
            }
            return sid

    def next_batch(self, sid: str):
        with self.lock:
            sc = self.scanners.get(sid)
            if sc is None:
                return None
            t = self.tables.get(sc["table"], {})
            out = []
            while sc["pos"] < len(sc["keys"]) and len(out) < sc["batch"]:
                k = sc["keys"][sc["pos"]]
                sc["pos"] += 1
                cells = []
                for col, versions in sorted(t.get(k, {}).items()):
                    if sc["cols"] is not None and col not in sc["cols"]:
                        continue
                    maxv = len(versions) if sc["maxv"] == -1 else sc["maxv"]
                    for ts, val in versions[:maxv]:
                        cells.append(
                            {"column": _b64(col), "timestamp": ts, "$": _b64(val)}
                        )
                if cells:
                    out.append({"key": _b64(k), "Cell": cells})
            return out


HB = FakeHBase()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, code: int, payload=None, location: str | None = None):
        body = json.dumps(payload).encode() if payload is not None else b""
        self.send_response(code)
        if location:
            self.send_header("Location", location)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else {}

    def do_GET(self):
        parts = self.path.strip("/").split("/")
        if len(parts) == 2 and parts[1] == "regions":
            regs = HB.regions.get(parts[0], [(b"", b"")])
            self._send(200, {"Region": [
                {"startKey": _b64(s), "endKey": _b64(e)} for s, e in regs
            ]})
        elif len(parts) == 2 and parts[0] == "scanner-global":
            rows = HB.next_batch(parts[1])
            if rows is None:
                self._send(404)
            elif not rows:
                self._send(204)
            else:
                self._send(200, {"Row": rows})
        else:
            self._send(404)

    def do_PUT(self):
        parts = self.path.strip("/").split("/")
        if len(parts) == 2 and parts[1] == "scanner":
            sid = HB.open_scanner(parts[0], self._body())
            host = self.headers.get("Host")
            self._send(201, location=f"http://{host}/scanner-global/{sid}")
        elif len(parts) == 2:  # /{table}/{fakerow}
            HB.put_rows(parts[0], self._body().get("Row", []))
            self._send(200)
        else:
            self._send(404)

    def do_DELETE(self):
        parts = self.path.strip("/").split("/")
        if len(parts) == 2 and parts[0] == "scanner-global":
            with HB.lock:
                HB.scanners.pop(parts[1], None)
            self._send(200)
        else:
            self._send(404)


@pytest.fixture(scope="module")
def hb_endpoint():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture(autouse=True)
def clean_store():
    with HB.lock:
        HB.tables.clear()
        HB.regions.clear()
        HB.scanners.clear()
    yield


# ----------------------------------------------------------------- unit: codec

def test_bytes_codec_hbase_layouts():
    # known HBase Bytes layouts: big-endian two's complement
    assert encode_value("int", 1) == b"\x00\x00\x00\x01"
    assert encode_value("long", -1) == b"\xff" * 8
    assert encode_value("short", 258) == b"\x01\x02"
    assert encode_value("boolean", True) == b"\xff"
    assert decode_value("int", b"\x00\x00\x00\x01") == 1
    assert decode_value("long", b"\xff" * 8) == -1
    assert decode_value("double", encode_value("double", 2.5)) == 2.5
    assert decode_value("float", encode_value("float", 0.5)) == 0.5
    assert decode_value("boolean", b"\x00") is False
    assert decode_value("string", "héllo".encode()) == "héllo"
    assert decode_value("string", b"") is None  # empty = null (reference)


def test_string_binary_roundtrip():
    raw = b"k\x00\x01\xffZ"
    s = to_string_binary(raw)
    assert s == "k\\x00\\x01\\xFFZ"
    assert to_bytes_binary(s) == raw


def test_date_decode_with_format():
    got = decode_value("date", b"2024-03-05 10:20:30", "yyyy-MM-dd HH:mm:ss")
    assert got == datetime(2024, 3, 5, 10, 20, 30)


# ----------------------------------------------------------------- unit: split

def test_region_intersection_split_parity():
    regions = [(b"", b"g"), (b"g", b"p"), (b"p", b"")]
    # unbounded user range: every region as-is
    assert hbase_split(regions, b"", b"") == regions
    # user range clips first and last, middle unchanged
    got = hbase_split(regions, b"c", b"s")
    assert got == [(b"c", b"g"), (b"g", b"p"), (b"p", b"s")]
    # range inside one region
    assert hbase_split(regions, b"h", b"k") == [(b"h", b"k")]
    # region entirely before/after the range is dropped
    assert hbase_split(regions, b"q", b"") == [(b"q", b"")]
    with pytest.raises(ValueError, match="startRowkey"):
        hbase_split(regions, b"z", b"a")


# ----------------------------------------------------------------- e2e

def _write_conf(hb_endpoint, **kw):
    base = {
        "endpoint": hb_endpoint,
        "table": "t1",
        "rowkeyColumn": [{"index": 0, "type": "string"}],
        "column": [
            {"index": 1, "name": "cf:lang", "type": "string"},
            {"index": 2, "name": "cf:stars", "type": "long"},
            {"index": 3, "name": "cf:score", "type": "double"},
            {"index": 4, "name": "cf:active", "type": "boolean"},
        ],
    }
    base.update(kw)
    return base


@pytest.fixture()
def sample_df(spark):
    return spark.createDataFrame(
        [
            ("r/a", "python", 12, 0.5, True),
            ("r/b", "go", 7, 1.25, False),
            ("r/c", None, None, None, None),
        ],
        "k string, lang string, stars long, score double, active boolean",
    ).coalesce(2)


READ_COLS = [
    {"name": "rowkey", "type": "string"},
    {"name": "cf:lang", "type": "string"},
    {"name": "cf:stars", "type": "long"},
    {"name": "cf:score", "type": "double"},
    {"name": "cf:active", "type": "boolean"},
]


def test_write_read_roundtrip_typed(spark, hb_endpoint, sample_df):
    stats = hbase_write(sample_df, _write_conf(hb_endpoint))
    # the all-null row under nullMode=skip is "No columns to insert":
    # skipped whole, neither written nor dirty (HbaseAbstractTask:60-69)
    assert stats == {"written": 2, "dirty": 0}
    got = hbase_read(
        spark,
        {"endpoint": hb_endpoint, "table": "t1", "column": READ_COLS},
    ).orderBy("rowkey")
    rows = [tuple(r) for r in got.collect()]
    assert rows == [
        ("r/a", "python", 12, 0.5, True),
        ("r/b", "go", 7, 1.25, False),
    ]


def test_read_constants_and_range(spark, hb_endpoint, sample_df):
    hbase_write(sample_df, _write_conf(hb_endpoint))
    got = hbase_read(
        spark,
        {
            "endpoint": hb_endpoint,
            "table": "t1",
            "range": {"startRowkey": "r/a", "endRowkey": "r/c"},
            "column": [
                {"name": "rowkey", "type": "string"},
                {"type": "string", "value": "const!"},
                {"type": "long", "value": "42"},
                {"name": "cf:stars", "type": "long"},
            ],
        },
    ).orderBy("rowkey")
    rows = [tuple(r) for r in got.collect()]
    # endRowkey exclusive: r/c not included
    assert rows == [("r/a", "const!", 42, 12), ("r/b", "const!", 42, 7)]


def test_region_parallel_scan(spark, hb_endpoint, sample_df):
    HB.regions["t1"] = [(b"", b"r/b"), (b"r/b", b"")]
    hbase_write(sample_df, _write_conf(hb_endpoint))
    got = hbase_read(
        spark, {"endpoint": hb_endpoint, "table": "t1", "column": READ_COLS}
    )
    assert got.count() == 2  # both region splits scanned (all-null row skipped)


def test_null_mode_empty_writes_empty_cell(spark, hb_endpoint, sample_df):
    hbase_write(sample_df, _write_conf(hb_endpoint, nullMode="empty"))
    with HB.lock:
        cells = HB.tables["t1"][b"r/c"]
    assert cells[b"cf:lang"][0][1] == b""  # empty bytes, cell present


def test_dirty_record_on_null_rowkey(spark, hb_endpoint):
    df = spark.createDataFrame(
        [(None, "x", 1, 1.0, True), ("ok", "y", 2, 2.0, False)],
        "k string, lang string, stars long, score double, active boolean",
    )
    stats = hbase_write(df, _write_conf(hb_endpoint))
    assert stats == {"written": 1, "dirty": 1}


def test_version_column_and_multiversion_read(spark, hb_endpoint):
    conf = {
        "endpoint": hb_endpoint,
        "table": "mv",
        "rowkeyColumn": [{"index": 0, "type": "string"}],
        "column": [{"index": 1, "name": "cf:v", "type": "long"}],
        "versionColumn": {"index": 2},
    }
    df1 = spark.createDataFrame([("k1", 10, 1000)], "k string, v long, ts long")
    df2 = spark.createDataFrame([("k1", 20, 2000)], "k string, v long, ts long")
    hbase_write(df1, conf)
    hbase_write(df2, conf)
    got = hbase_read(
        spark,
        {
            "endpoint": hb_endpoint,
            "table": "mv",
            "mode": "multiVersionFixedColumn",
            "maxVersion": -1,
            "column": [
                {"name": "rowkey", "type": "string"},
                {"name": "cf:v", "type": "long"},
            ],
        },
    ).orderBy("timestamp")
    rows = [tuple(r) for r in got.collect()]
    assert rows == [("k1", "cf:v", 1000, "10"), ("k1", "cf:v", 2000, "20")]
    # normal mode surfaces only the NEWEST version
    latest = hbase_read(
        spark,
        {"endpoint": hb_endpoint, "table": "mv",
         "column": [{"name": "rowkey", "type": "string"},
                    {"name": "cf:v", "type": "long"}]},
    ).collect()
    assert [tuple(r) for r in latest] == [("k1", 20)]


def test_composite_rowkey_with_constant(spark, hb_endpoint):
    conf = {
        "endpoint": hb_endpoint,
        "table": "ck",
        "rowkeyColumn": [
            {"index": 0, "type": "string"},
            {"index": -1, "type": "string", "value": "_"},
            {"index": 1, "type": "int"},
        ],
        "column": [{"index": 2, "name": "cf:x", "type": "string"}],
    }
    df = spark.createDataFrame([("a", 5, "payload")], "k string, n int, x string")
    assert hbase_write(df, conf) == {"written": 1, "dirty": 0}
    with HB.lock:
        keys = list(HB.tables["ck"])
    assert keys == [b"a_" + b"\x00\x00\x00\x05"]


def test_dispatch_read_source_write_sink(spark, hb_endpoint, sample_df):
    write_sink(sample_df, "hbase11xwriter", _write_conf(hb_endpoint))
    got = read_source(
        spark, "hbase11xreader",
        {"endpoint": hb_endpoint, "table": "t1", "column": READ_COLS},
    )
    assert got.count() == 2


def test_invalid_configs_rejected(spark, hb_endpoint, sample_df):
    with pytest.raises(ValueError, match="family:qualifier"):
        hbase_write(sample_df, _write_conf(
            hb_endpoint, column=[{"index": 1, "name": "nocolon", "type": "string"}]
        ))
    with pytest.raises(ValueError, match="nullMode"):
        hbase_write(sample_df, _write_conf(hb_endpoint, nullMode="zero"))
    with pytest.raises(ValueError, match="out of range"):
        hbase_write(sample_df, _write_conf(
            hb_endpoint, column=[{"index": 9, "name": "cf:x", "type": "string"}]
        ))
    with pytest.raises(ValueError, match="does not support type"):
        hbase_read(spark, {"endpoint": hb_endpoint, "table": "t1",
                           "column": [{"name": "cf:x", "type": "uuid"}]})
