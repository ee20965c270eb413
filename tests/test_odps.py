"""odpsreader / odpswriter against an in-process fake MaxCompute.

The fake speaks the Tunnel REST surface the plugins use — download
sessions that SNAPSHOT the table (``?downloads`` → DownloadID +
RecordCount), Arrow row-range reads (``?data&downloadid&rowrange=
(s,c)&arrow``), upload sessions with two-phase block commit
(``?uploads`` / ``?data&uploadid&blockid`` / commit-with-block-list),
plus table metadata, partition listing, and the SQLTask instances
endpoint the writer's truncate/addPart DDL goes through. Every request
is signature-verified with the documented Aliyun header scheme, so the
whole distributed path — split planning on session record counts,
per-slice Arrow fetches inside mapInPandas, per-task block uploads —
runs against the real wire shapes.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import io
import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from datax_spark.sources.odps import (
    expand_partitions,
    normalize_partition,
    odps_read,
    odps_write,
    parse_columns,
    split_record_count,
)
from datax_spark.sources.readers import read_source
from datax_spark.sinks.writers import write_sink

ACCESS_ID = "testid"
ACCESS_KEY = "testkey"
PROJECT = "proj"


class FakeODPS:
    def __init__(self):
        # table -> {"columns": [(n,t)], "partition_keys": [(n,t)],
        #           "data": {partition_spec_or_empty: [row dicts]}}
        self.tables: dict[str, dict] = {}
        self.downloads: dict[str, dict] = {}  # id -> {rows, partition}
        self.uploads: dict[str, dict] = {}    # id -> {blocks, partition, table, committed}
        self.sqls: list[str] = []
        self.download_sessions = 0
        self.data_calls: list[tuple[str, int, int]] = []
        self.lock = threading.Lock()
        self._uid = 0

    def new_table(self, name, columns, partition_keys=()):
        self.tables[name] = {
            "columns": list(columns),
            "partition_keys": list(partition_keys),
            "data": {},
        }

    def seed(self, table, partition, rows):
        self.tables[table]["data"].setdefault(partition, []).extend(rows)

    def uid(self, prefix):
        with self.lock:
            self._uid += 1
            return f"{prefix}{self._uid}"

    # ---- SQLTask DDL: exactly the statement forms the reference composes
    def run_sql(self, sql: str):
        self.sqls.append(sql)
        sql = sql.strip().rstrip(";")
        m = re.match(r"truncate table (\w+)$", sql)
        if m:
            self.tables[m.group(1)]["data"] = {}
            return
        m = re.match(
            r"alter table (\w+) (drop if exists|add if not exists|add) "
            r"partition\((.+)\)$", sql)
        if m:
            table, op, spec = m.groups()
            spec = normalize_partition(spec)
            data = self.tables[table]["data"]
            if op.startswith("drop"):
                data.pop(spec, None)
            else:
                data.setdefault(spec, [])
            return
        raise ValueError(f"fake cannot execute {sql!r}")


ODPS = FakeODPS()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _check_sig(self) -> bool:
        auth = self.headers.get("Authorization", "")
        date = self.headers.get("Date", "")
        ctype = self.headers.get("Content-Type", "") or ""
        # the client signs path?query verbatim
        msg = f"{self.command}\n\n{ctype}\n{date}\n{self.path}"
        mac = hmac.new(ACCESS_KEY.encode(), msg.encode(), hashlib.sha1)
        want = f"ODPS {ACCESS_ID}:{base64.b64encode(mac.digest()).decode()}"
        return auth == want

    def _reply(self, code, body=b"", ctype="application/json"):
        if isinstance(body, (dict, list)):
            body = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _route(self):
        u = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(u.query, keep_blank_values=True)
        flags = {kv.split("=", 1)[0] for kv in u.query.split("&") if kv}
        return u.path, q, flags

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def do_GET(self):  # noqa: N802
        if not self._check_sig():
            return self._reply(403, {"error": "bad signature"})
        path, q, flags = self._route()
        m = re.match(rf"/projects/{PROJECT}/tables/(\w+)$", path)
        if not m or m.group(1) not in ODPS.tables:
            return self._reply(404, {"error": "no such table"})
        t = ODPS.tables[m.group(1)]
        if "partitions" in flags:
            return self._reply(200, {"partitions": sorted(t["data"])})
        if "data" in flags:
            sid = q["downloadid"][0]
            sess = ODPS.downloads.get(sid)
            if sess is None:
                return self._reply(404, {"error": "no such download session"})
            s, c = map(int, re.match(
                r"\((\d+),(\d+)\)", q["rowrange"][0]).groups())
            ODPS.data_calls.append((sid, s, c))
            rows = sess["rows"][s:s + c]
            names = [n for n, _ in t["columns"]]
            arrays = {n: [r.get(n) for r in rows] for n in names}
            tbl = pa.table(arrays) if rows else pa.table(
                {n: pa.array([], type=pa.string()) for n in names})
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
            return self._reply(200, sink.getvalue(),
                               ctype="application/octet-stream")
        # table metadata
        return self._reply(200, {
            "columns": [{"name": n, "type": ty} for n, ty in t["columns"]],
            "partitionKeys": [
                {"name": n, "type": ty} for n, ty in t["partition_keys"]],
        })

    def do_POST(self):  # noqa: N802
        if not self._check_sig():
            return self._reply(403, {"error": "bad signature"})
        path, q, flags = self._route()
        body = self._body()
        if path == f"/projects/{PROJECT}/instances":
            try:
                ODPS.run_sql(json.loads(body)["sql"])
            except (KeyError, ValueError) as e:
                return self._reply(400, {"error": str(e)})
            return self._reply(200, {"status": "Terminated"})
        m = re.match(rf"/projects/{PROJECT}/tables/(\w+)$", path)
        if not m or m.group(1) not in ODPS.tables:
            return self._reply(404, {"error": "no such table"})
        table = m.group(1)
        t = ODPS.tables[table]
        part = normalize_partition(q.get("partition", [""])[0])
        if "downloads" in flags:
            # a download session SNAPSHOTS the partition at creation
            if part and part not in t["data"]:
                return self._reply(404, {"error": f"no partition {part}"})
            rows = list(t["data"].get(part, []))
            sid = ODPS.uid("dl_")
            ODPS.downloads[sid] = {"rows": rows, "partition": part}
            ODPS.download_sessions += 1
            return self._reply(200, {
                "DownloadID": sid, "Status": "NORMAL",
                "RecordCount": len(rows),
            })
        if "uploads" in flags:
            uid = ODPS.uid("ul_")
            ODPS.uploads[uid] = {
                "blocks": {}, "partition": part, "table": table,
                "committed": False,
            }
            return self._reply(200, {"UploadID": uid, "Status": "NORMAL"})
        if "uploadid" in q:
            # two-phase commit: apply EXACTLY the listed blocks, in order
            sess = ODPS.uploads.get(q["uploadid"][0])
            if sess is None:
                return self._reply(404, {"error": "no such upload session"})
            want = json.loads(body)["blocks"]
            missing = [b for b in want if b not in sess["blocks"]]
            if missing:
                return self._reply(400, {"error": f"missing blocks {missing}"})
            dest = ODPS.tables[sess["table"]]["data"].setdefault(
                sess["partition"], [])
            for b in want:
                dest.extend(sess["blocks"][b])
            sess["committed"] = True
            return self._reply(200, {"status": "committed"})
        return self._reply(400, {"error": "unknown POST"})

    def do_PUT(self):  # noqa: N802
        if not self._check_sig():
            return self._reply(403, {"error": "bad signature"})
        path, q, flags = self._route()
        if "uploadid" not in q or "blockid" not in q:
            return self._reply(400, {"error": "unknown PUT"})
        sess = ODPS.uploads.get(q["uploadid"][0])
        if sess is None:
            return self._reply(404, {"error": "no such upload session"})
        tbl = pa.ipc.open_stream(io.BytesIO(self._body())).read_all()
        sess["blocks"][int(q["blockid"][0])] = tbl.to_pylist()
        return self._reply(200, {"status": "ok"})


@pytest.fixture(scope="module")
def odps():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _conf(endpoint, **kw):
    return {
        "endpoint": endpoint, "project": PROJECT,
        "accessId": ACCESS_ID, "accessKey": ACCESS_KEY, **kw,
    }


@pytest.fixture(autouse=True)
def _fresh():
    ODPS.tables.clear()
    ODPS.downloads.clear()
    ODPS.uploads.clear()
    ODPS.sqls.clear()
    ODPS.data_calls.clear()
    ODPS.download_sessions = 0
    yield


# ------------------------------------------------------------ unit parity

def test_split_record_count_tiles_range():
    for count, advice in [(10, 3), (7, 7), (5, 32), (1, 4), (100, 1)]:
        ranges = split_record_count(count, advice)
        assert ranges[0][0] == 0
        covered = 0
        for s, c in ranges:
            assert s == covered
            covered += c
        assert covered == count
        assert len(ranges) == min(advice, count)
    assert split_record_count(0, 8) == [(0, 0)]  # empty slice, parity
    with pytest.raises(ValueError):
        split_record_count(-1, 4)
    with pytest.raises(ValueError):
        split_record_count(10, 0)


def test_parse_columns_kinds_and_case():
    parsed = parse_columns(["ID", "'cn'", "DT"], ["id", "v"], ["dt"])
    assert parsed == [
        ("normal", "id", "id"),
        ("constant", "cn", "const_1"),
        ("partition", "dt", "dt"),
    ]
    with pytest.raises(ValueError):
        parse_columns(["nope"], ["id"], ["dt"])


def test_expand_partitions_star_exact_wildcard():
    actual = ["dt=20170101,hh=08", "dt=20170102,hh=09", "dt=20170201,hh=08"]
    assert expand_partitions(["*"], actual) == [
        normalize_partition(a) for a in actual]
    assert expand_partitions(["DT=20170102,HH=09"], actual) == [
        "dt=20170102,hh=09"]
    assert expand_partitions(["dt=201701*"], actual) == [
        "dt=20170101,hh=08", "dt=20170102,hh=09"]
    assert expand_partitions(["dt=2018*"], actual) == []
    assert normalize_partition("dt='x' , hh='08'") == "dt=x,hh=08"


# ------------------------------------------------------------ reader

def _seed_plain(n=10):
    ODPS.new_table("src", [("id", "bigint"), ("name", "string")])
    ODPS.seed("src", "", [{"id": i, "name": f"n{i}"} for i in range(n)])


def test_read_non_partitioned_splits_share_session(spark, odps):
    _seed_plain(10)
    df = odps_read(spark, _conf(odps, table="src", adviceNum=3))
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [(i, f"n{i}") for i in range(10)]
    # one master session; 3 rowranges tiling [0, 10)
    assert ODPS.download_sessions == 1
    assert sorted((s, c) for _, s, c in ODPS.data_calls) == [
        (0, 3), (3, 3), (6, 4)]


def test_read_empty_table_yields_empty_frame(spark, odps):
    ODPS.new_table("src", [("id", "bigint"), ("name", "string")])
    ODPS.seed("src", "", [])
    df = odps_read(spark, _conf(odps, table="src", adviceNum=4))
    assert df.count() == 0
    assert df.columns == ["id", "name"]


def test_read_partitioned_star_and_partition_column(spark, odps):
    ODPS.new_table("logs", [("id", "bigint")], [("dt", "string")])
    ODPS.seed("logs", "dt=20170101", [{"id": 1}, {"id": 2}])
    ODPS.seed("logs", "dt=20170102", [{"id": 3}])
    df = odps_read(spark, _conf(
        odps, table="logs", partition=["*"], column=["id", "dt"]))
    got = sorted((r["id"], r["dt"]) for r in df.collect())
    assert got == [(1, "20170101"), (2, "20170101"), (3, "20170102")]


def test_read_partition_wildcard_and_no_match_errors(spark, odps):
    ODPS.new_table("logs", [("id", "bigint")], [("dt", "string")])
    ODPS.seed("logs", "dt=20170101", [{"id": 1}])
    ODPS.seed("logs", "dt=20170201", [{"id": 2}])
    df = odps_read(spark, _conf(
        odps, table="logs", partition=["dt=201701*"], column=["id"]))
    assert [r["id"] for r in df.collect()] == [1]
    with pytest.raises(ValueError, match="matches no partition"):
        odps_read(spark, _conf(
            odps, table="logs", partition=["dt=2018*"], column=["id"]))
    empty = odps_read(spark, _conf(
        odps, table="logs", partition=["dt=2018*"], column=["id"],
        successOnNoPartition=True))
    assert empty.count() == 0 and empty.columns == ["id"]


def test_read_split_mode_partition_one_session_each(spark, odps):
    ODPS.new_table("logs", [("id", "bigint")], [("dt", "string")])
    for d in ("dt=1", "dt=2", "dt=3"):
        ODPS.seed("logs", d, [{"id": int(d[-1])}])
    df = odps_read(spark, _conf(
        odps, table="logs", partition=["*"], column=["id"],
        splitMode="partition", adviceNum=32))
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
    assert ODPS.download_sessions == 3  # one master session per partition


def test_read_constant_column_and_case_insensitive(spark, odps):
    _seed_plain(3)
    df = odps_read(spark, _conf(
        odps, table="src", column=["NAME", "'cst'", "ID"], adviceNum=2))
    assert df.columns == ["name", "const_1", "id"]
    rows = sorted((r["id"], r["name"], r["const_1"]) for r in df.collect())
    assert rows == [(i, f"n{i}", "cst") for i in range(3)]


def test_read_snapshot_isolation_of_session(spark, odps):
    """A download session pins RecordCount at creation — rows appended
    after planning are invisible to the scan (Tunnel session parity)."""
    _seed_plain(4)
    df = odps_read(spark, _conf(odps, table="src", adviceNum=2))
    ODPS.seed("src", "", [{"id": 99, "name": "late"}])
    assert df.count() == 4


# ------------------------------------------------------------ writer

def test_write_then_read_round_trip_blocks(spark, odps):
    ODPS.new_table("dst", [("id", "bigint"), ("name", "string")])
    from pyspark.sql import functions as F
    df = spark.range(0, 7).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    res = odps_write(df, _conf(odps, table="dst", blockRows=3))
    assert res["blocks"] >= 3  # 7 rows / 3-row blocks across partitions
    committed = [u for u in ODPS.uploads.values() if u["committed"]]
    assert committed, "at least one upload session committed"
    got = sorted((r["id"], r["name"]) for r in read_source(
        spark, "odpsreader", _conf(odps, table="dst")).collect())
    assert got == [(i, f"n{i}") for i in range(7)]


def test_write_uncommitted_blocks_invisible(spark, odps):
    """Two-phase parity: blocks PUT without the commit POST never
    reach the table."""
    from datax_spark.sources import odps as mod
    ODPS.new_table("dst", [("id", "bigint")])
    conf = _conf(odps, table="dst")
    status, body = mod._request(conf, "POST", mod._table_path(conf), "uploads")
    uid = json.loads(body)["UploadID"]
    tbl = pa.table({"id": [1, 2]})
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    mod._request(conf, "PUT", mod._table_path(conf),
                 f"data&uploadid={uid}&blockid=0", data=sink.getvalue(),
                 content_type="application/octet-stream")
    df = odps_read(spark, _conf(odps, table="dst"))
    assert df.count() == 0  # block staged, never committed


def test_write_partitioned_truncate_and_addpart(spark, odps):
    from pyspark.sql import functions as F
    ODPS.new_table("plogs", [("id", "bigint")], [("dt", "string")])
    ODPS.seed("plogs", "dt=20170101", [{"id": 111}])
    df = spark.range(0, 3).select(F.col("id"))
    odps_write(df, _conf(
        odps, table="plogs", partition="dt=20170101", truncate=True))
    got = sorted(r["id"] for r in odps_read(spark, _conf(
        odps, table="plogs", partition=["dt=20170101"],
        column=["id"])).collect())
    assert got == [0, 1, 2]  # 111 truncated away
    assert any("drop if exists" in s for s in ODPS.sqls)
    assert any(re.search(r"add partition\(dt='20170101'\)", s)
               for s in ODPS.sqls)
    # truncate=False on a NEW partition: add if not exists, then append
    odps_write(df, _conf(
        odps, table="plogs", partition="dt=20170202", truncate=False))
    assert any("add if not exists" in s for s in ODPS.sqls)
    got2 = sorted(r["id"] for r in odps_read(spark, _conf(
        odps, table="plogs", partition=["dt=20170202"],
        column=["id"])).collect())
    assert got2 == [0, 1, 2]


def test_write_non_partitioned_truncate_sql(spark, odps):
    from pyspark.sql import functions as F
    ODPS.new_table("dst", [("id", "bigint")])
    ODPS.seed("dst", "", [{"id": 5}])
    odps_write(spark.range(0, 2).select(F.col("id")),
               _conf(odps, table="dst", truncate=True))
    assert "truncate table dst;" in ODPS.sqls
    assert sorted(r["id"] for r in odps_read(
        spark, _conf(odps, table="dst")).collect()) == [0, 1]


def test_jobspec_dispatch(spark, odps):
    from pyspark.sql import functions as F
    ODPS.new_table("dst", [("id", "bigint"), ("name", "string")])
    df = spark.range(0, 4).select(
        F.col("id"), F.lit("x").alias("name"))
    write_sink(df, "odpswriter", _conf(odps, table="dst"))
    out = read_source(spark, "odpsreader", _conf(odps, table="dst"))
    assert out.count() == 4


def test_bad_signature_rejected(spark, odps):
    _seed_plain(2)
    with pytest.raises(IOError, match="HTTP 403"):
        odps_read(spark, _conf(odps, table="src", accessKey="wrong"))
