"""tdenginereader / tdenginewriter against an in-process fake TDengine.

The fake speaks the REST ``/rest/sql`` endpoint (Basic auth, JSON
column_meta/data responses) and understands exactly the statement
shapes the plugins compose: the reader's
``select ... from ... where {where} [and _c0 >= ..][and _c0 < ..]``
window scans plus raw querySql, and the writer's three insert shapes
(super-table ``tbname using stable tags() values()`` segments,
sub-table filtered inserts, normal-table inserts), along with the
metadata statements (``show stables/tables/databases``, ``describe``,
``select database()``, tag-value probes).
"""

from __future__ import annotations

import base64
import json
import re
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.tdengine import (
    _compose,
    tdengine_read,
    tdengine_write,
)
from datax_spark.sources.readers import read_source
from datax_spark.sinks.writers import write_sink

USER, PASS, DB = "root", "taosdata", "test"
FMT = "%Y-%m-%d %H:%M:%S"


def _ms(s: str) -> int:
    return int(datetime.strptime(s, FMT).replace(
        tzinfo=timezone.utc).timestamp() * 1000)


def _fmt(ms: int) -> str:
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime(FMT)


class FakeTDengine:
    """Tables: name -> {"cols": [(field, type, note)], "kind":
    super|sub|normal, "stable": str|None, "tags": {field: value},
    "rows": [dict]} — first col is the timestamp (_c0), stored ms."""

    def __init__(self):
        self.tables: dict[str, dict] = {}
        self.sqls: list[str] = []

    def new_table(self, name, cols, kind="normal", stable=None, tags=None):
        self.tables[name] = {
            "cols": cols, "kind": kind, "stable": stable,
            "tags": dict(tags or {}), "rows": [],
        }

    # ---- statement dispatch
    def execute(self, sql: str) -> dict:
        self.sqls.append(sql)
        sql = sql.strip()
        low = sql.lower()
        if low == "select database()":
            return _resp([("database()", "BINARY")], [[DB]])
        if low == "show databases":
            return _resp([("name", "BINARY"), ("precision", "BINARY")],
                         [[DB, "ms"]])
        if low == "show stables":
            return _resp([("name", "BINARY")],
                         [[n] for n, t in self.tables.items()
                          if t["kind"] == "super"])
        if low == "show tables":
            return _resp(
                [("table_name", "BINARY"), ("stable_name", "BINARY")],
                [[n, t["stable"] or ""] for n, t in self.tables.items()
                 if t["kind"] != "super"])
        m = re.match(r"describe (\w+)$", low)
        if m:
            t = self.tables[m.group(1)]
            if t["kind"] == "sub" and t["stable"]:
                # real TDengine: a sub-table describes as its super
                # table's full schema, tags included (Note == "TAG")
                t = self.tables[t["stable"]]
            return _resp(
                [("Field", "BINARY"), ("Type", "BINARY"),
                 ("Length", "INT"), ("Note", "BINARY")],
                [[f, ty, 8, note] for f, ty, note in t["cols"]])
        if low.startswith("insert into"):
            return _resp([("affected_rows", "INT")],
                         [[self._insert(sql)]])
        if low.startswith("select"):
            return self._select(sql)
        raise ValueError(f"fake cannot execute {sql!r}")

    # ---- SELECT: the composed window scan, querySql, tag probes
    def _select(self, sql: str) -> dict:
        m = re.match(
            r"select (.+?) from (\w+)(?:\s+where\s+(.+))?$", sql.strip(),
            re.IGNORECASE | re.DOTALL)
        cols_s, table, where = m.groups()
        t = self.tables[table]
        fields = [f for f, _, _ in t["cols"]]
        sel = fields if cols_s.strip() == "*" else [
            c.strip() for c in cols_s.split(",")]
        # resolve rows: a super table scans all its children
        if t["kind"] == "super":
            rows = [dict(r, **c["tags"])
                    for c in self.tables.values()
                    if c.get("stable") == table for r in c["rows"]]
            fields = fields + [f for f, _, _ in t["cols"]
                               if f not in fields]
        else:
            rows = [dict(r, **t["tags"]) for r in t["rows"]]
        ts_field = t["cols"][0][0]
        if where:
            for cond in re.split(r"\s+and\s+", where, flags=re.IGNORECASE):
                cm = re.match(
                    r"_c0\s*(>=|<=|>|<)\s*('?)([^']+)\2", cond.strip())
                if not cm:
                    raise ValueError(f"fake cannot filter {cond!r}")
                op, quoted, val = cm.group(1), cm.group(2), cm.group(3)
                bound = _ms(val) if quoted else int(val)
                rows = [r for r in rows if _cmp(r[ts_field], op, bound)]
        types = {f: ty for f, ty, _ in t["cols"]}
        meta = [(c, types.get(c, "BINARY")) for c in sel]
        data = []
        for r in rows:
            out = []
            for c in sel:
                v = r.get(c)
                if types.get(c) == "TIMESTAMP" and v is not None:
                    v = _fmt(v)
                out.append(v)
            data.append(out)
        return _resp(meta, data)

    # ---- INSERT: the writer's three shapes
    def _insert(self, sql: str) -> int:
        n = 0
        sup = re.findall(
            r"(\w+) using (\w+) tags\(([^)]*)\) values\(([^)]*)\)", sql)
        if sup:
            for tbname, stable, tags_s, vals_s in sup:
                st = self.tables[stable]
                tag_fields = [f for f, _, note in st["cols"] if note == "TAG"]
                val_fields = [f for f, _, note in st["cols"] if note != "TAG"]
                tags = dict(zip(tag_fields, _values(tags_s)))
                if tbname not in self.tables:
                    self.new_table(
                        tbname,
                        [(f, ty, n_) for f, ty, n_ in st["cols"]
                         if n_ != "TAG"],
                        kind="sub", stable=stable, tags=tags)
                self.tables[tbname]["rows"].append(
                    self._row(val_fields, _values(vals_s), stable))
                n += 1
            return n
        m = re.match(
            r"insert into (\w+)\s*\(([^)]*)\)\s*values\s*(.+)$", sql,
            re.IGNORECASE | re.DOTALL)
        table, cols_s, vals_s = m.groups()
        fields = [c.strip() for c in cols_s.split(",")]
        for seg in re.findall(r"\(([^)]*)\)", vals_s):
            self.tables[table]["rows"].append(
                self._row(fields, _values(seg), table))
            n += 1
        return n

    def _row(self, fields, values, table) -> dict:
        types = {f: ty for f, ty, _ in self.tables[table]["cols"]}
        row = {}
        for f, v in zip(fields, values):
            if types.get(f) == "TIMESTAMP" and isinstance(v, str):
                v = _ms(v)
            row[f] = v
        return row


def _cmp(v, op, bound):
    return {"<": v < bound, "<=": v <= bound,
            ">": v > bound, ">=": v >= bound}[op]


def _values(s: str) -> list:
    out = []
    for tok in s.split(","):
        tok = tok.strip()
        if tok.upper() == "NULL":
            out.append(None)
        elif tok.startswith(("'", '"')):
            out.append(tok[1:-1].replace("\\'", "'"))
        elif tok in ("true", "false"):
            out.append(tok == "true")
        elif re.match(r"^-?\d+$", tok):
            out.append(int(tok))
        else:
            out.append(float(tok))
    return out


def _resp(meta, data):
    return {
        "status": "succ",
        "head": [m[0] for m in meta],
        "column_meta": [[m[0], m[1], 8] for m in meta],
        "data": data,
        "rows": len(data),
    }


TD = FakeTDengine()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):  # noqa: N802
        tok = base64.b64encode(f"{USER}:{PASS}".encode()).decode()
        if self.headers.get("Authorization") != f"Basic {tok}":
            body = json.dumps({"status": "error", "desc": "auth"}).encode()
            self.send_response(401)
        else:
            n = int(self.headers.get("Content-Length") or 0)
            sql = self.rfile.read(n).decode()
            try:
                body = json.dumps(TD.execute(sql)).encode()
                self.send_response(200)
            except Exception as e:  # noqa: BLE001
                body = json.dumps(
                    {"status": "error", "desc": str(e)}).encode()
                self.send_response(400)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def td():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture(autouse=True)
def _fresh():
    TD.tables.clear()
    TD.sqls.clear()
    yield


def _conf(url, **kw):
    return {"username": USER, "password": PASS,
            "connection": [{"jdbcUrl": [url], **kw.pop("conn", {})}], **kw}


def _seed_weather(n=6):
    TD.new_table("weather", [
        ("ts", "TIMESTAMP", ""), ("temp", "DOUBLE", ""),
        ("city", "BINARY", "")])
    base = _ms("2021-01-01 00:00:00")
    TD.tables["weather"]["rows"] = [
        {"ts": base + i * 3600_000, "temp": 20.0 + i, "city": f"c{i % 2}"}
        for i in range(n)
    ]


# ------------------------------------------------------------ validation

def test_validation_parity():
    with pytest.raises(ValueError, match=r"\[username\]"):
        tdengine_read(None, {"password": "x", "connection": [{}]})
    with pytest.raises(ValueError, match=r"\[connection\]"):
        tdengine_read(None, {"username": "u", "password": "x"})
    with pytest.raises(ValueError, match="less than"):
        tdengine_read(None, {
            "username": "u", "password": "x",
            "connection": [{"jdbcUrl": ["http://x"], "table": ["t"]}],
            "beginDateTime": "2021-01-02 00:00:00",
            "endDateTime": "2021-01-01 00:00:00"})
    with pytest.raises(ValueError, match=r"\[jdbcUrl\]"):
        tdengine_read(None, {
            "username": "u", "password": "x", "connection": [{}]})


def test_compose_matches_reference_shape():
    sql = _compose({"column": ["ts", "temp"],
                    "beginDateTime": "2021-01-01 00:00:00",
                    "endDateTime": "2021-01-02 00:00:00"}, "weather")
    assert sql == ("select ts,temp from weather where _c0 > "
                   f"{-(2**63)} and _c0 >= '2021-01-01 00:00:00'"
                   " and _c0 < '2021-01-02 00:00:00'")


# ------------------------------------------------------------ reader

def test_read_table_mode_window(spark, td):
    _seed_weather(6)
    df = tdengine_read(spark, _conf(
        td, conn={"table": ["weather"]}, column=["ts", "temp", "city"],
        beginDateTime="2021-01-01 01:00:00",
        endDateTime="2021-01-01 04:00:00"))
    rows = sorted((r["temp"], r["city"]) for r in df.collect())
    assert rows == [(21.0, "c1"), (22.0, "c0"), (23.0, "c1")]
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_read_query_sql_passthrough(spark, td):
    _seed_weather(3)
    df = tdengine_read(spark, _conf(
        td, conn={"querySql": ["select city,temp from weather"]}))
    assert sorted((r["city"], r["temp"]) for r in df.collect()) == [
        ("c0", 20.0), ("c0", 22.0), ("c1", 21.0)]


def test_read_multi_table_union(spark, td):
    _seed_weather(2)
    TD.new_table("weather2", TD.tables["weather"]["cols"])
    TD.tables["weather2"]["rows"] = [
        {"ts": _ms("2021-01-01 00:00:00"), "temp": 99.0, "city": "z"}]
    df = tdengine_read(spark, _conf(
        td, conn={"table": ["weather", "weather2"]},
        column=["temp", "city"]))
    assert sorted(r["temp"] for r in df.collect()) == [20.0, 21.0, 99.0]


# ------------------------------------------------------------ writer

def test_write_normal_table_round_trip(spark, td):
    from pyspark.sql import functions as F
    TD.new_table("weather", [
        ("ts", "TIMESTAMP", ""), ("temp", "DOUBLE", ""),
        ("city", "BINARY", "")])
    df = spark.createDataFrame(
        [(datetime(2021, 1, 1, i), 20.0 + i, f"c{i}") for i in range(4)],
        "ts timestamp, temp double, city string")
    tdengine_write(df, _conf(td, conn={"table": ["weather"]},
                             column=["ts", "temp", "city"], batchSize=2))
    back = tdengine_read(spark, _conf(
        td, conn={"table": ["weather"]}, column=["temp", "city"]))
    assert sorted((r["temp"], r["city"]) for r in back.collect()) == [
        (20.0 + i, f"c{i}") for i in range(4)]
    # batched: >= 2 insert statements for 4 rows at batchSize=2
    assert sum("insert into" in s for s in TD.sqls) >= 2


def test_write_super_table_tbname_segments(spark, td):
    TD.new_table("stb", [
        ("ts", "TIMESTAMP", ""), ("f1", "DOUBLE", ""),
        ("t1", "BINARY", "TAG")], kind="super")
    df = spark.createDataFrame(
        [(datetime(2021, 1, 1), 1.0, "a", "d1"),
         (datetime(2021, 1, 2), 2.0, "b", "d2"),
         (datetime(2021, 1, 3), 3.0, "a", "d1")],
        "ts timestamp, f1 double, t1 string, tbname string")
    tdengine_write(df, _conf(
        td, conn={"table": ["stb"]}, column=["ts", "f1", "t1", "tbname"]))
    assert TD.tables["d1"]["tags"] == {"t1": "a"}
    assert len(TD.tables["d1"]["rows"]) == 2
    assert len(TD.tables["d2"]["rows"]) == 1
    # and the super-table scan unions children with tag columns
    back = tdengine_read(spark, _conf(
        td, conn={"table": ["stb"]}, column=["f1", "t1"]))
    assert sorted((r["f1"], r["t1"]) for r in back.collect()) == [
        (1.0, "a"), (2.0, "b"), (3.0, "a")]


def test_write_super_table_without_tbname_fails_loudly(spark, td):
    TD.new_table("stb", [
        ("ts", "TIMESTAMP", ""), ("f1", "DOUBLE", ""),
        ("t1", "BINARY", "TAG")], kind="super")
    df = spark.createDataFrame(
        [(datetime(2021, 1, 1), 1.0, "a")],
        "ts timestamp, f1 double, t1 string")
    with pytest.raises(NotImplementedError, match="schemaless"):
        tdengine_write(df, _conf(
            td, conn={"table": ["stb"]}, column=["ts", "f1", "t1"]))


def test_write_sub_table_filters_tbname_and_tags(spark, td):
    TD.new_table("stb", [
        ("ts", "TIMESTAMP", ""), ("f1", "DOUBLE", ""),
        ("t1", "BINARY", "TAG")], kind="super")
    TD.new_table("d1", [("ts", "TIMESTAMP", ""), ("f1", "DOUBLE", "")],
                 kind="sub", stable="stb", tags={"t1": "a"})
    # the reference's tag-value probe (select t1 from d1) reads the tag
    # off existing rows — a sub-table in the wild always has its tags
    TD.tables["d1"]["rows"].append({"ts": _ms("2020-12-31 00:00:00"),
                                    "f1": 0.5})
    df = spark.createDataFrame(
        [(datetime(2021, 1, 1), 1.0, "a", "d1"),
         (datetime(2021, 1, 2), 2.0, "b", "dX"),   # tbname mismatch
         (datetime(2021, 1, 3), 3.0, "z", "d1")],  # tag mismatch
        "ts timestamp, f1 double, t1 string, tbname string")
    tdengine_write(df, _conf(
        td, conn={"table": ["d1"]},
        column=["ts", "f1", "t1", "tbname"], ignoreTagsUnmatched=True))
    assert [r["f1"] for r in TD.tables["d1"]["rows"]] == [0.5, 1.0]


def test_jobspec_dispatch(spark, td):
    _seed_weather(3)
    df = read_source(spark, "tdenginereader", _conf(
        td, conn={"table": ["weather"]}, column=["ts", "temp", "city"]))
    assert df.count() == 3
    TD.new_table("sink", [
        ("ts", "TIMESTAMP", ""), ("temp", "DOUBLE", ""),
        ("city", "BINARY", "")])
    write_sink(df, "tdenginewriter", _conf(
        td, conn={"table": ["sink"]}, column=["ts", "temp", "city"]))
    assert len(TD.tables["sink"]["rows"]) == 3
