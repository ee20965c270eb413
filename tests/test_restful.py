"""restfulapireader against a real in-process HTTP server.

The reference plugin (RestFulApiReader.java, HttpServiceUtil.java)
fetches one URL per job — GET with queryParam appended, POST with a
JSON body — applies headerInfos, extracts records at dataPath's last
dot-segment via recursive search (JsonLoop.java), and projects the
configured column list in order with NULL for absent keys. These
tests drive the whole path over stdlib http.server: transport,
envelope unwrapping, projection, and the error paths.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from datax_spark.sources.readers import (
    _json_loop,
    read_source,
    restful_fetch,
    restful_records,
)

ROWS = [
    {"id": 1, "name": "rh", "age": 20, "create_time": "2020-12-22 14:00:01"},
    {"id": 2, "name": "lf", "age": 31, "create_time": "2020-12-23 09:30:00"},
]


class _Handler(BaseHTTPRequestHandler):
    seen: list[dict] = []

    def _respond(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        u = urlparse(self.path)
        _Handler.seen.append(
            {
                "method": "GET",
                "path": u.path,
                "query": {k: v[0] for k, v in parse_qs(u.query).items()},
                "token": self.headers.get("token"),
            }
        )
        if u.path == "/list":
            self._respond(
                200,
                {
                    "code": 200,
                    "msg": "ok",
                    "data": {"totalCount": len(ROWS), "rows": ROWS},
                },
            )
        elif u.path == "/flat":
            self._respond(200, ROWS)  # top-level JSON array
        elif u.path == "/one":
            self._respond(200, ROWS[0])  # single object, no dataPath
        else:
            self._respond(404, {"msg": "not found"})

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        _Handler.seen.append({"method": "POST", "path": self.path, "body": body})
        self._respond(200, {"data": {"rows": [r for r in ROWS if r["age"] >= body.get("min_age", 0)]}})

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_get_with_query_header_and_datapath(spark, server):
    _Handler.seen.clear()
    df = read_source(
        spark,
        "restfulapireader",
        {
            "url": f"{server}/list",
            "method": "get",
            "dataPath": "data.rows",
            "column": ["id", "name", "age", "create_time"],
            "headerInfos": {"token": "123456"},
            "queryParam": {"id": 1, "name": "rh"},
        },
    )
    got = [r.asDict() for r in df.collect()]
    assert got == ROWS
    assert df.columns == ["id", "name", "age", "create_time"]
    req = _Handler.seen[0]
    assert req["query"] == {"id": "1", "name": "rh"}
    assert req["token"] == "123456"


def test_post_body_param(spark, server):
    _Handler.seen.clear()
    df = read_source(
        spark,
        "restfulapireader",
        {
            "url": f"{server}/post",
            "method": "post",
            "dataPath": "data.rows",
            "column": ["id", "name"],
            "bodyParam": {"min_age": 30},
        },
    )
    assert [r.asDict() for r in df.collect()] == [{"id": 2, "name": "lf"}]
    assert _Handler.seen[0]["body"] == {"min_age": 30}


def test_top_level_array_and_missing_column_null(spark, server):
    df = read_source(
        spark,
        "restfulapireader",
        {"url": f"{server}/flat", "column": ["id", "name", "missing"]},
    )
    rows = df.orderBy("id").collect()
    assert [r["missing"] for r in rows] == [None, None]
    assert [r["name"] for r in rows] == ["rh", "lf"]


def test_single_object_without_datapath(spark, server):
    df = read_source(
        spark,
        "restfulapireader",
        {"url": f"{server}/one", "column": ["id", "name"]},
    )
    assert [r.asDict() for r in df.collect()] == [{"id": 1, "name": "rh"}]


def test_http_error_raises(server):
    with pytest.raises(Exception):
        restful_fetch(f"{server}/nope")


def test_bad_method_rejected(server):
    with pytest.raises(ValueError, match="get/post"):
        restful_fetch(f"{server}/list", method="put")


def test_json_loop_last_match_wins_case_insensitive():
    doc = {"a": {"Rows": [{"x": 1}]}, "b": {"rows": [{"x": 2}]}}
    assert _json_loop(doc, "rows") == [{"x": 2}]
    assert restful_records(json.dumps(doc), "whatever.rows") == [{"x": 2}]


def test_datapath_missing_raises():
    with pytest.raises(ValueError, match="not found"):
        restful_records(json.dumps({"a": 1}), "data.rows")


# ---------------- restfulapiwriter ----------------

RECEIVED: list = []


class _SinkHandler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        RECEIVED.append(
            {
                "path": self.path,
                "token": self.headers.get("token"),
                "body": json.loads(self.rfile.read(n)),
            }
        )
        body = b'{"code":200}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        u = urlparse(self.path)
        RECEIVED.append(
            {"path": u.path, "query": {k: v[0] for k, v in parse_qs(u.query).items()}}
        )
        body = b'{"code":200}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def sink_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SinkHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_writer_bulk_post_batched(spark, sink_server):
    from datax_spark.sinks.writers import write_sink

    RECEIVED.clear()
    df = spark.range(100).selectExpr("id", "concat('n', id) as name").repartition(4)
    write_sink(
        df,
        "restfulapiwriter",
        {
            "url": f"{sink_server}/bulk",
            "method": "post",
            "column": ["id", "name"],
            "headerInfos": {"token": "t0"},
            "batchSize": 10,
        },
    )
    rows = [r for req in RECEIVED for r in req["body"]]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["name"] == f"n{r['id']}" for r in rows)
    assert all(len(req["body"]) <= 10 for req in RECEIVED)
    assert all(req["token"] == "t0" for req in RECEIVED)


def test_writer_get_with_column_substitution(spark, sink_server):
    from datax_spark.sinks.writers import write_sink

    RECEIVED.clear()
    df = spark.createDataFrame([(7, "x")], ["id", "name"])
    out = write_sink(
        df,
        "restfulapiwriter",
        {
            "url": f"{sink_server}/notify",
            "method": "get",
            "column": ["id", "name"],
            "queryParam": {"id": "$id", "static": "s"},
        },
    )
    assert out["requests"] == 1
    assert RECEIVED[0]["query"] == {"id": "7", "static": "s"}


def test_writer_post_refs_fold_into_body(spark, sink_server):
    from datax_spark.sinks.writers import write_sink

    RECEIVED.clear()
    df = spark.createDataFrame([(3, "y")], ["id", "name"])
    write_sink(
        df,
        "restfulapiwriter",
        {
            "url": f"{sink_server}/one",
            "method": "post",
            "column": ["id", "name"],
            "queryParam": {"the_id": "$id"},
            "bodyParam": {"fixed": 1},
        },
    )
    assert RECEIVED[0]["body"] == {"fixed": 1, "the_id": 3}
