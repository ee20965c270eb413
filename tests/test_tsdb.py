"""tsdbreader / tsdbwriter against an in-process fake TSDB.

The fake speaks the two OpenTSDB-compatible endpoints the plugins use
(``/api/put`` ingest, ``/api/query`` with aggregator=none + literal_or
tag filters), so the whole distributed path runs for real: the writer
batches datapoints from each partition, the reader fans (metric ×
time-slice) queries across executors via mapInPandas, and a
write→read round-trip must reproduce the frame.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.tsdb import time_slices, tsdb_read, tsdb_write
from datax_spark.sources.readers import read_source
from datax_spark.sinks.writers import write_sink


class FakeTSDB:
    def __init__(self):
        self.dps: list[dict] = []  # {metric, timestamp, value, tags}
        self.puts = 0

    def query(self, body: dict) -> list[dict]:
        start, end = body["start"], body["end"]
        out = []
        for q in body["queries"]:
            filters = {
                f["tagk"]: f["filter"] for f in q.get("filters", [])
            }
            series: dict[str, dict] = {}
            for dp in self.dps:
                if dp["metric"] != q["metric"]:
                    continue
                if not (start <= dp["timestamp"] <= end):
                    continue
                if any(dp["tags"].get(k) != v for k, v in filters.items()):
                    continue
                key = json.dumps(dp["tags"], sort_keys=True)
                s = series.setdefault(
                    key, {"metric": dp["metric"], "tags": dp["tags"], "dps": {}}
                )
                s["dps"][str(dp["timestamp"])] = dp["value"]
            out.extend(series.values())
        return out


TSDB = FakeTSDB()


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers.get("Content-Length", 0))))
        if self.path.rstrip("/").endswith("/api/put"):
            TSDB.dps.extend(body)
            TSDB.puts += 1
            payload = b'{"success": true}'
        elif self.path.rstrip("/").endswith("/api/query"):
            payload = json.dumps(TSDB.query(body)).encode()
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def tsdb():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


BEGIN_MS = 1_700_000_000_000  # inside the configured window below
BEGIN_STR = "2023-11-14 22:13:20"
END_STR = "2023-11-14 23:13:20"


def test_time_slices_cover_range_half_open():
    sl = time_slices(0, 10_000, 3_000)
    assert sl == [(0, 2999), (3000, 5999), (6000, 8999), (9000, 9999)]
    with pytest.raises(ValueError):
        time_slices(10, 10, 1000)


def test_write_then_read_round_trip(spark, tsdb):
    TSDB.dps.clear(); TSDB.puts = 0
    rows = [
        ("cpu", BEGIN_MS + i * 60_000, float(i), json.dumps({"host": f"h{i % 2}"}))
        for i in range(20)
    ] + [("mem", BEGIN_MS + 5_000, 42.0, json.dumps({"host": "h0"}))]
    df = spark.createDataFrame(rows, "metric string, ts long, value double, tags string")
    write_sink(
        df.repartition(4), "tsdbwriter",
        {"endpoint": tsdb, "batchSize": 7},
    )
    assert len(TSDB.dps) == 21
    assert TSDB.puts >= 4  # batched per partition

    got = read_source(
        spark, "tsdbreader",
        {
            "endpoint": tsdb,
            "metric": ["cpu", "mem"],
            "beginDateTime": BEGIN_STR,
            "endDateTime": END_STR,
            "splitIntervalMs": 10 * 60_000,  # 6 slices per metric
        },
    )
    back = sorted(
        (r["metric"], r["ts"], r["value"], r["tags"]) for r in got.collect()
    )
    assert back == sorted(rows)


def test_tag_filter(spark, tsdb):
    TSDB.dps.clear()
    rows = [
        ("cpu", BEGIN_MS, 1.0, json.dumps({"host": "h0"})),
        ("cpu", BEGIN_MS + 1000, 2.0, json.dumps({"host": "h1"})),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double, tags string")
    tsdb_write(df, {"endpoint": tsdb})
    got = tsdb_read(
        spark,
        {
            "endpoint": tsdb,
            "metric": "cpu",
            "beginDateTime": BEGIN_STR,
            "endDateTime": END_STR,
            "tag": {"host": "h1"},
        },
    ).collect()
    assert [(r["value"], json.loads(r["tags"])) for r in got] == [(2.0, {"host": "h1"})]


def test_map_tags_column(spark, tsdb):
    TSDB.dps.clear()
    df = spark.sql(
        f"select 'disk' metric, {BEGIN_MS}L ts, 3.5 value, map('dc','eu') tags"
    )
    tsdb_write(df, {"endpoint": tsdb})
    assert TSDB.dps == [
        {"metric": "disk", "timestamp": BEGIN_MS, "value": 3.5, "tags": {"dc": "eu"}}
    ]


def test_invalid_interval_rejected(spark, tsdb):
    with pytest.raises(ValueError, match="splitIntervalMs"):
        tsdb_read(
            spark,
            {
                "endpoint": tsdb,
                "metric": "cpu",
                "beginDateTime": BEGIN_STR,
                "endDateTime": END_STR,
                "splitIntervalMs": 0,
            },
        )
