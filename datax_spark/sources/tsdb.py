"""TSDB reader / writer over the OpenTSDB-compatible HTTP API.

Reference parity (tsdbreader/.../TSDBReader.java, TSDBDump.java;
tsdbwriter/.../TSDBUtils.java):

* **read**: the job splits into (metric × time-interval) slices —
  ``splitIntervalMs`` wide, interval ``[start, end)``
  (TSDBReader.Job.split:163-270) — and each slice POSTs
  ``/api/query`` with ``{"start", "end", "queries": [{"aggregator":
  "none", "metric", "filters": [literal_or per tag]}]}``
  (TSDBDump.queryRange4SingleField:200-216). The response is the
  OpenTSDB shape ``[{"metric", "tags", "dps": {ts: value}}]``;
  each datapoint becomes a row ``(metric, ts, value, tags_json)``.

  Spark-first scale shape: the reference fans slices across a fixed
  channel count; here the slice table itself is a DataFrame and the
  HTTP fetches run inside ``mapInPandas`` — parallelism = executor
  cores, and a 10x wider time range just means 10x more slices across
  the same cluster. Basic auth rides as a header when
  username/password are set (HttpUtils.post parity).

* **write**: rows batch into ``/api/put`` JSON arrays
  (``[{"metric", "timestamp", "value", "tags"}]``,
  TSDBUtils.put:60-80, default batchSize 100) from each partition in
  parallel. At-least-once under task retry; TSDB puts are idempotent
  per (metric, tags, timestamp).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_FMT = "%Y-%m-%d %H:%M:%S"  # Constant.DEFAULT_DATA_FORMAT
DEFAULT_SPLIT_MS = 60 * 60 * 1000  # hour slices, as OpenTSDBReader splits


def _parse_ms(s) -> int:
    if isinstance(s, (int, float)):
        ms = int(s)
        return ms * 1000 if ms < 10_000_000_000 else ms  # TimeUtils.isSecond
    return int(
        datetime.strptime(s, DATE_FMT).replace(tzinfo=timezone.utc).timestamp() * 1000
    )


def _auth_header(p: dict) -> dict:
    if p.get("username"):
        import base64

        tok = base64.b64encode(
            f"{p['username']}:{p.get('password', '')}".encode()
        ).decode()
        return {"Authorization": f"Basic {tok}"}
    return {}


def _post(url: str, payload, headers: dict, timeout: float = 60.0):
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        if not (200 <= resp.status < 300):
            raise IOError(f"TSDB call failed: HTTP {resp.status}")
        return json.loads(body) if body else None


def time_slices(begin_ms: int, end_ms: int, interval_ms: int) -> list[tuple[int, int]]:
    """[start, end) slices, interval-aligned walk like the reference's
    plusMillis loop (end-1 because the TSDB end bound is inclusive)."""
    if begin_ms >= end_ms:
        raise ValueError("beginDateTime must be before endDateTime")
    if interval_ms <= 0:
        raise ValueError("splitIntervalMs must be > 0")
    out = []
    t = begin_ms
    while t < end_ms:
        nxt = min(t + interval_ms, end_ms)
        out.append((t, nxt - 1))
        t = nxt
    return out


def tsdb_read(spark: SparkSession, p: dict) -> DataFrame:
    """Distributed /api/query scan; returns
    (metric string, ts long, value double, tags string[json])."""
    endpoint = p["endpoint"].rstrip("/")
    metrics = p.get("metric") or p.get("column")
    metrics = [metrics] if isinstance(metrics, str) else list(metrics)
    begin = _parse_ms(p["beginDateTime"])
    end = _parse_ms(p["endDateTime"])
    interval = int(p.get("splitIntervalMs", DEFAULT_SPLIT_MS))
    tags = p.get("tag") or p.get("tags") or {}
    headers = _auth_header(p)

    slices = [
        (m, s, e) for m in metrics for (s, e) in time_slices(begin, end, interval)
    ]
    sl = spark.createDataFrame(slices, "metric string, start long, end long")
    n_parts = min(len(slices), spark.sparkContext.defaultParallelism * 2) or 1
    sl = sl.repartition(n_parts)

    def fetch(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for metric, s, e in pdf.itertuples(index=False):
                q = {"aggregator": "none", "metric": metric}
                if tags:
                    q["filters"] = [
                        {
                            "type": "literal_or",
                            "tagk": k,
                            "filter": str(v),
                            "groupBy": False,
                        }
                        for k, v in tags.items()
                    ]
                body = {"start": int(s), "end": int(e), "queries": [q]}
                res = _post(f"{endpoint}/api/query", body, headers) or []
                for series in res:
                    tg = json.dumps(series.get("tags") or {}, sort_keys=True)
                    for ts, val in (series.get("dps") or {}).items():
                        rows.append((series["metric"], int(ts), float(val), tg))
            yield pd.DataFrame(
                rows, columns=["metric", "ts", "value", "tags"]
            )

    schema = "metric string, ts long, value double, tags string"
    return sl.mapInPandas(fetch, schema=schema)


def tsdb_write(df: DataFrame, p: dict) -> dict:
    """Distributed /api/put sink. Expects columns (metric, ts|timestamp,
    value, tags[json string or map]); batches of batchSize per request."""
    endpoint = p["endpoint"].rstrip("/")
    batch = int(p.get("batchSize", 100))
    headers = _auth_header(p)
    cols = {c.lower(): c for c in df.columns}
    ts_col = cols.get("ts") or cols.get("timestamp")
    tags_col = cols.get("tags")
    sel = [
        F.col(cols["metric"]).alias("metric"),
        F.col(ts_col).cast("long").alias("timestamp"),
        F.col(cols["value"]).cast("double").alias("value"),
    ]
    if tags_col is not None:
        c = F.col(tags_col)
        if dict(df.dtypes)[tags_col].startswith("map"):
            c = F.to_json(c)
        sel.append(c.alias("tags"))
    out = df.select(*sel)

    def send(rows) -> None:
        buf = []

        def flush():
            if buf:
                _post(f"{endpoint}/api/put", buf, headers)
                buf.clear()

        for r in rows:
            dp = {
                "metric": r["metric"],
                "timestamp": r["timestamp"],
                "value": r["value"],
                "tags": json.loads(r["tags"]) if "tags" in r and r["tags"] else {},
            }
            buf.append(dp)
            if len(buf) >= batch:
                flush()
        flush()

    out.foreachPartition(send)
    return {"endpoint": endpoint, "batch_size": batch}
