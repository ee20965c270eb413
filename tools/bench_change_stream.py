"""Scale probe for the lake_changes streaming source.

Replays an n-event changelog into a LakeTable (the standard fixture +
engine), then measures the streaming change feed two ways:

1. FULL DRAIN — stream from startingVersion=1 (initial-snapshot replay
   as inserts + every epoch's diff) through an availableNow pass into
   a noop sink: change-rows/sec for the whole history.
2. TAIL — commit a tiny k-key update and drain again from the same
   checkpoint: wall + rows for one small commit. The O(commit)
   property of the source is this number staying flat as n grows
   (manifest-pruned buckets: the tail pass reads the touched buckets,
   not the table).

Each pass cross-checks row counts against the batch change feed
(LakeTable.changes) per commit, so the throughput numbers are for a
VERIFIED feed.

Usage: python tools/bench_change_stream.py [n_events] [epochs] [cpus] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _drain(stream_df, ckpt, name):
    q = (
        stream_df.writeStream.format("noop")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sum(int(p["numInputRows"]) for p in (q.recentProgress or []))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from pyspark.sql import functions as F

    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.table import LakeTable
    from datax_spark.session import get_spark
    from datax_spark.streaming.change_source import stream_changes

    spark = get_spark("bench-change-stream", cores=cpus)
    spec = ChangelogSpec(
        n_events=n_events,
        n_repos=max(200, n_events // 20_000),
        paths_per_repo=400,
        events_per_epoch=-(-n_events // n_epochs),
        evolve_from_epoch=max(1, n_epochs - 2),
        seed=42,
    )
    root = tempfile.mkdtemp(prefix="datax_spark_cdfstream_")
    out = {"n_events": n_events, "epochs": n_epochs, "cpus": cpus, "buckets": buckets}
    write_events(spark, spec, os.path.join(root, "events"))
    eng = ReplayEngine(
        spark,
        events_root=os.path.join(root, "events"),
        table_root=os.path.join(root, "table"),
        metrics_root=os.path.join(root, "metrics"),
        config=ReplayConfig(num_buckets=buckets),
    )
    eng.run()
    t = eng.table()
    head = t.current_version()

    # expected per-commit row counts from the batch feed
    expected = {
        v: t.changes(v - 1, v).count() for v in range(1, head + 1)
    }

    cdf = stream_changes(spark, t.root, starting_version=1)
    ck = os.path.join(root, "ck")
    t0 = time.monotonic()
    rows_full = _drain(cdf, ck, "cdf_full")
    full_sec = time.monotonic() - t0
    exp_full = sum(expected.values())
    out["full_rows"] = rows_full
    out["full_rows_expected"] = exp_full
    out["full_sec"] = round(full_sec, 3)
    out["full_rows_per_sec"] = round(rows_full / full_sec, 1)

    # tail: one small commit, same checkpoint
    k = 20
    sample = [
        (r.repo, r.path)
        for r in t.read().select("repo", "path").orderBy("repo", "path").limit(k).collect()
    ]
    upd = (
        t.lookup(sample)
        .withColumn("content", F.concat(F.col("content"), F.lit("-touch")))
        .withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
        .withColumn("__op", F.lit("U"))
    )
    from datax_spark.lake.merge import merge_into

    merge_into(t, upd, op_col="__op").commit()
    t1 = time.monotonic()
    rows_tail = _drain(cdf, ck, "cdf_tail")
    tail_sec = time.monotonic() - t1
    out["tail_rows"] = rows_tail
    out["tail_rows_expected"] = t.changes(head, head + 1).count()
    out["tail_sec"] = round(tail_sec, 3)

    out["verified"] = (
        rows_full == exp_full and rows_tail == out["tail_rows_expected"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
