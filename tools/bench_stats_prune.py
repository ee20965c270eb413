"""Measure manifest-stats file skipping on a large sorted table.

Builds a LakeTable of N rows (default 16M) keyed by id with per-file
stats on ``lsn``, sort-order-compacted into ~``target_file_rows`` files
(disjoint lsn ranges per file within each bucket), then times a 1%
lsn-range aggregation three ways:

* full  — read() + post-filter (no stats consulted; the parquet scan
          still gets Catalyst row-group pushdown)
* stats — read(filters=...) with manifest file skipping
* plan  — plan_files() alone (scan planning is driver-side metadata)

Reports per-trial wall times (best-of-3, interleaved) plus the
kept/skipped file counts, and appends a row to BENCH/stats_prune.json.

Usage: python tools/bench_stats_prune.py [n_rows] [num_buckets] [file_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datax_spark.lake.merge import merge_into  # noqa: E402
from datax_spark.lake.table import LakeTable  # noqa: E402
from datax_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    num_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    file_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 125_000
    root = "/tmp/datax_spark_stats_prune/table"
    shutil.rmtree("/tmp/datax_spark_stats_prune", ignore_errors=True)

    spark = get_spark("bench-stats-prune")
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("k"),
            F.lit("U").alias("op"),
            F.col("id").alias("lsn"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
    )
    t = LakeTable.create(
        spark, root,
        schema=df.drop("op").schema,
        key_cols=["k"], num_buckets=num_buckets, stats_cols=["lsn"],
    )
    t0 = time.monotonic()
    merge_into(t, df, strategy="spj").commit()
    t.compact(target_file_rows=file_rows, sort_cols=["lsn"])
    build_s = time.monotonic() - t0
    m = t.manifest()
    n_files = sum(len(fs) for fs in m.files.values())

    lo, hi = int(n_rows * 0.495), int(n_rows * 0.505)  # 1% of the key space
    flt = [("lsn", ">=", lo), ("lsn", "<", hi)]
    kept, skipped = t.plan_files(flt)

    def run_full() -> tuple[float, int]:
        s = time.monotonic()
        n = t.read().filter((F.col("lsn") >= lo) & (F.col("lsn") < hi)).count()
        return time.monotonic() - s, n

    def run_stats() -> tuple[float, int]:
        s = time.monotonic()
        n = t.read(filters=flt).count()
        return time.monotonic() - s, n

    full_t, stats_t = [], []
    n_full = n_stats = -1
    run_stats()  # warm both code paths once before timing
    run_full()
    for _ in range(3):  # interleaved trials: host noise hits both arms
        dt, n_full = run_full()
        full_t.append(round(dt, 3))
        dt, n_stats = run_stats()
        stats_t.append(round(dt, 3))
    s = time.monotonic()
    t.plan_files(flt)
    plan_ms = (time.monotonic() - s) * 1000
    assert n_full == n_stats == hi - lo, (n_full, n_stats, hi - lo)

    out = {
        "n_rows": n_rows,
        "num_buckets": num_buckets,
        "target_file_rows": file_rows,
        "n_files": n_files,
        "files_kept": len(kept),
        "files_skipped": len(skipped),
        "range_rows": hi - lo,
        "build_s": round(build_s, 1),
        "full_read_s": full_t,
        "stats_read_s": stats_t,
        "speedup_best": round(min(full_t) / min(stats_t), 2),
        "plan_ms": round(plan_ms, 1),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/stats_prune.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    shutil.rmtree("/tmp/datax_spark_stats_prune", ignore_errors=True)


if __name__ == "__main__":
    main()
