"""A/B the as-of join's union+window plan against the naive range-join
formulation (equi key + non-equi ts residual + per-row argmax), digest-
verified equal before any number is reported.

The naive plan is what you get writing the query directly in SQL: a
join whose per-key cost is |left_k| x |right_k| pairs — quadratic in
key density — followed by a max_by regroup. The union+window plan is
one exchange + one sort, linear per key. The gap widens with rows per
key; the K dial below sets it.

Usage: python tools/bench_asof.py [n_left] [n_right] [n_keys] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from pyspark.sql import functions as F

    from datax_spark.operators.asof import asof_join
    from datax_spark.session import get_spark

    spark = get_spark("bench-asof", cores=cpus)

    def synth(n, tag):
        # deterministic pseudo-random ts per row; ts made unique per
        # (key, ts) by construction (id-derived) — the asof contract
        return (
            spark.range(n)
            .select(
                (F.col("id") % n_keys).alias("k"),
                (F.xxhash64(F.col("id"), F.lit(tag)) % (10**9)).alias("ts"),
                F.col("id").alias(f"{tag}_id"),
            )
        )

    left = synth(n_left, "l").persist()
    right = (
        synth(n_right, "r")
        .dropDuplicates(["k", "ts"])  # contract: unique per (key, ts)
        .persist()
    )
    left.count(), right.count()

    def digest(df):
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in sorted(df.columns)
        ]
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")),
            ).first()
        )

    # union+window (best of 2: second run is steady-state)
    win_secs = []
    for _ in range(2):
        t0 = time.monotonic()
        aj = asof_join(left, right, on=["k"], left_ts="ts")
        d_win = digest(aj)
        win_secs.append(round(time.monotonic() - t0, 2))

    # naive: non-equi join + per-left-row argmax regroup
    naive_secs = []
    for _ in range(2):
        t1 = time.monotonic()
        r2 = right.select(
            F.col("k").alias("rk"), F.col("ts").alias("rts"), "r_id"
        )
        j = left.join(
            r2, on=(F.col("k") == F.col("rk")) & (F.col("rts") <= F.col("ts")),
            how="left",
        )
        best = j.groupBy("k", "ts", "l_id").agg(
            F.max_by("r_id", "rts").alias("r_id")
        )
        d_naive = digest(best.select("k", "ts", "l_id", "r_id"))
        naive_secs.append(round(time.monotonic() - t1, 2))

    assert d_win == d_naive, f"digest mismatch: {d_win} vs {d_naive}"

    print(
        json.dumps(
            {
                "metric": "asof_union_window_vs_range_join",
                "n_left": n_left,
                "n_right": n_right,
                "n_keys": n_keys,
                "rows_per_key": n_left // n_keys,
                "cpus": cpus,
                "union_window_secs": min(win_secs),
                "naive_range_join_secs": min(naive_secs),
                "speedup": round(min(naive_secs) / min(win_secs), 2),
                "trials": {"window": win_secs, "naive": naive_secs},
                "verified": True,
            }
        )
    )


if __name__ == "__main__":
    main()
