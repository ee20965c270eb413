"""Subprocess worker for the scaling benchmark.

Modes:
  gen    <events_root> <n_events>            — write the change log (seed 42)
  replay <events_root> <work_root> <cpus>    — replay it on local[cpus]

Each invocation builds its own SparkSession so parallelism is a true
process-level setting (the sandbox analog of submitting to clusters of
N vs 4N executors with spark-submit --py-files; see BENCH/BASELINE.md).
Prints one JSON line with wall time and throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.session import get_spark  # noqa: E402


def spec_for(n_events: int):
    from datax_spark.fixtures.changelog import ChangelogSpec

    return ChangelogSpec(
        n_events=n_events,
        n_repos=500,
        paths_per_repo=400,
        events_per_epoch=max(250_000, n_events // 4),
        evolve_from_epoch=2,
        seed=42,
    )


def main() -> None:
    mode = sys.argv[1]
    if mode == "gen":
        events_root, n_events = sys.argv[2], int(sys.argv[3])
        from datax_spark.fixtures.changelog import write_events

        spark = get_spark("scaling-gen", cores=32)
        t0 = time.monotonic()
        write_events(spark, spec_for(n_events), events_root)
        print(json.dumps({"mode": "gen", "sec": round(time.monotonic() - t0, 2)}))
        return

    if mode == "replay":
        events_root, work_root, cpus = sys.argv[2], sys.argv[3], int(sys.argv[4])
        from datax_spark.engine.replay import ReplayConfig, ReplayEngine

        spark = get_spark(f"scaling-replay-{cpus}", cores=cpus)
        # fixed bucket/salt layout across runs: the LAYOUT must not vary
        # with cluster size (a real table's bucketing is fixed); only
        # execution parallelism changes.
        cfg = ReplayConfig(num_buckets=128)
        eng = ReplayEngine(
            spark,
            events_root=events_root,
            table_root=os.path.join(work_root, f"table_{cpus}"),
            metrics_root=os.path.join(work_root, f"metrics_{cpus}"),
            config=cfg,
        )
        # warm the JVM/codegen so the measurement excludes startup
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        n_events = spark.read.parquet(events_root).count()
        t0 = time.monotonic()
        results = eng.run()
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "mode": "replay",
                    "cpus": cpus,
                    "events": n_events,
                    "epochs": len(results),
                    "rows_after": results[-1].rows_after if results else 0,
                    "sec": round(wall, 2),
                    "events_per_sec": round(n_events / wall, 1),
                }
            )
        )
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
