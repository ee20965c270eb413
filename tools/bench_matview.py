"""Scale probe for incremental aggregate-view maintenance
(lake/matview.py).

Replays an n-event changelog into a LakeTable (the standard fixture +
engine), then maintains a (repo, lang) count/sum/min/max view of it
three ways and times each:

1. STEPWISE — refresh once per source epoch commit (the deployment
   shape: sync after every ingest epoch). Cost per refresh should
   track the epoch's CHANGED GROUPS, not the table.
2. TAIL — commit a tiny k-key update to the big table and refresh
   again: the O(changed) claim is this number staying flat as n
   grows (the feed is manifest-bucket-pruned; the view join touches
   only the buckets those groups live in).
3. RECOMPUTE — the naive alternative: a from-scratch GROUP BY over
   the whole table (what a reader->writer re-extract costs every
   sync, which is the reference's only derived-table shape).

The final view state is frame-compared against the recompute before
any number is reported — these are throughputs of a VERIFIED view.

Usage: python tools/bench_matview.py [n_events] [epochs] [cpus] [buckets]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    n_repos = int(sys.argv[5]) if len(sys.argv) > 5 else 200
    paths_per_repo = int(sys.argv[6]) if len(sys.argv) > 6 else 2_000
    # "nomin": drop min(lsn) from the view — min over a monotone
    # version column is the intrinsically recompute-heavy aggregate
    # (most groups' oldest survivor advances every epoch); without it
    # the refresh is pure signed-delta arithmetic (max never dirties
    # on a monotone feed under the dominance rule)
    nomin = len(sys.argv) > 7 and sys.argv[7] == "nomin"

    import pandas as pd
    from pyspark.sql import functions as F

    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.matview import AggView, AggViewSpec
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable
    from datax_spark.session import get_spark

    spark = get_spark("bench-matview", cores=cpus)
    root = tempfile.mkdtemp(prefix="matview_bench_")
    spec = ChangelogSpec(
        n_events=n_events,
        events_per_epoch=n_events // n_epochs,
        n_repos=n_repos,
        paths_per_repo=paths_per_repo,
        evolve_from_epoch=None,
        seed=7,
    )
    write_events(spark, spec, os.path.join(root, "events"))
    eng = ReplayEngine(
        spark,
        events_root=os.path.join(root, "events"),
        table_root=os.path.join(root, "table"),
        metrics_root=os.path.join(root, "metrics"),
        config=ReplayConfig(num_buckets=buckets),
    )
    t0 = time.monotonic()
    eng.run()
    replay_s = round(time.monotonic() - t0, 2)
    table = LakeTable.load(spark, os.path.join(root, "table"))
    n_rows = table.total_rows()

    view = AggView.create(
        spark,
        os.path.join(root, "view"),
        table,
        AggViewSpec(
            group_cols=("repo", "lang"),
            sum_cols=("lsn",),
            min_cols=() if nomin else ("lsn",),
            max_cols=("lsn",),
            group_fill=(("lang", "__null__"),),
        ),
        num_buckets=16,
    )

    steps = []
    for ver in table.versions():
        if ver == 0:
            continue
        t1 = time.monotonic()
        r = view.refresh(table, to_version=ver)
        steps.append(
            {
                "to_version": ver,
                "secs": round(time.monotonic() - t1, 2),
                "groups_changed": r.groups_changed,
                "groups_recomputed": r.groups_recomputed,
                "phase_ms": r.phase_ms,
            }
        )

    # tail: a tiny update batch against the full-size table
    tail_keys = (
        table.read()
        .select("repo", "path", "lang")
        .orderBy("repo", "path")
        .limit(20)
    )
    upd = tail_keys.select(
        "repo",
        "path",
        F.lit("ztail_commit").alias("commit"),
        F.lit(10**9).cast("long").alias("lsn"),
        "lang",
        F.lit("tail-bump").alias("content"),
        F.lit("U").alias("op"),
    )
    merge_into(table, upd, op_col="op").commit()
    t2 = time.monotonic()
    rt = view.refresh(table)
    tail_s = round(time.monotonic() - t2, 2)

    # the naive alternative, timed on the same warm session
    t3 = time.monotonic()
    r_aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("lsn").alias("sum_lsn"),
        F.max("lsn").alias("max_lsn"),
    ]
    cols = ["repo", "lang", "n_rows", "sum_lsn", "max_lsn"]
    if not nomin:
        r_aggs.insert(2, F.min("lsn").alias("min_lsn"))
        cols.insert(4, "min_lsn")
    recompute = view.spec.fill(table.read()).groupBy("repo", "lang").agg(*r_aggs)
    want = recompute.toPandas()
    recompute_s = round(time.monotonic() - t3, 2)

    got = view.read().toPandas()
    got = got[cols].sort_values(["repo", "lang"]).reset_index(drop=True)
    want = want[cols].sort_values(["repo", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    print(
        json.dumps(
            {
                "metric": "matview_refresh",
                "aggs": "count,sum,max" + ("" if nomin else ",min"),
                "n_events": n_events,
                "table_rows": n_rows,
                "n_groups": len(got),
                "cpus": cpus,
                "buckets": buckets,
                "replay_secs": replay_s,
                "stepwise": steps,
                "tail_refresh_secs": tail_s,
                "tail_groups_changed": rt.groups_changed,
                "full_recompute_secs": recompute_s,
                "verified": True,
            }
        )
    )


if __name__ == "__main__":
    main()
