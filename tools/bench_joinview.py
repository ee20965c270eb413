"""Scale probe for incremental join-view maintenance
(lake/joinview.py).

Replays an n-event changelog into a fact LakeTable, builds a per-repo
dimension table, materializes the fact ⋈ dim LEFT join view, then
times the three maintenance regimes:

1. STEPWISE — refresh once per fact epoch commit. Cost per refresh
   tracks the epoch's CHANGED KEYS (their post-images come straight
   off the bucket-pruned change feed; no fact scan), never the table.
2. FACT TAIL — a tiny 20-key fact update against the full-size table:
   the O(changed) claim is this staying flat as n grows.
3. DIM DELTA — update k dim rows: cost = one semi-join of the fact
   against the k changed dim keys (AQE broadcasts it) + rewrite of
   exactly the fact rows referencing them. The interesting number is
   its proportionality to |referencing rows|, not |table|.
4. RECOMPUTE — the naive alternative: the full two-table join (what a
   reader->writer re-extract costs every sync, the reference's only
   multi-table shape).

The view is digest-compared (count + sum of xxhash64 over every
column) against the from-scratch join before any number is reported.

Usage: python tools/bench_joinview.py [n_events] [epochs] [cpus]
                                      [buckets] [repos] [paths_per]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def digest(df):
    from pyspark.sql import functions as F

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(df.columns)
    ]
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: ANSI mode raises on long overflow
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).first()


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    n_repos = int(sys.argv[5]) if len(sys.argv) > 5 else 200
    paths_per_repo = int(sys.argv[6]) if len(sys.argv) > 6 else 2_000

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.joinview import JoinView, JoinViewSpec
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable
    from datax_spark.session import get_spark

    spark = get_spark("bench-joinview", cores=cpus)
    root = tempfile.mkdtemp(prefix="joinview_bench_")
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
    fact = LakeTable.load(spark, os.path.join(root, "table"))
    n_rows = fact.total_rows()

    dim_schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("owner", T.StringType()),
            T.StructField("tier", T.LongType()),
        ]
    )
    dim = LakeTable.create(
        spark, os.path.join(root, "dim"), dim_schema, key_cols=["repo"],
        num_buckets=4,
    )
    dim_rows = fact.read().select("repo").distinct().select(
        "repo",
        F.concat(F.lit("team-"), F.col("repo")).alias("owner"),
        (F.xxhash64("repo") % 5).alias("tier"),
        F.lit("U").alias("op"),
    )
    merge_into(dim, dim_rows).commit()

    view = JoinView.create(
        spark,
        os.path.join(root, "view"),
        fact,
        dim,
        JoinViewSpec(on=(("repo", "repo"),), how="left", right_prefix="d_"),
        num_buckets=buckets,
    )

    steps = []
    for ver in fact.versions():
        if ver == 0:
            continue
        t1 = time.monotonic()
        r = view.refresh(fact, dim, left_to=ver)
        steps.append(
            {
                "to_version": ver,
                "secs": round(time.monotonic() - t1, 2),
                "rows_upserted": r.rows_upserted,
                "rows_deleted": r.rows_deleted,
                "phase_ms": r.phase_ms,
            }
        )

    # fact tail: a tiny update batch against the full-size table
    tail = (
        fact.read()
        .select("repo", "path", "lang")
        .orderBy("repo", "path")
        .limit(20)
        .select(
            "repo", "path",
            F.lit("ztail_commit").alias("commit"),
            F.lit(10**9).cast("long").alias("lsn"),
            "lang",
            F.lit("tail-bump").alias("content"),
            F.lit("U").alias("op"),
        )
    )
    merge_into(fact, tail, op_col="op").commit()
    t2 = time.monotonic()
    rt = view.refresh(fact, dim)
    tail_s = round(time.monotonic() - t2, 2)

    # dim delta: update 3 dim rows -> only their referencing fact rows
    k_dim = 3
    upd_dim = (
        dim.read()
        .orderBy("repo")
        .limit(k_dim)
        .select(
            "repo", F.concat(F.col("owner"), F.lit("-x")).alias("owner"),
            (F.col("tier") + 100).alias("tier"), F.lit("U").alias("op"),
        )
    )
    merge_into(dim, upd_dim).commit()
    t3 = time.monotonic()
    rd = view.refresh(fact, dim)
    dim_s = round(time.monotonic() - t3, 2)

    # the naive alternative, timed warm: full join + digest
    t4 = time.monotonic()
    d = dim.read().select(
        F.col("repo").alias("__dr"),
        F.col("owner").alias("d_owner"),
        F.col("tier").alias("d_tier"),
    )
    view_cols = [f.name for f in view.table.manifest().schema.fields]
    fresh = (
        fact.read()
        .join(d, on=F.col("repo") == F.col("__dr"), how="left")
        .select(*view_cols)
    )
    want = digest(fresh)
    recompute_s = round(time.monotonic() - t4, 2)

    got = digest(view.read().select(*view_cols))
    assert (got["n"], got["h"]) == (want["n"], want["h"]), (
        f"view digest {tuple(got)} != recompute digest {tuple(want)}"
    )

    print(
        json.dumps(
            {
                "metric": "joinview_refresh",
                "n_events": n_events,
                "table_rows": n_rows,
                "n_dim": n_repos,
                "cpus": cpus,
                "buckets": buckets,
                "replay_secs": replay_s,
                "stepwise": steps,
                "fact_tail_refresh_secs": tail_s,
                "fact_tail_rows": rt.rows_upserted + rt.rows_deleted,
                "dim_delta_refresh_secs": dim_s,
                "dim_delta_rows": rd.rows_upserted + rd.rows_deleted,
                "dim_keys_changed": k_dim,
                "full_recompute_secs": recompute_s,
                "verified": True,
            }
        )
    )


if __name__ == "__main__":
    main()
