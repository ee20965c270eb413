"""Dump .explain('formatted') physical plans for the engine's core
operators into docs/PLANS.md, with the properties each plan must show
(pushed filters, pruned schemas, map-side partial aggregates,
whole-stage codegen spans, broadcast joins). Re-run after operator
changes; the assertions at the bottom fail if a plan regresses.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datax_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("dump-plans", cores=8)
    sections: list[tuple[str, str, str, list[str]]] = []

    # 1. LWW dedup: must be partial_max_by (map-side combine) -> exchange
    from datax_spark.operators.dedup import lww_dedup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    dd = lww_dedup(ev, keys=["user_id"], order_cols=["ts", "event_id"])
    sections.append((
        "LWW dedup (operators.dedup.lww_dedup)",
        "partial_max_by BEFORE the exchange: each map task reduces to <= "
        "|keys in partition| rows, so shuffle volume is bounded by distinct "
        "keys x map tasks, never by event count. Spark 4.1 plans "
        "max_by(struct, struct) as SortAggregate (MaxBy is a "
        "DeclarativeAggregate with a struct buffer, which HashAggregateExec "
        "cannot hold in its mutable UnsafeRow map; ObjectHashAggregateExec "
        "only serves TypedImperativeAggregates). Measured alternatives at "
        "4M events / 120k keys, warm, local[8]: max_by SortAggregate 0.61s; "
        "max(struct) 0.45s but loses the payload/order separation; "
        "HashAggregate max(lsn) + left-semi join back 1.42s (second shuffle "
        "of the full event stream costs more than the per-partition sort); "
        "string-packed max + join 2.26s. The partial sort is bounded by "
        "partition size and feeds a merge-exchange, so it scales with "
        "events/partition, not total events — the asserted property is the "
        "map-side partial, not the aggregate flavor.",
        plan_of(dd),
        ["partial_max_by", "hashpartitioning"],
    ))

    # 2. Filter + projection pushdown into the parquet scan
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_orderkey", "l_quantity")
    sections.append((
        "Scan pushdown (filter + column pruning)",
        "PushedFilters carries the shipdate predicate into the parquet "
        "reader; ReadSchema lists only the 3 referenced columns of 11.",
        plan_of(q),
        ["PushedFilters:", "l_shipdate"],
    ))

    # 3. Broadcast star join
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.sum("o_totalprice").alias("rev"))
    sections.append((
        "Broadcast join (dimension enrich)",
        "BroadcastHashJoin — the fact side never shuffles for the join; "
        "only the final aggregate exchanges on the group key.",
        plan_of(j),
        ["BroadcastHashJoin"],
    ))

    # 4. MinHash LSH signature stage: partial_min aggregates
    from datax_spark.functions.dedup_text import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cands = minhash_lsh_candidates(docs, "text", "doc_id")
    mh_plan = plan_of(cands)
    # the band self-join must read the PERSISTED signature frame on
    # BOTH sides (InMemoryTableScan x2 over one shared InMemoryRelation)
    # — the corpus is shingled+hashed exactly once; without the persist
    # the plan regresses to two complete scan→explode→min-agg subtrees
    import re as _re

    n_imts = len(_re.findall(r"InMemoryTableScan", mh_plan))
    sections.append((
        "MinHash LSH candidates (functions.dedup_text)",
        "The signature stage is partial_min over xxhash64 of the "
        "exploded shingle hashes — string-hashed once, map-side combined; "
        "band bucket join exchanges only on (band, bh). The signature "
        "frame is persisted (MEMORY_AND_DISK, one narrow row per doc) so "
        f"both sides of the self-join read the cache (InMemoryTableScan "
        f"counted: {n_imts}, asserted >= 2) and the corpus is scanned "
        "ONCE — previously the join recomputed the whole shingle+hash "
        "pipeline on each side.",
        mh_plan,
        ["partial_min", "explode(", "InMemoryTableScan"],
    ))
    if n_imts < 2:
        sections.append((
            "MINHASH cache-reuse REGRESSION",
            f"expected both self-join sides on InMemoryTableScan, found {n_imts}",
            mh_plan, ["__NEVER__"],
        ))

    # 5. Cosine top-k: TakeOrderedAndProject (per-partition top-k)
    from datax_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    tk = cosine_topk(emb, "embedding", "vec_id", [1.0] * 64, k=10)
    sections.append((
        "Cosine top-k (functions.similarity)",
        "TakeOrderedAndProject: each partition keeps its local top-10; "
        "the driver merges k x p rows — no global sort at any scale.",
        plan_of(tk),
        ["TakeOrderedAndProject"],
    ))

    # 6. Change data feed: one full-outer join on the keys, no
    # nested-loop/cartesian anywhere
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    import tempfile

    troot = tempfile.mkdtemp(prefix="dump_plans_cdf_")
    ct = LakeTable.create(
        spark, troot,
        schema=spark.createDataFrame([], "k string, v long").schema,
        key_cols=["k"], num_buckets=4,
    )
    for batch in ([("a", 1, "U")], [("a", 2, "U")]):
        merge_into(ct, spark.createDataFrame(batch, "k string, v long, op string")).commit()
    cdf = ct.changes(1, 2)
    sections.append((
        "Change data feed (lake.table.LakeTable.changes)",
        "Snapshot diff = ONE join on the key columns (full-outer via the "
        "sort-merge path; AQE may degenerate tiny sides); payload equality "
        "is a single xxhash64 per side computed before the join, so the "
        "exchange carries (keys, img struct, hash) and no nested-loop or "
        "cartesian product can appear at any size.",
        plan_of(cdf),
        ["FullOuter", "xxhash64", "!CartesianProduct", "!BroadcastNestedLoopJoin"],
    ))

    # 7. Storage-partitioned merge: exactly ONE Exchange (the epoch
    # batch, grouped by bucket); the current table side never appears
    # as a Spark scan at all — each bucket task reads its own files
    from datax_spark.lake.merge import spj_merge_frame
    from datax_spark.operators.schema_evolution import evolve_schema

    sroot = tempfile.mkdtemp(prefix="dump_plans_spj_")
    st = LakeTable.create(
        spark, sroot,
        schema=spark.createDataFrame([], "k string, v long").schema,
        key_cols=["k"], num_buckets=4,
    )
    merge_into(st, spark.createDataFrame([("a", 1, "U")], "k string, v long, op string")).commit()
    upd2 = spark.createDataFrame([("a", 2, "U"), ("b", 3, "U")], "k string, v long, op string")
    upd2 = upd2.withColumn("__b", st.bucket_expr())
    spj = spj_merge_frame(
        st, upd2, "op", "D", evolve_schema(st.manifest().schema, upd2.drop("op", "__b").schema),
        st.new_txn_dir(),
    )
    import re

    spj_plan = plan_of(spj)
    # formatted explain prints each node twice (tree + detail); count
    # the detail headers, one per physical Exchange
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", spj_plan))
    sections.append((
        "Storage-partitioned merge (lake.merge.spj_merge_frame)",
        "The CoW merge without the two table-sized exchanges: the only "
        f"Exchange in the plan (counted: {n_exchanges}, asserted == 1) is "
        "the epoch batch hashing to its buckets for FlatMapGroupsInPandas; "
        "the current snapshot is read executor-side by each bucket's task "
        "(Arrow scan of exactly its co-located files — the same guarantee "
        "Spark's storage-partitioned joins exploit on bucket tables), so "
        "no plan node scales with TABLE size, only with batch size. "
        "Measured vs the shuffle plan at 16M events / 128 buckets / "
        "local[32]: 323k ev/s vs 278k ev/s (1.16x), byte-identical final "
        "state (tools/scale_check.py ... spj).",
        spj_plan,
        ["FlatMapGroupsInPandas", "__b"],
    ))
    if n_exchanges != 1:
        sections.append((
            "SPJ exchange-count REGRESSION",
            f"expected exactly 1 Exchange, found {n_exchanges}",
            spj_plan, ["__NEVER__"],
        ))

    # 7b. EXCHANGE-ALIGNED fused epoch: dedup agg + merge in a plan
    # with exactly ONE Exchange total — the agg's shuffle, pinned to
    # num_buckets partitions on a murmur3-bucketed table, IS the
    # bucket routing; the merge is MapInPandas with no exchange of its
    # own (partition_id == pmod(murmur3(keys), nb) == bucket).
    from datax_spark.engine.replay import aligned_shuffle_confs
    from datax_spark.operators.dedup import lww_dedup_stats

    aroot = tempfile.mkdtemp(prefix="dump_plans_aligned_")
    at = LakeTable.create(
        spark, aroot,
        schema=spark.createDataFrame([], "k string, v long, c long").schema,
        key_cols=["k"], num_buckets=4, hash_fn="murmur3",
    )
    raw = spark.createDataFrame(
        [("a", 1, 1, "U"), ("a", 2, 2, "U"), ("b", 3, 1, "U")],
        "k string, v long, c long, op string",
    )
    with aligned_shuffle_confs(spark, 4):
        add = lww_dedup_stats(
            raw, keys=["k"], order_cols=["c"], lsn_col="c", content_col=None
        )
        add = add.withColumn("__b", at.bucket_expr())
        from datax_spark.operators.dedup import STAT_COLS as _SC

        al = spj_merge_frame(
            at, add, "op", "D",
            evolve_schema(at.manifest().schema, add.drop("op", "__b", *_SC).schema),
            at.new_txn_dir(), stat_cols=_SC, aligned=True,
        )
        al_plan = plan_of(al)
    n_al_exchanges = len(re.findall(r"\(\d+\) Exchange", al_plan))
    sections.append((
        "Exchange-aligned fused epoch (hash_fn=murmur3, aligned=True)",
        "The WHOLE epoch — LWW dedup with fused lineage stats AND the "
        f"per-bucket merge — in ONE exchange (counted: {n_al_exchanges}, "
        "asserted == 1): the dedup aggregation's own shuffle, pinned to "
        "num_buckets partitions with AQE coalescing off, lands every key "
        "in the partition that IS its murmur3 bucket, so the merge runs "
        "as MapInPandas straight over the agg output. The map-side "
        "partial (partial_max_by) is preserved below the exchange. Vs "
        "the two-exchange fused plan this deletes a full exchange of "
        "the deduped epoch batch; interleaved best-of A/B at 8M events "
        "/ 128 buckets / local[32] with pure-CPU controls: aligned "
        "376-716k ev/s vs two-exchange 300-528k ev/s across two noise "
        "windows (tools/scale_check.py ... murmur3|xxhash64), "
        "sha256-frame-equal either way.",
        al_plan,
        ["MapInPandas", "partial_max_by", "!FlatMapGroupsInPandas"],
    ))
    if n_al_exchanges != 1:
        sections.append((
            "ALIGNED exchange-count REGRESSION",
            f"expected exactly 1 Exchange, found {n_al_exchanges}",
            al_plan, ["__NEVER__"],
        ))

    # 8. Exact dedup: the shuffle key must be the 32-byte sha2, never
    # the raw document text
    from datax_spark.functions.dedup_text import exact_dedup

    docs2 = spark.read.parquet(f"{SF}/documents.parquet")
    ed = exact_dedup(docs2, "text", "doc_id")
    sections.append((
        "Exact dedup (functions.dedup_text.exact_dedup)",
        "The aggregation (and therefore the exchange) keys on "
        "sha2(text, 256) — 32 bytes/row through the shuffle regardless "
        "of document length; the raw text column is pruned before the "
        "exchange (ReadSchema keeps it only to feed the hash).",
        plan_of(ed),
        ["sha2(cast(text", "hashpartitioning(_groupingexpression"],
    ))

    # 9. Matview signed-delta aggregate: one hash agg over the change
    # feed with a map-side partial — the exchange carries groups, not
    # feed rows
    from datax_spark.lake.matview import AggViewSpec, signed_delta

    ev9 = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "_change_type",
        F.when(F.col("event_id") % 2 == 0, F.lit("insert")).otherwise(
            F.lit("delete")
        ),
    )
    sd = signed_delta(
        ev9,
        AggViewSpec(
            group_cols=("user_id",),
            sum_cols=("value",),
            min_cols=("ts",),
            max_cols=("ts",),
        ),
    )
    sections.append((
        "Matview signed-delta aggregate (lake.matview.signed_delta)",
        "Incremental view maintenance is ONE decomposable hash aggregate "
        "over the preimage change feed: partial_sum/partial_min/partial_max "
        "run map-side, so the exchange carries at most |groups touched per "
        "map task| rows — the refresh shuffles groups, never the feed. The "
        "downstream dirty-group recompute (min/max retraction) is a "
        "left-semi join on the dirty-group keys — AQE broadcasts the key "
        "set while it is small, shuffle semi-join when a churn-heavy "
        "window dirties millions of groups.",
        plan_of(sd),
        ["partial_sum", "partial_min", "partial_max", "hashpartitioning"],
    ))

    # 10. As-of join: union+window — ONE exchange on the key, a sort,
    # a Window; never the BroadcastNestedLoopJoin a naive non-equi
    # range join plans into
    from datax_spark.operators.asof import asof_join

    ev10 = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev10.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").cast("long").alias("t"),
    )
    purch = ev10.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("t"),
        F.col("value").alias("pv"),
    )
    aj = asof_join(clicks, purch, on=["user_id"], left_ts="t")
    aj_plan = plan_of(aj)
    n_aj_exchanges = len(re.findall(r"\(\d+\) Exchange", aj_plan))
    sections.append((
        "As-of join (operators.asof.asof_join)",
        "The union+window formulation: both sides scan, union, ONE "
        "exchange on the key columns, one in-partition sort, a Window "
        "running last(payload, ignorenulls) — linear in |left|+|right| "
        "per key and whole-stage-codegen'd around the window. The naive "
        "range-join expression (equi key + non-equi ts residual) plans "
        "as BroadcastNestedLoopJoin, quadratic per key group; it must "
        "never appear.",
        aj_plan,
        ["Window", "!BroadcastNestedLoop", "!CartesianProduct"],
    ))
    if n_aj_exchanges != 1:
        sections.append((
            "ASOF exchange-count REGRESSION",
            f"expected exactly 1 Exchange, found "
            f"{n_aj_exchanges}",
            aj_plan, ["__NEVER__"],
        ))

    out = ["# Physical plans of the core operators\n",
           "Generated by `python tools/dump_plans.py` — the quoted plan\n"
           "properties are asserted, so regressions fail the script.\n"]
    failures = []
    for title, why, plan, needles in sections:
        out.append(f"\n## {title}\n\n{why}\n\n```\n{plan}```\n")
        for n in needles:
            if n.startswith("!"):  # negative assertion: must NOT appear
                if n[1:] in plan:
                    failures.append(f"{title}: forbidden '{n[1:]}' present")
            elif n not in plan:
                failures.append(f"{title}: missing '{n}'")

    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")
    with open(path, "w") as fh:
        fh.write("".join(out))
    print(f"wrote {path}")
    if failures:
        for f in failures:
            print("PLAN REGRESSION:", f)
        raise SystemExit(1)
    print("all plan assertions hold")


if __name__ == "__main__":
    main()
