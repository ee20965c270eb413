"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Coverage map (SURVEY.md §2 -> query names). Every query is
oracle-checked (round 2 eliminated all rows-only entries):

* CDC / LWW replay core ............ cdc_lww_latest_state, cdc_replay_state,
                                     cdc_replay_repo_table (engine replay vs
                                     pure-SQL LWW of the raw log + sha256),
                                     cdc_lineage_metrics (engine lineage vs
                                     recount of the raw log),
                                     cdc_change_feed (snapshot-diff CDF vs
                                     log-derived diff),
                                     cdc_change_feed_stream (the feed as a
                                     Structured Streaming source vs per-epoch
                                     log-derived diffs),
                                     cdc_time_travel (read-at-version vs
                                     log replay truncated at that epoch)
* dx_* transformer parity (§2.4) ... dx_substr_pad_replace, dx_filter_null_rules,
                                     dx_json_extract, dx_encryption_roundtrip
* split / framework ops (§2.1/2.3).. range_split_scan, string_pk_split
                                     (ASCII-radix-128 bignum ranges),
                                     quantile_split_scan (equal-height
                                     sampled-distribution split),
                                     hot_key_salted_agg, dirty_data_split,
                                     speed_metrics
* schema evolution (§2.5) .......... schema_evolution_union
* internal SQL ops (§2.5) .......... tpch_q1, region_revenue, window_topk_orders,
                                     event_sessionization, event_lag_delta,
                                     orders_rollup, orders_cube,
                                     price_percentiles (exact interpolating),
                                     customer_set_ops (EXCEPT/INTERSECT)
* training-data dedup .............. exact_dedup_docs, ngram_jaccard_pairs
                                     (guardrailed O(n^2) exact baseline),
                                     minhash_lsh_pairs (LSH output == exact
                                     all-pairs set at the contract threshold),
                                     simhash_docs (bit-exact SQL replica),
                                     doc_fingerprint (FNV in HUGEINT SQL)
* similarity search ................ embedding_cosine_topk,
                                     embedding_lsh_topk / embedding_ivf_topk /
                                     embedding_near_dup_lsh (hyperplane /
                                     centroid matrices embedded as SQL
                                     literals -> DuckDB replays the full ANN
                                     pipelines), embedding_near_dup
                                     (guardrailed exact baseline)
* text analysis .................... text_quality, lang_id_markers,
                                     token_count_bpeish
* multimodal plumbing .............. multimodal_features (image),
                                     audio_features (audio)

Floats: every computed double is explicitly ``round()``-ed to the same
precision on BOTH sides so the value-hash compares stable digits; every
computed integer is cast so DuckDB and Spark hash the same physical
type (HUGEINT/INT32 vs BIGINT was the round-1 hash-mismatch cause).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUERY_VEC = [1.0] * 64  # similarity-search literal query (64-dim testdata)


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _docs(spark: SparkSession, sf_dir: str):
    """documents table, spread across the cluster: the small parquet
    arrives as one scan partition (single row group), which would
    serialize shingling / Arrow UDF batches / long expression chains
    onto one core (measured 6x on the 5k-doc corpus)."""
    from datax_spark.functions.util import spread

    return spread(spark.read.parquet(_p(sf_dir, "documents")))


# ---------------------------------------------------------------------------
# CDC / LWW replay core
# ---------------------------------------------------------------------------

def _q_cdc_lww_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW dedup (operators.dedup.lww_dedup): latest event per user_id
    ordered by (ts, event_id) — the max-LSN-per-key reduction at the
    heart of the replay engine, as a hash agg (map-side combine), not
    a window sort."""
    from datax_spark.operators.dedup import lww_dedup

    ev = spark.read.parquet(_p(sf_dir, "events"))
    latest = lww_dedup(ev, keys=["user_id"], order_cols=["ts", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 4).alias("last_value"),
    )


def _q_cdc_replay_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full replay semantics over an op-typed log: event_type 'error'
    acts as a DELETE; final state = LWW winner per key unless the
    winner is a delete (analog: lake.merge_into's delete handling)."""
    from datax_spark.operators.dedup import lww_dedup

    ev = spark.read.parquet(_p(sf_dir, "events"))
    latest = lww_dedup(ev, keys=["user_id"], order_cols=["ts", "event_id"])
    return latest.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.round("value", 4).alias("last_value"),
    )


_REPLAY_CACHE: dict[str, str] = {}

# Deterministic, sf-independent root: the replay fixture is a fixed
# synthetic changelog (20k events, seed 42), so queries() at any sf
# produce the same state AND oracle_sql() can read the same event log
# back with DuckDB read_parquet (the engine's final table is checked
# value-for-value against a pure-SQL LWW replay of the raw log).
# Keyed by pid so concurrent contract runs (pytest + check_contract +
# driver) never rmtree each other's live run; queries() and
# oracle_sql() always execute in the same process, so the embedded
# path stays consistent where it matters.
_REPLAY_ROOT = f"/tmp/datax_spark_contract_replay_{os.getpid()}"
_REPLAY_N_EVENTS = 20_000  # the fixed contract ChangelogSpec size


def _replay_run_root(spark: SparkSession, sf_dir: str) -> str:
    """Run the actual CDC replay engine (fixtures -> ReplayEngine ->
    LakeTable) once per process over a deterministic synthetic repo
    changelog; return the run root."""
    import shutil

    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events

    if _REPLAY_CACHE.get("root"):
        return _REPLAY_CACHE["root"]
    root = _REPLAY_ROOT
    shutil.rmtree(root, ignore_errors=True)
    spec = ChangelogSpec(
        n_events=_REPLAY_N_EVENTS, n_repos=50, paths_per_repo=120,
        events_per_epoch=5_000, evolve_from_epoch=2, seed=42,
    )
    write_events(spark, spec, os.path.join(root, "events"))
    eng = ReplayEngine(
        spark,
        events_root=os.path.join(root, "events"),
        table_root=os.path.join(root, "table"),
        metrics_root=os.path.join(root, "metrics"),
        # the SHIPPED default config: fused storage-partitioned merge,
        # exchange-aligned on the murmur3 bucket layout (one Spark job
        # and ONE shuffle per epoch). The salted two-stage dedup
        # variant rides the same fused path (exact composed stats) and
        # is oracle-checked separately (hot_key_salted_agg) plus
        # crash-tested in pytest (test_replay_e2e CFG salt_buckets=8).
        # stats_cols: every commit also harvests per-file lsn bounds
        # into the manifest (the filtered-read skipping they enable is
        # oracle-checked by cdc_recent_changes_scan on the fine table).
        config=ReplayConfig(num_buckets=16, stats_cols=("lsn",)),
    )
    eng.run()
    _REPLAY_CACHE["root"] = root
    return root


def _q_cdc_replay_repo_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end engine flagship (rows-only): binlog replay of a
    deterministic (repo, path, commit, lang, content) changelog with
    I/U/D ops, LWW (commit, lsn) ordering, salted dedup, bucketed CoW
    merge, schema evolution and exactly-once epoch commits; returns
    the final table state with the sha256(content) invariant."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    return t.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history target: the engine replays the SAME changelog
    into a history table keeping EVERY version as a validity interval —
    upserts close the key's open interval and open a new one, deletes
    close without opening (lake/scd2.py; reference analog: DataX's
    append-history landing recipe, mysqlwriter writeMode=insert). The
    table is keyed (repo, path, lsn) but BUCKET-ROUTED on (repo, path)
    (LakeTable bucket_cols), so each key's whole history co-locates and
    every epoch's open-row read is bucket-pruned. Oracle: one window
    SQL over the raw log — valid_to = LEAD(commit, lsn) per key in
    (commit, lsn) order, delete events close but emit no row."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.scd2 import Scd2Config, Scd2Engine

    troot = os.path.join(root, "table_scd2")
    if not _REPLAY_CACHE.get("scd2"):
        Scd2Engine(
            spark,
            events_root=os.path.join(root, "events"),
            table_root=troot,
            config=Scd2Config(num_buckets=16),
        ).run()
        _REPLAY_CACHE["scd2"] = troot
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, troot)
    return t.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
        "valid_to_commit", "valid_to_lsn", "is_current",
    )


def _q_cdc_bootstrap_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot bootstrap -> binlog handoff (Debezium
    snapshot-mode / DMS full-load+CDC; reference analog: the
    otsstreamreader export window is bounded by stream expiration,
    OTSStreamReaderChecker.java:39-58, so pre-window state loads from
    a snapshot and the tail resumes from the snapshot position). A
    SECOND table is seeded from the source state at a mid-epoch
    watermark (LWW over the log prefix, no op column), then the SAME
    epoch files replay on top — the engine keeps only lsn > watermark
    (pushed to the parquet scan), so the partial-overlap epoch applies
    exactly its tail. Final state must equal the full-history
    sequential replay: the oracle is the identical pure-SQL LWW over
    the whole raw log used for cdc_replay_repo_table."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    if not _REPLAY_CACHE.get("bootstrap"):
        from datax_spark.engine.replay import ReplayConfig, ReplayEngine
        from datax_spark.operators.dedup import lww_dedup

        w = _REPLAY_N_EVENTS // 2 - 1  # inside epoch 1 of 4 (5k/epoch)
        ev = (
            spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(root, "events"))
            .filter(F.col("lsn") <= w)
        )
        snap = (
            lww_dedup(ev, keys=["repo", "path"], order_cols=["commit", "lsn"])
            .filter(F.col("op") != "D")
            .drop("op", "epoch")
        )
        eng = ReplayEngine(
            spark,
            events_root=os.path.join(root, "events"),
            table_root=os.path.join(root, "table_boot"),
            metrics_root=os.path.join(root, "metrics_boot"),
            config=ReplayConfig(num_buckets=16, stats_cols=("lsn",)),
        )
        eng.bootstrap(snap, w)
        eng.run()
        _REPLAY_CACHE["bootstrap"] = "done"
    t = LakeTable.load(spark, os.path.join(root, "table_boot"))
    return t.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_incremental_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (chunked) snapshot bootstrap interleaved with the
    live tail — the DBLog / Debezium incremental-snapshot algorithm
    (at 10^10 source rows one consistent snapshot frame is
    unrealistic). The engine's log has EXPIRED epoch 0; the tail
    begins mid-log after begin_incremental_bootstrap pins the
    watermark, and two key-range chunks (each captured at its own
    low-watermark position, mid-tail) fill in pre-watermark state
    between epoch applies. Chunk rows whose key saw an already-applied
    event past their low watermark are dropped (the DBLog window
    suppression — without it a chunk captured before a tail-applied
    delete would resurrect the row); survivors merge through the
    cross-batch (commit, lsn) order guard. Final state must equal the
    full-history sequential replay: the oracle is the identical
    pure-SQL LWW over the WHOLE raw log, pre-expiry."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    if not _REPLAY_CACHE.get("inc_bootstrap"):
        import shutil

        from datax_spark.engine.replay import ReplayConfig, ReplayEngine
        from datax_spark.operators.dedup import lww_dedup

        trunc = os.path.join(root, "events_inc")
        shutil.copytree(os.path.join(root, "events"), trunc)
        shutil.rmtree(os.path.join(trunc, "epoch=0"))  # expired history
        t0 = 4_999  # tail starts after epoch 0's last lsn

        def chunk(low_lsn: int, parity: int):
            ev = (
                spark.read.option("mergeSchema", "true")
                .parquet(os.path.join(root, "events"))
                .filter(F.col("lsn") <= low_lsn)
            )
            st = (
                lww_dedup(ev, keys=["repo", "path"], order_cols=["commit", "lsn"])
                .filter(F.col("op") != "D")
                .drop("op", "epoch")
            )
            return st.filter(F.abs(F.xxhash64("repo", "path")) % 2 == parity)

        eng = ReplayEngine(
            spark,
            events_root=trunc,
            table_root=os.path.join(root, "table_inc"),
            metrics_root=os.path.join(root, "metrics_inc"),
            config=ReplayConfig(num_buckets=16, stats_cols=("lsn",)),
        )
        like = spark.read.parquet(trunc).drop("op", "epoch")
        eng.begin_incremental_bootstrap(like, t0)
        eng.apply_epoch(1)
        eng.bootstrap_chunk(chunk(8_000, 0), "range-even", 8_000)
        eng.apply_epoch(2)
        eng.bootstrap_chunk(chunk(12_000, 1), "range-odd", 12_000)
        eng.apply_epoch(3)
        _REPLAY_CACHE["inc_bootstrap"] = "done"
    t = LakeTable.load(spark, os.path.join(root, "table_inc"))
    return t.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_replay_mor_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same binlog replay executed with merge_strategy='mor'
    (merge-on-read: each epoch APPENDS delta files with tombstones —
    the Iceberg v2 equality-delete write shape — instead of rewriting
    buckets) with a compact_every=3 cadence, so the final snapshot has
    BOTH compacted base buckets and pending deltas from the last
    epoch. The returned state is the bucket-local LWW MERGED read
    (LakeTable._read_merged_buckets); the oracle is the identical
    pure-SQL sequential replay that checks the CoW path — write path
    and read path differ end-to-end, the answer must not."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.lake.table import LakeTable

    if not _REPLAY_CACHE.get("mor"):
        eng = ReplayEngine(
            spark,
            events_root=os.path.join(root, "events"),
            table_root=os.path.join(root, "table_mor"),
            metrics_root=os.path.join(root, "metrics_mor"),
            config=ReplayConfig(
                num_buckets=16, merge_strategy="mor", compact_every=3
            ),
        )
        eng.run()
        _REPLAY_CACHE["mor"] = "done"
    t = LakeTable.load(spark, os.path.join(root, "table_mor"))
    assert t.manifest().delta_files, "expected pending deltas in the final snapshot"
    return t.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream CDC fan-out (lake-to-lake incremental replication,
    lake/replicate.py): a replica table is SEEDED from the replayed
    source table at a mid-stream snapshot (pre-schema-evolution), then
    brought to the source head by applying only the change feed between
    the consumed version and current — exercising the snapshot diff,
    the replica's merge, additive schema evolution THROUGH the feed,
    and the replica_of_version exactly-once watermark. The returned
    replica state must equal the source's, so the oracle is the same
    pure-SQL sequential replay of the raw event log."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.replicate import sync
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    rep_root = os.path.join(root, "replica")
    if not _REPLAY_CACHE.get("replica"):
        vs = t.versions()
        mid = vs[len(vs) // 2]
        r1 = sync(t, rep_root, to_version=mid)
        r2 = sync(t, rep_root)
        assert r1.mode == "seed" and r2.mode == "incremental", (r1, r2)
        assert sync(t, rep_root).mode == "noop"
        _REPLAY_CACHE["replica"] = "done"
    rep = LakeTable.load(spark, rep_root)
    return rep.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed point read (LakeTable.lookup — the serving-path analog of
    otsreader's keyed GetRange): fetch the first 20 keys of the final
    state, by explicit (repo, path) list, from the MERGE-ON-READ table
    while it still has pending deltas — so the bucket-pruned lookup
    path AND the bucket-local LWW merge are both on the line. Oracle:
    the pure-SQL sequential replay limited to the same first-20 key
    range."""
    _q_cdc_replay_mor_table(spark, sf_dir)  # ensure the MoR run exists
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table_mor"))
    keys = [
        (r.repo, r.path)
        for r in t.read()
        .select("repo", "path")
        .orderBy("repo", "path")
        .limit(20)
        .collect()
    ]
    return t.lookup(keys).select(
        "repo", "path", "commit", "lsn", "lang",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup where per-file KEY BLOOMS (LakeTable bloom_cols,
    the Delta bloom-filter-index analog) do the file skipping that
    min/max bounds cannot: the final replayed state is seeded into a
    bloom-indexed twin and sorted-compacted so every bucket holds
    SEVERAL files (disjoint path sort ranges, lsn-only manifest
    stats) — a 12-key lookup then bucket-prunes to <=12 buckets and
    the path/repo blooms drop the within-bucket files that provably
    lack the keys, asserted via plan_files before returning. Oracle:
    the pure-SQL sequential replay limited to the same LAST-12 key
    range (the opposite slice from cdc_point_lookup)."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    src = LakeTable.load(spark, os.path.join(root, "table"))
    bloom_root = os.path.join(root, "table_bloom")
    if not _REPLAY_CACHE.get("bloom"):
        sm = src.manifest()
        t = LakeTable.create(
            spark, bloom_root, sm.schema, list(sm.key_cols),
            num_buckets=16, resolve_order=list(sm.resolve_order),
            stats_cols=["lsn"], bloom_cols=["repo", "path"],
        )
        seed = src.read().withColumn("__op", F.lit("U"))
        merge_into(t, seed, op_col="__op").commit()
        # split each bucket into ~4 path-sorted files so skipping is
        # within-bucket — the layout a serving table would keep
        t.compact(sort_cols=["path"], target_file_rows=80)
        _REPLAY_CACHE["bloom"] = "done"
    t = LakeTable.load(spark, bloom_root)
    keys = [
        (r.repo, r.path)
        for r in t.read()
        .select("repo", "path")
        .orderBy(F.desc("repo"), F.desc("path"))
        .limit(12)
        .collect()
    ]
    # the same per-column IN conjuncts lookup() pushes; blooms must
    # beat the bucket pruning alone (several files per touched bucket)
    kflt = [
        ("repo", "in", sorted({k[0] for k in keys})),
        ("path", "in", sorted({k[1] for k in keys})),
    ]
    kept, skipped = t.plan_files(kflt)
    assert skipped, f"expected bloom file-skipping, kept all {len(kept)} files"
    return t.lookup(keys).select(
        "repo", "path", "commit", "lsn", "lang",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_debezium_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The public CDC wire format on the line: the replay fixture's
    raw event log is wrapped into Debezium envelopes (deletes as
    before-image rows with null after — exactly what a binlog source
    connector publishes) and normalized back to flat engine events by
    sources/debezium.py's stateless JVM projection. The oracle reads
    the raw log directly, so every envelope field mapping (op c/u/d,
    image side selection, schema-evolution null fill) must be exact.
    """
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.sources.debezium import normalize_debezium, wrap_debezium

    ev = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "events")
    )
    row_schema = T.StructType(
        [f for f in ev.schema.fields if f.name != "op"]
    )
    wire = wrap_debezium(ev)
    got = normalize_debezium(wire, row_schema)
    return got.select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant", "op",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate view
    (lake/matview.py): a (repo, lang) GROUP BY of the replayed table —
    count(*), sum/min/max(lsn) — advanced snapshot-by-snapshot through
    the preimage change feed (signed-delta arithmetic for count/sum,
    dirty-group-only recompute for min/max under retraction), never
    recomputed from scratch. The reference's closest shape is a full
    re-extract per run (reader -> writer copy of the aggregate); here
    each sync costs O(changed groups). Oracle: a from-scratch GROUP BY
    over the pure-SQL LWW final state of the raw log — every delete,
    group-moving update and schema-evolution epoch in between must
    net out exactly."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.matview import AggView, AggViewSpec
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    view_root = os.path.join(root, "agg_view")
    if not _REPLAY_CACHE.get("agg_view"):
        view = AggView.create(
            spark, view_root, t,
            AggViewSpec(
                group_cols=("repo", "lang"),
                sum_cols=("lsn",),
                min_cols=("lsn",),
                max_cols=("lsn",),
                # the fixture's ~1/37 NULL-lang bucket: NULL groups are
                # sentinel-encoded (SQL-equality key joins can't
                # address a NULL key); the oracle coalesces identically
                group_fill=(("lang", "__null__"),),
            ),
            num_buckets=8,
        )
        recomputed = 0
        for ver in t.versions():
            if ver == 0:
                continue  # the empty create snapshot
            r = view.refresh(t, to_version=ver)
            assert not r.skipped
            recomputed += r.groups_recomputed
        # the fixture's updates retract old (commit, lsn) winners, so
        # the dirty min/max recompute path must actually have fired
        assert recomputed > 0, "dirty-group recompute path never exercised"
        _REPLAY_CACHE["agg_view"] = "done"
    view = AggView.load(spark, view_root)
    return view.read().select(
        "repo", "lang", "n_rows", "sum_lsn", "min_lsn", "max_lsn"
    )


def _q_cdc_matview_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded incremental views (continuous-aggregate composition):
    a SECOND-level view over the first view's table — per-repo lang
    group count, file count, total/max lsn — maintained from the FIRST
    view's own change feed, stepped through each of its refresh
    commits. A view is itself a LakeTable, so maintenance is closed
    under composition; the oracle recomputes both levels from the LWW
    final state of the raw log. lsn is never NULL in the fixture, so
    level-1's internal 0-for-all-NULL sum encoding cannot diverge from
    the oracle's SUM-skips-NULL semantics here."""
    _q_cdc_incremental_agg_view(spark, sf_dir)  # level 1 exists + synced
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.matview import AggView, AggViewSpec

    v1 = AggView.load(spark, os.path.join(root, "agg_view"))
    v2_root = os.path.join(root, "agg_rollup")
    if not _REPLAY_CACHE.get("agg_rollup"):
        v2 = AggView.create(
            spark, v2_root, v1.table,
            AggViewSpec(
                group_cols=("repo",),
                sum_cols=("n_rows", "sum_lsn"),
                max_cols=("max_lsn",),
            ),
            num_buckets=4,
        )
        for ver in v1.table.versions():
            if ver == 0:
                continue
            v2.refresh(v1.table, to_version=ver)
        _REPLAY_CACHE["agg_rollup"] = "done"
    v2 = AggView.load(spark, v2_root)
    return v2.read().select(
        F.col("repo"),
        F.col("n_rows").alias("n_lang_groups"),
        F.col("sum_n_rows").alias("n_files"),
        F.col("sum_sum_lsn").alias("sum_lsn"),
        F.col("max_max_lsn").alias("max_lsn"),
    )


def _q_cdc_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained JOIN view (lake/joinview.py): the
    replayed repo table LEFT-joined to a lang-dimension LakeTable,
    kept in sync from BOTH change feeds by the delta-join plan — fact
    deltas re-join their post-images, dim deltas semi-join only the
    fact rows referencing changed dim keys; never a full recompute.
    The refresh windows interleave fact-only, dim-only and
    both-changed syncs (dim updates AND a dim delete after the view
    exists, so the null-out path fires). The reference's closest
    shape is a full re-extract of a multi-table SELECT per run
    (HiveReader.java:58-74); here each sync costs O(changed rows).
    Oracle: the pure-SQL LWW replay LEFT JOIN the dim's final state
    inlined as VALUES."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.joinview import JoinView, JoinViewSpec
    from datax_spark.lake.table import LakeTable

    fact = LakeTable.load(spark, os.path.join(root, "table"))
    dim_root = os.path.join(root, "lang_dim")
    view_root = os.path.join(root, "join_view")
    if not _REPLAY_CACHE.get("join_view"):
        from datax_spark.lake.merge import merge_into

        dim_schema = T.StructType(
            [
                T.StructField("lang", T.StringType()),
                T.StructField("family", T.StringType()),
                T.StructField("rank", T.LongType()),
            ]
        )
        dim = LakeTable.create(
            spark, dim_root, dim_schema, key_cols=["lang"], num_buckets=2
        )
        view = JoinView.create(
            spark, view_root, fact, dim,
            JoinViewSpec(on=(("lang", "lang"),), how="left", right_prefix="lang_"),
            num_buckets=8,
        )
        langs = ["python", "java", "go", "ts", "rs", "md"]

        def _dim_batch(rows, deletes=()):
            data = [(*r, "U") for r in rows] + [
                (d, None, None, "D") for d in deletes
            ]
            return spark.createDataFrame(
                data,
                T.StructType(
                    dim_schema.fields + [T.StructField("op", T.StringType())]
                ),
            )

        # dim v1: every fixture lang; fact pinned mid-history so the
        # final refresh exercises fact-delta and dim-delta together
        merge_into(dim, _dim_batch(
            [(x, f"fam_{x}", i) for i, x in enumerate(langs)]
        )).commit()
        fvs = [v for v in fact.versions() if v > 0]
        mid = fvs[len(fvs) // 2]
        r1 = view.refresh(fact, dim, left_to=mid)
        assert r1.rows_upserted > 0
        # dim v2: updates + a delete AFTER the view holds md rows —
        # the left-join null-out retraction must fire
        merge_into(dim, _dim_batch(
            [("python", "script", 0), ("go", "native", 2)], deletes=["md"]
        )).commit()
        r2 = view.refresh(fact, dim)
        assert r2.rows_upserted > 0
        assert view.synced_versions() == (
            fact.current_version(), dim.current_version()
        )
        _REPLAY_CACHE["join_view"] = "done"
    view = JoinView.load(spark, view_root)
    return view.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
        "lang_family", "lang_rank",
    )


def _q_cdc_scd2_asof_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the replayed SCD2 history
    (operators/asof.asof_enrich_scd2 over lake/scd2.py output), pinned
    by an end-to-end identity: joining the RAW LOG back to the history
    at each event's own (commit, lsn) must return the event's own
    version — inserts/updates match themselves (their version's
    validity interval opens exactly at their timestamp), and DELETE
    events match NOTHING (the delete closed the prior interval
    right-open at its own timestamp and opened none). Exercises
    lexicographic (commit, lsn) as-of ordering + interval containment
    against real engine output. Oracle: one CASE over the raw log."""
    _q_cdc_scd2_history(spark, sf_dir)  # materializes + caches the history
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable
    from datax_spark.operators.asof import asof_enrich_scd2

    hist = LakeTable.load(spark, os.path.join(root, "table_scd2")).read().select(
        "repo", "path", "commit", "lsn",
        F.sha2("content", 256).alias("hist_sha"),
        "valid_to_commit", "valid_to_lsn",
    )
    ev = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(root, "events"))
        .select("repo", "path", "commit", "lsn", "op",
                F.sha2("content", 256).alias("event_sha"))
    )
    return asof_enrich_scd2(
        ev, hist, on=["repo", "path"], fact_ts=["commit", "lsn"],
        valid_from=["commit", "lsn"],
        valid_to=["valid_to_commit", "valid_to_lsn"],
        right_cols=["hist_sha"],
    )


def _q_cdc_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level predicate delete (LakeTable.delete_where — the
    DELETE FROM ... WHERE / retention-sweep / GDPR-erasure surface;
    reference analog: the postSql DELETE statements rdbms writers run,
    WriterUtil.java's templated SQL, but here a first-class snapshot
    commit that rides the change feed and views). A replica of the
    replayed table (exercising the replication seed path too) deletes
    every lang='md' row; NULL-lang rows must survive (SQL equality).
    Oracle: the pure-SQL LWW final state with the complement
    predicate."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.replicate import sync
    from datax_spark.lake.table import LakeTable

    rep_root = os.path.join(root, "retention_replica")
    if not _REPLAY_CACHE.get("retention"):
        src = LakeTable.load(spark, os.path.join(root, "table"))
        sync(src, rep_root)
        rep = LakeTable.load(spark, rep_root)
        n = rep.delete_where(filters=[("lang", "=", "md")])
        assert n > 0, "fixture always contains md rows"
        _REPLAY_CACHE["retention"] = rep.current_version()
    rep = LakeTable.load(spark, rep_root)
    return rep.read(version=_REPLAY_CACHE["retention"]).select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE (LakeTable.update_where) on the retention
    replica, after the delete: every surviving lang='go' row gets
    lsn += 10**9 (expressions see OLD values, SQL UPDATE semantics)
    as a first-class snapshot commit. Oracle: the complement-predicate
    LWW state with the same CASE applied."""
    _q_cdc_retention_delete(spark, sf_dir)  # replica exists, md deleted
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    rep = LakeTable.load(spark, os.path.join(root, "retention_replica"))
    if not _REPLAY_CACHE.get("update_where"):
        n = rep.update_where(
            {"lsn": "lsn + 1000000000"}, filters=[("lang", "=", "go")]
        )
        assert n > 0, "fixture always contains go rows"
        _REPLAY_CACHE["update_where"] = rep.current_version()
    return rep.read(version=_REPLAY_CACHE["update_where"]).select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_join_view_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed join views (multi-dim star enrichment): a SECOND
    JoinView joins the FIRST one's table to a repo-owner dimension —
    a view's output is itself a LakeTable, so delta-join maintenance
    is closed under composition (the join sibling of the matview
    cascade). The owner dim gets churn AFTER level 2 exists (owner
    update for repos ending '3', delete for repos ending '7' —
    null-fill under the left join), so the level-2 refresh exercises
    its dim-delta path against real level-1 output. Oracle: the LWW
    state LEFT JOIN the lang dim LEFT JOIN the owner dim's final
    state, all expressed inline."""
    _q_cdc_join_view(spark, sf_dir)  # level 1 exists + synced
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.joinview import JoinView, JoinViewSpec
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    v1 = JoinView.load(spark, os.path.join(root, "join_view"))
    dim_root = os.path.join(root, "owner_dim")
    v2_root = os.path.join(root, "join_view_rollup")
    if not _REPLAY_CACHE.get("join_view_rollup"):
        dim_schema = T.StructType(
            [
                T.StructField("repo", T.StringType()),
                T.StructField("owner", T.StringType()),
            ]
        )
        dim = LakeTable.create(
            spark, dim_root, dim_schema, key_cols=["repo"], num_buckets=2
        )
        seed = (
            v1.table.read().select("repo").distinct()
            .select(
                "repo",
                F.concat(F.lit("team-"), F.col("repo")).alias("owner"),
                F.lit("U").alias("op"),
            )
        )
        merge_into(dim, seed).commit()
        v2 = JoinView.create(
            spark, v2_root, v1.table, dim,
            JoinViewSpec(on=(("repo", "repo"),), how="left", right_prefix="o_"),
            num_buckets=8,
        )
        r1 = v2.refresh(v1.table, dim)
        assert r1.rows_upserted > 0
        churn = (
            dim.read().filter(F.col("repo").endswith("3"))
            .select("repo", F.concat(F.lit("lead-"), F.col("repo")).alias("owner"),
                    F.lit("U").alias("op"))
            .unionByName(
                dim.read().filter(F.col("repo").endswith("7"))
                .select("repo", F.lit(None).cast("string").alias("owner"),
                        F.lit("D").alias("op"))
            )
        )
        merge_into(dim, churn).commit()
        r2 = v2.refresh(v1.table, dim)
        assert r2.rows_upserted > 0
        _REPLAY_CACHE["join_view_rollup"] = "done"
    v2 = JoinView.load(spark, v2_root)
    return v2.read().select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
        "lang_family", "lang_rank", "o_owner",
    )


def _q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (the Iceberg read-at-version surface):
    read the replay table AS OF the snapshot committed by epoch 1
    (version 2: create = v0, epoch k commits v = k+1) — a
    pre-schema-evolution snapshot, so the old schema comes back
    verbatim. Oracle: the pure-SQL LWW replay of the raw log
    restricted to epochs <= 1."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    return t.read(version=2).select(
        "repo", "path", "commit", "lsn", "lang",
        F.sha2("content", 256).alias("content_sha256"),
    )


def _q_cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two committed snapshots of the replay
    table (LakeTable.changes — the Delta CDF / Iceberg changelog-scan
    surface): per-key insert/update/delete classification for the
    effect of epochs 2-3 (version 2 = after epoch 1, version 4 =
    after epoch 3). Oracle: the same diff derived from the raw event
    log (winners at epoch<=1 vs epoch<=3, full-outer on the key)."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    ch = t.changes(2, 4)
    return ch.select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
        "_change_type",
    )


def _q_cdc_change_feed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed consumed as a STRUCTURED STREAMING source
    (streaming/change_source.py, format('lake_changes') via the public
    Python DataSource API — the streaming sibling of cdc_change_feed
    and the closest shape to otsstreamreader's tunnel tail): offsets
    are snapshot versions, partitions are manifest-pruned (commit,
    bucket) pairs, and each task diffs the bucket's old/new LWW state
    executor-side in Arrow with zero Spark exchange. Streamed from
    startingVersion=1, so the feed replays the initial snapshot as
    inserts and then every commit's per-key insert/update/delete rows
    tagged with _commit_version. Oracle: per-epoch snapshot diffs
    derived from the raw event log (winner state after each epoch,
    full-outer joined to the previous epoch's state; version =
    epoch + 1, since create is v0 and epoch k commits v(k+1))."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.streaming.change_source import stream_changes

    out = os.path.join(root, "cdf_stream_out")
    if not _REPLAY_CACHE.get("cdf_stream"):
        cdf = stream_changes(
            spark, os.path.join(root, "table"), starting_version=1
        )
        q = (
            cdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(root, "cdf_stream_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        _REPLAY_CACHE["cdf_stream"] = "done"
    return spark.read.parquet(out).select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
        "_change_type", "_commit_version",
    )


def _q_cdc_lineage_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch lineage metrics emitted by the replay run, rolled up
    from the engine's per-(epoch, bucket) rows (CommunicationTool.java:
    16-50 analog): the oracle recomputes every column — offsets,
    counts, bytes, post-dedup keys, and the post-merge table size —
    directly from the raw event log, so the engine's self-reported
    lineage is value-checked end to end. (The per-bucket breakdown is
    covered by pytest; buckets hash on Spark's murmur3 — xxhash64 on
    pre-r3 tables — neither of which ANSI SQL can reproduce.)"""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.engine.metrics import read_metrics

    m = read_metrics(spark, os.path.join(root, "metrics"))
    return m.groupBy(F.col("epoch").cast("long").alias("epoch")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("n_deletes").alias("n_deletes"),
        F.min("min_lsn").alias("min_lsn"),
        F.max("max_lsn").alias("max_lsn"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("n_keys_after_dedup").alias("n_keys_after_dedup"),
        F.sum("rows_after_merge").alias("rows_after_merge"),
    )


def _q_cdc_snapshot_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-lineage metadata table (the Iceberg ``snapshots``
    metadata-table surface): one row per committed snapshot of the
    replay table — version, parent version, the epoch watermark that
    snapshot committed, and its total live row count (sum of the
    manifest's per-bucket counts, i.e. what COUNT(*) at that version
    returns). Metadata-only: built from the O(num_versions) manifest
    JSONs, no data files touched — at 10^10 events this reads a few KB.
    Oracle: the raw event log replayed per epoch PREFIX (LWW winners
    whose final op is not a delete), plus the empty create snapshot
    v0 — so every snapshot's committed row count is value-checked
    against an independent sequential replay."""
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.lake.table import LakeTable

    t = LakeTable.load(spark, os.path.join(root, "table"))
    rows = []
    for v in t.versions():
        m = t.manifest(v)
        rows.append((v, m.parent, m.last_epoch, sum(m.row_counts.values())))
    return spark.createDataFrame(
        rows, "version int, parent int, last_epoch int, n_rows bigint"
    )


def _q_cdc_recent_changes_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats file skipping (the Iceberg lower/upper-bounds scan
    planning surface): replay the same changelog into a FINE-bucketed
    table (96 buckets) with per-file [min, max, null_count] stats on
    ``lsn``, then serve "which keys' current state changed in the last
    100 events" as ``read(filters=[('lsn', '>=', hi-100)])``. Only the
    ~100 winning keys' buckets have a file whose max-lsn bound reaches
    the range, so the scan SKIPS the other buckets' files entirely —
    asserted here, so a layout regression fails loudly rather than
    silently scanning everything. At 100 TB this is the difference
    between touching O(changed buckets) files and a full-table scan.
    Oracle: the pure-SQL LWW replay restricted to the same lsn range.
    """
    root = _replay_run_root(spark, sf_dir)
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.lake.table import LakeTable

    if not _REPLAY_CACHE.get("fine"):
        eng = ReplayEngine(
            spark,
            events_root=os.path.join(root, "events"),
            table_root=os.path.join(root, "table_fine"),
            metrics_root=os.path.join(root, "metrics_fine"),
            config=ReplayConfig(num_buckets=96, stats_cols=("lsn",)),
        )
        eng.run()
        _REPLAY_CACHE["fine"] = "done"
    t = LakeTable.load(spark, os.path.join(root, "table_fine"))
    flt = [("lsn", ">=", _REPLAY_N_EVENTS - 100)]
    kept, skipped = t.plan_files(flt)
    assert skipped, "stats pruning skipped nothing — bounds harvesting broke"
    return t.read(filters=flt).select(
        "repo", "path", "commit", "lsn", "lang", "lang_variant",
        F.sha2("content", 256).alias("content_sha256"),
    )


# ---------------------------------------------------------------------------
# dx_* transformer parity
# ---------------------------------------------------------------------------

def _q_dx_substr_pad_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.transforms import dx_pad, dx_replace, dx_substr

    part = spark.read.parquet(_p(sf_dir, "part"))
    return part.select(
        "p_partkey",
        dx_substr("p_name", 2, 8).alias("sub_name"),
        dx_pad("p_brand", "l", 12, "*").alias("pad_brand"),
        dx_replace("p_type", 0, 3, "XYZ").alias("rep_type"),
    )


def _q_dx_filter_null_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_filter's null semantics (FilterTransformer.java:74-262) on a
    derived nullable column; one row of kept-counts per rule."""
    from datax_spark.functions.transforms import dx_filter_drops

    cust = spark.read.parquet(_p(sf_dir, "customer"))
    x = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    kept = lambda op, v: F.sum((~dx_filter_drops(x, op, v)).cast("long"))
    return cust.agg(
        F.count(F.lit(1)).alias("total"),
        kept(">", "F").alias("kept_gt"),
        kept("=", "null").alias("kept_eq_null"),
        kept("!=", "null").alias("kept_ne_null"),
        kept("like", "M.*").alias("kept_like"),
        kept("not like", "M.*").alias("kept_not_like"),
    )


def _q_dx_encryption_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_encryption parity (AES-ECB as the public analog of the
    fork's SM4): the oracle can't run AES, but the roundtrip count is
    oracle-checkable — Spark must decrypt(encrypt(x)) == x for every
    row to match the plain count."""
    from datax_spark.functions.transforms import dx_encryption

    part = spark.read.parquet(_p(sf_dir, "part"))
    key = "0123456789abcdef"
    enc = part.select(
        "p_name", dx_encryption("p_name", key, "encrypt").alias("ct")
    )
    rt = enc.select(
        "p_name", dx_encryption("ct", key, "decrypt").alias("pt")
    )
    return rt.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("pt") == F.col("p_name")).cast("long")).alias("n_roundtrip_ok"),
    )


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint via Arrow UDF (rows-only)."""
    from datax_spark.functions.content import rolling_fingerprint

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", rolling_fingerprint("text").alias("fingerprint"))


def _q_dx_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.transforms import dx_json

    ev = spark.read.parquet(_p(sf_dir, "events"))
    return ev.select(
        "event_id", dx_json("props", "k").cast("bigint").alias("k")
    )


# ---------------------------------------------------------------------------
# split / framework ops
# ---------------------------------------------------------------------------

def _q_range_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """splitPk-style even min/max range split (SingleTableSplitUtil.
    java:33-127): bucket rows into 8 even pk ranges, count per slice."""
    li = spark.read.parquet(_p(sf_dir, "lineitem"))
    bounds = li.agg(
        F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    )
    j = li.crossJoin(F.broadcast(bounds))
    bucket = F.least(
        F.expr("(l_orderkey - mn) * 8 div (mx - mn + 1)"), F.lit(7)
    ).alias("bucket")
    return (
        j.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _q_string_pk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-PK ASCII-radix-128 range split (RangeSplitUtil.java:14-30,
    doAsciiStringSplit + RdbmsRangeSplitWrap.java:45-72): split the
    c_name key space into 8 even bignum ranges, assign each row to its
    slice, count per slice. The slice id is the number of interior
    split points <= the key — identical to the predicate ranges since
    equal-length ASCII strings compare the same as text and as
    base-128 numbers. min/max bounds are a bounded 1-row collect (the
    reference issues the same MIN/MAX query: SingleTableSplitUtil
    getPkRange)."""
    from datax_spark.sources.readers import ascii_string_split_points

    cust = spark.read.parquet(_p(sf_dir, "customer"))
    mn, mx = cust.agg(F.min("c_name"), F.max("c_name")).first()
    interior = ascii_string_split_points(mn, mx, 8)[1:-1]
    bucket = F.lit(0)
    for p in interior:
        bucket = bucket + (F.col("c_name") >= F.lit(p)).cast("int")
    return (
        cust.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c_name").alias("min_name"),
            F.max("c_name").alias("max_name"),
        )
    )


def _q_quantile_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height (sampled-quantile) range split — the reference's
    Oracle SAMPLE split estimation (SingleTableSplitUtil.java:298-393):
    split points come from the observed o_totalprice distribution, so
    every slice carries ~n/8 rows even though the key is skewed. Uses
    the exact-rank mode (relative_error=0) so DuckDB can reproduce the
    points; the GK-sketch mode is the production scale path."""
    from datax_spark.sources.readers import quantile_split_points

    orders = spark.read.parquet(_p(sf_dir, "orders"))
    pts = quantile_split_points(orders, "o_totalprice", 8, relative_error=0)
    bucket = F.lit(0)
    for p in pts:
        bucket = bucket + (F.col("o_totalprice") >= F.lit(p)).cast("int")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


def _q_hot_key_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a 5-value hot key (operators.
    skew.salted_repartition): must equal the plain group-by."""
    from datax_spark.operators.skew import salted_repartition

    ev = spark.read.parquet(_p(sf_dir, "events"))
    salted = salted_repartition(ev, keys=["event_type"], salt_buckets=8)
    stage1 = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
    )
    return (
        stage1.groupBy("event_type")
        .agg(
            F.sum("c").alias("records"),
            F.sum("s").alias("sv"),
        )
        .select(
            "event_type", "records",
            F.round(F.col("sv").cast("double"), 2).alias("sum_value"),
        )
    )


def _q_dirty_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """errorLimit accounting (ErrorRecordChecker.java:18-82): classify
    records dirty by a conversion rule, report counts vs limits."""
    ev = spark.read.parquet(_p(sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("bigint")
    dirty = (k > 90).cast("long")
    return ev.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.sum(dirty).alias("dirty_records"),
        F.round(F.sum(dirty) / F.count(F.lit(1)), 6).alias("dirty_pct"),
        (F.sum(dirty) > 500).cast("int").alias("exceeds_record_limit"),
        ((F.sum(dirty) / F.count(F.lit(1))) > 0.05).cast("int").alias("exceeds_pct_limit"),
    )


def _q_speed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communication-style counters per event_type (records, bytes,
    value stats, distinct users) — CommunicationTool.java:16-50."""
    ev = spark.read.parquet(_p(sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("records"),
        F.sum(F.octet_length("props")).alias("bytes_props"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _q_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive union-by-name with null-fill (operators.schema_evolution):
    an old-schema slice (no source col) unioned with a new-schema slice."""
    from datax_spark.operators.schema_evolution import evolve_schema, union_by_name

    docs = spark.read.parquet(_p(sf_dir, "documents"))
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "source")
    target = evolve_schema(old.schema, new.schema)
    return union_by_name(old, target).unionByName(union_by_name(new, target))


# ---------------------------------------------------------------------------
# internal SQL ops (engine building blocks)
# ---------------------------------------------------------------------------

def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_p(sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dimensions."""
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    cust = spark.read.parquet(_p(sf_dir, "customer"))
    nation = spark.read.parquet(_p(sf_dir, "nation"))
    region = spark.read.parquet(_p(sf_dir, "region"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _q_event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    session-start counter per user — the batch form of a stateful
    streaming session window."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(_p(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    starts = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(starts).over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def _q_event_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join: every click event enriched with the
    user's most recent purchase at-or-before it (operators/asof.py,
    union+window formulation — one exchange on user_id + one sort,
    whole-stage codegen, no range-join explosion). Oracle: DuckDB's
    native ASOF LEFT JOIN."""
    from datax_spark.operators.asof import asof_join

    ev = spark.read.parquet(_p(sf_dir, "events"))
    as_sec = F.col("ts").cast("timestamp").cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", as_sec.alias("ts_sec"), "value",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", as_sec.alias("ts_sec"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts_sec",
        right_cols=["purchase_event_id", "purchase_value"],
        right_prefix="last_",
    )


def _q_event_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event deltas (lag): CDC-style ordering analysis."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(_p(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)).alias("gap_sec"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


def _q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (status -> priority hierarchy with totals)."""
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def _q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations of status x
    priority incl. both totals) — completes the grouping-sets family
    next to orders_rollup."""
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolating percentiles per group (Spark `percentile`
    == DuckDB `quantile_cont`, verified value-identical)."""
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
    )


def _q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (distinct EXCEPT / INTERSECT): customers with no
    urgent orders, and customers with at least one 'F'-status order,
    as one tagged relation."""
    cust = spark.read.parquet(_p(sf_dir, "customer")).select("c_custkey")
    orders = spark.read.parquet(_p(sf_dir, "orders"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    f_status = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    no_urgent = cust.subtract(urgent).withColumn("tag", F.lit("no_urgent"))
    has_f = cust.intersect(f_status).withColumn("tag", F.lit("has_f"))
    return no_urgent.unionByName(has_f)


def _q_window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = spark.read.parquet(_p(sf_dir, "orders"))
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", F.round("o_totalprice", 2).alias("totalprice"))
    )


# ---------------------------------------------------------------------------
# training-data dedup
# ---------------------------------------------------------------------------

def _q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.dedup_text import exact_dedup

    docs = _docs(spark, sf_dir)
    # text_len rides the aggregation (group-constant: all texts in a
    # sha2 group are identical) — the raw text never crosses the shuffle
    return exact_dedup(
        docs, "text", "doc_id",
        extra_aggs=[F.min(F.length("text")).alias("text_len")],
    ).select("keep_id", "n_dups", "text_len")


def _q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard near-dup pairs within each source group —
    the explicitly-O(n^2) EXACT BASELINE for the MinHash scale path
    (guardrailed: the operator refuses inputs past max_rows)."""
    from datax_spark.functions.dedup_text import ngram_jaccard_exact_pairs

    docs = _docs(spark, sf_dir)
    j = ngram_jaccard_exact_pairs(
        docs, "text", "doc_id", group_col="source", threshold=0.2
    )
    return j.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))


def _q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline over 3-WORD shingles (the
    standard unit for LLM-corpus dedup): shingle -> 64 minhashes -> 16
    bands -> bucket join -> signature prefilter -> exact Jaccard
    verify >= 0.5. Word shingles cut the explode+hash stage ~6x vs
    char-5 shingles on this corpus with the same near-dup signal.

    Oracle-checked against the exact all-pairs word-3-gram Jaccard
    set: at threshold 0.5 with 64/16-band LSH the candidate stage has
    ~100% recall (the corpus' true near-dup pairs sit at s >= 0.9
    where P(miss) = (1 - s^4)^16 ~ 1e-13), so the verified LSH output
    equals the exact set — the driver's equality check covers both
    precision (verify stage) and recall (banding) of the scale path."""
    from datax_spark.functions.dedup_text import minhash_dedup

    docs = spark.read.parquet(_p(sf_dir, "documents"))
    return minhash_dedup(
        docs, "text", "doc_id", threshold=0.5, k=3, shingle_mode="word",
        prefilter_margin=0.15,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard_r"))


def _q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc via Arrow pandas UDF (rows-only)."""
    from datax_spark.functions.dedup_text import simhash64

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", simhash64("text").alias("simhash"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def _q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs a literal query vector, JVM-side
    zip_with/aggregate dot product; rank on rounded sim + id so the
    ordering is float-stable across engines."""
    from datax_spark.functions.similarity import cosine_sim

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    return (
        emb.select(
            "vec_id", F.round(cosine_sim("embedding", QUERY_VEC), 4).alias("cosine_r")
        )
        .orderBy(F.desc("cosine_r"), F.asc("vec_id"))
        .limit(10)
    )


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact baseline (oracle-
    checked); the LSH-bucketed variant is the scale path (rows-only
    query below)."""
    from datax_spark.functions.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    p = embedding_near_dup_pairs(emb, "embedding", "vec_id", threshold=0.35)
    return p.select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


def _q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup: signature bucket self-join then
    exact cosine verify. Fully oracle-checked: the hyperplane matrix is
    a deterministic literal embedded in the oracle SQL, so DuckDB
    replays the ENTIRE pipeline — signature signs, bucket join, exact
    verify — not just the output's precision."""
    from datax_spark.functions.similarity import embedding_near_dup_lsh

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    p = embedding_near_dup_lsh(
        emb, "embedding", "vec_id", threshold=0.3, bits=4, dim=64
    )
    return p.select("id_a", "id_b", F.round("cosine", 4).alias("cosine_r"))


def _q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a pre-trained (deterministic literal) coarse
    quantizer: Arrow-UDF cluster assignment, cosine top-k within the
    probed clusters. Oracle-checked end to end — the centroid matrix
    is embedded in the oracle SQL, so DuckDB reproduces assignment,
    probe selection and the final top-k. (The inline k-means training
    path is covered by pytest; its sampled centroids are not
    SQL-expressible.)"""
    from datax_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    r = ivf_topk(
        emb, "embedding", "vec_id", QUERY_VEC, k=10, n_clusters=8, n_probe=3,
        centroids=_IVF_CENTROIDS,
    )
    return r.select("vec_id", F.round("cosine_sim", 4).alias("cosine_r"))


def _q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path (rows-only): random-hyperplane LSH bucket probe then
    cosine top-k within the bucket (numpy signatures via Arrow UDF)."""
    from datax_spark.functions.similarity import lsh_bucket_topk

    emb = spark.read.parquet(_p(sf_dir, "embeddings"))
    r = lsh_bucket_topk(
        emb, "embedding", "vec_id", QUERY_VEC, k=10, bits=8, multiprobe=4
    )
    return r.select("vec_id", F.round("cosine_sim", 4).alias("cosine_r"))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import alpha_ratio, quality_score, token_count

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.round(alpha_ratio("text"), 4).alias("alpha_r"),
        quality_score("text").alias("quality"),
    )


def _q_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/text.scrub_pii): emails/IPs/cards/
    phones replaced by typed placeholders in one chained
    regexp_replace projection (codegen, no Python). PII is injected
    deterministically per doc so every pattern actually fires; the
    oracle replays the same chain in DuckDB (patterns live in the
    Java∩RE2 subset; 'g' flag = Spark's replace-all)."""
    from datax_spark.functions.text import scrub_pii

    docs = _docs(spark, sf_dir)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact u"), F.col("doc_id"),
            F.lit("@example.com at 10.2.3.4 or +1 415-555-01"),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("t"),
    )
    scrubbed = salted.select("doc_id", scrub_pii("t").alias("s"))
    n_of = lambda tok: (  # noqa: E731
        (F.length(F.col("s")) - F.length(F.replace(F.col("s"), F.lit(tok), F.lit(""))))
        / len(tok)
    ).cast("long")
    return scrubbed.select(
        "doc_id",
        F.sha2("s", 256).alias("scrubbed_sha"),
        n_of("<EMAIL>").alias("n_email"),
        n_of("<IP>").alias("n_ip"),
        n_of("<PHONE>").alias("n_phone"),
    )


def _q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-line and
    duplicate-word fractions as pure array expressions
    (split → array_distinct → size arithmetic, codegen'd end to end).
    Raw doubles emitted — both engines compute the identical IEEE
    division of the same integers."""
    from datax_spark.functions.text import dup_line_fraction, dup_word_fraction

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        dup_line_fraction("text").alias("dup_line_frac"),
        dup_word_fraction("text").alias("dup_word_frac"),
    )


def _q_lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datax_spark.functions.text import lang_id_en, stopword_hits

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        "lang",
        stopword_hits("text").alias("en_hits"),
        lang_id_en("text").alias("lang_guess"),
    )


def _q_token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token count via Arrow pandas UDF; oracle uses the
    equivalent regexp_extract_all (texts are ASCII so \\w agrees)."""
    from datax_spark.functions.content import token_count_bpeish

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", token_count_bpeish("text").cast("bigint").alias("n_bpe_tokens")
    )


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary pipeline: text -> utf-8 payload (stand-in for an
    image blob) -> mapInPandas fake decode -> typed feature columns.
    The decode is a deterministic stub (real codecs are stubbed per
    the environment); the Spark plumbing (binary schema, Arrow
    batches, output schema) is real and oracle-checked on the
    byte-derived features."""
    from datax_spark.functions.multimodal import with_fake_image_features

    docs = _docs(spark, sf_dir)
    blobs = docs.select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return with_fake_image_features(blobs, "payload").select(
        "doc_id", "n_bytes", "width", "height", "mode"
    )


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality plumbing: opaque binary -> typed metadata via
    mapInPandas (deterministic fake decode; features are functions of
    byte length so the oracle can verify the full pipeline)."""
    from datax_spark.functions.multimodal import with_fake_audio_features

    docs = _docs(spark, sf_dir)
    blobs = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return with_fake_audio_features(blobs, "payload").select(
        "doc_id", "n_bytes", "sample_rate", "duration_ms", "channels"
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: LWW latest-state replay of the event log."""
    return _q_cdc_lww_latest_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering is deliberate and rotates per round: the driver's
    # correctness run samples a 50-query PREFIX of this dict, so the 12
    # queries whose newest driver rows are oldest (this round: the
    # relational/window/dedup set, last stamped in r3) sit immediately
    # after the flagship, and the 12 freshest driver-green queries (the
    # embedding/text set, stamped r4) rotate to the tail.  The goal is
    # that EVERY query carries a driver row within the last two rounds;
    # everything stays oracle-green at every position
    # (tools/check_contract.py runs ALL of them, every round).
    return {
        "cdc_lww_latest_state": _q_cdc_lww_latest_state,
        "window_topk_orders": _q_window_topk_orders,
        "event_sessionization": _q_event_sessionization,
        "event_asof_enrich": _q_event_asof_enrich,
        "event_lag_delta": _q_event_lag_delta,
        "orders_rollup": _q_orders_rollup,
        "orders_cube": _q_orders_cube,
        "price_percentiles": _q_price_percentiles,
        "customer_set_ops": _q_customer_set_ops,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "simhash_docs": _q_simhash_docs,
        "cdc_replay_state": _q_cdc_replay_state,
        "cdc_replay_repo_table": _q_cdc_replay_repo_table,
        "cdc_scd2_history": _q_cdc_scd2_history,
        "cdc_bootstrap_handoff": _q_cdc_bootstrap_handoff,
        "cdc_incremental_bootstrap": _q_cdc_incremental_bootstrap,
        "cdc_replay_mor_table": _q_cdc_replay_mor_table,
        "cdc_replica_sync": _q_cdc_replica_sync,
        "cdc_point_lookup": _q_cdc_point_lookup,
        "cdc_bloom_point_lookup": _q_cdc_bloom_point_lookup,
        "cdc_debezium_normalize": _q_cdc_debezium_normalize,
        "cdc_time_travel": _q_cdc_time_travel,
        "cdc_incremental_agg_view": _q_cdc_incremental_agg_view,
        "cdc_matview_rollup": _q_cdc_matview_rollup,
        "cdc_join_view": _q_cdc_join_view,
        "cdc_join_view_rollup": _q_cdc_join_view_rollup,
        "cdc_retention_delete": _q_cdc_retention_delete,
        "cdc_scd2_asof_identity": _q_cdc_scd2_asof_identity,
        "cdc_update_where": _q_cdc_update_where,
        "cdc_snapshot_lineage": _q_cdc_snapshot_lineage,
        "cdc_recent_changes_scan": _q_cdc_recent_changes_scan,
        "cdc_change_feed": _q_cdc_change_feed,
        "cdc_change_feed_stream": _q_cdc_change_feed_stream,
        "cdc_lineage_metrics": _q_cdc_lineage_metrics,
        "dx_substr_pad_replace": _q_dx_substr_pad_replace,
        "dx_filter_null_rules": _q_dx_filter_null_rules,
        "dx_json_extract": _q_dx_json_extract,
        "dx_encryption_roundtrip": _q_dx_encryption_roundtrip,
        "doc_fingerprint": _q_doc_fingerprint,
        "range_split_scan": _q_range_split_scan,
        "string_pk_split": _q_string_pk_split,
        "quantile_split_scan": _q_quantile_split_scan,
        "hot_key_salted_agg": _q_hot_key_salted_agg,
        "dirty_data_split": _q_dirty_data_split,
        "speed_metrics": _q_speed_metrics,
        "schema_evolution_union": _q_schema_evolution_union,
        "tpch_q1": _q_tpch_q1,
        "region_revenue": _q_region_revenue,
        # --- tail (driver-green in r4; re-verified every round by
        # tools/check_contract.py even when outside the sampled prefix) ---
        "embedding_cosine_topk": _q_embedding_cosine_topk,
        "embedding_lsh_topk": _q_embedding_lsh_topk,
        "embedding_ivf_topk": _q_embedding_ivf_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        "embedding_near_dup_lsh": _q_embedding_near_dup_lsh,
        "text_quality": _q_text_quality,
        "pii_scrub_docs": _q_pii_scrub_docs,
        "doc_repetition_stats": _q_doc_repetition_stats,
        "lang_id_markers": _q_lang_id_markers,
        "token_count_bpeish": _q_token_count_bpeish,
        "multimodal_features": _q_multimodal_features,
        "audio_features": _q_audio_features,
    }


_QV = "[" + ", ".join(f"{x:.1f}" for x in QUERY_VEC) + "]"


# --- deterministic ANN constants shared by queries() and oracle_sql() ---
# The hyperplane / centroid matrices are Python-side deterministic
# values; embedding them as SQL literals lets DuckDB replay the full
# ANN pipelines (signature signs, bucket joins, probes) value-for-value.
def _ivf_centroids():
    import numpy as np

    # pre-trained coarse quantizer stand-in: seed-fixed Gaussian at the
    # corpus' per-dim scale (~N(0, 0.125))
    return np.random.default_rng(7).standard_normal((8, 64)) * 0.12


_IVF_CENTROIDS = _ivf_centroids()


def _vec_lit(v) -> str:
    # repr(float) round-trips binary64 exactly; DuckDB parses to DOUBLE
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"


def _sig_sql(planes, e: str = "e") -> str:
    """SQL for the hyperplane signature sum_b 2^b * (dot(e, p_b) > 0) —
    matches similarity.hyperplane_signature_udf bit order."""
    terms = [
        f"(CASE WHEN list_dot_product({e}, {_vec_lit(p)}) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, p in enumerate(planes)
    ]
    return "(" + "\n + ".join(terms) + ")"


def _lsh_topk_probes(bits: int, multiprobe: int, seed: int = 42) -> list[int]:
    import numpy as np

    from datax_spark.functions.similarity import _planes

    planes = _planes(len(QUERY_VEC), bits, seed)
    qsig = int(((np.asarray(QUERY_VEC) @ planes.T) > 0) @ (1 << np.arange(bits)))
    return [qsig] + [qsig ^ (1 << b) for b in range(min(multiprobe, bits))]


def _embedding_lsh_oracles() -> dict[str, str]:
    from datax_spark.functions.similarity import _planes

    p4 = _planes(64, 4, 42)
    p8 = _planes(64, 8, 42)
    probes = ", ".join(str(x) for x in _lsh_topk_probes(bits=8, multiprobe=4))
    cents = ",\n".join(
        f"({cid}, {_vec_lit(c)})" for cid, c in enumerate(_IVF_CENTROIDS)
    )
    import numpy as np

    q = np.asarray(QUERY_VEC)
    qd = ((np.asarray(_IVF_CENTROIDS) - q[None, :]) ** 2).sum(axis=1)
    ivf_probes = ", ".join(str(int(c)) for c in qd.argsort()[:3])
    return {
        "embedding_near_dup_lsh": f"""
            WITH v AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
                 s AS (SELECT vec_id, e, {_sig_sql(p4)} AS sig FROM v)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 4) AS cosine_r
            FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.3
        """,
        "embedding_lsh_topk": f"""
            WITH v AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
                 s AS (SELECT vec_id, e, {_sig_sql(p8)} AS sig FROM v)
            SELECT vec_id,
                   round(list_cosine_similarity(e, {_QV}), 4) AS cosine_r
            FROM s
            WHERE sig IN ({probes})
            ORDER BY list_cosine_similarity(e, {_QV}) DESC, vec_id ASC
            LIMIT 10
        """,
        "embedding_ivf_topk": f"""
            WITH v AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
                 c(cid, cv) AS (VALUES {cents}),
                 a AS (SELECT vec_id, e, cid,
                              row_number() OVER (PARTITION BY vec_id
                                  ORDER BY list_distance(e, cv) ASC, cid ASC) AS rn
                       FROM v CROSS JOIN c),
                 asg AS (SELECT vec_id, e, cid FROM a WHERE rn = 1)
            SELECT vec_id,
                   round(list_cosine_similarity(e, {_QV}), 4) AS cosine_r
            FROM asg
            WHERE cid IN ({ivf_probes})
            ORDER BY list_cosine_similarity(e, {_QV}) DESC, vec_id ASC
            LIMIT 10
        """,
    }

_EN_HITS_SQL = """(
    ((len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5)
  + ((len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5)
  + ((len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4)
  + ((len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', ' to ', ''))) / 4)
  + ((len(' ' || lower(text) || ' ') - len(replace(' ' || lower(text) || ' ', ' is ', ''))) / 4)
)::BIGINT"""

_NTOK_SQL = """(CASE WHEN len(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\\s+')) END)::INT"""


def _simhash_oracle() -> str:
    """64-bit SimHash replicated in SQL: per-token FNV-1a-64 (HUGEINT
    mod-2^64 arithmetic), per-bit majority vote, signed-int64 fold —
    matches dedup_text.simhash64 bit-for-bit on ASCII text."""
    # offset matches dedup_text.simhash64's seed constant (a 61-bit
    # FNV-offset variant, deliberately shared with rolling_fingerprint)
    fnv = (
        "list_reduce(list_prepend(1469598103934665603::HUGEINT, "
        "list_transform(range(1, strlen(t) + 1), "
        "i -> ascii(substr(t, i, 1))::HUGEINT)), "
        "(h, c) -> (xor(h, c) * 1099511628211) % 18446744073709551616)"
    )
    bits = "\n + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, "
        f"h -> CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform(
                     list_filter(string_split_regex(text, '\\s+'),
                                 t -> len(t) > 0),
                     t -> {fnv}) AS hs
          FROM documents
        ),
        v AS (SELECT doc_id, ({bits}) AS uv FROM toks)
        SELECT doc_id,
               (CASE WHEN uv >= 9223372036854775808
                     THEN uv - 18446744073709551616 ELSE uv END)::BIGINT AS simhash
        FROM v
    """


def oracle_sql() -> dict[str, str]:
    return {
        **_embedding_lsh_oracles(),
        "simhash_docs": _simhash_oracle(),
        "cdc_lww_latest_state": """
            SELECT user_id, event_id AS last_event_id,
                   event_type AS last_event_type,
                   round(value, 4) AS last_value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        "cdc_replay_state": """
            SELECT user_id, event_id AS last_event_id,
                   round(value, 4) AS last_value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # Pure-SQL sequential replay of the raw event log (valid because
        # the fixture's commit is lexicographically monotone in lsn, so
        # global max-(commit, lsn) per key == epoch-by-epoch application):
        # final state excludes keys whose winner is a delete; sha256 of
        # the winning content is the per-row invariant.
        "cdc_replay_repo_table": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # SCD2 history: every version an interval; valid_to = the next
        # event's position per key (deletes close, emit nothing)
        "cdc_scd2_history": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *,
                     lead(commit) OVER win AS valid_to_commit,
                     lead(lsn) OVER win AS valid_to_lsn
              FROM ev
              WINDOW win AS (PARTITION BY repo, path ORDER BY commit, lsn)
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256,
                   valid_to_commit, valid_to_lsn,
                   (valid_to_lsn IS NULL) AS is_current
            FROM w WHERE op <> 'D'
        """,
        # snapshot bootstrap + log-tail handoff: a table seeded from
        # the mid-log source state and tailed with lsn > watermark
        # must equal the full-history replay — the same pure-SQL LWW
        # over the entire raw log IS the oracle.
        "cdc_bootstrap_handoff": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # chunked (DBLog-style) incremental bootstrap: expired-prefix
        # tail + interleaved key-range chunks with window suppression
        # must also equal the full-history replay — same pure-SQL LWW
        # over the entire pre-expiry raw log.
        "cdc_incremental_bootstrap": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # replica sync: seed-at-mid-snapshot + incremental change-feed
        # apply must reproduce the source state exactly — so the oracle
        # is again the same sequential replay of the raw log.
        "cdc_replica_sync": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # merge-on-read replay: different write path (delta append +
        # tombstones) and read path (bucket-local LWW merge), same
        # final state — so the oracle is the same sequential replay.
        "cdc_replay_mor_table": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        "cdc_point_lookup": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY repo, path LIMIT 20
        """,
        # bloom-indexed point lookup: different physical table (seeded
        # twin, path-sorted multi-file buckets, per-file key blooms),
        # same logical state — so the oracle is the same sequential
        # replay, taken from the opposite end of the key order
        "cdc_bloom_point_lookup": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY repo DESC, path DESC LIMIT 12
        """,
        # debezium wire round trip: wrap(raw log) -> normalize must be
        # the identity, so the oracle is the raw log itself
        "cdc_debezium_normalize": f"""
            SELECT repo, path, commit, lsn, lang, lang_variant, op,
                   sha256(content) AS content_sha256
            FROM read_parquet(
                '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                union_by_name = true)
        """,
        # incremental agg view: maintained purely from the change feed,
        # must equal a from-scratch GROUP BY over the LWW final state
        # (sum cast: DuckDB sum(BIGINT) is HUGEINT, the view stores i64)
        "cdc_incremental_agg_view": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            ),
            state AS (
              SELECT repo, coalesce(lang, '__null__') AS lang, lsn
              FROM w WHERE rn = 1 AND op <> 'D'
            )
            SELECT repo, lang,
                   count(*) AS n_rows,
                   CAST(sum(lsn) AS BIGINT) AS sum_lsn,
                   min(lsn) AS min_lsn,
                   max(lsn) AS max_lsn
            FROM state GROUP BY repo, lang
        """,
        # scd2 as-of identity: every non-delete event matches its own
        # version's sha; deletes match nothing (right-open intervals)
        "cdc_scd2_asof_identity": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            )
            SELECT repo, path, commit, lsn, op,
                   sha256(content) AS event_sha,
                   CASE WHEN op <> 'D' THEN sha256(content) END AS hist_sha
            FROM ev
        """,
        # predicate delete on a replica: LWW final state minus the
        # deleted predicate; NULL lang never matches '=' and survives
        "cdc_retention_delete": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w
            WHERE rn = 1 AND op <> 'D'
              AND (lang IS NULL OR lang <> 'md')
        """,
        # predicate update after the delete: same LWW state, lsn
        # bumped where lang='go'
        "cdc_update_where": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit,
                   CASE WHEN lang = 'go' THEN lsn + 1000000000
                        ELSE lsn END AS lsn,
                   lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w
            WHERE rn = 1 AND op <> 'D'
              AND (lang IS NULL OR lang <> 'md')
        """,
        # incremental join view: maintained from BOTH change feeds,
        # must equal the LWW final state LEFT-joined to the dim's
        # final state (the same literal epochs the Spark side commits)
        "cdc_join_view": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            ),
            fact AS (
              SELECT repo, path, commit, lsn, lang, lang_variant,
                     sha256(content) AS content_sha256
              FROM w WHERE rn = 1 AND op <> 'D'
            ),
            dim AS (
              SELECT * FROM (VALUES
                ('python', 'script',   CAST(0 AS BIGINT)),
                ('java',   'fam_java', CAST(1 AS BIGINT)),
                ('go',     'native',   CAST(2 AS BIGINT)),
                ('ts',     'fam_ts',   CAST(3 AS BIGINT)),
                ('rs',     'fam_rs',   CAST(4 AS BIGINT))
              ) AS t(lang, lang_family, lang_rank)
            )
            SELECT f.*, d.lang_family, d.lang_rank
            FROM fact f LEFT JOIN dim d USING (lang)
        """,
        # composed join views: LWW state LEFT JOIN lang dim LEFT JOIN
        # the owner dim's final state (update %3, delete %7 -> NULL)
        "cdc_join_view_rollup": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            ),
            fact AS (
              SELECT repo, path, commit, lsn, lang, lang_variant,
                     sha256(content) AS content_sha256
              FROM w WHERE rn = 1 AND op <> 'D'
            ),
            dim AS (
              SELECT * FROM (VALUES
                ('python', 'script',   CAST(0 AS BIGINT)),
                ('java',   'fam_java', CAST(1 AS BIGINT)),
                ('go',     'native',   CAST(2 AS BIGINT)),
                ('ts',     'fam_ts',   CAST(3 AS BIGINT)),
                ('rs',     'fam_rs',   CAST(4 AS BIGINT))
              ) AS t(lang, lang_family, lang_rank)
            )
            SELECT f.*, d.lang_family, d.lang_rank,
                   CASE WHEN f.repo LIKE '%7' THEN NULL
                        WHEN f.repo LIKE '%3' THEN 'lead-' || f.repo
                        ELSE 'team-' || f.repo END AS o_owner
            FROM fact f LEFT JOIN dim d USING (lang)
        """,
        # cascaded rollup: recompute BOTH aggregation levels from the
        # LWW final state; the maintained two-level cascade must match
        "cdc_matview_rollup": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            ),
            state AS (
              SELECT repo, coalesce(lang, '__null__') AS lang, lsn
              FROM w WHERE rn = 1 AND op <> 'D'
            ),
            l1 AS (
              SELECT repo, lang, count(*) AS n,
                     CAST(sum(lsn) AS BIGINT) AS s, max(lsn) AS m
              FROM state GROUP BY repo, lang
            )
            SELECT repo,
                   count(*) AS n_lang_groups,
                   CAST(sum(n) AS BIGINT) AS n_files,
                   CAST(sum(s) AS BIGINT) AS sum_lsn,
                   max(m) AS max_lsn
            FROM l1 GROUP BY repo
        """,
        "cdc_time_travel": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true, hive_partitioning = true,
                  hive_types = {{'epoch': BIGINT}})
              WHERE epoch <= 1
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang,
                   sha256(content) AS content_sha256
            FROM w WHERE rn = 1 AND op <> 'D'
        """,
        # snapshots metadata table: v0 is the empty create; each epoch k
        # commits version k+1 whose live-row count equals the LWW
        # winners (non-delete) over the epoch<=k prefix of the raw log.
        "cdc_snapshot_lineage": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true, hive_partitioning = true,
                  hive_types = {{'epoch': BIGINT}})
            ),
            eps AS (SELECT DISTINCT epoch FROM ev),
            per AS (
              SELECT p.epoch AS pe, ev.repo, ev.path, ev.op,
                     row_number() OVER (
                       PARTITION BY p.epoch, ev.repo, ev.path
                       ORDER BY ev.commit DESC, ev.lsn DESC) AS rn
              FROM eps p JOIN ev ON ev.epoch <= p.epoch
            ),
            counts AS (
              SELECT pe, count(*) AS n_rows
              FROM per WHERE rn = 1 AND op <> 'D'
              GROUP BY pe
            )
            SELECT CAST(0 AS INT) AS version, CAST(NULL AS INT) AS parent,
                   CAST(-1 AS INT) AS last_epoch, CAST(0 AS BIGINT) AS n_rows
            UNION ALL
            SELECT CAST(pe + 1 AS INT) AS version, CAST(pe AS INT) AS parent,
                   CAST(pe AS INT) AS last_epoch, CAST(n_rows AS BIGINT) AS n_rows
            FROM counts
        """,
        # stats-pruned "recent changes" scan: the engine serves it by
        # skipping files via manifest bounds; the oracle replays the
        # raw log and keeps winners in the same lsn range — file
        # skipping must be invisible in the answer.
        "cdc_recent_changes_scan": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true)
            ),
            w AS (
              SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit DESC, lsn DESC) AS rn
              FROM ev
            )
            SELECT repo, path, commit, lsn, lang, lang_variant,
                   sha256(content) AS content_sha256
            FROM w
            WHERE rn = 1 AND op <> 'D' AND lsn >= {_REPLAY_N_EVENTS - 100}
        """,
        "cdc_change_feed": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true, hive_partitioning = true,
                  hive_types = {{'epoch': BIGINT}})
            ),
            s1 AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY repo, path
                    ORDER BY commit DESC, lsn DESC) AS rn
                FROM ev WHERE epoch <= 1)
              WHERE rn = 1 AND op <> 'D'
            ),
            s2 AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY repo, path
                    ORDER BY commit DESC, lsn DESC) AS rn
                FROM ev WHERE epoch <= 3)
              WHERE rn = 1 AND op <> 'D'
            )
            SELECT coalesce(b.repo, a.repo) AS repo,
                   coalesce(b.path, a.path) AS path,
                   CASE WHEN b.repo IS NULL THEN a.commit ELSE b.commit END AS commit,
                   CASE WHEN b.repo IS NULL THEN a.lsn ELSE b.lsn END AS lsn,
                   CASE WHEN b.repo IS NULL THEN a.lang ELSE b.lang END AS lang,
                   CASE WHEN b.repo IS NULL THEN a.lang_variant
                        ELSE b.lang_variant END AS lang_variant,
                   sha256(CASE WHEN b.repo IS NULL THEN a.content
                               ELSE b.content END) AS content_sha256,
                   CASE WHEN a.repo IS NULL THEN 'insert'
                        WHEN b.repo IS NULL THEN 'delete'
                        WHEN a.commit <> b.commit THEN 'update'
                   END AS _change_type
            FROM s1 a FULL OUTER JOIN s2 b
              ON a.repo = b.repo AND a.path = b.path
            WHERE a.repo IS NULL OR b.repo IS NULL OR a.commit <> b.commit
        """,
        # streaming change-feed source: the oracle rebuilds EVERY
        # commit's per-key diff from the raw log — winner state after
        # each epoch, full-outer joined to the state one epoch before
        # (b.as_of = a.as_of + 1); unmatched b at epoch 0 is the
        # initial-snapshot replay, unmatched a (below the last epoch)
        # is a delete. Winners are unique per (commit, lsn), so update
        # detection on those two columns equals the engine's full-
        # payload fingerprint. _commit_version = epoch + 1 (create=v0).
        "cdc_change_feed_stream": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true, hive_partitioning = true,
                  hive_types = {{'epoch': BIGINT}})
            ),
            eps AS (SELECT DISTINCT epoch FROM ev),
            state AS (
              SELECT * FROM (
                SELECT ep.epoch AS as_of, e.*,
                       row_number() OVER (PARTITION BY ep.epoch, e.repo, e.path
                           ORDER BY e.commit DESC, e.lsn DESC) AS rn
                FROM eps ep JOIN ev e ON e.epoch <= ep.epoch)
              WHERE rn = 1 AND op <> 'D'
            ),
            mx AS (SELECT max(epoch) AS m FROM ev)
            SELECT coalesce(b.repo, a.repo) AS repo,
                   coalesce(b.path, a.path) AS path,
                   CASE WHEN b.repo IS NULL THEN a.commit ELSE b.commit END AS commit,
                   CASE WHEN b.repo IS NULL THEN a.lsn ELSE b.lsn END AS lsn,
                   CASE WHEN b.repo IS NULL THEN a.lang ELSE b.lang END AS lang,
                   CASE WHEN b.repo IS NULL THEN a.lang_variant
                        ELSE b.lang_variant END AS lang_variant,
                   sha256(CASE WHEN b.repo IS NULL THEN a.content
                               ELSE b.content END) AS content_sha256,
                   CASE WHEN a.repo IS NULL THEN 'insert'
                        WHEN b.repo IS NULL THEN 'delete'
                        ELSE 'update' END AS _change_type,
                   (coalesce(b.as_of, a.as_of + 1) + 1)::BIGINT AS _commit_version
            FROM (SELECT s.* FROM state s, mx WHERE s.as_of < mx.m) a
            FULL OUTER JOIN state b
              ON a.repo = b.repo AND a.path = b.path AND b.as_of = a.as_of + 1
            WHERE a.repo IS NULL OR b.repo IS NULL
               OR a.commit <> b.commit OR a.lsn <> b.lsn
        """,
        "cdc_lineage_metrics": f"""
            WITH ev AS (
              SELECT * FROM read_parquet(
                  '{_REPLAY_ROOT}/events/epoch=*/*.parquet',
                  union_by_name = true, hive_partitioning = true,
                  hive_types = {{'epoch': BIGINT}})
            ),
            per_epoch AS (
              SELECT epoch,
                     count(*)::BIGINT AS n_events,
                     sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)::BIGINT AS n_deletes,
                     min(lsn) AS min_lsn,
                     max(lsn) AS max_lsn,
                     sum(coalesce(strlen(content), 0))::BIGINT AS bytes_in,
                     count(DISTINCT (repo, path))::BIGINT AS n_keys_after_dedup
              FROM ev GROUP BY epoch
            ),
            cume AS (
              SELECT ep.epoch, e.repo, e.path, e.op,
                     row_number() OVER (PARTITION BY ep.epoch, e.repo, e.path
                                        ORDER BY e.commit DESC, e.lsn DESC) AS rn
              FROM (SELECT DISTINCT epoch FROM ev) ep
              JOIN ev e ON e.epoch <= ep.epoch
            ),
            live AS (
              SELECT epoch, count(*)::BIGINT AS rows_after_merge
              FROM cume WHERE rn = 1 AND op <> 'D' GROUP BY epoch
            )
            SELECT p.epoch, p.n_events, p.n_deletes, p.min_lsn, p.max_lsn,
                   p.bytes_in, p.n_keys_after_dedup, l.rows_after_merge
            FROM per_epoch p JOIN live l ON p.epoch = l.epoch
        """,
        "dx_substr_pad_replace": """
            SELECT p_partkey,
                   substr(p_name, 3, 8) AS sub_name,
                   lpad(p_brand, 12, '*') AS pad_brand,
                   'XYZ' || substr(p_type, 4) AS rep_type
            FROM part
        """,
        "dx_filter_null_rules": """
            WITH t AS (SELECT nullif(c_mktsegment, 'BUILDING') AS x FROM customer)
            SELECT count(*) AS total,
                   sum(CASE WHEN NOT coalesce(x > 'F', FALSE) THEN 1 ELSE 0 END)::BIGINT AS kept_gt,
                   sum(CASE WHEN NOT (CASE WHEN x IS NULL THEN TRUE ELSE x = 'null' END) THEN 1 ELSE 0 END)::BIGINT AS kept_eq_null,
                   sum(CASE WHEN NOT (CASE WHEN x IS NULL THEN FALSE ELSE x <> 'null' END) THEN 1 ELSE 0 END)::BIGINT AS kept_ne_null,
                   sum(CASE WHEN NOT coalesce(regexp_matches(x, '^(?:M.*)$'), FALSE) THEN 1 ELSE 0 END)::BIGINT AS kept_like,
                   sum(CASE WHEN coalesce(regexp_matches(x, '^(?:M.*)$'), FALSE) THEN 1 ELSE 0 END)::BIGINT AS kept_not_like
            FROM t
        """,
        "dx_json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "dx_encryption_roundtrip": """
            SELECT count(*) AS total, count(*) AS n_roundtrip_ok FROM part
        """,
        # FNV-1a-63 recurrence replicated in HUGEINT arithmetic (the
        # mask & 0x7FFF... == mod 2^63); texts are ASCII so per-char
        # codes equal utf-8 bytes.
        "doc_fingerprint": """
            SELECT doc_id,
                   list_reduce(
                       list_prepend(1469598103934665603::HUGEINT,
                           list_transform(range(1, strlen(text) + 1),
                                          i -> ascii(substr(text, i, 1))::HUGEINT)),
                       (h, c) -> (xor(h, c) * 1099511628211) % 9223372036854775808
                   )::BIGINT AS fingerprint
            FROM documents
        """,
        "range_split_scan": """
            SELECT least(((l_orderkey - mn) * 8) // (mx - mn + 1), 7) AS bucket,
                   count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem,
                 (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem)
            GROUP BY 1
        """,
        "quantile_split_scan": """
            WITH pts AS (
              SELECT list_sort(list_distinct(list(p))) AS ps FROM (
                SELECT o_totalprice AS p FROM (
                  SELECT o_totalprice,
                         row_number() OVER (ORDER BY o_totalprice) AS rn
                  FROM orders)
                WHERE rn IN (SELECT (i * (SELECT count(*) FROM orders)) // 8
                             FROM range(1, 8) t(i))
              )
            )
            SELECT len(list_filter(ps, p -> p <= o_totalprice))::INT AS bucket,
                   count(*) AS n_rows,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders, pts
            GROUP BY 1
        """,
        "string_pk_split": """
            WITH b AS (
              SELECT c_name,
                     list_reduce(
                         list_prepend(0::HUGEINT,
                             list_transform(range(1, len(c_name) + 1),
                                            i -> ascii(substr(c_name, i, 1))::HUGEINT)),
                         (a, x) -> a * 128 + x) AS v
              FROM customer
            ),
            mm AS (SELECT min(v) AS l, max(v) AS r FROM b),
            pts AS (
              SELECT list_transform(range(1, 8),
                         i -> l + i * ((r - l) // 8) + least(i::HUGEINT, (r - l) % 8)) AS ps
              FROM mm
            )
            SELECT len(list_filter(ps, p -> p <= v))::INT AS bucket,
                   count(*) AS n_rows,
                   min(c_name) AS min_name,
                   max(c_name) AS max_name
            FROM b, pts
            GROUP BY 1
        """,
        "hot_key_salted_agg": """
            SELECT event_type, count(*) AS records,
                   round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_value
            FROM events GROUP BY event_type
        """,
        "dirty_data_split": """
            WITH t AS (SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
                                   THEN 1 ELSE 0 END AS dirty FROM events)
            SELECT count(*) AS total_records,
                   sum(dirty)::BIGINT AS dirty_records,
                   round(sum(dirty)::DOUBLE / count(*), 6) AS dirty_pct,
                   CAST(sum(dirty) > 500 AS INT) AS exceeds_record_limit,
                   CAST((sum(dirty) / count(*)) > 0.05 AS INT) AS exceeds_pct_limit
            FROM t
        """,
        "speed_metrics": """
            SELECT event_type, count(*) AS records,
                   sum(strlen(props))::BIGINT AS bytes_props,
                   round(avg(value), 4) AS avg_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "schema_evolution_union": """
            SELECT doc_id, lang, NULL AS source FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "region_revenue": """
            SELECT r_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "window_topk_orders": """
            SELECT o_custkey, o_orderkey, rnk::INT AS rnk, round(o_totalprice, 2) AS totalprice
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) rnk
                  FROM orders)
            WHERE rnk <= 3
        """,
        "event_sessionization": """
            WITH g AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(floor(epoch(ts))::BIGINT) OVER w IS NULL
                            OR floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w > 1800
                          THEN 1 ELSE 0 END AS start
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, (sum(start) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))::BIGINT AS session_id
              FROM g
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(event_id) AS first_event_id,
                   max(event_id) AS last_event_id,
                   round(sum(value), 4) AS session_value
            FROM s GROUP BY user_id, session_id
        """,
        # as-of join: DuckDB's native ASOF LEFT JOIN is the oracle —
        # largest purchase ts <= click ts per user, inclusive
        "event_asof_enrich": """
            WITH clicks AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, value
              FROM events WHERE event_type = 'click'
            ),
            purchases AS (
              SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                     event_id AS last_purchase_event_id,
                     value AS last_purchase_value
              FROM events WHERE event_type = 'purchase'
            )
            SELECT c.event_id, c.user_id, c.ts_sec, c.value,
                   p.last_purchase_event_id, p.last_purchase_value
            FROM clicks c ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND c.ts_sec >= p.ts_sec
        """,
        "event_lag_delta": """
            SELECT user_id, event_id,
                   floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w AS gap_sec,
                   round(value - lag(value) OVER w, 4) AS value_delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "orders_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "price_percentiles": """
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   round(quantile_cont(o_totalprice, 0.95), 4) AS p95
            FROM orders GROUP BY o_orderpriority
        """,
        "customer_set_ops": """
            SELECT c_custkey, 'no_urgent' AS tag FROM (
              SELECT c_custkey FROM customer
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
            UNION ALL
            SELECT c_custkey, 'has_f' AS tag FROM (
              SELECT c_custkey FROM customer
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_dups,
                   len(text)::INT AS text_len
            FROM documents GROUP BY text
        """,
        "ngram_jaccard_pairs": """
            WITH d AS (SELECT doc_id, source,
                              list_distinct(list_transform(
                                  range(1, greatest(len(text) - 4, 0) + 1),
                                  i -> substr(text, i, 5))) AS sh
                       FROM documents),
                 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              len(list_intersect(a.sh, b.sh)) AS i,
                              len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
                       FROM d a JOIN d b
                         ON a.source = b.source AND a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   round(CASE WHEN u = 0 THEN 0.0 ELSE i / u::DOUBLE END, 4) AS jaccard_r
            FROM p
            WHERE (CASE WHEN u = 0 THEN 0.0 ELSE i / u::DOUBLE END) >= 0.2
        """,
        "minhash_lsh_pairs": """
            WITH t AS (SELECT doc_id,
                              list_filter(string_split_regex(text, '\\s+'),
                                          x -> len(x) > 0) AS toks
                       FROM documents),
                 d AS (SELECT doc_id,
                              list_distinct(list_transform(
                                  range(1, greatest(len(toks) - 2, 0) + 1),
                                  i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS sh
                       FROM t),
                 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              len(list_intersect(a.sh, b.sh)) AS i,
                              len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS u
                       FROM d a JOIN d b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   round(CASE WHEN u = 0 THEN 0.0 ELSE i / u::DOUBLE END, 4) AS jaccard_r
            FROM p
            WHERE (CASE WHEN u = 0 THEN 0.0 ELSE i / u::DOUBLE END) >= 0.5
        """,
        "embedding_cosine_topk": f"""
            SELECT vec_id,
                   round(list_cosine_similarity(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       {_QV}), 4) AS cosine_r
            FROM embeddings
            ORDER BY cosine_r DESC, vec_id ASC
            LIMIT 10
        """,
        "embedding_near_dup": """
            WITH v AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 4) AS cosine_r
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.35
        """,
        "text_quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                     {_NTOK_SQL} AS n_tokens,
                     CASE WHEN len(text) = 0 THEN 0.0
                          ELSE len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / len(text)::DOUBLE
                     END AS alpha,
                     {_EN_HITS_SQL} AS hits
              FROM documents)
            SELECT doc_id, n_tokens,
                   round(alpha, 4) AS alpha_r,
                   round((
                       (CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END)
                     + alpha
                     + least(hits / greatest(n_tokens, 1)::DOUBLE * 10.0, 1.0)
                   ) / 3.0, 6) AS quality
            FROM t
        """,
        # PII scrub: same regex chain (Java-and-RE2 subset), 'g' flag =
        # Spark's replace-all; placeholder counts by length arithmetic
        "pii_scrub_docs": r"""
            WITH s AS (
              SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  text || ' contact u' || doc_id
                       || '@example.com at 10.2.3.4 or +1 415-555-01'
                       || CAST(doc_id % 100 AS VARCHAR),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                  '\b\d(?:[ -]?\d){12,18}\b', '<CARD>', 'g'),
                  '(?:\+|\b)\d(?:[ ()-]?\d){6,11}\b', '<PHONE>', 'g') AS s
              FROM documents
            )
            SELECT doc_id, sha256(s) AS scrubbed_sha,
              CAST((length(s) - length(replace(s, '<EMAIL>', ''))) / 7
                   AS BIGINT) AS n_email,
              CAST((length(s) - length(replace(s, '<IP>', ''))) / 4
                   AS BIGINT) AS n_ip,
              CAST((length(s) - length(replace(s, '<PHONE>', ''))) / 7
                   AS BIGINT) AS n_phone
            FROM s
        """,
        # repetition stats: identical integer inputs -> identical IEEE
        # doubles in both engines, no rounding needed
        "doc_repetition_stats": r"""
            SELECT doc_id,
              CASE WHEN len(string_split(text, chr(10))) <= 1 THEN 0.0
                   ELSE (len(string_split(text, chr(10)))
                         - len(list_distinct(string_split(text, chr(10)))))
                        * 1.0 / len(string_split(text, chr(10)))
              END AS dup_line_frac,
              CASE WHEN len(string_split_regex(trim(text), '\s+')) <= 1
                   THEN 0.0
                   ELSE (len(string_split_regex(trim(text), '\s+'))
                         - len(list_distinct(
                               string_split_regex(trim(text), '\s+'))))
                        * 1.0 / len(string_split_regex(trim(text), '\s+'))
              END AS dup_word_frac
              FROM documents
        """,
        "lang_id_markers": f"""
            SELECT doc_id, lang,
                   {_EN_HITS_SQL} AS en_hits,
                   CASE WHEN {_EN_HITS_SQL} >= 2 THEN 'en' ELSE 'other' END AS lang_guess
            FROM documents
        """,
        "token_count_bpeish": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens
            FROM documents
        """,
        "multimodal_features": """
            SELECT doc_id,
                   strlen(text) AS n_bytes,
                   (strlen(text) % 640) + 1 AS width,
                   (strlen(text) % 480) + 1 AS height,
                   'RGB' AS mode
            FROM documents
        """,
        "audio_features": """
            SELECT doc_id,
                   strlen(text) AS n_bytes,
                   16000::BIGINT AS sample_rate,
                   ((strlen(text) // 2) * 1000) // 16000 AS duration_ms,
                   1::BIGINT AS channels
            FROM documents
        """,
    }
