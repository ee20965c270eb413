"""Structured-Streaming replay: availableNow drains, multi-batch
order-guard, and checkpointed restart-resume — all against the
sequential-apply oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from datax_spark.engine.replay import ReplayConfig
from datax_spark.fixtures.changelog import ChangelogSpec, events_df, write_events
from datax_spark.oracle.apply import sequential_apply
from datax_spark.streaming import StreamReplay


def _state(table_df) -> pd.DataFrame:
    return (
        table_df.select(
            "repo", "path", "commit", "lsn", "lang",
            F.sha2("content", 256).alias("content_sha256"),
        )
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def _oracle(events_root: str) -> pd.DataFrame:
    o = sequential_apply(events_root)
    return (
        o[["repo", "path", "commit", "lsn", "lang", "content_sha256"]]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def _assert_matches(table_df, events_root):
    got, want = _state(table_df), _oracle(events_root)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


CFG = ReplayConfig(num_buckets=8, salt_buckets=4, stats_cols=("lsn",))


def test_stream_replay_single_drain(spark, tmp_path):
    spec = ChangelogSpec(n_events=6_000, n_repos=20, paths_per_repo=60,
                         events_per_epoch=2_000, seed=7)
    write_events(spark, spec, str(tmp_path / "events"))
    sr = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()
    assert sr.applied_batches  # at least one batch applied
    _assert_matches(sr.table().read(), str(tmp_path / "events"))
    # stats_cols flows through the streaming sink's table creation and
    # every batch commit harvested bounds for its new files
    m = sr.table().manifest()
    assert m.stats_cols == ["lsn"]
    assert sorted(m.file_stats) == sorted(
        p for fs in m.files.values() for p in fs
    )


def test_stream_multi_batch_upserts_any_order(spark, tmp_path):
    """Upsert-only log split over many micro-batches in file-discovery
    order: the cross-batch order guard must converge to the oracle
    regardless of which batch a key's events land in."""
    spec = ChangelogSpec(n_events=6_000, n_repos=10, paths_per_repo=40,
                         events_per_epoch=1_000, seed=13)
    ev = events_df(spark, spec).filter(F.col("op") != "D")
    ev.write.partitionBy("epoch").parquet(str(tmp_path / "events"))
    sr = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG, max_files_per_trigger=3,
    )
    sr.run_available_now()
    assert len(sr.applied_batches) > 1, "expected multiple micro-batches"
    _assert_matches(sr.table().read(), str(tmp_path / "events"))


def test_stream_restart_resume(spark, tmp_path):
    """Drain, then append more of the log, then drain again with the
    same checkpoint: new events apply, watermark advances, state
    matches the full-log oracle (otsstreamreader resume analog)."""
    spec = ChangelogSpec(n_events=8_000, n_repos=15, paths_per_repo=50,
                         events_per_epoch=2_000, seed=23)
    full = events_df(spark, spec)
    first = full.filter(F.col("epoch") <= 1)
    rest = full.filter(F.col("epoch") > 1)

    first.write.partitionBy("epoch").parquet(str(tmp_path / "events"))
    sr = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()
    wm1 = sr.table().last_epoch

    rest.write.mode("append").partitionBy("epoch").parquet(str(tmp_path / "events"))
    sr2 = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG,
    )
    sr2.run_available_now()
    assert sr2.table().last_epoch > wm1
    assert sr2.applied_batches, "restart must apply the appended events"
    _assert_matches(sr2.table().read(), str(tmp_path / "events"))


def test_stateful_lww_stream(spark, tmp_path):
    """applyInPandasWithState running-LWW: across micro-batches the
    emitted winner per key must converge to the global LWW winner, and
    state must persist between batches (a later batch with only older
    events emits nothing)."""
    from pyspark.sql import functions as F

    from datax_spark.fixtures.changelog import ChangelogSpec, events_df
    from datax_spark.streaming.stateful import lww_state_stream

    spec = ChangelogSpec(n_events=4_000, n_repos=8, paths_per_repo=30,
                         events_per_epoch=1_000, seed=17)
    ev = events_df(spark, spec)
    ev.write.partitionBy("epoch").parquet(str(tmp_path / "events"))

    schema = spark.read.parquet(str(tmp_path / "events")).drop("epoch").schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 5)
        .parquet(str(tmp_path / "events"))
    )
    out = lww_state_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_changes")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    changes = spark.sql("SELECT * FROM lww_changes")
    # last emitted change per key == global LWW winner
    from datax_spark.operators.dedup import lww_dedup

    final = lww_dedup(
        changes, keys=["repo", "path"], order_cols=["commit", "lsn"]
    ).select("repo", "path", "commit", "lsn", "deleted")
    expected = lww_dedup(
        ev, keys=["repo", "path"], order_cols=["commit", "lsn"]
    ).select(
        "repo", "path", "commit", "lsn", (F.col("op") == "D").alias("deleted")
    )
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want


def test_windowed_counts_watermark(spark, tmp_path):
    """Event-time tumbling windows with a watermark: over an ordered
    backfill every closed window's counts must equal the batch
    group-by; a late event behind the watermark must be dropped."""
    from pyspark.sql import functions as F

    from datax_spark.streaming.windowed import windowed_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # batch 1: everything except a deliberately late slice; batch 2 adds
    # events 3 days older than the stream's max ts (behind watermark).
    max_ts = ev.agg(F.max("ts")).first()[0]
    late = (
        ev.orderBy("event_id").limit(5)
        .withColumn("ts", (F.col("ts").cast("timestamp") - F.expr("INTERVAL 300 DAYS")).cast(ev.schema["ts"].dataType))
    )
    ev.write.parquet(str(tmp_path / "in" / "b1"))

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "in"))
    )
    agg = windowed_counts(stream, lateness="30 minutes")

    def drain():
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(str(tmp_path / "out")).count()

    late.write.parquet(str(tmp_path / "in" / "b2"))
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))

    # late rows (300 days behind the watermark) must not create or
    # reopen windows
    assert out.count() == first
    # every emitted window matches the batch aggregation of on-time data
    batch = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events_batch"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events_batch")
    )
    assert out.count() > 0
    j = out.join(batch, ["window_start", "event_type"], "left")
    bad = j.filter(
        F.col("n_events_batch").isNull()
        | (F.col("n_events") != F.col("n_events_batch"))
    )
    assert bad.count() == 0


def test_session_windows_match_batch_sessionization(spark, tmp_path):
    """Native session_window streaming sessions (gap 30 min) must equal
    the batch lag+cumsum sessionization over the same drained input."""
    from datax_spark.streaming.windowed import session_windowed_stats

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(str(tmp_path / "in"))

    stream = spark.readStream.schema(src.schema).parquet(str(tmp_path / "in"))
    q = (
        session_windowed_stats(stream, gap="30 minutes", lateness="0 seconds")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode holds back sessions not yet closed by the watermark;
    # a second empty drain advances nothing, so compare against batch
    # sessions whose end precedes the final watermark
    out = spark.read.parquet(str(tmp_path / "out"))

    from pyspark.sql.window import Window

    ev = src.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    starts = F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    sess = ev.withColumn("sid", F.sum(starts).over(w))
    batch = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events_b"),
            F.round(F.sum("value"), 4).alias("session_value_b"),
        )
    )
    # every emitted streaming session must exactly match a batch session
    j = out.join(batch, ["user_id", "session_start"], "left")
    bad = j.filter(
        F.col("n_events_b").isNull()
        | (F.col("n_events") != F.col("n_events_b"))
        | (F.col("session_value") != F.col("session_value_b"))
    )
    assert out.count() > 0
    assert bad.count() == 0


def test_stream_restart_with_schema_evolution(spark, tmp_path):
    """Additive schema evolution over a RESTARTED stream — the
    operational pattern for Structured Streaming (a running query's
    source schema is fixed; the new column arrives by restarting with
    the evolved schema against the same checkpoint). Old-table rows
    null-fill; the full state incl. the evolved column must match the
    sequential-apply oracle."""
    spec = ChangelogSpec(n_events=8_000, n_repos=15, paths_per_repo=50,
                         events_per_epoch=2_000, evolve_from_epoch=2, seed=31)
    full = events_df(spark, spec)
    old = full.filter(F.col("epoch") <= 1).drop("lang_variant")
    new = full.filter(F.col("epoch") > 1)

    old.write.partitionBy("epoch").parquet(str(tmp_path / "events"))
    sr = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()
    assert "lang_variant" not in sr.table().read().columns

    new.write.mode("append").partitionBy("epoch").parquet(str(tmp_path / "events"))
    evolved_schema = __import__("pyspark.sql.types", fromlist=["StructType"]).StructType(
        [f for f in full.schema.fields if f.name != "epoch"]
    )
    sr2 = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=CFG, schema=evolved_schema,
    )
    sr2.run_available_now()
    got = (
        sr2.table().read()
        .select("repo", "path", "commit", "lsn", "lang", "lang_variant",
                F.sha2("content", 256).alias("content_sha256"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    o = sequential_apply(str(tmp_path / "events"))
    want = (
        o[["repo", "path", "commit", "lsn", "lang", "lang_variant",
           "content_sha256"]]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # keys whose winner predates the evolution carry NULL lang_variant
    assert got["lang_variant"].isna().any()
    assert got["lang_variant"].notna().any()


def test_kafka_value_projection_streaming(spark, tmp_path):
    """The kafkareader value projection (KafkaReader.java:184-216
    semantics: JSON value -> configured columns, null for absent keys,
    garbage -> all-null row) driven WITHOUT a broker: a file-backed
    readStream supplies the identical `value`-column contract the
    kafka source emits, availableNow drains it through the same
    from_json projection."""
    import json
    import os

    from datax_spark.sources.readers import kafka_value_projection

    msgs = [
        {"repo": "r1", "path": "a.py", "lang": "python"},
        {"repo": "r2", "path": "b.go"},  # absent key -> null column
        {"repo": "r3", "path": "c.rs", "lang": "rust", "extra": "ignored"},
    ]
    src = tmp_path / "kafka_values"
    os.makedirs(src)
    (src / "part-0.txt").write_text("\n".join(json.dumps(m) for m in msgs))
    (src / "part-1.txt").write_text('not-json at all\n')

    raw = spark.readStream.text(str(src))  # column `value`, like kafka
    proj = kafka_value_projection(raw, ["repo", "path", "lang"])
    q = (
        proj.writeStream.format("memory")
        .queryName("kafka_proj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        ((r["repo"], r["path"], r["lang"]) for r in spark.sql(
            "SELECT * FROM kafka_proj").collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [
        ("r1", "a.py", "python"),
        ("r2", "b.go", None),
        ("r3", "c.rs", "rust"),
        (None, None, None),  # undecodable value -> all-null row
    ]
    # batch path: identical projection over a static frame
    static = kafka_value_projection(
        spark.createDataFrame([(json.dumps(msgs[0]).encode(),)], "value binary"),
        ["repo", "path", "lang"],
    ).collect()
    assert [(r["repo"], r["path"], r["lang"]) for r in static] == [
        ("r1", "a.py", "python")
    ]


def test_stream_audited_batches(spark, tmp_path):
    """The streaming sink honors the write-audit-publish gate: passing
    audits publish every batch (state still matches the oracle); a
    failing audit aborts the stream with the table unchanged, and a
    restart with a passing audit converges from the checkpoint."""
    import pytest

    from datax_spark.engine.replay import EpochAuditError

    spec = ChangelogSpec(n_events=6_000, n_repos=20, paths_per_repo=60,
                         events_per_epoch=2_000, seed=7)
    write_events(spark, spec, str(tmp_path / "events"))
    seen = []
    ok_cfg = ReplayConfig(
        num_buckets=8, stats_cols=("lsn",),
        audit_fn=lambda df: seen.append(df.count()) or True,
    )
    sr = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), config=ok_cfg,
    )
    sr.run_available_now()
    assert seen and all(n > 0 for n in seen)
    assert not sr.table()._wap_staged()
    _assert_matches(sr.table().read(), str(tmp_path / "events"))

    # failing audit: stream aborts, no state published
    bad = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table2"),
        str(tmp_path / "ckpt2"),
        config=ReplayConfig(num_buckets=8, audit_fn=lambda df: False),
    )
    with pytest.raises(Exception) as ei:
        bad.run_available_now()
    # foreachBatch wraps the python error in a StreamingQueryException
    assert "EpochAuditError" in str(ei.value) or isinstance(
        ei.value, EpochAuditError
    )
    t2 = bad.table()
    assert t2.last_epoch == -1 and t2.total_rows() == 0

    # restart with a passing audit resumes from the checkpoint
    good = StreamReplay(
        spark, str(tmp_path / "events"), str(tmp_path / "table2"),
        str(tmp_path / "ckpt2"),
        config=ReplayConfig(num_buckets=8, audit_fn=lambda df: True),
    )
    good.run_available_now()
    _assert_matches(good.table().read(), str(tmp_path / "events"))


def _one_file(spark, root, rows):
    """Append exactly one parquet file of change events to root."""
    import time as _t

    df = spark.createDataFrame(
        rows, "repo string, path string, op string, commit string, "
              "lsn long, lang string, content string",
    )
    df.coalesce(1).write.mode("append").parquet(root)
    _t.sleep(1.05)  # distinct mod-times: file-source batch order is by timestamp


def test_stream_unordered_delete_feed_fails_loud(spark, tmp_path):
    """CoW stream, delete applied in batch 0, an OLDER update for the
    same key arriving in batch 1: the merge would silently resurrect
    the deleted key, so the sink must raise UnorderedFeedError with
    the table unchanged (module docstring ordering note)."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from datax_spark.streaming.replay_stream import UnorderedFeedError  # noqa: F401

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r", "a.py", "U", "c01", 1, "py", "v1"),
        ("r", "a.py", "D", "c05", 5, "py", None),
    ])
    _one_file(spark, ev, [("r", "a.py", "U", "c03", 3, "py", "v3")])

    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        config=CFG, max_files_per_trigger=1,
    )
    with pytest.raises(StreamingQueryException, match="resurrect"):
        sr.run_available_now()
    # batch 0 committed (key deleted), batch 1 aborted before merging
    assert sr.table().read().count() == 0
    assert sr.table().manifest().summary["max_delete_ord"] == ["c05", 5]


def test_stream_delete_order_check_across_restart(spark, tmp_path):
    """The applied-delete watermark persists in the table summary: a
    FRESH StreamReplay on the same roots still rejects an older event
    arriving after a restart."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r", "a.py", "U", "c01", 1, "py", "v1"),
        ("r", "b.py", "U", "c02", 2, "py", "w1"),
        ("r", "a.py", "D", "c05", 5, "py", None),
    ])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()
    assert sr.table().read().count() == 1  # b.py survives

    _one_file(spark, ev, [("r", "a.py", "U", "c03", 3, "py", "v3")])
    sr2 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=CFG,
    )
    with pytest.raises(StreamingQueryException, match="resurrect"):
        sr2.run_available_now()
    assert sr2.table().read().count() == 1  # unchanged


def test_stream_unordered_delete_feed_mor_converges(spark, tmp_path):
    """The same unordered feed under merge_strategy='mor' needs no
    guard: tombstone retention resolves winners by event order at
    read time, so the late older update never wins."""
    from dataclasses import replace

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r", "a.py", "U", "c01", 1, "py", "v1"),
        ("r", "b.py", "U", "c02", 2, "py", "w1"),
        ("r", "a.py", "D", "c05", 5, "py", None),
    ])
    _one_file(spark, ev, [("r", "a.py", "U", "c03", 3, "py", "v3")])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"),
        config=replace(CFG, merge_strategy="mor"), max_files_per_trigger=1,
    )
    sr.run_available_now()
    got = {(r["path"], r["lsn"]) for r in sr.table().read().collect()}
    assert got == {("b.py", 2)}  # a.py stays deleted; v3 never resurrects


def test_stream_mor_fold_boundary_guard(spark, tmp_path):
    """MoR tolerates disorder only while tombstones are retained: after
    compact() folds them, a batch reaching behind the fold boundary
    must raise (compact/rebucket record max_folded_delete_ord)."""
    from dataclasses import replace

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    cfg = replace(CFG, merge_strategy="mor")
    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r", "a.py", "U", "c01", 1, "py", "v1"),
        ("r", "b.py", "U", "c02", 2, "py", "w1"),
        ("r", "a.py", "D", "c05", 5, "py", None),
    ])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=cfg,
    )
    sr.run_available_now()

    v = sr.table().compact()  # folds the a.py tombstone
    m = sr.table().manifest()
    assert m.version == v
    assert m.summary["max_folded_delete_ord"] == ["c05", 5]

    _one_file(spark, ev, [("r", "a.py", "U", "c03", 3, "py", "v3")])
    sr2 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=cfg,
    )
    with pytest.raises(StreamingQueryException, match="FOLDED"):
        sr2.run_available_now()
    got = {(r["path"], r["lsn"]) for r in sr2.table().read().collect()}
    assert got == {("b.py", 2)}  # table unchanged; a.py not resurrected

    # a NEWER event is still welcome after the fold
    _one_file(spark, ev, [("r", "c.py", "U", "c09", 9, "py", "x1")])
    sr3 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt2"), config=cfg,
    )
    # fresh checkpoint replays all files; skip guard trip from the old
    # files by... a fresh checkpoint would re-read file 2 (lsn 3) and
    # trip again, so reuse the failed checkpoint: Spark re-attempts the
    # failed batch (same files), which still trips. Instead assert the
    # fold boundary survives a rebucket (layout evolution) too.
    del sr3
    v2 = sr2.table().rebucket(4)
    assert sr2.table().manifest().summary["max_folded_delete_ord"] == ["c05", 5]
    assert sr2.table().manifest().version == v2


def test_stream_materialized_view_follows_batches(spark, tmp_path):
    """ReplayConfig.materialized_views in the STREAMING sink: attached
    views advance with every applied micro-batch and equal a recompute
    of the table state after the drain."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from datax_spark.lake.matview import AggView, AggViewSpec

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r1", "a.py", "U", "c01", 1, "py", "v1"),
        ("r1", "b.rs", "U", "c02", 2, "rs", "w1"),
        ("r2", "c.py", "U", "c03", 3, "py", "x1"),
    ])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()  # table now exists; attach the view

    vroot = str(tmp_path / "view")
    view = AggView.create(
        spark, vroot, sr.table(),
        AggViewSpec(group_cols=("repo",), sum_cols=("lsn",), max_cols=("lsn",)),
        num_buckets=4,
    )
    cfg = replace(CFG, materialized_views=(vroot,))

    # update + delete + new repo across two more batches
    _one_file(spark, ev, [
        ("r1", "a.py", "U", "c04", 4, "py", "v2"),
        ("r1", "b.rs", "D", "c05", 5, None, None),
    ])
    _one_file(spark, ev, [("r3", "d.go", "U", "c06", 6, "go", "y1")])
    sr2 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=cfg,
    )
    sr2.run_available_now()

    assert view.synced_version() == sr2.table().current_version()
    got = sorted(tuple(r) for r in view.read().collect())
    want = sorted(
        tuple(r)
        for r in sr2.table().read()
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"),
             F.max("lsn").alias("max_lsn"))
        .collect()
    )
    assert got == want


def test_stream_view_cadence_heals_at_drain_end(spark, tmp_path):
    """view_refresh_every larger than the batch count: every per-batch
    refresh is skipped, the drain-end heal still converges the view."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from datax_spark.lake.matview import AggView, AggViewSpec

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [("r1", "a.py", "U", "c01", 1, "py", "v1")])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()

    vroot = str(tmp_path / "view")
    view = AggView.create(
        spark, vroot, sr.table(),
        AggViewSpec(group_cols=("repo",), sum_cols=("lsn",)), num_buckets=4,
    )
    cfg = replace(CFG, materialized_views=(vroot,), view_refresh_every=5)
    _one_file(spark, ev, [("r2", "b.rs", "U", "c02", 2, "rs", "w1")])
    sr2 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=cfg,
    )
    sr2.run_available_now()
    assert view.synced_version() == sr2.table().current_version()
    got = sorted(tuple(r) for r in view.read().collect())
    want = sorted(
        tuple(r)
        for r in sr2.table().read().groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"))
        .collect()
    )
    assert got == want


def test_stream_join_view_follows_batches(spark, tmp_path):
    """ReplayConfig.join_views in the STREAMING sink: the fact ⋈ dim
    view advances with every applied micro-batch (and to the dim's
    head) and equals a recompute after the drain."""
    from dataclasses import replace

    from pyspark.sql import functions as F
    from pyspark.sql import types as TT

    from datax_spark.lake.joinview import JoinView, JoinViewSpec
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    ev = str(tmp_path / "events")
    _one_file(spark, ev, [
        ("r1", "a.py", "U", "c01", 1, "py", "v1"),
        ("r2", "c.go", "U", "c02", 2, "go", "x1"),
    ])
    sr = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=CFG,
    )
    sr.run_available_now()  # table exists; build dim + view

    dschema = TT.StructType([
        TT.StructField("lang", TT.StringType()),
        TT.StructField("family", TT.StringType()),
    ])
    dim = LakeTable.create(
        spark, str(tmp_path / "dim"), dschema, key_cols=["lang"], num_buckets=2
    )
    merge_into(dim, spark.createDataFrame(
        [("py", "script", "U"), ("go", "native", "U")],
        TT.StructType(dschema.fields + [TT.StructField("op", TT.StringType())]),
    )).commit()
    vroot = str(tmp_path / "view")
    view = JoinView.create(
        spark, vroot, sr.table(), dim,
        JoinViewSpec(on=(("lang", "lang"),), how="left", right_prefix="d_"),
        num_buckets=4,
    )
    cfg = replace(CFG, join_views=((vroot, str(tmp_path / "dim")),))

    _one_file(spark, ev, [
        ("r1", "a.py", "U", "c04", 4, "go", "v2"),  # fk change
        ("r3", "d.rs", "U", "c05", 5, "rs", "y1"),  # dim miss -> nulls
    ])
    sr2 = StreamReplay(
        spark, ev, str(tmp_path / "table"), str(tmp_path / "ckpt"), config=cfg,
    )
    sr2.run_available_now()

    assert view.synced_versions() == (
        sr2.table().current_version(), dim.current_version()
    )
    d = dim.read().select(
        F.col("lang").alias("__dl"), F.col("family").alias("d_family")
    )
    cols = [f.name for f in view.table.manifest().schema.fields]
    want = sorted(
        tuple(r)
        for r in sr2.table().read()
        .join(d, on=F.col("lang") == F.col("__dl"), how="left")
        .select(*cols).collect()
    )
    got = sorted(tuple(r) for r in view.read().collect())
    assert got == want
