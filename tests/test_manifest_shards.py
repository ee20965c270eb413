"""Sharded manifest storage (the Iceberg manifest-list analog): with
``shard_buckets`` set, per-bucket metadata lives in content-addressed
shard files and a commit rewrites only the shards it touches. The
contract: a sharded table is observably IDENTICAL to an unsharded twin
fed the same batches — reads, lookups, change feed, time travel,
retention — while commit metadata cost drops from O(table) to
O(touched buckets)."""

import json
import os

import pyspark.sql.functions as F

from datax_spark.lake import LakeTable, merge_into
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("content", T.StringType()),
    ]
)
DDL = "repo string, path string, op string, lsn long, content string"


def _rows(df):
    return {tuple(r) for r in df.select("repo", "path", "lsn", "content").collect()}


def _batches():
    return [
        [(f"r{i}", f"p{j}", "U", i * 10 + j, f"c{i}{j}") for i in range(6) for j in range(4)],
        [("r1", "p1", "U", 100, "c11x"), ("r2", "p2", "D", 101, None)],
        [("r9", "p9", "U", 102, "new"), ("r3", "p3", "U", 103, "c33x")],
    ]


def _shard_files(root):
    mdir = os.path.join(root, "_manifests")
    return sorted(f for f in os.listdir(mdir) if f.startswith("shard-"))


def test_sharded_equals_unsharded_twin(spark, tmp_path):
    a = LakeTable.create(
        spark, str(tmp_path / "a"), SCHEMA, ["repo", "path"], num_buckets=16
    )
    b = LakeTable.create(
        spark, str(tmp_path / "b"), SCHEMA, ["repo", "path"], num_buckets=16,
        shard_buckets=4,
    )
    for batch in _batches():
        for t in (a, b):
            merge_into(t, spark.createDataFrame(batch, DDL)).commit()
    assert _rows(a.read()) == _rows(b.read())
    # snapshot files carry shard refs, not file lists
    raw = b._snapshot_raw(b.current_version())
    assert "shards" in raw and "files" not in raw
    # materialized manifests agree completely
    assert a.manifest().files.keys() == b.manifest().files.keys()
    assert a.manifest().row_counts == b.manifest().row_counts
    # time travel + change feed identical
    for v in (1, 2, 3):
        assert _rows(a.read(version=v)) == _rows(b.read(version=v))
        ca = {tuple(r) for r in a.changes(v - 1, v).collect()}
        cb = {tuple(r) for r in b.changes(v - 1, v).collect()}
        assert ca == cb
    # keyed lookup through the sharded metadata
    assert _rows(b.lookup([("r1", "p1")])) == {("r1", "p1", 100, "c11x")}


def test_commit_rewrites_only_touched_shards(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=64,
        shard_buckets=8,
    )
    big = [(f"r{i}", f"p{j}", "U", i * 100 + j, "x") for i in range(20) for j in range(10)]
    merge_into(t, spark.createDataFrame(big, DDL)).commit()
    raw1 = t._snapshot_raw(t.current_version())
    # one key -> one bucket -> ONE shard differs; the other 7 shard
    # references are carried from the parent byte-identically
    merge_into(t, spark.createDataFrame([("r1", "p1", "U", 9999, "y")], DDL)).commit()
    raw2 = t._snapshot_raw(t.current_version())
    diff = [si for si in raw2["shards"] if raw2["shards"][si] != raw1["shards"][si]]
    assert len(diff) == 1
    assert _rows(t.lookup([("r1", "p1")])) == {("r1", "p1", 9999, "y")}
    # MoR delta append: same single-shard metadata cost
    merge_into(
        t, spark.createDataFrame([("r1", "p1", "U", 10000, "z")], DDL), strategy="mor"
    ).commit()
    raw3 = t._snapshot_raw(t.current_version())
    diff = [si for si in raw3["shards"] if raw3["shards"][si] != raw2["shards"][si]]
    assert len(diff) == 1
    assert _rows(t.lookup([("r1", "p1")])) == {("r1", "p1", 10000, "z")}


def test_metadata_write_cost_is_o_touched(spark, tmp_path):
    """The scale property itself: per-commit metadata bytes written on
    a WIDE layout are ~constant for the sharded form (one shard + one
    small snapshot) but O(table) for the single-file form."""
    wide = LakeTable.create(
        spark, str(tmp_path / "w"), SCHEMA, ["repo", "path"], num_buckets=256,
        shard_buckets=16,
    )
    flat = LakeTable.create(
        spark, str(tmp_path / "f"), SCHEMA, ["repo", "path"], num_buckets=256
    )
    big = [
        (f"r{i}", f"p{j}", "U", i * 1000 + j, "x" * 10)
        for i in range(40)
        for j in range(25)
    ]
    for t in (wide, flat):
        merge_into(t, spark.createDataFrame(big, DDL)).commit()

    def commit_meta_bytes(t):
        mdir = t._manifest_dir()
        before = {f: os.path.getsize(os.path.join(mdir, f)) for f in os.listdir(mdir)}
        merge_into(
            t, spark.createDataFrame([("r1", "p1", "U", 999999, "y")], DDL)
        ).commit()
        return sum(
            os.path.getsize(os.path.join(mdir, f))
            for f in os.listdir(mdir)
            if f not in before and f != "_current"
        )

    sharded_bytes = commit_meta_bytes(wide)
    flat_bytes = commit_meta_bytes(flat)
    assert sharded_bytes * 3 < flat_bytes, (sharded_bytes, flat_bytes)
    assert _rows(wide.read()) == _rows(flat.read())


def test_vacuum_reclaims_orphan_shards(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=16,
        shard_buckets=4,
    )
    for batch in _batches():
        merge_into(t, spark.createDataFrame(batch, DDL)).commit()
    before = set(_shard_files(t.root))
    state = _rows(t.read())
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    after = set(_shard_files(t.root))
    assert after < before  # expired-only shards reclaimed
    assert any(os.path.basename(p).startswith("shard-") for p in removed)
    # live snapshot fully intact after retention
    assert _rows(t.read()) == state
    live = set(t._snapshot_raw(t.current_version())["shards"].values())
    assert live <= after


def test_replay_engine_with_sharded_manifests(spark, tmp_path):
    """The engine end-to-end on sharded metadata (incl. schema
    evolution and adaptive rebucket): final state equals the pandas
    oracle exactly as with single-file manifests."""
    from datax_spark.engine import ReplayConfig, ReplayEngine
    from datax_spark.fixtures import ChangelogSpec, write_events
    from datax_spark.oracle import sequential_apply

    root = str(tmp_path / "events")
    spec = ChangelogSpec(
        n_events=6_000, n_repos=20, paths_per_repo=50,
        events_per_epoch=2_000, evolve_from_epoch=2, seed=31,
    )
    write_events(spark, spec, root)
    eng = ReplayEngine(
        spark,
        root,
        str(tmp_path / "table"),
        str(tmp_path / "metrics"),
        ReplayConfig(
            num_buckets=4,
            shard_manifest_buckets=4,
            target_bucket_rows=200,
        ),
    )
    results = eng.run()
    assert any(r.rebucketed_to for r in results)
    assert "shards" in eng.table()._snapshot_raw(eng.table().current_version())
    cols = ["repo", "path", "commit", "lsn", "lang", "h", "lang_variant"]
    exp = sequential_apply(root).rename(columns={"content_sha256": "h"})
    got = (
        eng.table()
        .read()
        .withColumn("h", F.sha2("content", 256))
        .select(*cols)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert got.equals(exp[cols].reset_index(drop=True))


def test_streaming_change_feed_over_sharded_table(spark, tmp_path):
    from datax_spark.streaming.change_source import stream_changes

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=16,
        shard_buckets=4,
    )
    for batch in _batches():
        merge_into(t, spark.createDataFrame(batch, DDL)).commit()
    sink = []
    q = (
        stream_changes(spark, t.root, starting_version=1)
        .writeStream.foreachBatch(lambda df, bid: sink.append(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    got = [r for rows in sink for r in rows]
    by_commit = {}
    for r in got:
        by_commit.setdefault(r._commit_version, []).append(r)
    assert sorted(by_commit) == [1, 2, 3]
    for v, rows in by_commit.items():
        want = {tuple(r) for r in t.changes(v - 1, v).collect()}
        assert {tuple(r)[:-1] for r in rows} == want, f"v{v}"


def test_legacy_manifests_still_load(spark, tmp_path):
    """Pre-shard tables (single-file manifests, no shard_buckets key)
    keep loading byte-for-byte — the reader handles both forms."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], num_buckets=8
    )
    merge_into(t, spark.createDataFrame(_batches()[0], DDL)).commit()
    raw = t._snapshot_raw(t.current_version())
    assert "shards" not in raw and "files" in raw
    # simulate a manifest written before the shard_buckets field
    raw.pop("shard_buckets", None)
    with open(
        os.path.join(t._manifest_dir(), f"v{t.current_version():08d}.json"), "w"
    ) as fh:
        json.dump(raw, fh)
    assert t.manifest().shard_buckets is None
    assert len(_rows(t.read())) == 24
