"""Per-file key bloom filters (Delta bloom-filter-index analog):
commit-time harvest, equality/IN file skipping beyond min/max bounds,
never-skip-a-match safety, sharded-manifest round-trip, rebucket /
rollback carry-through, and the engine/lookup integration."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from datax_spark.lake import LakeTable, merge_into
from datax_spark.lake.table import (
    _bloom_encode,
    _bloom_may_match,
    harvest_file_blooms,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("content", T.StringType()),
    ]
)


def _upserts(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], "U", r[2], r[3]) for r in rows],
        "repo string, path string, op string, lsn long, content string",
    ).select("repo", "path", "op", "lsn", "content")


def _write_interleaved_bucket(root, bucket, parts):
    """Write several files into one bucket whose key sets interleave:
    every file spans the full [min, max] key range, so min/max stats
    can never distinguish them — only a bloom can."""
    d = os.path.join(root, "data", f"manual-b{bucket}")
    os.makedirs(d, exist_ok=True)
    paths = []
    for i, rows in enumerate(parts):
        p = os.path.join(d, f"part-{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "repo": [r[0] for r in rows],
                    "path": [r[1] for r in rows],
                    "lsn": pa.array([r[2] for r in rows], pa.int64()),
                    "content": [r[3] for r in rows],
                }
            ),
            p,
        )
        paths.append(p)
    return paths


def test_bloom_unit_roundtrip_and_unsupported_types(tmp_path):
    p = str(tmp_path / "one.parquet")
    pq.write_table(
        pa.table(
            {
                "k": ["a", "b", None, "z"],
                "n": pa.array([1, 2, 3, 4], pa.int64()),
                "f": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        ),
        p,
    )
    blooms = harvest_file_blooms([p], ["k", "n", "f", "absent"])
    got = blooms[p]
    # float column is un-encodable -> no bloom; absent column ignored
    assert set(got) == {"k", "n"}
    for present in ("a", "b", "z"):
        assert _bloom_may_match(got["k"], "=", present)
    assert not _bloom_may_match(got["k"], "=", "nope")
    assert _bloom_may_match(got["n"], "in", [99, 2])
    assert not _bloom_may_match(got["n"], "in", [99, 100])
    # type prefixes: int 1 in the bloom must not answer for string "1"
    assert not _bloom_may_match(got["n"], "=", "1")
    # non-equality ops and un-encodable probe values never consult it
    assert _bloom_may_match(got["k"], ">=", "a")
    assert _bloom_may_match(got["k"], "=", 1.5)
    assert _bloom_encode(True) is None and _bloom_encode(None) is None


def test_bloom_skips_files_minmax_cannot(spark, tmp_path):
    """Interleaved key populations: every file's [min, max] spans the
    whole range, so stats keep everything — the bloom still prunes to
    the one file holding the key, and results stay exact."""
    root = str(tmp_path / "t_bloom")
    t = LakeTable.create(
        spark, root, SCHEMA, ["repo", "path"],
        num_buckets=1, stats_cols=["path"], bloom_cols=["path"],
    )
    # one bucket, three files; file i holds keys path=k-<j> with
    # j % 3 == i, and every file carries both "k-000..." lows and
    # "k-099" highs so path bounds are useless
    all_rows = [("r", f"k-{j:03d}", j, f"c{j}") for j in range(90)]
    parts = [
        [r for j, r in enumerate(all_rows) if j % 3 == i] for i in range(3)
    ]
    paths = _write_interleaved_bucket(root, 0, parts)
    t.commit(
        replaced_buckets=[0],
        new_files={0: paths},
        new_row_counts={0: len(all_rows)},
    )
    m = t.manifest()
    rels = sorted(p for fs in m.files.values() for p in fs)
    assert sorted(m.file_blooms) == rels and len(rels) == 3
    # stats alone keep all 3 files (bounds overlap fully)...
    for p in rels:
        lo, hi, _ = m.file_stats[p]["path"]
        assert lo <= "k-002" <= hi
    # ...but the bloom narrows an equality probe to exactly 1 file
    kept, skipped = t.plan_files([("path", "=", "k-040")])
    assert len(kept) == 1 and len(skipped) == 2
    got = t.read(filters=[("path", "=", "k-040")]).collect()
    assert [(r.repo, r.path, r.lsn) for r in got] == [("r", "k-040", 40)]

    # never-skip-a-match: EVERY key still resolves to its exact row
    for j in range(90):
        key = f"k-{j:03d}"
        rows = t.read(filters=[("path", "=", key)]).collect()
        assert [(r.path, r.lsn) for r in rows] == [(key, j)]

    # IN list touching two residue classes keeps exactly those 2 files
    kept, skipped = t.plan_files([("path", "in", ["k-000", "k-001"])])
    assert len(kept) == 2 and len(skipped) == 1


def test_bloom_lookup_and_merge_path(spark, tmp_path):
    """Through the real merge write path: lookup()'s IN pushdown uses
    the blooms, results equal a bloomless twin on every key incl.
    deleted/absent ones."""
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    ta = LakeTable.create(
        spark, root_a, SCHEMA, ["repo", "path"], num_buckets=4,
        bloom_cols=["repo", "path"],
    )
    tb = LakeTable.create(spark, root_b, SCHEMA, ["repo", "path"], num_buckets=4)
    rows = [(f"r{i % 7}", f"p{i}", i, f"c{i}") for i in range(60)]
    for t in (ta, tb):
        merge_into(t, _upserts(spark, rows)).commit()
        upd = spark.createDataFrame(
            [("r1", "p1", "D", 1000, None), ("r2", "p2", "U", 1001, "new")],
            "repo string, path string, op string, lsn long, content string",
        )
        merge_into(t, upd).commit()
    assert ta.manifest().file_blooms and not tb.manifest().file_blooms
    probes = [("r1", "p1"), ("r2", "p2"), ("r3", "p3"), ("zz", "zz")]
    a = sorted(map(tuple, ta.lookup(probes).collect()))
    b = sorted(map(tuple, tb.lookup(probes).collect()))
    assert a == b and len(a) == 2  # p1 deleted, zz never existed


def test_bloom_sharded_manifest_and_rollback(spark, tmp_path):
    root = str(tmp_path / "t_shard")
    t = LakeTable.create(
        spark, root, SCHEMA, ["repo", "path"], num_buckets=8,
        bloom_cols=["path"], shard_buckets=2,
    )
    merge_into(t, _upserts(spark, [(f"r{i}", f"p{i}", i, "x") for i in range(40)])).commit()
    v1 = t.current_version()
    m = t.manifest()
    assert m.file_blooms  # survived the shard round-trip
    # snapshot file itself holds refs only — blooms live in shards
    with open(os.path.join(root, "_manifests", f"v{v1:08d}.json")) as fh:
        raw = json.load(fh)
    assert "file_blooms" not in raw and "shards" in raw
    kept, skipped = t.plan_files([("path", "=", "p7")])
    assert skipped and t.read(filters=[("path", "=", "p7")]).count() == 1

    # a second commit, then rollback: blooms follow the target snapshot
    merge_into(t, _upserts(spark, [("r7", "p7", 999, "hot")])).commit()
    t.rollback(v1)
    m2 = t.manifest()
    assert m2.file_blooms and sorted(m2.file_blooms) == sorted(m.file_blooms)
    got = t.read(filters=[("path", "=", "p7")]).collect()
    assert [(r.lsn,) for r in got] == [(7,)]


def test_bloom_rebucket_and_compact_reharvest(spark, tmp_path):
    root = str(tmp_path / "t_re")
    t = LakeTable.create(
        spark, root, SCHEMA, ["repo", "path"], num_buckets=2, bloom_cols=["path"],
    )
    merge_into(t, _upserts(spark, [(f"r{i}", f"p{i}", i, "x") for i in range(30)])).commit()
    t.rebucket(8)
    m = t.manifest()
    live = sorted(p for fs in m.files.values() for p in fs)
    assert sorted(m.file_blooms) == live
    assert t.read(filters=[("path", "=", "p11")]).count() == 1
    # an update makes the next compaction a real rewrite; commit()
    # re-harvests blooms for the rewritten files
    merge_into(t, _upserts(spark, [("r11", "p11", 999, "hot")])).commit()
    t.compact()
    m2 = t.manifest()
    live2 = sorted(p for fs in m2.files.values() for p in fs)
    assert sorted(m2.file_blooms) == live2
    got = t.read(filters=[("path", "=", "p11")]).collect()
    assert [(r.lsn,) for r in got] == [(999,)]


def test_bloom_engine_e2e_point_lookup(spark, tmp_path):
    """ReplayConfig.bloom_cols threads through the batch engine; the
    final table serves bloom-pruned point lookups that match a full
    scan filter."""
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures import ChangelogSpec, write_events

    events_root = str(tmp_path / "events")
    table_root = str(tmp_path / "table")
    metrics_root = str(tmp_path / "metrics")
    spec = ChangelogSpec(
        n_events=800, n_repos=6, paths_per_repo=30, events_per_epoch=400, seed=11
    )
    write_events(spark, spec, events_root)
    eng = ReplayEngine(
        spark,
        events_root=events_root,
        table_root=table_root,
        metrics_root=metrics_root,
        config=ReplayConfig(num_buckets=8, bloom_cols=("path",)),
    )
    eng.run()
    t = LakeTable.load(spark, table_root)
    m = t.manifest()
    assert m.bloom_cols == ["path"] and m.file_blooms
    sample = t.read().limit(5).collect()
    for r in sample:
        got = t.lookup([(r.repo, r.path)]).collect()
        assert len(got) == 1 and got[0].path == r.path


def test_bloom_cols_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="bloom_cols"):
        LakeTable.create(
            spark, str(tmp_path / "bad"), SCHEMA, ["repo", "path"],
            bloom_cols=["nope"],
        )
