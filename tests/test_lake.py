"""LakeTable format: create/commit/read, bucket pruning, schema
evolution on read, commit conflicts, vacuum."""

import os

import pyspark.sql.functions as F
import pytest

from datax_spark.lake import LakeTable, merge_into
from datax_spark.lake.table import CommitConflictError
from datax_spark.operators.schema_evolution import SchemaEvolutionError, evolve_schema
from pyspark.sql import types as T

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


def test_create_merge_read(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=8)
    pend = merge_into(t, _upserts(spark, [("r1", "a", 1, "x"), ("r2", "b", 2, "y")]))
    v = pend.commit(summary={"last_epoch": 0})
    assert v == 1 and t.last_epoch == 0 and t.total_rows() == 2

    # update one key, delete the other
    upd = spark.createDataFrame(
        [("r1", "a", "U", 3, "x2"), ("r2", "b", "D", 4, None)],
        "repo string, path string, op string, lsn long, content string",
    )
    merge_into(t, upd).commit(summary={"last_epoch": 1})
    rows = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert rows == {("r1", "a"): "x2"}

    # time travel: previous snapshot still readable
    old = {(r.repo, r.path) for r in t.read(version=1).collect()}
    assert old == {("r1", "a"), ("r2", "b")}


def test_bucket_pruning(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=16)
    rows = [(f"r{i}", f"p{i}", i, f"c{i}") for i in range(200)]
    merge_into(t, _upserts(spark, rows)).commit()
    m = t.manifest()
    some_bucket = int(next(iter(m.files)))
    pruned = t.read(buckets=[some_bucket])
    full = t.read()
    assert 0 < pruned.count() < full.count() == 200
    # merging a single key must replace only its bucket
    one = merge_into(t, _upserts(spark, [("r5", "p5", 999, "new")]))
    assert len(one.replaced_buckets) == 1


def test_schema_evolution_merge(spark, tmp_path):
    root = str(tmp_path / "t3")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=4)
    merge_into(t, _upserts(spark, [("r1", "a", 1, "x")])).commit()
    upd = spark.createDataFrame(
        [("r2", "b", "U", 2, "y", "py-v1")],
        "repo string, path string, op string, lsn long, content string, lang_variant string",
    )
    merge_into(t, upd).commit()
    got = {(r.repo, r.path): r.lang_variant for r in t.read().collect()}
    assert got == {("r1", "a"): None, ("r2", "b"): "py-v1"}  # old rows null-filled

    # non-additive change rejected
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(
            t.manifest().schema,
            T.StructType([T.StructField("lsn", T.StringType())]),
        )


def test_commit_conflict_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "t4")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=4)
    p1 = merge_into(t, _upserts(spark, [("r1", "a", 1, "x")]))
    p2 = merge_into(t, _upserts(spark, [("r1", "a", 2, "y")]))
    p1.commit()
    with pytest.raises(CommitConflictError):
        p2.commit()  # stale parent — optimistic concurrency
    removed = t.vacuum()
    assert removed  # p2's orphan files reclaimed
    assert {r.content for r in t.read().collect()} == {"x"}
