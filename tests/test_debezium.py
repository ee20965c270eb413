"""Debezium envelope normalization (sources/debezium.py): the public
CDC wire format -> the engine's flat event rows, as a stateless
JVM-side projection (reference shape: otsstreamreader's op-typed
change records, MultiVerModeRecordSender.java:83-121)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.fixtures.changelog import ChangelogSpec, write_events
from datax_spark.sources.debezium import normalize_debezium, wrap_debezium

ROW_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

ROWS = [
    ("r1", "a.py", "c001", 1, "python", "print(1)", "I"),
    ("r1", "a.py", "c002", 2, "python", "print(2)", "U"),
    ("r1", "b.py", "c003", 3, None, None, "D"),  # delete: nulled payload
    ("r2", "c.go", "c004", 4, "go", "package main", "U"),
]


EVENT_SCHEMA = T.StructType(
    ROW_SCHEMA.fields + [T.StructField("op", T.StringType())]
)


def _events(spark):
    return spark.createDataFrame(ROWS, EVENT_SCHEMA)


def _sorted_pdf(df):
    return (
        df.toPandas()
        .sort_values(["repo", "path", "lsn"])
        .reset_index(drop=True)
    )


def test_round_trip_bare_and_connect_wrapped(spark):
    ev = _events(spark)
    for wrapper in (False, True):
        wire = wrap_debezium(ev, connect_wrapper=wrapper)
        got = normalize_debezium(wire, ROW_SCHEMA)
        assert _sorted_pdf(got[ev.columns]).equals(_sorted_pdf(ev))


def test_mixed_wrapped_and_bare_in_one_batch(spark):
    ev = _events(spark)
    wire = wrap_debezium(ev.limit(2)).union(
        wrap_debezium(ev.subtract(ev.limit(2)), connect_wrapper=True)
    )
    got = normalize_debezium(wire, ROW_SCHEMA)
    assert _sorted_pdf(got[ev.columns]).equals(_sorted_pdf(ev))


def test_tombstones_snapshot_reads_and_garbage(spark):
    ev = _events(spark).filter("op = 'U'")
    wire = wrap_debezium(ev)
    # snapshot-read op 'r' maps to I; tombstone + garbage drop out
    r_row = wire.select(
        F.regexp_replace("value", '"op":"u"', '"op":"r"').alias("value")
    ).limit(1)
    noise = spark.createDataFrame(
        [(None,), ("not json",), ('{"op":"x"}',)], "value string"
    )
    got = normalize_debezium(wire.union(r_row).union(noise), ROW_SCHEMA)
    ops = {r.op for r in got.select("op").distinct().collect()}
    assert ops == {"U", "I"}
    assert got.count() == ev.count() + 1


def test_source_metadata_projection(spark):
    wire = wrap_debezium(_events(spark))
    got = normalize_debezium(
        wire, ROW_SCHEMA, source_cols={"_wal_lsn": "lsn", "_tbl": "table"}
    )
    rows = got.select("lsn", "_wal_lsn", "_tbl").collect()
    assert all(r.lsn == r._wal_lsn and r._tbl == "events" for r in rows)


def test_op_col_collision_raises(spark):
    with pytest.raises(ValueError, match="op_col"):
        normalize_debezium(
            wrap_debezium(_events(spark)), ROW_SCHEMA, op_col="lsn"
        )


def test_streaming_normalize_equals_batch(spark, tmp_path):
    """The projection is stateless: readStream over envelope JSON
    files must produce exactly the batch result."""
    ev = _events(spark)
    wire_dir = str(tmp_path / "wire")
    wrap_debezium(ev).write.mode("overwrite").parquet(wire_dir)
    want = _sorted_pdf(normalize_debezium(spark.read.parquet(wire_dir), ROW_SCHEMA))

    stream = spark.readStream.schema("value string").parquet(wire_dir)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    (
        normalize_debezium(stream, ROW_SCHEMA)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = _sorted_pdf(spark.read.parquet(out_dir))
    assert got[want.columns.tolist()].equals(want)


def test_fixture_changelog_survives_the_wire(spark, tmp_path):
    """End-to-end over the real fixture (nulled D payloads, schema
    evolution mid-stream): engine events -> debezium wire -> normalize
    must be the identity on every column including the evolved one."""
    root = str(tmp_path / "events")
    spec = ChangelogSpec(
        n_events=4_000, events_per_epoch=1_000, evolve_from_epoch=2, seed=7
    )
    write_events(spark, spec, root)
    ev = spark.read.option("mergeSchema", "true").parquet(root)
    row_schema = T.StructType([f for f in ev.schema.fields if f.name != "op"])
    wire = wrap_debezium(ev)
    got = normalize_debezium(wire, row_schema)
    cols = ["repo", "path", "commit", "lsn", "lang", "lang_variant", "op", "epoch"]
    a = (
        got.withColumn("sha", F.sha2("content", 256))
        .select(*cols, "sha")
        .toPandas()
        .sort_values(["lsn"])
        .reset_index(drop=True)
    )
    b = (
        ev.withColumn("sha", F.sha2("content", 256))
        .select(*cols, "sha")
        .toPandas()
        .sort_values(["lsn"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_rejects_complement_partition(spark):
    """Every input value lands in exactly one of: normalized events,
    rejects, or provable tombstones — the wire-boundary dirty-data
    accounting (ErrorRecordChecker analog)."""
    from datax_spark.sources.debezium import debezium_rejects

    ev = _events(spark)
    wire = wrap_debezium(ev)
    noise = spark.createDataFrame(
        [(None,), ("",), ("   ",), ("not json",), ('{"op":"x"}',),
         ('{"payload": {"op": "zz"}}',)],
        "value string",
    )
    allv = wire.union(noise)
    good = normalize_debezium(allv, ROW_SCHEMA)
    bad = debezium_rejects(allv, ROW_SCHEMA)
    n_tomb = 3  # None, "", whitespace
    assert good.count() == ev.count()
    assert bad.count() == allv.count() - ev.count() - n_tomb
    raw_ops = {r.raw_op for r in bad.collect()}
    assert raw_ops == {None, "x", "zz"}
