"""Declarative job spec: reader → dx_* chain → writer, dirty-data
limits, synthetic streamreader, write modes."""

import os

import pytest
from pyspark.sql import types as T

from datax_spark.jobspec import run_job
from datax_spark.sources.readers import jdbc_split_predicates

SF = "/root/testdata/sf0.001"


def test_parquet_to_parquet_with_chain(spark, tmp_path):
    out = str(tmp_path / "out")
    spec = {
        "reader": {
            "name": "parquetreader",
            "parameter": {
                "path": f"{SF}/lineitem.parquet",
                "column": ["l_orderkey", "l_returnflag", "l_quantity"],
                "where": "l_quantity > 10",
            },
        },
        "transformer": [
            {"name": "dx_filter", "column": "l_returnflag", "paras": ["like", "A"]},
        ],
        "writer": {"name": "parquetwriter", "parameter": {"path": out, "writeMode": "truncate"}},
    }
    res = run_job(spark, spec)
    back = spark.read.parquet(out)
    assert res.rows_written == back.count() > 0
    assert back.filter("l_returnflag = 'A'").count() == 0  # like 'A' rows dropped
    assert back.filter("l_quantity <= 10").count() == 0


def test_streamreader_generator(spark, tmp_path):
    out = str(tmp_path / "gen")
    spec = {
        "reader": {
            "name": "streamreader",
            "parameter": {
                "sliceRecordCount": 100,
                "column": [
                    {"name": "k", "type": "long", "random": [0, 9]},
                    {"name": "tag", "type": "string", "value": "fixed"},
                ],
            },
        },
        "writer": {"name": "parquetwriter", "parameter": {"path": out, "writeMode": "truncate"}},
    }
    res = run_job(spark, spec)
    back = spark.read.parquet(out)
    assert res.rows_written == 100
    assert back.filter("k < 0 or k > 9").count() == 0
    assert back.filter("tag != 'fixed'").count() == 0


def test_dirty_data_quarantine_and_limits(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("oops", "c")], "num string, tag string"
    ).write.parquet(src)
    qdir = str(tmp_path / "quarantine")
    spec = {
        "reader": {"name": "parquetreader", "parameter": {"path": src}},
        "writer": {"name": "parquetwriter", "parameter": {"path": str(tmp_path / "ok"), "writeMode": "truncate"}},
        "castSchema": T.StructType(
            [T.StructField("num", T.LongType()), T.StructField("tag", T.StringType())]
        ),
        "settings": {"errorLimit": {"record": 5}, "quarantinePath": qdir},
    }
    res = run_job(spark, spec)
    assert res.rows_written == 2 and res.rows_dirty == 1
    assert spark.read.parquet(qdir).collect()[0]["num"] == "oops"

    # record limit has priority (ErrorRecordChecker.java:18-82)
    spec["settings"] = {"errorLimit": {"record": 0}}
    spec["writer"]["parameter"]["path"] = str(tmp_path / "ok2")
    with pytest.raises(RuntimeError, match="record limit"):
        run_job(spark, spec)


def test_lakewriter_upsert(spark, tmp_path):
    lake = str(tmp_path / "lake")
    base = {
        "reader": {"name": "parquetreader", "parameter": {"path": f"{SF}/region.parquet"}},
        "writer": {
            "name": "lakewriter",
            "parameter": {"path": lake, "keys": ["r_regionkey"], "numBuckets": 4},
        },
    }
    r1 = run_job(spark, base)
    r2 = run_job(spark, base)  # idempotent upsert of identical rows
    assert r1.writer_stats["rows_after"] == r2.writer_stats["rows_after"] == 5


def test_write_mode_nonconflict(spark, tmp_path):
    out = str(tmp_path / "nc")
    spec = {
        "reader": {"name": "parquetreader", "parameter": {"path": f"{SF}/region.parquet"}},
        "writer": {"name": "parquetwriter", "parameter": {"path": out, "writeMode": "nonConflict"}},
    }
    run_job(spark, spec)
    with pytest.raises(Exception):
        run_job(spark, spec)  # target exists => fail (HdfsWriter nonConflict)


def test_jdbc_split_predicates():
    preds = jdbc_split_predicates("id", 0, 99, 4)
    assert preds[0] == "id >= 0 AND id < 25"
    assert preds[3] == "id >= 75 AND id <= 99"
    assert preds[-1] == "id IS NULL"  # NULL bucket never lost
    assert len(preds) == 5


def test_hivereader_sql(spark):
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView(
        "nation_v"
    )
    from datax_spark.sources.readers import read_source

    df = read_source(
        spark, "hivereader", {"sql": "SELECT n_regionkey, count(*) AS n FROM nation_v GROUP BY 1"}
    )
    assert df.count() == 5
