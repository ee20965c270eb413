"""hivewriter: staged INSERT INTO/OVERWRITE through the session catalog.

Reference flow (HiveWriter.java:42-256): spool the batch as a temp
table, run ``insert {into|overwrite} table <db>.<t> [partition(...)]
select * from <tmp> DISTRIBUTE BY rand()``, drop the temp table. Here
the staging is a temp view and the INSERT runs on Spark's catalog;
these tests assert the reference's mode semantics — into appends,
overwrite replaces, a static partition overwrite replaces only the
addressed partition — and that the temp view never leaks.
"""

from __future__ import annotations

import pytest

from datax_spark.sinks.writers import write_sink


@pytest.fixture()
def catalog_table(spark):
    spark.sql("drop table if exists default.hw_t")
    spark.sql("create table default.hw_t (id bigint, name string) using parquet")
    yield "hw_t"
    spark.sql("drop table if exists default.hw_t")


def _rows(spark, table="default.hw_t"):
    return sorted(
        (r["id"], r["name"]) for r in spark.sql(f"select * from {table}").collect()
    )


def test_insert_into_appends_then_overwrite_replaces(spark, catalog_table):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    write_sink(df1, "hivewriter",
               {"databaseName": "default", "tableName": "hw_t"})
    df2 = spark.createDataFrame([(3, "c")], "id long, name string")
    write_sink(df2, "hivewriter",
               {"databaseName": "default", "tableName": "hw_t",
                "writeMode": "insert"})
    assert _rows(spark) == [(1, "a"), (2, "b"), (3, "c")]

    df3 = spark.createDataFrame([(9, "z")], "id long, name string")
    write_sink(df3, "hivewriter",
               {"databaseName": "default", "tableName": "hw_t",
                "writeMode": "overwrite"})
    assert _rows(spark) == [(9, "z")]
    # post() parity: the staging view is dropped either way
    assert not [t for t in spark.catalog.listTables()
                if t.name.startswith("tmp_datax_hivewriter")]


def test_static_partition_overwrite_replaces_only_that_partition(spark):
    spark.sql("drop table if exists default.hw_p")
    spark.sql(
        "create table default.hw_p (id bigint) using parquet "
        "partitioned by (dt string)")
    try:
        for dt, ids in (("d1", [1, 2]), ("d2", [3])):
            df = spark.createDataFrame([(i,) for i in ids], "id long")
            write_sink(df, "hivewriter",
                       {"databaseName": "default", "tableName": "hw_p",
                        "partition": f"dt='{dt}'"})
        df = spark.createDataFrame([(7,)], "id long")
        write_sink(df, "hivewriter",
                   {"databaseName": "default", "tableName": "hw_p",
                    "partition": "dt='d1'", "writeMode": "overwrite"})
        got = sorted((r["id"], r["dt"]) for r in
                     spark.sql("select * from default.hw_p").collect())
        assert got == [(3, "d2"), (7, "d1")]  # d2 untouched
    finally:
        spark.sql("drop table if exists default.hw_p")


def test_column_subset_and_validation(spark, catalog_table):
    df = spark.createDataFrame(
        [(1, "a", "junk")], "id long, name string, extra string")
    write_sink(df, "hivewriter",
               {"databaseName": "default", "tableName": "hw_t",
                "column": ["id", "name"]})
    assert _rows(spark) == [(1, "a")]
    with pytest.raises(ValueError, match=r"\[databaseName\]"):
        write_sink(df, "hivewriter", {"tableName": "hw_t"})
    with pytest.raises(ValueError, match=r"\[tableName\]"):
        write_sink(df, "hivewriter", {"databaseName": "default"})
