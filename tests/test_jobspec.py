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


def test_jdbcwriter_presql_modes_postsql(spark, tmp_path):
    """jdbcwriter parity with CommonRdbmsWriter.java:91-165 /
    WriterUtil.java:113-170 against embedded Derby: preSql with @table
    templating, writeMode insert / replace (staged set-wise upsert),
    and postSql."""
    from datax_spark.sinks.writers import write_sink

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    base = {
        "jdbcUrl": url,
        "table": "people",
        "driver": "org.apache.derby.jdbc.EmbeddedDriver",
    }

    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    write_sink(df1, "jdbcwriter", {
        **base,
        "writeMode": "insert",
        "preSql": 'CREATE TABLE @table ("id" BIGINT, "v" VARCHAR(40))',
    })
    read = lambda t: (
        spark.read.format("jdbc").option("url", url).option("dbtable", t).load()
    )
    assert sorted((r["id"], r["v"]) for r in read("people").collect()) == [
        (1, "a"), (2, "b"),
    ]

    # replace: existing key 2 is replaced, new key 3 inserted; postSql
    # runs after the upsert (here: audit row with @table templating)
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "id bigint, v string")
    write_sink(df2, "jdbcwriter", {
        **base,
        "writeMode": "replace",
        "keys": ["id"],
        "preSql": 'CREATE TABLE audit ("note" VARCHAR(40))',
        "postSql": "INSERT INTO audit VALUES ('wrote @table')",
    })
    assert sorted((r["id"], r["v"]) for r in read("people").collect()) == [
        (1, "a"), (2, "B"), (3, "c"),
    ]
    assert read("audit").collect()[0]["note"] == "wrote people"
    # staging table dropped after the swap
    with pytest.raises(Exception):
        read("people_dx_stage").collect()

    # a batch carrying DUPLICATE conflict keys lands one row per key
    # (row-wise last-wins like REPLACE INTO; deterministic winner = max
    # over non-key columns) instead of inserting both staged duplicates
    df3 = spark.createDataFrame(
        [(4, "x"), (4, "y"), (1, "a2")], "id bigint, v string"
    )
    write_sink(df3, "jdbcwriter", {**base, "writeMode": "replace", "keys": ["id"]})
    assert sorted((r["id"], r["v"]) for r in read("people").collect()) == [
        (1, "a2"), (2, "B"), (3, "c"), (4, "y"),
    ]

    # writeMode=update without keys is a config error
    with pytest.raises(ValueError, match="keys"):
        write_sink(df2, "jdbcwriter", {**base, "writeMode": "update"})


def test_jdbcwriter_replace_string_key_column_types(spark, tmp_path):
    """String conflict keys need createTableColumnTypes on dialects
    that map StringType to a non-comparable type (Derby -> CLOB): the
    staged swap's equality predicate must run against VARCHAR."""
    from datax_spark.sinks.writers import write_sink

    url = f"jdbc:derby:{tmp_path}/sdb2;create=true"
    base = {
        "jdbcUrl": url, "table": "kv",
        "createTableColumnTypes": "uid VARCHAR(40), v BIGINT",
    }
    read = lambda: (
        spark.read.format("jdbc").option("url", url).option("dbtable", "kv").load()
    )
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], "uid string, v long")
    write_sink(df1, "jdbcwriter", {
        **base, "writeMode": "insert",
        "preSql": 'CREATE TABLE @table ("uid" VARCHAR(40), "v" BIGINT)',
    })
    df2 = spark.createDataFrame([("b", 20), ("c", 3)], "uid string, v long")
    write_sink(df2, "jdbcwriter", {**base, "writeMode": "replace", "keys": ["uid"]})
    assert sorted((r["uid"], r["v"]) for r in read().collect()) == [
        ("a", 1), ("b", 20), ("c", 3),
    ]


def test_jdbcreader_string_pk_predicate_split(spark, tmp_path):
    """End-to-end string-PK split over a real JDBC source: the
    predicates become one partition each (incl. the NULL bucket) and
    the union covers every row exactly once."""
    from datax_spark.sinks.writers import write_sink
    from datax_spark.sources.readers import read_source

    url = f"jdbc:derby:{tmp_path}/sdb;create=true"
    names = [(f"user_{i:04d}",) for i in range(97)]
    df = spark.createDataFrame(names, "uid string")
    # Derby maps Spark StringType to CLOB (not range-comparable); give
    # the PK a VARCHAR column via preSql as a real deployment would
    write_sink(df, "jdbcwriter", {
        "jdbcUrl": url, "table": "users", "writeMode": "insert",
        "preSql": 'CREATE TABLE @table ("uid" VARCHAR(40))',
    })

    got = read_source(spark, "jdbcreader", {
        "jdbcUrl": url,
        "table": "users",
        "splitPk": '"uid"',
        "lowerBound": "user_0000",
        "upperBound": "user_0096",
        "numPartitions": 4,
        "splitFactor": 1,
    })
    # up to 4 ranges + NULL bucket; control-char interior points are
    # dropped (slices merge) so the exact count varies with the bounds
    assert 2 <= got.rdd.getNumPartitions() <= 5

    # default splitFactor=5: a single-table splitPk job fans out 4*5
    # ranges (+ NULL bucket) to avoid starving channels (ReaderSplitUtil)
    wide = read_source(spark, "jdbcreader", {
        "jdbcUrl": url, "table": "users", "splitPk": '"uid"',
        "lowerBound": "user_0000", "upperBound": "user_0096",
        "numPartitions": 4,
    })
    assert got.rdd.getNumPartitions() < wide.rdd.getNumPartitions() <= 21
    assert wide.count() == 97
    assert got.count() == 97
    assert sorted(r["uid"] for r in got.collect()) == sorted(n[0] for n in names)


def test_bigint_split_points_remainder_spread():
    from datax_spark.sources.readers import bigint_split_points

    # gap 10 over 4 slices: widths differ by at most one, remainder
    # spread over the first slices (RangeSplitUtil.java:77-91)
    pts = bigint_split_points(0, 10, 4)
    assert pts[0] == 0 and pts[-1] == 10
    assert pts == sorted(pts) and len(pts) == 5
    widths = [b - a for a, b in zip(pts, pts[1:])]
    assert max(widths) - min(widths) <= 1
    # degenerate: gap smaller than slice count collapses (step==0 branch)
    assert bigint_split_points(5, 7, 8) == [5, 6, 7]
    assert bigint_split_points(3, 3, 4) == [3, 3]
    # swapped bounds are reordered like the reference
    assert bigint_split_points(10, 0, 4) == bigint_split_points(0, 10, 4)


def test_ascii_bignum_roundtrip():
    from datax_spark.sources.readers import (
        ascii_string_split_points,
        ascii_to_bignum,
        bignum_to_ascii,
    )

    for s in ["a", "Customer#000000042", "zz~", "\x01abc"]:
        assert bignum_to_ascii(ascii_to_bignum(s)).lstrip("\x00") == s.lstrip("\x00")
    with pytest.raises(ValueError):
        ascii_to_bignum("héllo")  # non-ASCII rejected (RangeSplitUtil.java:121)

    pts = ascii_string_split_points("Customer#000000001", "Customer#000001500", 8)
    assert pts[0] == "Customer#000000001" and pts[-1] == "Customer#000001500"
    assert len(pts) == 9
    assert pts == sorted(pts)  # equal-length ASCII: lexicographic == bignum order
    nums = [ascii_to_bignum(p) for p in pts]
    assert nums == sorted(nums)


def test_string_split_predicates_shape():
    from datax_spark.sources.readers import string_split_predicates

    preds = string_split_predicates("c_name", "Customer#000000001",
                                    "Customer#000001500", 4)
    # interior points carrying control chars are dropped (SQL-literal
    # safety), merging slices — but the chain always partitions. The
    # first/last slices are UNBOUNDED (bounds shape only the interior
    # points) so stale configured bounds can never silently drop rows
    # — same shape as Spark's numeric partitionColumn edges and
    # quantile_split_predicates; NULL bucket last.
    assert 2 <= len(preds) <= 5
    assert preds[0].startswith("c_name < '")
    assert preds[-2].startswith("c_name >= '")
    assert " AND " not in preds[0] and " AND " not in preds[-2]
    assert preds[-1] == "c_name IS NULL"
    for pred in preds[:-1]:
        assert all(" " <= ch <= "\x7e" for ch in pred)
    # single-point range: no interior points -> one unbounded slice
    single = string_split_predicates("k", "abc", "abc", 4, include_null_bucket=False)
    assert single == ["k IS NOT NULL"]
    # quote escaping (interior midpoint of a'b..a'z keeps the quote)
    q = string_split_predicates("k", "a'b", "a'z", 2, include_null_bucket=False)
    assert any("''" in s for s in q)


def test_string_split_keeps_out_of_bounds_rows(spark):
    """Keys OUTSIDE the configured [lower, upper] bounds land in the
    unbounded edge slices instead of being silently dropped (the
    numeric splitPk path has always behaved this way via Spark's
    partitionColumn; string predicates must match)."""
    import duckdb

    from datax_spark.sources.readers import string_split_predicates

    keys = ["aaa", "bbb", "mmm", "yyy", "zzz"]
    preds = string_split_predicates("k", "ccc", "xxx", 4)  # stale narrow bounds
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    matches = [
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0]
        for p in preds
    ]
    assert sum(matches) == len(keys)  # aaa/zzz kept despite the bounds


def test_string_split_partitions_cover_all_rows(spark):
    """Applying the generated predicates as filters over the customer
    table must partition it: every row in exactly one slice."""
    from datax_spark.sources.readers import string_split_predicates

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    mn, mx = cust.agg({"c_name": "min"}, ).collect()[0][0], \
        cust.agg({"c_name": "max"}).collect()[0][0]
    preds = string_split_predicates("c_name", mn, mx, 8)
    total = cust.count()
    counts = [cust.filter(p).count() for p in preds]
    assert sum(counts) == total
    assert counts[-1] == 0  # no NULL keys in testdata


def test_expand_table_conf():
    from datax_spark.sources.readers import expand_table_conf, plan_table_splits

    assert expand_table_conf("tb[0-2]") == ["tb0", "tb1", "tb2"]
    # zero-padding preserved when start is written with leading zeros
    assert expand_table_conf("tb[08-10]") == ["tb08", "tb09", "tb10"]
    # schema prefix + suffix + comma list + swapped bounds
    assert expand_table_conf("db.t[2-1]x, plain") == ["db.t1x", "db.t2x", "plain"]
    assert expand_table_conf(["a[0-1]", "b"]) == ["a0", "a1", "b"]
    # splitFactor: single table with splitPk fans out 5x; shards divide
    # the channel budget (ceil) with no factor (ReaderSplitUtil.java:62-77)
    assert plan_table_splits(1, 4, True) == 20
    assert plan_table_splits(1, 4, True, split_factor=3) == 12
    assert plan_table_splits(10, 4, True) == 1
    assert plan_table_splits(3, 8, False) == 3


def test_csvreader_gzip(spark, tmp_path):
    import gzip

    gz = tmp_path / "data.csv.gz"
    with gzip.open(gz, "wt") as f:
        f.write("1,alpha\n2,beta\n")
    from datax_spark.sources.readers import read_source

    df = read_source(spark, "csvreader", {"path": str(gz), "compress": "gzip"})
    assert df.count() == 2
    with pytest.raises(NotImplementedError, match="lzo"):
        read_source(spark, "csvreader", {"path": str(gz), "compress": "lzo"})


def test_csvreader_zstd_and_lz4_frames(spark, tmp_path):
    """compress=zstd / lz4 (r5): standard .zst / .lz4 frame files —
    what `zstd file.csv` / `lz4 file.csv` produce — decode through
    the repo's own RFC 8878 / LZ4-frame decoders (the Hadoop codecs
    need the absent native library), reference-compressed by the real
    CLIs, skipHeader per file."""
    import shutil as _shutil
    import subprocess as _sp

    from datax_spark.sources.readers import read_source

    body = "id,name\n1,alpha\n2,beta\n3,gamma\n"
    for tool, ext, compress in (("zstd", "zst", "zstd"),
                                ("lz4", "lz4", "lz4")):
        if _shutil.which(tool) is None:
            pytest.skip(f"no {tool} CLI on host")
        out = tmp_path / f"data_{ext}.csv.{ext}"
        comp = _sp.run([tool, "-c"], input=body.encode(),
                       capture_output=True).stdout
        out.write_bytes(comp)
        df = read_source(spark, "csvreader", {
            "path": str(out), "compress": compress, "skipHeader": True,
        })
        rows = sorted((r[0], r[1]) for r in df.collect())
        assert rows == [("1", "alpha"), ("2", "beta"), ("3", "gamma")]


def test_csvreader_zip_archives(spark, tmp_path):
    """compress=zip (r4): every member of each archive streams through
    the delimiter engine; skipHeader drops line 1 PER member (the
    reference's per-file semantics, DFSUtil's ZipCycleInputStream)."""
    import zipfile

    z1 = tmp_path / "a.zip"
    with zipfile.ZipFile(z1, "w") as zf:
        zf.writestr("one.csv", "id,name\n1,alpha\n2,beta\n")
        zf.writestr("sub/two.csv", "id,name\n3,gamma\n")
    z2 = tmp_path / "b.zip"
    with zipfile.ZipFile(z2, "w") as zf:
        zf.writestr("three.csv", "id,name\n4,delta\n")
    from datax_spark.sources.readers import read_source

    df = read_source(spark, "csvreader", {
        "path": [str(z1), str(z2)], "compress": "zip", "skipHeader": True,
    })
    got = sorted((r["_c0"], r["_c1"]) for r in df.collect())
    assert got == [("1", "alpha"), ("2", "beta"), ("3", "gamma"), ("4", "delta")]
    # without skipHeader the member headers surface as rows
    df2 = read_source(spark, "csvreader", {
        "path": str(z1), "compress": "zip",
    })
    assert df2.count() == 5


def test_jdbcreader_shard_union(spark, tmp_path):
    """table[0-1] pattern expands to two shards whose scans union."""
    from datax_spark.sinks.writers import write_sink
    from datax_spark.sources.readers import read_source

    url = f"jdbc:derby:{tmp_path}/shards;create=true"
    for i, rows in enumerate([[(1,), (2,)], [(3,)]]):
        write_sink(
            spark.createDataFrame(rows, "id bigint"), "jdbcwriter",
            {"jdbcUrl": url, "table": f"shard{i}", "writeMode": "insert"},
        )
    df = read_source(spark, "jdbcreader", {"jdbcUrl": url, "table": "shard[0-1]"})
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]


def test_quantile_split_predicates(spark):
    """Equal-height split (sampled-quantile analog): slices partition
    the table and are balanced even on skewed keys, unlike the even
    min/max arithmetic split."""
    from datax_spark.sources.readers import (
        quantile_split_points,
        quantile_split_predicates,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    total = orders.count()
    preds = quantile_split_predicates(orders, "o_totalprice", 8)
    assert len(preds) == 9  # 8 ranges + NULL bucket
    counts = [orders.filter(p).count() for p in preds]
    assert sum(counts) == total
    assert counts[-1] == 0  # no NULL keys
    # GK sketch at 0.001 relative error: every slice within 10% of n/8
    assert max(counts[:-1]) <= total / 8 * 1.1
    assert min(counts[:-1]) >= total / 8 * 0.9
    # exact mode returns sorted, deduped interior points
    pts = quantile_split_points(orders, "o_totalprice", 8, relative_error=0)
    assert pts == sorted(pts) and len(pts) == len(set(pts)) <= 7
    # exact mode is a single-partition global sort — guarded by a
    # row-count ceiling (fail loud, like the O(n^2) dedup baselines)
    import pytest

    with pytest.raises(ValueError, match="exact_max_rows"):
        quantile_split_points(
            orders, "o_totalprice", 8, relative_error=0, exact_max_rows=10
        )


def test_hivereader_sql(spark):
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView(
        "nation_v"
    )
    from datax_spark.sources.readers import read_source

    df = read_source(
        spark, "hivereader", {"sql": "SELECT n_regionkey, count(*) AS n FROM nation_v GROUP BY 1"}
    )
    assert df.count() == 5


def test_hivereader_multi_sql_concatenates(spark):
    """A list of SQLs is one task per statement with concatenated
    result sets (HiveReader.java:58-74) — not just the first one."""
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView(
        "nation_v2"
    )
    from datax_spark.sources.readers import read_source

    df = read_source(
        spark,
        "hivereader",
        {"sql": [
            "SELECT n_nationkey FROM nation_v2 WHERE n_regionkey = 0",
            "SELECT n_nationkey FROM nation_v2 WHERE n_regionkey <> 0",
        ]},
    )
    assert df.count() == 25


def test_jdbcreader_temporal_pk_routes_to_native_partitioning(spark, tmp_path):
    """Date-shaped bounds must use Spark's native temporal
    partitionColumn, NOT the ASCII string split (which would emit
    garbage date literals)."""
    from datax_spark.sinks.writers import write_sink
    from datax_spark.sources.readers import read_source

    url = f"jdbc:derby:{tmp_path}/tdb;create=true"
    import datetime

    rows = [(datetime.date(2020, 1, 1 + i), i) for i in range(20)]
    df = spark.createDataFrame(rows, "d date, v long")
    write_sink(df, "jdbcwriter", {
        "jdbcUrl": url, "table": "datets", "writeMode": "insert",
        "preSql": 'CREATE TABLE @table ("d" DATE, "v" BIGINT)',
    })
    got = read_source(spark, "jdbcreader", {
        "jdbcUrl": url,
        "table": "datets",
        "splitPk": '"d"',
        "lowerBound": "2020-01-01",
        "upperBound": "2020-01-20",
        "numPartitions": 4,
        "splitFactor": 1,
    })
    assert got.count() == 20
    assert got.rdd.getNumPartitions() == 4  # native range partitioning
    # explicit type config forces the mode regardless of bound shape
    forced = read_source(spark, "jdbcreader", {
        "jdbcUrl": url, "table": "datets", "splitPk": '"d"',
        "lowerBound": "2020-01-01", "upperBound": "2020-01-20",
        "numPartitions": 4, "splitFactor": 1, "splitPkType": "date",
    })
    assert forced.count() == 20


def test_hdfsreader_sequencefile(spark, tmp_path):
    """fileType=seq: SequenceFile values are delimiter-parsed text
    lines (DFSUtil.java:214-242)."""
    from datax_spark.sources.readers import read_source

    seq = str(tmp_path / "seqdata")
    spark.sparkContext.parallelize(
        [(1, "1,alpha"), (2, "2,beta"), (3, "3,gamma")], 2
    ).saveAsSequenceFile(seq)
    df = read_source(
        spark, "hdfsreader",
        {"path": f"{seq}/part-*", "fileType": "seq", "column": ["_c0", "_c1"]},
    )
    assert sorted((int(r["_c0"]), r["_c1"]) for r in df.collect()) == [
        (1, "alpha"), (2, "beta"), (3, "gamma"),
    ]
    with pytest.raises(NotImplementedError, match="rc"):
        read_source(spark, "hdfsreader", {"path": seq, "fileType": "rc"})


def test_hdfsreader_filetype_orc_roundtrip(spark, tmp_path):
    from datax_spark.sources.readers import read_source

    orc = str(tmp_path / "orcdata")
    spark.createDataFrame([(1, "x")], ["a", "b"]).write.orc(orc)
    df = read_source(spark, "hdfsreader", {"path": orc, "fileType": "orc"})
    assert [(r["a"], r["b"]) for r in df.collect()] == [(1, "x")]


def test_plan_channel_count_reference_parity():
    """adjustChannelNumber (JobContainer.java:416-486): rate limits
    divide by per-channel speeds, the tighter budget wins, explicit
    channel count is the no-rate-limit fallback."""
    from datax_spark.jobspec import plan_channel_count

    # byte limit alone: 10 MiB/s global / 1 MiB/s per channel
    assert plan_channel_count({"speed": {"byte": 10 * 1_048_576}}) == 10
    # record limit alone: 50k rec/s / 10k per channel
    assert plan_channel_count({"speed": {"record": 50_000}}) == 5
    # both set: min(byByte, byRecord) — the tighter budget
    assert (
        plan_channel_count({"speed": {"byte": 10 * 1_048_576, "record": 50_000}})
        == 5
    )
    # a global budget below one channel's speed floors at 1
    assert plan_channel_count({"speed": {"byte": 1000}}) == 1
    # no rate limit: explicit speed.channel
    assert plan_channel_count({"speed": {"channel": 7}}) == 7
    # nothing configured -> None (Spark source partitioning decides)
    assert plan_channel_count({}) is None
    assert plan_channel_count({"speed": {}}) is None
    # non-positive per-channel speed with a limit set is a config error
    with pytest.raises(ValueError, match="byte speed"):
        plan_channel_count({"speed": {"byte": 100}}, channel_byte_speed=0)
    with pytest.raises(ValueError, match="record speed"):
        plan_channel_count({"speed": {"record": 100}}, channel_record_speed=-1)


def test_jobspec_speed_drives_reader_split_width(spark, tmp_path):
    """job.setting.speed.record=30000 -> 3 channels -> a single-table
    jdbc job with a splitPk fans out channels x splitFactor = 15 task
    slices (ReaderSplitUtil.java:62-77: one table must still feed
    every channel), observable as 15 part-files: the transform chain
    is narrow, so the scan's partitioning survives to the writer."""
    from datax_spark.sinks.writers import write_sink

    url = f"jdbc:derby:{tmp_path}/chan;create=true"
    write_sink(
        spark.createDataFrame([(i,) for i in range(1, 31)], "id bigint"),
        "jdbcwriter",
        {"jdbcUrl": url, "table": "nums", "writeMode": "insert"},
    )
    out = str(tmp_path / "chan_out")
    result = run_job(
        spark,
        {
            "reader": {
                "name": "jdbcreader",
                "parameter": {
                    "jdbcUrl": url,
                    "table": "nums",
                    "splitPk": "id",
                    "splitPkType": "long",
                    "lowerBound": 1,
                    "upperBound": 30,
                },
            },
            "writer": {
                "name": "parquetwriter",
                "parameter": {"path": out, "writeMode": "truncate"},
            },
            "settings": {"speed": {"record": 30_000}},
        },
    )
    assert result.rows_written == 30
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 3 * 5  # channels x default splitFactor
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == list(range(1, 31))
