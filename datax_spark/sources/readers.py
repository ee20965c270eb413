"""Source readers: the Reader-plugin surface re-expressed as Spark scans.

The reference's Reader contract is ``Job.split(adviceNumber) →
Task.startRead`` (``common/.../spi/Reader.java:46,50``); in Spark the
split step IS the data source's partitioning, so each reader here is a
thin declarative mapping from DataX reader-plugin config onto
``spark.read`` options — Catalyst owns predicate pushdown and column
pruning (the reference splices ``where``/``column`` into its SELECT by
hand, ``SingleTableSplitUtil.java:84-142``).

Readers covered (SURVEY.md §2.1):
  txtfilereader/hdfsreader(TEXT,CSV)  → csv / text
  hdfsreader(ORC)                     → orc
  parquet-based lake scans            → parquet
  restfulapireader-style JSON         → json
  streamreader (synthetic)            → fixtures.changelog / range
  mysqlreader & rdbms family          → jdbc (split semantics below)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jdbc_split_predicates(
    split_pk: str,
    lower: int,
    upper: int,
    num_splits: int,
    include_null_bucket: bool = True,
) -> list[str]:
    """Even BigInteger-style range predicates + a NULL-pk slice.

    Mirrors the reference's split strategy exactly
    (``SingleTableSplitUtil.java:33-127``: even min/max ranges, left-
    closed right-open, last range closed, plus the dedicated
    ``IS NULL`` bucket at :111-124 so NULL-pk rows are never lost).
    Feed the result to ``spark.read.jdbc(url, table, predicates=...)``
    — Spark runs one partition per predicate.
    """
    if num_splits <= 0:
        raise ValueError("num_splits must be positive")
    span = upper - lower + 1
    step = max(span // num_splits, 1)
    preds = []
    lo = lower
    for i in range(num_splits):
        hi = upper if i == num_splits - 1 else min(lo + step - 1, upper)
        if lo > upper:
            break
        if i == num_splits - 1:
            preds.append(f"{split_pk} >= {lo} AND {split_pk} <= {upper}")
        else:
            preds.append(f"{split_pk} >= {lo} AND {split_pk} < {hi + 1}")
        lo = hi + 1
    if include_null_bucket:
        preds.append(f"{split_pk} IS NULL")
    return preds


def read_source(spark: SparkSession, name: str, parameter: dict) -> DataFrame:
    """Dispatch a reader-plugin config to a Spark scan."""
    p = dict(parameter)
    path = p.get("path")
    columns = p.get("column")
    where = p.get("where")

    if name in ("parquetreader", "lakereader"):
        df = spark.read.parquet(*(path if isinstance(path, list) else [path]))
    elif name in ("txtfilereader", "hdfsreader", "csvreader"):
        df = (
            spark.read.option("sep", p.get("fieldDelimiter", ","))
            .option("header", str(p.get("skipHeader", False)).lower())
            .option("encoding", p.get("encoding", "utf-8"))
            .option("nullValue", p.get("nullFormat", "\\N"))
            .csv(*(path if isinstance(path, list) else [path]))
        )
    elif name == "orcreader":
        df = spark.read.orc(*(path if isinstance(path, list) else [path]))
    elif name in ("jsonreader", "restfulapireader"):
        df = spark.read.json(*(path if isinstance(path, list) else [path]))
    elif name == "jdbcreader":
        reader = spark.read.format("jdbc").option("url", p["jdbcUrl"]).option(
            "dbtable", p.get("querySql") and f"({p['querySql']}) t" or p["table"]
        )
        for k in ("user", "password", "driver"):
            if k in p:
                reader = reader.option(k, p[k])
        if "splitPk" in p and "lowerBound" in p:
            # range split; the NULL bucket comes via predicates mode
            reader = (
                reader.option("partitionColumn", p["splitPk"])
                .option("lowerBound", p["lowerBound"])
                .option("upperBound", p["upperBound"])
                .option("numPartitions", p.get("numPartitions", 8))
            )
        df = reader.load()
    elif name in ("hivereader", "sqlreader"):
        # hivereader runs user HiveQL via HiveServer2 JDBC, one task per
        # SQL (HiveReader.java:58-74); on Spark the warehouse is native:
        # the statement runs directly against the session catalog.
        df = spark.sql(p["sql"] if isinstance(p.get("sql"), str) else p["sql"][0])
    elif name == "kafkareader":
        # KafkaReader.java:77-85 splits one task per partition; Spark's
        # kafka source does the same. JSON values project onto the
        # configured column list (KafkaReader.java:184-216). Untested
        # here (no broker in this environment) but complete.
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", p["bootstrapServers"])
            .option("subscribe", p["topic"])
            .option("startingOffsets", p.get("startingOffsets", "earliest"))
            .load()
        )
        cols = p.get("column") or []
        schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
        df = raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("j")
        ).select(*[F.col(f"j.{c}").alias(c) for c in cols])
        columns = None
    elif name == "streamreader":
        # synthetic generator (StreamReader.java:94-166 analog):
        # column specs {"value": const} or {"random": [lo, hi]} per type
        n = int(p.get("sliceRecordCount", 1000)) * int(p.get("slices", 1))
        df = spark.range(n).withColumnRenamed("id", "__i")
        for i, spec in enumerate(p.get("column", [])):
            typ = spec.get("type", "string")
            colname = spec.get("name", f"col{i}")
            if "value" in spec:
                df = df.withColumn(colname, F.lit(spec["value"]).cast(typ))
            else:
                lo, hi = spec.get("random", [0, 100])
                r = F.abs(F.xxhash64("__i", F.lit(i))) % (int(hi) - int(lo) + 1) + int(lo)
                if typ == "string":
                    df = df.withColumn(colname, F.concat(F.lit("s"), r.cast("string")))
                else:
                    df = df.withColumn(colname, r.cast(typ))
        df = df.drop("__i")
        columns = None  # streamreader's `column` is generator specs, not a projection
    else:
        raise ValueError(f"unknown reader plugin: {name}")

    if where:
        df = df.filter(where)  # pushed down by Catalyst
    if columns:
        df = df.select(*columns)  # column pruning reaches the scan
    return df


def cast_with_quarantine(
    df: DataFrame, target: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Cast columns to a target schema, routing rows with failed casts
    to a dirty-data frame instead of erroring — the TaskPluginCollector
    side channel (``dataxPluginDev.md:426-440``;
    ``StdoutPluginCollector.java``) as a DataFrame split.

    A cast fails when try_cast yields NULL for a non-NULL input.
    Returns (good, dirty); ``dirty`` keeps original values.
    """
    fail = F.lit(False)
    for f in target.fields:
        c = F.col(f.name)
        fail = fail | (c.isNotNull() & c.try_cast(f.dataType).isNull())
    dirty = df.filter(fail)
    good = df.filter(~fail).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
    )
    return good, dirty


def check_error_limit(
    n_dirty: int, n_total: int, record_limit: int | None, pct_limit: float | None
) -> None:
    """Job-level dirty-data limits: record limit has priority over the
    percentage limit (``ErrorRecordChecker.java:18-82``)."""
    if record_limit is not None and n_dirty > record_limit:
        raise RuntimeError(
            f"dirty-data record limit exceeded: {n_dirty} > {record_limit}"
        )
    if pct_limit is not None and n_total > 0 and (n_dirty / n_total) > pct_limit:
        raise RuntimeError(
            f"dirty-data percentage limit exceeded: {n_dirty / n_total:.4f} > {pct_limit}"
        )
