"""Sink writers: the Writer-plugin surface as Spark writes.

Write modes mirror hdfswriter (``HdfsWriter.java:83-92,151-196``):
append / nonConflict (fail if target exists) / truncate (overwrite).
The reference's two-phase temp-dir-then-rename commit is built into
Spark's FileOutputCommitter for files and formalized in
``lake.LakeTable`` for upserts (atomic manifest swap).

Upsert writers (mysqlwriter's ON DUPLICATE KEY UPDATE family,
``WriterUtil.java:150-170``) map to ``lakewriter`` → LakeTable MERGE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

_MODE = {"append": "append", "truncate": "overwrite", "nonConflict": "error"}


def write_sink(df: DataFrame, name: str, parameter: dict) -> dict:
    """Dispatch a writer-plugin config; returns write stats."""
    p = dict(parameter)
    path = p.get("path")
    mode = _MODE.get(p.get("writeMode", "append"), p.get("writeMode", "append"))

    if name in ("parquetwriter", "hdfswriter_parquet"):
        df.write.mode(mode).parquet(path)
    elif name in ("txtfilewriter", "hdfswriter", "csvwriter"):
        (
            df.write.mode(mode)
            .option("sep", p.get("fieldDelimiter", ","))
            .option("header", str(p.get("header", False)).lower())
            .option("nullValue", p.get("nullFormat", "\\N"))
            .option("compression", p.get("compress", "none"))
            .csv(path)
        )
    elif name == "orcwriter":
        df.write.mode(mode).option("compression", p.get("compress", "snappy")).orc(path)
    elif name == "kafkawriter":
        # KafkaWriter.java: row -> JSON -> producer.send; untested here
        # (no broker) but complete. Exactly-once on replay comes from
        # downstream idempotence, as in the reference (at-least-once).
        (
            df.select(F.to_json(F.struct(*df.columns)).alias("value"))
            .write.format("kafka")
            .option("kafka.bootstrap.servers", p["bootstrapServers"])
            .option("topic", p["topic"])
            .save()
        )
    elif name == "jdbcwriter":
        writer = (
            df.write.format("jdbc")
            .option("url", p["jdbcUrl"])
            .option("dbtable", p["table"])
            .mode(mode if mode in ("append", "overwrite") else "append")
        )
        for k in ("user", "password", "driver", "batchsize"):
            if k in p:
                writer = writer.option(k, p[k])
        writer.save()
    elif name == "streamwriter":
        # console smoke sink (StreamWriter.java analog)
        df.show(int(p.get("recordNumBeforePrint", 20)), truncate=False)
    elif name == "lakewriter":
        keys = p["keys"]
        if not LakeTable.exists(path):
            schema = df.schema if p.get("op_col") is None else df.drop(p["op_col"]).schema
            LakeTable.create(
                df.sparkSession, path, schema=schema, key_cols=keys,
                num_buckets=int(p.get("numBuckets", 64)),
            )
        table = LakeTable.load(df.sparkSession, path)
        op_col = p.get("op_col")
        if op_col is None:
            # pure upsert (writeMode=replace/update analog): inject op=U
            df = df.withColumn("__op", F.lit("U"))
            op_col = "__op"
        pending = merge_into(table, df, op_col=op_col, delete_op=p.get("delete_op", "D"))
        version = pending.commit(summary=p.get("summary"))
        return {"rows_after": pending.stats.rows_after, "version": version}
    else:
        raise ValueError(f"unknown writer plugin: {name}")
    return {"path": path}
