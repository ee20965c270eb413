"""Declarative job spec: the DataX job-JSON surface on Spark.

A job is ``{reader, transformer[], writer, settings}`` — the same
shape as the reference's ``job.content[0]`` (``userGuid.md:87-151``),
compiled to one Spark logical plan instead of a thread-per-task
pipeline. The reference's lifecycle (``JobContainer.java:96-128``)
collapses: split/schedule/channel are Catalyst + the Spark scheduler;
what remains is read → transform chain → (dirty-data split) → write.

Example::

    spec = {
        "reader": {"name": "parquetreader",
                   "parameter": {"path": ".../lineitem.parquet",
                                  "column": ["l_orderkey", "l_comment"],
                                  "where": "l_quantity > 10"}},
        "transformer": [
            {"name": "dx_substr", "column": "l_comment", "paras": [0, 8]},
            {"name": "dx_filter", "column": "l_orderkey", "paras": ["<", "100"]},
        ],
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": "/tmp/out", "writeMode": "truncate"}},
        "settings": {"errorLimit": {"record": 0, "percentage": 0.01}},
    }
    result = run_job(spark, spec)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from datax_spark.functions.transforms import TransformChain
from datax_spark.sinks.writers import write_sink
from datax_spark.sources.readers import cast_with_quarantine, check_error_limit, read_source


@dataclass
class JobResult:
    rows_written: int
    rows_dirty: int
    writer_stats: dict = field(default_factory=dict)


def run_job(spark: SparkSession, spec: dict) -> JobResult:
    reader = spec["reader"]
    df = read_source(spark, reader["name"], reader.get("parameter", {}))

    df = TransformChain(spec.get("transformer", [])).apply(df)

    n_dirty = 0
    settings = spec.get("settings", {})
    cast_schema = spec.get("castSchema")
    if cast_schema is not None:
        target = (
            cast_schema
            if isinstance(cast_schema, T.StructType)
            else T.StructType.fromJson(cast_schema)
        )
        df, dirty = cast_with_quarantine(df, target)
        n_dirty = dirty.count()
        limits = settings.get("errorLimit", {})
        n_total = n_dirty + df.count()
        check_error_limit(
            n_dirty, n_total, limits.get("record"), limits.get("percentage")
        )
        quarantine_path = settings.get("quarantinePath")
        if quarantine_path and n_dirty:
            dirty.write.mode("append").parquet(quarantine_path)

    n = df.count()
    writer = spec["writer"]
    stats = write_sink(df, writer["name"], writer.get("parameter", {}))
    return JobResult(rows_written=n, rows_dirty=n_dirty, writer_stats=stats)
