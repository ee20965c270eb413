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


#: per-channel speed defaults (``CoreConstant`` defaults in
#: core.json: channel byte speed 1 MiB/s, record speed 10000 rec/s)
CHANNEL_BYTE_SPEED = 1_048_576
CHANNEL_RECORD_SPEED = 10_000


def plan_channel_count(
    settings: dict,
    channel_byte_speed: int = CHANNEL_BYTE_SPEED,
    channel_record_speed: int = CHANNEL_RECORD_SPEED,
) -> int | None:
    """Global speed → parallelism (``JobContainer.adjustChannelNumber``,
    ``JobContainer.java:416-486``): a job-level byte/record rate limit
    divided by the per-channel rate gives the channel count; when both
    limits are set the SMALLER channel count wins (the tighter
    budget); with no rate limit the explicit ``speed.channel`` is
    used. Returns None when the spec says nothing (the reference
    throws there, but on Spark the source's own partitioning is a
    sane default — callers that require the reference's strictness
    can check for None).

    On Spark the number feeds the READER's split width (``jdbcreader``
    ``numPartitions`` / per-shard split planning) — the analog of the
    reference's channel schedule — rather than a post-read
    ``repartition``, which would add a shuffle the scan can avoid.
    """
    speed = (settings or {}).get("speed", {}) or {}
    by_byte = by_rec = None
    if speed.get("byte") and int(speed["byte"]) > 0:
        if channel_byte_speed <= 0:
            raise ValueError(
                "per-channel byte speed must be positive when "
                "job.setting.speed.byte is set (JobContainer.java:437-443)"
            )
        by_byte = max(1, int(speed["byte"]) // channel_byte_speed)
    if speed.get("record") and int(speed["record"]) > 0:
        if channel_record_speed <= 0:
            raise ValueError(
                "per-channel record speed must be positive when "
                "job.setting.speed.record is set (JobContainer.java:456-462)"
            )
        by_rec = max(1, int(speed["record"]) // channel_record_speed)
    limited = [c for c in (by_byte, by_rec) if c is not None]
    if limited:
        return min(limited)
    if speed.get("channel") and int(speed["channel"]) > 0:
        return int(speed["channel"])
    return None


def run_job(spark: SparkSession, spec: dict) -> JobResult:
    reader = spec["reader"]
    reader_param = dict(reader.get("parameter", {}))
    channels = plan_channel_count(spec.get("settings", {}))
    if channels is not None:
        # the schedule knob lands on the reader's split width, never a
        # post-read repartition (that would be a gratuitous shuffle)
        reader_param.setdefault("numPartitions", channels)
    df = read_source(spark, reader["name"], reader_param)

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
