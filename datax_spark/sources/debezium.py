"""Debezium change-event envelope -> replay-engine event rows.

The reference tails a proprietary change stream and hands typed
op-rows to the writer (otsstreamreader's
``MultiVerModeRecordSender.java:83-121``: one record per change, op
in insert/update/delete). The public ecosystem's equivalent wire
format is the Debezium envelope — the JSON every Kafka-Connect CDC
connector (MySQL binlog, Postgres WAL, Mongo oplog) publishes:

    {"before": <row|null>, "after": <row|null>,
     "source": {"lsn": ..., "ts_ms": ..., ...},
     "op": "c"|"u"|"d"|"r", "ts_ms": ...}

optionally nested under a Kafka-Connect ``{"schema":..., "payload":
<envelope>}`` wrapper, with key-compaction TOMBSTONES (null value)
trailing every delete.

This module maps that envelope onto the engine's flat event schema as
a PURE column projection — two ``from_json`` parses and a CASE, all
JVM-side, so the same expression works on a batch DataFrame, a
``readStream``, and inside the kafka tail's spool round:

* op mapping: c (create) -> I, r (snapshot read) -> I, u -> U,
  d -> D — the engine's insert/upsert/delete verbs;
* row image: ``after`` for c/r/u, ``before`` for d (a binlog delete
  carries only the old image — same shape as the fixture's nulled
  D-rows);
* tombstones and unparseable values drop out (op is null), counted
  by the caller's dirty-data path if it cares;
* Connect wrapper: handled by coalescing a ``payload``-nested parse
  with the bare parse — no per-row Python anywhere.

``wrap_debezium`` is the inverse (engine events -> envelope JSON),
used by tests and the contract oracle to prove the round trip is
exact, and as a reference for what the normalizer expects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# engine op <-> debezium op
_DBZ_TO_ENGINE = {"c": "I", "r": "I", "u": "U", "d": "D"}
_ENGINE_TO_DBZ = {"I": "c", "U": "u", "D": "d"}

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("connector", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The envelope struct for a given row schema (before/after are
    full row images; ``source`` carries transaction metadata)."""
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", SOURCE_SCHEMA),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def _engine_op(dbz_op: Column) -> Column:
    out = F.lit(None).cast("string")
    for k, v in _DBZ_TO_ENGINE.items():
        out = F.when(dbz_op == k, v).otherwise(out)
    return out


def normalize_debezium(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
    op_col: str = "op",
    source_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Project a DataFrame of Debezium JSON values (bytes or string
    ``value_col``) into flat engine event rows: one output column per
    ``row_schema`` field plus ``op_col`` in I/U/D.

    Accepts both the bare envelope and the Kafka-Connect
    ``{"schema":..., "payload": envelope}`` wrapper, mixed freely
    (the wrapped parse wins when its op is set). Tombstones (null
    value) and undecodable rows are dropped — in a binlog tail the
    delete itself already arrived as op=d, the tombstone is
    compaction noise.

    ``source_cols`` optionally projects envelope ``source`` metadata
    into extra output columns, e.g. ``{"_wal_lsn": "lsn"}`` when the
    ordering column is transaction position rather than a row field.

    Streaming-safe: the result is a stateless projection, usable on
    ``readStream`` inputs unchanged.
    """
    if op_col in {f.name for f in row_schema.fields}:
        raise ValueError(
            f"op_col {op_col!r} collides with a row_schema field; "
            "pick a different output name"
        )
    env = envelope_schema(row_schema)
    wrapped = T.StructType([T.StructField("payload", env)])
    raw = F.col(value_col).cast("string")
    bare = F.from_json(raw, env)
    inner = F.from_json(raw, wrapped)["payload"]
    e = F.when(inner["op"].isNotNull(), inner).otherwise(bare)
    image = F.when(e["op"] == "d", e["before"]).otherwise(e["after"])
    cols = [image[f.name].alias(f.name) for f in row_schema.fields]
    cols.append(_engine_op(e["op"]).alias(op_col))
    for out_name, src_field in (source_cols or {}).items():
        cols.append(e["source"][src_field].alias(out_name))
    return df.select(*cols).filter(F.col(op_col).isNotNull())


def debezium_rejects(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """The complement of :func:`normalize_debezium`: the raw values it
    DROPS — non-null, non-tombstone payloads with no mappable op
    (unknown op letters, heartbeats, undecodable JSON). The dirty-data
    accounting surface at the wire boundary (the reference counts
    every discarded record against errorLimit before the writer ever
    sees it, ErrorRecordChecker.java:18-82): route this to a
    quarantine sink or count it against a cap; together with
    normalize, every input value is exactly once in one of the two
    frames or a provable tombstone."""
    env = envelope_schema(row_schema)
    wrapped = T.StructType([T.StructField("payload", env)])
    raw = F.col(value_col).cast("string")
    bare = F.from_json(raw, env)
    inner = F.from_json(raw, wrapped)["payload"]
    e = F.when(inner["op"].isNotNull(), inner).otherwise(bare)
    mapped = _engine_op(e["op"])
    is_tombstone = raw.isNull() | (F.length(F.trim(raw)) == 0)
    return df.filter(mapped.isNull() & ~is_tombstone).select(
        raw.alias("value"), e["op"].alias("raw_op")
    )


def wrap_debezium(
    df: DataFrame,
    op_col: str = "op",
    lsn_col: str | None = "lsn",
    connect_wrapper: bool = False,
    connector: str = "datax-spark-fixture",
) -> DataFrame:
    """Inverse of :func:`normalize_debezium` (engine events -> one
    ``value`` JSON string column): deletes become before-image
    envelopes with null ``after``, everything else after-image with
    null ``before`` — byte-for-byte what a Debezium source connector
    publishes, so tests and oracles can prove normalize(wrap(x)) == x.
    """
    row_fields = [f.name for f in df.schema.fields if f.name != op_col]
    row = F.struct(*[F.col(c) for c in row_fields])
    null_row = F.lit(None).cast(
        T.StructType([f for f in df.schema.fields if f.name != op_col])
    )
    is_del = F.col(op_col) == "D"
    dbz_op = F.lit(None).cast("string")
    for k, v in _ENGINE_TO_DBZ.items():
        dbz_op = F.when(F.col(op_col) == k, v).otherwise(dbz_op)
    env = F.struct(
        F.when(is_del, row).otherwise(null_row).alias("before"),
        F.when(is_del, null_row).otherwise(row).alias("after"),
        F.struct(
            F.lit(connector).alias("connector"),
            F.lit("lake").alias("db"),
            F.lit("events").alias("table"),
            (F.col(lsn_col).cast("long") if lsn_col else F.lit(None).cast("long")).alias("lsn"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("source"),
        dbz_op.alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    if connect_wrapper:
        env = F.struct(env.alias("payload"))
    return df.select(F.to_json(env).alias("value"))
