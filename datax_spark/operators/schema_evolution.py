"""Schema evolution: additive columns + safe type widening.

New columns may appear mid-stream in the change log (north_star: "new
columns like lang variants appear mid-stream") and an upstream ``ALTER
COLUMN`` may widen a numeric type. Policy is the Iceberg model:

* ``ADD COLUMN`` — existing rows get NULL for new columns;
* safe type promotion — byte → short → int → long and float → double
  (the Iceberg-allowed widenings; Spark 4's parquet reader natively
  reads old narrow files under the widened schema, so no rewrite).
  A batch whose column is NARROWER than the table's casts up on write
  and the schema stays put;
* column drops/renames and any other type change are rejected;
* ``frozen_cols`` (the table's key and bucket-routing columns) reject
  EVERY type change including safe widening: the bucket layout hashes
  those columns' raw values, and Spark's murmur3/xxhash64 hash an int
  and a long to different values — a widened key would silently
  re-route every row to a different bucket.

The reference has no schema evolution at all (writer errors on
column-count mismatch, ``CommonRdbmsWriter.java:281-290``); this is
one of the engine's genuinely new capabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


_INT_RANK = {T.ByteType: 0, T.ShortType: 1, T.IntegerType: 2, T.LongType: 3}
_FLOAT_RANK = {T.FloatType: 0, T.DoubleType: 1}


def widened_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The wider of two types along a SAFE promotion chain, or None
    when no such chain exists (incompatible change)."""
    if a == b:
        return a
    ta, tb = type(a), type(b)
    if ta in _INT_RANK and tb in _INT_RANK:
        return a if _INT_RANK[ta] >= _INT_RANK[tb] else b
    if ta in _FLOAT_RANK and tb in _FLOAT_RANK:
        return a if _FLOAT_RANK[ta] >= _FLOAT_RANK[tb] else b
    return None


def evolve_schema(
    current: T.StructType,
    incoming: T.StructType,
    frozen_cols: set[str] | None = None,
) -> T.StructType:
    """Return ``current`` evolved by ``incoming``: new fields appended
    (in incoming order, after all current fields — old data files stay
    readable), shared fields widened along the safe promotion chains.

    Raises on any non-additive, non-widening change — and on ANY type
    change for ``frozen_cols`` (key/bucket-routing columns, whose
    hashes must stay byte-stable across the table's life).
    """
    frozen = frozen_cols or set()
    cur = {f.name: f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        if f.name in cur:
            if cur[f.name].dataType == f.dataType:
                continue
            if f.name in frozen:
                raise SchemaEvolutionError(
                    f"type change for key/bucket column '{f.name}' "
                    f"({cur[f.name].dataType.simpleString()} -> "
                    f"{f.dataType.simpleString()}): routing hashes are "
                    "type-sensitive; cast the batch to the table's key "
                    "type instead"
                )
            w = widened_type(cur[f.name].dataType, f.dataType)
            if w is None:
                raise SchemaEvolutionError(
                    f"type change for column '{f.name}': "
                    f"{cur[f.name].dataType.simpleString()} -> "
                    f"{f.dataType.simpleString()} is not a safe widening"
                )
            if w != cur[f.name].dataType:
                # widening changes the TYPE only — a non-nullable
                # column stays non-nullable unless the incoming field
                # is itself nullable
                out[[x.name for x in out].index(f.name)] = T.StructField(
                    f.name, w, nullable=cur[f.name].nullable or f.nullable
                )
        else:
            out.append(T.StructField(f.name, f.dataType, nullable=True))
    return T.StructType(out)


def union_by_name(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target`` schema, null-filling missing columns."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
