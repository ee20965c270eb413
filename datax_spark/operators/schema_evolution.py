"""Additive schema evolution: union-by-name with null-fill.

New columns may appear mid-stream in the change log (north_star: "new
columns like lang variants appear mid-stream"). Policy is additive-only
— the Iceberg ``ALTER TABLE ADD COLUMN`` model: existing rows get NULL
for new columns, column drops/renames are rejected, and a column's type
must stay stable. The reference has no schema evolution at all (writer
errors on column-count mismatch, ``CommonRdbmsWriter.java:281-290``);
this is one of the engine's genuinely new capabilities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


def evolve_schema(current: T.StructType, incoming: T.StructType) -> T.StructType:
    """Return ``current`` plus any new fields from ``incoming``.

    Raises on type conflicts (non-additive change). Field order:
    current fields first, new fields appended in incoming order — so
    old data files remain readable under the evolved schema.
    """
    cur = {f.name: f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        if f.name in cur:
            if cur[f.name].dataType != f.dataType:
                raise SchemaEvolutionError(
                    f"type change for column '{f.name}': "
                    f"{cur[f.name].dataType.simpleString()} -> {f.dataType.simpleString()}"
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
