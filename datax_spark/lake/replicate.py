"""Incremental lake-to-lake replication — the CDC fan-out consumer.

A LakeTable is itself a change source: every committed snapshot is a
consumable increment (``LakeTable.changes``). This module closes the
loop downstream — a *replica* LakeTable that follows a source table by
applying only the change feed between the source version it last
consumed and the source's current snapshot, exactly the
Kafka-Connect-style "sink connector reading a CDC topic" shape, but
snapshot-to-snapshot with no broker in between.

Reference analog: a DataX job whose reader is otsstreamreader (the CDC
tail) and whose writer is a keyed upsert writer — here both ends are
lake tables and the increment is computed from manifests instead of a
stream position file.

Scale and exactly-once:

* Incremental cost is O(changed keys), not O(table): ``changes`` full-
  outer-joins two bucket-partitioned snapshots on the key hash and the
  resulting merge touches only the affected buckets. A 10^10-row source
  with a 0.1% daily churn syncs by moving ~10^7 rows.
* The replica records the consumed source version in its snapshot
  summary (``replica_of_version``) and the apply is ONE atomic merge
  commit — crash anywhere and the replica is still a consistent
  snapshot whose watermark says exactly where to resume; re-running a
  completed sync is a no-op. Same idempotence contract as the replay
  engine's epoch watermark.
* If the source's consumed snapshot has been retired by
  ``expire_snapshots`` (the incremental history is gone), ``sync``
  falls back to a REPAIR: a full-outer diff of replica-current vs
  source-current (both bucket-partitioned on the same key hash, one
  shuffle per side) applied as a merge — O(table) but convergent,
  including deletes that happened in the lost window. Pin a source tag
  to the replication watermark to avoid ever needing it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

REPLICA_WATERMARK = "replica_of_version"


@dataclass
class SyncResult:
    replica_version: int
    synced_to: int  # source version the replica now reflects
    mode: str  # seed | incremental | repair | noop


def _apply(replica: LakeTable, updates: DataFrame, synced_to: int, mode: str) -> SyncResult:
    pending = merge_into(replica, updates, op_col="__op")
    v = pending.commit(summary={REPLICA_WATERMARK: synced_to})
    return SyncResult(replica_version=v, synced_to=synced_to, mode=mode)


def _cross_table_diff(replica: LakeTable, source: LakeTable, to_version: int) -> DataFrame:
    """Repair diff: what must change on the replica so it equals the
    source snapshot. Same plan shape as ``LakeTable.changes`` but the
    FROM side is the replica — both sides are bucket-hashed on the same
    keys, so each side exchanges once and AQE owns skew."""
    from datax_spark.operators.schema_evolution import union_by_name

    sm = source.manifest(to_version)
    keys = sm.key_cols
    payload = [f.name for f in sm.schema.fields if f.name not in keys]
    old = union_by_name(replica.read(), sm.schema)
    new = union_by_name(source.read(version=to_version), sm.schema)

    def tag(df: DataFrame, side: str) -> DataFrame:
        img = F.struct(*[F.col(c) for c in payload]).alias(f"__img_{side}")
        h = F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in payload]
        ).alias(f"__h_{side}")
        return df.select(*keys, img, h)

    j = tag(old, "a").join(tag(new, "b"), on=keys, how="full_outer")
    op = F.when(F.col("__h_b").isNull(), F.lit("D")).otherwise(F.lit("U"))
    img = F.when(F.col("__h_b").isNull(), F.col("__img_a")).otherwise(F.col("__img_b"))
    return (
        j.filter(
            F.col("__h_a").isNull()
            | F.col("__h_b").isNull()
            | (F.col("__h_a") != F.col("__h_b"))
        )
        .select(*keys, *[img.getField(c).alias(c) for c in payload], op.alias("__op"))
    )


def sync(
    source: LakeTable,
    replica_root: str,
    to_version: int | str | None = None,
) -> SyncResult:
    """Bring the replica at ``replica_root`` up to the source's
    ``to_version`` (default: current). Creates and seeds the replica on
    first call; applies the incremental change feed afterwards; falls
    back to a repair diff when the incremental window has been expired
    on the source. Additive source schema evolution flows through
    automatically (the change feed carries the TO-side schema and the
    replica merge evolves to it)."""
    spark = source.spark
    sm = source.manifest(to_version)

    if not LakeTable.exists(replica_root):
        replica = LakeTable.create(
            spark,
            replica_root,
            sm.schema,
            sm.key_cols,
            num_buckets=sm.num_buckets,
            resolve_order=list(sm.resolve_order),
            stats_cols=list(sm.stats_cols),
            bloom_cols=list(sm.bloom_cols),
            hash_fn=sm.hash_fn,
            bucket_cols=list(sm.bucket_cols) or None,
        )
        seed = source.read(version=sm.version).withColumn("__op", F.lit("U"))
        return _apply(replica, seed, sm.version, "seed")

    replica = LakeTable.load(spark, replica_root)
    wm = replica.manifest().summary.get(REPLICA_WATERMARK)
    if wm is None:
        raise ValueError(
            f"table at {replica_root} is not a replica (no {REPLICA_WATERMARK} watermark)"
        )
    wm = int(wm)
    if wm == sm.version:
        return SyncResult(replica.current_version(), wm, "noop")
    if wm > sm.version:
        raise ValueError(
            f"replica is at source v{wm}, ahead of requested v{sm.version} "
            "(use LakeTable.rollback on the replica to rewind)"
        )
    try:
        cdf = source.changes(wm, sm.version)
        mode = "incremental"
    except FileNotFoundError:
        # the consumed snapshot was expired on the source: repair
        cdf = None
        mode = "repair"
    if cdf is not None:
        updates = (
            cdf.withColumn(
                "__op",
                F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
                    F.lit("U")
                ),
            ).drop("_change_type")
        )
    else:
        updates = _cross_table_diff(replica, source, sm.version)
    return _apply(replica, updates, sm.version, mode)


def apply_change_batch(replica: LakeTable, batch_df: DataFrame) -> int | None:
    """Apply one micro-batch of ``lake_changes`` rows (full images +
    ``_change_type`` + ``_commit_version``) to a replica, exactly
    once: rows at or below the replica's watermark are dropped (a
    crash-replayed batch becomes a no-op), the batch collapses to each
    key's LAST state across the commits it covers (``max_by`` on
    ``_commit_version`` — a key inserted then deleted in one batch
    applies as the delete), and the merge commit advances the
    watermark to the batch's highest commit in the same atomic
    snapshot. Returns the new replica version, or None if the whole
    batch was a replay."""
    wm = int(replica.manifest().summary[REPLICA_WATERMARK])
    fresh = batch_df.filter(F.col("_commit_version") > wm)
    hi = fresh.agg(F.max("_commit_version")).first()[0]
    if hi is None:
        return None
    keys = replica.manifest().key_cols
    others = [c for c in fresh.columns if c not in keys]
    latest = (
        fresh.groupBy(*keys)
        .agg(F.max_by(F.struct(*others), F.col("_commit_version")).alias("__w"))
        .select(*keys, "__w.*")
    )
    updates = latest.withColumn(
        "__op",
        F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(F.lit("U")),
    ).drop("_change_type", "_commit_version")
    pending = merge_into(replica, updates, op_col="__op")
    return pending.commit(summary={REPLICA_WATERMARK: int(hi)})


def stream_sync(
    source: LakeTable,
    replica_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_interval: str | None = None,
):
    """Streaming lake-to-lake replication: seed the replica if absent
    (batch :func:`sync`), then follow the source's committed snapshots
    through the ``lake_changes`` streaming source, applying each
    micro-batch as one atomic merge commit via
    :func:`apply_change_batch`. Returns the started StreamingQuery
    (``available_now=True`` drains pending commits and stops — the
    scheduled-replication shape; a ``processing_interval`` follows the
    source continuously).

    Exactly-once composes from two sides: Spark's checkpoint replays
    at-least-once, and the replica's ``replica_of_version`` watermark
    makes re-application a no-op — the same idempotence contract as
    the replay engine's epoch watermark. A fresh checkpoint starts at
    the watermark (``sinceVersion``), so checkpoint loss alone never
    skips or double-applies a commit."""
    from datax_spark.streaming.change_source import stream_changes

    spark = source.spark
    if not LakeTable.exists(replica_root):
        sync(source, replica_root)
    replica = LakeTable.load(spark, replica_root)
    wm = replica.manifest().summary.get(REPLICA_WATERMARK)
    if wm is None:
        raise ValueError(
            f"table at {replica_root} is not a replica (no {REPLICA_WATERMARK} watermark)"
        )
    cdf = stream_changes(spark, source.root, since_version=int(wm))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_change_batch(LakeTable.load(spark, replica_root), batch_df)

    w = cdf.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_interval is not None:
        w = w.trigger(processingTime=processing_interval)
    return w.start()
