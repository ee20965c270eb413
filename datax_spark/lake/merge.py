"""Copy-on-write MERGE INTO for LakeTable.

Semantics — the SQL this implements (Iceberg-style):

    MERGE INTO target t USING deduped_updates s
    ON t.key = s.key
    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

Reference analog: the RDBMS writer's last-writer-wins upsert
(``WriterUtil.java:150-170`` ON DUPLICATE KEY UPDATE) plus its
``deleteFlag`` pre-delete path (``CommonRdbmsWriter.java:322-362``),
executed set-wise instead of row-batch-wise.

Physical plan (scale notes):

* **Bucket pruning**: updates are hashed to buckets first; only
  affected buckets' data files are read and rewritten. An epoch that
  touches 5% of the key space costs 5% of the table in I/O, not 100%.
* The matched/not-matched split is ONE left-anti join (survivors =
  current rows whose key has no update) plus a union with the upsert
  rows — no full-outer join, no window. Both sides shuffle on the
  key columns once; AQE handles skewed key distributions
  (``spark.sql.adaptive.skewJoin``). On a real cluster with
  storage-partitioned joins (Spark 3.3+, SPARK-37375) the shuffle on
  the current side disappears entirely because the table is already
  bucket-partitioned; locally we keep the plain shuffle.
* Output is repartitioned by bucket and sorted within partitions by
  key before write — stable file sizes, better compression, and
  future merges read back sorted runs.
* Row counts per new file come from parquet footers (driver-side
  metadata read, no extra Spark job).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable
from datax_spark.operators.schema_evolution import evolve_schema, union_by_name


@dataclass
class MergeStats:
    affected_buckets: list[int]
    rows_before: int
    rows_after: int
    files_written: int
    bucket_rows_after: dict[int, int] = field(default_factory=dict)


@dataclass
class PendingMerge:
    """Data files are written (phase 1); ``commit`` swaps the snapshot
    pointer (phase 2). A crash between the phases leaves only orphan
    files — the table state is unchanged and the epoch replays cleanly.
    """

    table: LakeTable
    base_version: int
    replaced_buckets: list[int]
    new_files: dict[int, list[str]]
    new_row_counts: dict[int, int]
    schema: T.StructType
    stats: MergeStats

    def commit(self, summary: dict | None = None) -> int:
        return self.table.commit(
            self.replaced_buckets,
            self.new_files,
            self.new_row_counts,
            schema=self.schema,
            summary=summary,
            base_version=self.base_version,
        )


def merge_into(
    table: LakeTable,
    updates: DataFrame,
    op_col: str = "op",
    delete_op: str = "D",
    write_partitions: int | None = None,
    order_cols: list[str] | None = None,
    affected_buckets: list[int] | None = None,
    update_keys: DataFrame | None = None,
) -> PendingMerge:
    """Write phase of MERGE. ``updates`` must be deduplicated (one row
    per key — run ``operators.lww_dedup`` first) and contain the key
    columns, ``op_col``, and the payload columns.

    ``order_cols`` (e.g. ``["commit", "lsn"]``) enables the cross-batch
    LWW guard: an update only applies when its order tuple is strictly
    greater than the current table row's — the conditional-merge form
    ``WHEN MATCHED AND s.order > t.order THEN UPDATE`` that makes
    re-delivered or out-of-order micro-batches unable to regress a key
    (used by the streaming sink; the in-order batch engine skips it
    because its epoch watermark already enforces order).
    """
    if update_keys is not None and order_cols:
        # update_keys supplies the anti-join key set from the
        # pre-transform frame, but the order guard filters `upd` — a
        # stale update's key would still evict its current row with no
        # replacement (silent data loss). No caller needs both: the
        # guard exists for out-of-order delivery, where the key set
        # must come from the post-guard frame anyway.
        raise ValueError(
            "update_keys cannot be combined with order_cols: the "
            "anti-join key set would include keys whose update the "
            "order guard rejects"
        )
    m = table.manifest()
    keys = m.key_cols
    nb = m.num_buckets

    incoming = updates.drop(op_col).schema
    evolved = evolve_schema(m.schema, incoming)

    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nb)).cast("int")
    upd = updates.withColumn("__b", bucket)

    if affected_buckets is not None:
        affected = sorted(affected_buckets)  # caller already knows (saves a job)
    else:
        affected = sorted(
            r["__b"] for r in upd.select("__b").distinct().collect()
        )  # at most num_buckets ints — tiny driver collect

    current = union_by_name(table.read(buckets=affected), evolved)

    if order_cols:
        cur_ord = current.select(
            *keys, F.struct(*[F.col(c) for c in order_cols]).alias("__cur_ord")
        )
        upd = (
            upd.join(cur_ord, on=keys, how="left")
            .filter(
                F.col("__cur_ord").isNull()
                | (F.struct(*[F.col(c) for c in order_cols]) > F.col("__cur_ord"))
            )
            .drop("__cur_ord")
        )
    # anti-join: current rows whose key received ANY event (upsert or
    # delete) are dropped; the upsert rows below carry the new image.
    # ``update_keys`` lets the caller supply the key set from a cheaper
    # (e.g. cached pre-transform) frame so expensive lazy transforms on
    # ``updates`` are not computed twice — once here and once for the
    # upsert projection.
    upd_keys = update_keys.select(*keys) if update_keys is not None else upd.select(*keys)
    survivors = current.join(upd_keys, on=keys, how="left_anti")
    upserts = union_by_name(upd.filter(F.col(op_col) != delete_op), evolved)

    out_cols = [f.name for f in evolved.fields]
    result = (
        survivors.select(*out_cols)
        .unionByName(upserts.select(*out_cols))
        .withColumn("__b", bucket)
    )

    txn = table.new_txn_dir()
    n_parts = write_partitions or max(
        len(affected), table.spark.sparkContext.defaultParallelism
    )
    (
        result.repartition(n_parts, F.col("__b"))
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .partitionBy("__b")
        .parquet(txn)
    )

    new_files: dict[int, list[str]] = {}
    new_counts: dict[int, int] = {}
    for d in glob.glob(os.path.join(txn, "__b=*")):
        b = int(re.search(r"__b=(\d+)$", d).group(1))
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if rows:
            new_files[b] = files
            new_counts[b] = rows

    rows_before = sum(m.row_counts.get(str(b), 0) for b in affected)
    stats = MergeStats(
        affected_buckets=affected,
        rows_before=rows_before,
        rows_after=sum(new_counts.values()),
        files_written=sum(len(v) for v in new_files.values()),
        bucket_rows_after=dict(new_counts),
    )
    return PendingMerge(
        table=table,
        base_version=m.version,
        replaced_buckets=affected,
        new_files=new_files,
        new_row_counts=new_counts,
        schema=evolved,
        stats=stats,
    )
