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

Physical plans (scale notes) — three strategies, same verified output:

* **spj** (default for batch replay): the storage-partitioned merge.
  The table is already bucket-hashed on its keys, so the current side
  needs no Exchange at all — the epoch batch shuffles once (grouped
  by bucket) and each bucket's task reads its own data files
  executor-side, filters evicted keys with Arrow kernels, and writes
  one new file. Optionally fuses the per-bucket lineage aggregation
  into the same task (``stat_cols``), making a whole replay epoch one
  Spark job. Memory per task = one bucket; ``num_buckets`` is the
  dial. See ``spj_merge_frame``.
* **shuffle**: bucket pruning (only affected buckets' files read and
  rewritten: an epoch touching 5% of the key space costs 5% of the
  table in I/O), then ONE left-anti join (survivors = current rows
  whose key has no update) plus a union with the upsert rows — no
  full-outer join, no window. Both sides shuffle on the key columns
  once; AQE handles skewed key distributions and memory, which is why
  this remains the fallback for pathological bucket sizes. Both plans
  support the cross-batch ``order_cols`` guard. Output is
  repartitioned by bucket and sorted within partitions; row counts
  come from parquet footers (driver-side metadata read).
* **mor** (merge-on-read): the epoch batch is APPENDED as one delta
  file per touched bucket (tombstone rows for deletes) and no current
  data is read or rewritten — write cost O(batch), independent of
  table size (Iceberg v2 equality-delete shape). Readers pay a
  bucket-local LWW merge until ``LakeTable.compact()`` folds deltas
  into a fresh base. The strategy for write-rate-bound ingest where
  epochs are far smaller than the touched buckets' base rows; pair
  with a compaction cadence (``ReplayConfig.compact_every``) to bound
  read amplification. See ``mor_delta_frame``.
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

from datax_spark.lake.table import (
    CommitConflictError,
    LakeTable,
    bucket_expr_for,
    composite_key_array,
    conform_arrow,
)
from datax_spark.operators.schema_evolution import (
    SchemaEvolutionError,
    evolve_schema,
    union_by_name,
)


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

    ``bucket_stats`` is populated by the fused spj path: per-bucket
    lineage aggregates computed inside the merge tasks themselves.
    """

    table: LakeTable
    base_version: int
    replaced_buckets: list[int]
    new_files: dict[int, list[str]]
    new_row_counts: dict[int, int]
    schema: T.StructType
    stats: MergeStats
    bucket_stats: dict[int, dict] | None = None
    # "cow": commit replaces the touched buckets' base files.
    # "mor": commit APPENDS the files as merge-on-read deltas instead —
    # base files untouched, readers merge until the next compact().
    mode: str = "cow"

    def commit(self, summary: dict | None = None, rebase: bool = False,
               max_retries: int = 5) -> int:
        """Swap the snapshot pointer. With ``rebase=False`` (default) a
        concurrent commit since ``base_version`` raises
        CommitConflictError — the single-writer engine's behavior.

        ``rebase=True`` is Iceberg's optimistic-concurrency retry: on
        conflict, re-validate this merge against the NEW current
        snapshot and re-commit on top of it when that is provably safe:

        * CoW: every bucket this merge REWRITES must be untouched
          between our base and the new current (buckets partition the
          key space identically across versions, so disjoint buckets =
          disjoint keys); untouched buckets carry over from the new
          parent, preserving the concurrent writer's work.
        * MoR: a delta append is computed from the batch alone, so it
          is valid over any base — only a concurrent ``rebucket``
          invalidates the bucket assignment.
        * Schemas merge additively (the union must evolve cleanly from
          the new current's schema), so neither writer's columns are
          lost.

        A genuine overlap still raises — recompute the merge then.
        """
        attempts = (max_retries if rebase else 0) + 1
        for attempt in range(attempts):
            try:
                if self.mode == "mor":
                    return self.table.commit_deltas(
                        self.new_files,
                        self.new_row_counts,
                        schema=self.schema,
                        summary=summary,
                        base_version=self.base_version,
                    )
                return self.table.commit(
                    self.replaced_buckets,
                    self.new_files,
                    self.new_row_counts,
                    schema=self.schema,
                    summary=summary,
                    base_version=self.base_version,
                )
            except CommitConflictError:
                if attempt == attempts - 1:
                    raise
                self._rebase_onto_current()
        raise AssertionError("unreachable")

    def _rebase_onto_current(self) -> None:
        """Point this pending merge at the current snapshot, raising
        CommitConflictError when the concurrent history makes that
        unsafe (overlapping bucket rewrite, rebucket, expired base,
        or an incompatible schema)."""
        cur = self.table.manifest()
        try:
            base = self.table.manifest(self.base_version)
        except FileNotFoundError as e:
            raise CommitConflictError(
                f"base snapshot v{self.base_version} expired; recompute the merge"
            ) from e
        if cur.num_buckets != base.num_buckets:
            raise CommitConflictError(
                "concurrent rebucket invalidated this merge's bucket "
                "assignment; recompute the merge"
            )
        if self.mode != "mor":
            changed = {
                b
                for b in (
                    set(cur.files) | set(base.files)
                    | set(cur.delta_files) | set(base.delta_files)
                )
                if cur.files.get(b) != base.files.get(b)
                or cur.delta_files.get(b) != base.delta_files.get(b)
            }
            overlap = changed & {str(b) for b in self.replaced_buckets}
            if overlap:
                raise CommitConflictError(
                    f"concurrent commit touched buckets "
                    f"{sorted(int(b) for b in overlap)} this merge rewrites; "
                    f"recompute the merge"
                )
        try:
            self.schema = evolve_schema(
                cur.schema, self.schema,
                frozen_cols=set(cur.key_cols) | set(cur.bucket_cols or ()),
            )
        except SchemaEvolutionError as e:
            raise CommitConflictError(
                f"concurrent schema change is incompatible: {e}"
            ) from e
        self.base_version = cur.version


def merge_into(
    table: LakeTable,
    updates: DataFrame,
    op_col: str = "op",
    delete_op: str = "D",
    write_partitions: int | None = None,
    order_cols: list[str] | None = None,
    affected_buckets: list[int] | None = None,
    update_keys: DataFrame | None = None,
    strategy: str = "shuffle",
    stat_cols: tuple[str, ...] | None = None,
    aligned: bool = False,
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

    ``strategy`` picks the physical plan:

    * ``"shuffle"`` (default): anti-join + union, both sides exchange
      on the key columns — Catalyst/AQE owns skew and memory.
    * ``"spj"``: storage-partitioned merge — the analog of Spark's
      storage-partitioned joins (SPARK-37375) for this table format.
      The table is ALREADY bucket-hashed on the keys, so only the
      (small) update side shuffles, grouped by bucket; each bucket's
      task then reads its own current data files directly and merges
      in Arrow — the current side never enters an Exchange and is
      never re-written through a second shuffle. See
      ``_spj_merge_write`` for the memory model and crash-safety.
    * ``"mor"``: merge-on-read delta append — writes O(batch) delta
      files with tombstones and defers the merge to read/compact time.
      See ``mor_delta_frame``.
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
    if stat_cols and strategy not in ("spj", "mor"):
        raise ValueError("stat_cols (fused lineage) requires strategy='spj' or 'mor'")
    m = table.manifest()
    if aligned:
        if strategy not in ("spj", "mor"):
            raise ValueError("aligned merges require strategy='spj' or 'mor'")
        if m.hash_fn != "murmur3":
            raise ValueError(
                f"aligned merges need a murmur3-bucketed table (the "
                f"shuffle partitioner's own hash); this table buckets on "
                f"{m.hash_fn!r}. Recreate with hash_fn='murmur3' or pass "
                f"aligned=False."
            )
        if m.bucket_cols and list(m.bucket_cols) != list(m.key_cols):
            # the upstream dedup shuffle hashes the FULL key; a subset
            # bucket routing no longer equals the partitioner, so the
            # partition_id == bucket contract cannot hold
            raise ValueError(
                f"aligned merges need full-key bucket routing; this table "
                f"buckets on subset {list(m.bucket_cols)} of keys "
                f"{list(m.key_cols)}. Pass aligned=False."
            )
    keys = m.key_cols

    incoming = updates.drop(op_col, *(stat_cols or ())).schema
    evolved = evolve_schema(
        m.schema, incoming,
        frozen_cols=set(m.key_cols) | set(m.bucket_cols or ()),
    )

    bucket = bucket_expr_for(m)
    upd = updates.withColumn("__b", bucket)

    if strategy == "spj":
        if m.delta_files:
            # the spj tasks read raw BASE files per bucket; pending MoR
            # deltas would be silently ignored — refuse instead.
            raise ValueError(
                "table has pending merge-on-read deltas; run "
                "table.compact() first or use strategy='mor'/'shuffle' "
                "(the shuffle plan reads the merged view)"
            )
        # affected buckets come back with the merge result itself (one
        # stats row per bucket group) — no pre-pass needed; the order
        # guard runs inside the bucket task (vectorized pandas on the
        # matched subset)
        return _spj_merge_write(
            table, upd, op_col, delete_op, evolved,
            stat_cols=stat_cols, order_cols=order_cols, aligned=aligned,
        )
    if strategy == "mor":
        if order_cols:
            # the cross-batch guard needs the CURRENT row's order tuple,
            # i.e. a read of the base — which is exactly what MoR's
            # O(batch) write refuses to pay. Out-of-order delivery needs
            # the spj/shuffle guard; the batch engine's epoch watermark
            # already serializes epochs, so MoR epochs are in-order.
            raise ValueError(
                "order_cols (cross-batch LWW guard) is not supported "
                "with strategy='mor'; use 'spj' or 'shuffle'"
            )
        return _mor_delta_write(
            table, upd, op_col, delete_op, evolved, stat_cols=stat_cols,
            aligned=aligned,
        )
    if strategy != "shuffle":
        raise ValueError(f"unknown merge strategy: {strategy}")

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
        # __b leads so the partitioned write's required ordering is a
        # satisfied prefix — otherwise the key sort is superseded by
        # the write's own Sort(__b) and the layout is arrival order
        .sortWithinPartitions("__b", *keys)
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


_conform_arrow = conform_arrow  # shared with the table's MoR read path


SPJ_STATS_SCHEMA = (
    "bucket int, rows long, file string, n_keys long, n_events long, "
    "n_deletes long, min_lsn long, max_lsn long, bytes_in long"
)


def _aligned_bucket_apply(upd: DataFrame, bucket_fn, table: LakeTable) -> DataFrame:
    """Run a per-bucket pandas kernel over an ALREADY bucket-aligned
    frame — zero exchange.

    Precondition (the exchange-aligned contract, see
    ``Manifest.hash_fn``): ``upd``'s most recent shuffle was keyed on
    the table's ``key_cols`` with EXACTLY ``num_buckets`` partitions
    and AQE partition coalescing disabled, and the table buckets on
    murmur3 — then ``partition_id == pmod(murmur3(keys), nb) == __b``
    and partition p holds exactly bucket p's rows. Under that contract
    this is ``mapInPandas`` straight over the aggregation output:
    where ``spj_merge_frame``'s default shape pays
    ``repartition(nb, __b)`` — a SECOND full exchange of the deduped
    epoch batch — the aligned shape pays none at all.

    The contract is ASSERTED executor-side per partition (one vector
    compare of ``__b`` against TaskContext.partitionId), so a broken
    precondition — a transform that repartitioned, a stray conf — is a
    loud crash before any file is written, never silent misplacement.
    """
    import pandas as pd

    nb = int(table.manifest().num_buckets)

    def apply_partition(batches):
        from pyspark import TaskContext

        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pid = int(TaskContext.get().partitionId())
        bs = pdf["__b"].unique()
        if len(bs) != 1 or int(bs[0]) != pid:
            raise RuntimeError(
                f"aligned merge precondition broken: partition {pid} of "
                f"{nb} holds bucket(s) {sorted(int(x) for x in bs)[:8]} — "
                f"the update frame's last exchange was not "
                f"hashpartitioning(key_cols, num_buckets). A transform "
                f"that repartitions/joins, or shuffle confs not pinned "
                f"(spark.sql.shuffle.partitions={nb}, AQE coalescing "
                f"off), breaks alignment; rerun with aligned=False."
            )
        yield bucket_fn(pdf)

    return upd.mapInPandas(apply_partition, schema=SPJ_STATS_SCHEMA)


def spj_merge_frame(
    table: LakeTable,
    upd: DataFrame,
    op_col: str,
    delete_op: str,
    evolved: T.StructType,
    txn: str,
    stat_cols: tuple[str, ...] | None = None,
    order_cols: list[str] | None = None,
    aligned: bool = False,
) -> DataFrame:
    """Storage-partitioned merge write phase (no Exchange on the
    current side).

    ``aligned=True`` (murmur3-bucketed tables only, see
    ``_aligned_bucket_apply``) removes the update side's exchange too:
    the epoch batch arrives already partitioned bucket-wise by the
    upstream dedup aggregation's own shuffle, so the WHOLE epoch runs
    on ONE exchange — scan -> partial agg (map-side combined) -> one
    shuffle that is simultaneously the dedup reduction AND the bucket
    routing -> per-bucket merge tasks. At 10^10 events that deletes an
    entire exchange of the deduped batch per epoch.

    Physical shape — the ``zipPartitions`` the bucket layout earns:
    the updates frame (already carrying ``__b``) is grouped by bucket
    via ``applyInPandas`` — ONE exchange, of the small epoch batch
    only. Each bucket's task then opens its own current data files
    straight from the snapshot manifest (an executor-side Arrow scan;
    the files of bucket b hold exactly the keys that hash to b, which
    is the same co-location guarantee Spark's storage-partitioned
    joins (SPARK-37375) exploit on Iceberg bucket tables), filters out
    keys the batch replaces, and streams survivors + sorted upserts
    into one new parquet file per bucket.

    Versus the shuffle plan, per epoch this saves (a) the exchange of
    the rewritten table rows (the CoW write's ``repartition(__b)``)
    and (b) the exchange of the current side into the anti-join — the
    two terms that grow with TABLE size rather than batch size.

    Memory model: one task holds one bucket's update batch (pandas)
    plus ONE current data file's row group at a time (Arrow streaming
    write) — bounded by ``num_buckets``, the same dial as the CoW
    blast radius. Crash-safety: files land under a fresh txn dir via
    write-to-tmp + atomic rename (task retries are idempotent:
    deterministic final name, last rename wins); nothing is visible
    until the manifest swap, exactly like the shuffle path.

    ``stat_cols`` (the per-key lineage counters ``operators.dedup.
    STAT_COLS``, in order: n_events, n_deletes, min_lsn, max_lsn,
    bytes_in) fuses the per-BUCKET lineage aggregation into the merge
    task itself: the whole epoch — dedup, transforms, merge, lineage —
    becomes ONE Spark job with no intermediate persist/collect barrier
    (previously a separate bucket-stats job cost ~1s of fixed overhead
    per epoch on small epochs).

    ``order_cols`` enables the cross-batch LWW guard (``WHEN MATCHED
    AND s.order > t.order``) inside the bucket task: matched current
    rows are only evicted when the update's order tuple is strictly
    greater, and stale upserts are dropped — all via vectorized pandas
    merges on the (bounded) matched subset, never per-row Python. Used
    by the streaming sink, where re-delivered or out-of-order
    micro-batches must not regress a key.
    """
    import pandas as pd

    from pyspark.sql.pandas.types import to_arrow_schema

    m = table.manifest()
    keys = list(m.key_cols)
    root = table.root
    bucket_files = {
        int(b): [os.path.join(root, p) for p in fs] for b, fs in m.files.items()
    }
    evolved_pa = to_arrow_schema(evolved)
    out_cols = [f.name for f in evolved.fields]

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import os as _os
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        b = int(pdf["__b"].iloc[0])
        if stat_cols:
            st = {
                "n_keys": len(pdf),
                "n_events": int(pdf[stat_cols[0]].sum()),
                "n_deletes": int(pdf[stat_cols[1]].sum()),
                "min_lsn": int(pdf[stat_cols[2]].min()),
                "max_lsn": int(pdf[stat_cols[3]].max()),
                "bytes_in": int(pdf[stat_cols[4]].sum()),
            }
        else:
            st = {
                "n_keys": len(pdf), "n_events": 0, "n_deletes": 0,
                "min_lsn": None, "max_lsn": None, "bytes_in": 0,
            }

        def composite(tbl):
            # One kernel for BOTH sides — the shared length-prefixed
            # injective encoding (see table.composite_key_array for why
            # pandas elementwise concat must never build these keys).
            return composite_key_array(tbl, keys)

        evicted = _pc.unique(
            composite(_pa.Table.from_pandas(pdf[keys], preserve_index=False))
        )

        guard = list(order_cols or ())

        def lex_gt(dfm, pairs):
            """Vectorized lexicographic compare over column pairs:
            True where tuple(left cols) > tuple(right cols)."""
            import numpy as np

            gt = np.zeros(len(dfm), dtype=bool)
            eq = np.ones(len(dfm), dtype=bool)
            for lcol, rcol in pairs:
                lv, rv = dfm[lcol], dfm[rcol]
                gt |= eq & (lv > rv).fillna(False).to_numpy(dtype=bool)
                eq &= (lv == rv).fillna(False).to_numpy(dtype=bool)
            return gt

        def pd_to_arrow(dfp):
            dfp = dfp.copy()
            for c in out_cols:
                if c not in dfp.columns:
                    dfp[c] = None
            return _pa.Table.from_pandas(
                dfp[out_cols], schema=evolved_pa, preserve_index=False
            )

        upd_ko = pdf[keys + guard] if guard else None
        cur_seen = []  # matched current (keys + order), for stale-upsert drop

        final = _os.path.join(txn, f"b{b:05d}.parquet")
        tmp = f"{final}.{_uuid.uuid4().hex}.tmp"
        writer = None
        rows = 0
        try:
            for f in bucket_files.get(b, ()):
                t = _pq.read_table(f)
                if not t.num_rows:
                    continue
                in_upd = _pc.is_in(composite(t), value_set=evicted)
                surv = t.filter(_pc.invert(in_upd))
                if surv.num_rows:
                    surv = _conform_arrow(surv, evolved_pa)
                    writer = writer or _pq.ParquetWriter(tmp, evolved_pa)
                    writer.write_table(surv)
                    rows += surv.num_rows
                if guard:
                    matched = t.filter(in_upd)
                    if matched.num_rows:
                        mp = matched.to_pandas()
                        cur_seen.append(mp[keys + guard])
                        mm = mp.merge(
                            upd_ko, on=keys, how="left", suffixes=("", "__u")
                        )
                        newer = lex_gt(mm, [(c + "__u", c) for c in guard])
                        keep = mp[~newer]  # update is stale: current row stays
                        if len(keep):
                            writer = writer or _pq.ParquetWriter(tmp, evolved_pa)
                            kt = pd_to_arrow(keep)
                            writer.write_table(kt)
                            rows += kt.num_rows
            ups = pdf[pdf[op_col] != delete_op]
            if guard and len(ups) and cur_seen:
                cur_ord = pd.concat(cur_seen, ignore_index=True)
                mm = ups.merge(
                    cur_ord, on=keys, how="left",
                    suffixes=("", "__c"), indicator=True,
                )
                newer = lex_gt(mm, [(c, c + "__c") for c in guard])
                keep_mask = (mm["_merge"] == "left_only").to_numpy() | newer
                ups = ups[keep_mask]
            ups = ups.sort_values(keys)
            if len(ups):
                ut = pd_to_arrow(ups)
                writer = writer or _pq.ParquetWriter(tmp, evolved_pa)
                writer.write_table(ut)
                rows += ut.num_rows
        finally:
            if writer is not None:
                writer.close()
        if rows:
            _os.rename(tmp, final)
            return pd.DataFrame([{"bucket": b, "rows": rows, "file": final, **st}])
        if _os.path.exists(tmp):
            _os.remove(tmp)
        return pd.DataFrame([{"bucket": b, "rows": 0, "file": None, **st}])

    # Pin the merge exchange to num_buckets partitions (a user
    # repartition on the grouping key satisfies
    # ClusteredDistribution(__b), so Catalyst adds no second exchange;
    # REPARTITION_BY_NUM is exempt from AQE coalescing). Rationale is
    # the scale shape, not local wall time: a bucket task's cost has a
    # constant file-I/O term (open the bucket's current files, write +
    # rename one parquet file) that does not shrink with batch bytes,
    # so AQE's byte-based coalescing — built for pure-compute stages —
    # packs many bucket rewrites serially into few tasks whenever the
    # batch is small relative to the advisory partition size. At
    # production bucket counts (O(10^4) for a 10^10-row table) that
    # would cap merge parallelism by batch size instead of by layout.
    # Measured at local[32]/64 buckets: identical plan at bench scale
    # (AQE already kept 64), ~10% on 2k-event epochs (32 parallel
    # bucket rewrites vs 1 serial task; driver fixed costs dominate).
    if aligned:
        return _aligned_bucket_apply(upd, merge_bucket, table)
    return (
        upd.repartition(int(table.manifest().num_buckets), F.col("__b"))
        .groupBy("__b")
        .applyInPandas(merge_bucket, schema=SPJ_STATS_SCHEMA)
    )


def _spj_merge_write(
    table: LakeTable,
    upd: DataFrame,
    op_col: str,
    delete_op: str,
    evolved: T.StructType,
    stat_cols: tuple[str, ...] | None = None,
    order_cols: list[str] | None = None,
    aligned: bool = False,
) -> PendingMerge:
    m = table.manifest()
    txn = table.new_txn_dir()
    res = spj_merge_frame(
        table, upd, op_col, delete_op, evolved, txn,
        stat_cols=stat_cols, order_cols=order_cols, aligned=aligned,
    ).collect()  # bounded: one row per affected bucket

    affected = sorted(int(r["bucket"]) for r in res)
    new_files = {int(r["bucket"]): [r["file"]] for r in res if r["rows"]}
    new_counts = {int(r["bucket"]): int(r["rows"]) for r in res if r["rows"]}
    rows_before = sum(m.row_counts.get(str(b), 0) for b in affected)
    stats = MergeStats(
        affected_buckets=affected,
        rows_before=rows_before,
        rows_after=sum(new_counts.values()),
        files_written=len(new_files),
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
        bucket_stats={
            int(r["bucket"]): {
                "n_keys": int(r["n_keys"]),
                "n_events": int(r["n_events"]),
                "n_deletes": int(r["n_deletes"]),
                "min_lsn": r["min_lsn"],
                "max_lsn": r["max_lsn"],
                "bytes_in": int(r["bytes_in"]),
            }
            for r in res
        },
    )


def mor_delta_frame(
    table: LakeTable,
    upd: DataFrame,
    op_col: str,
    delete_op: str,
    evolved: T.StructType,
    txn: str,
    stat_cols: tuple[str, ...] | None = None,
    aligned: bool = False,
) -> DataFrame:
    """Merge-on-read write phase: the epoch batch becomes one DELTA
    file per touched bucket — upserts carry the new image, deletes
    become tombstone rows (``__op='D'``) — and NOTHING of the current
    table is read or rewritten. This is the Iceberg v2 equality-delete
    write shape: an epoch's write cost is O(batch), independent of
    table size, where CoW (spj/shuffle) pays O(touched buckets of the
    table) per epoch. Readers resolve base ⊕ deltas with bucket-local
    LWW (``LakeTable._read_merged_buckets``) until ``compact()`` folds
    the deltas into a fresh base.

    Physical shape: ONE exchange of the epoch batch grouped by bucket
    (``applyInPandas``); each task sorts its bucket's rows by key and
    streams them into one parquet file under the txn dir (tmp +
    atomic rename; deterministic name makes task retries idempotent).
    ``stat_cols`` fuses the per-bucket lineage aggregation exactly as
    the spj plan does, so a whole MoR epoch is ONE Spark job.

    Within a delta file keys are unique (the epoch batch is LWW-
    deduplicated upstream); across files the manifest's delta order is
    the apply order, and the engine's epoch watermark guarantees that
    order matches event time for the batch engine.
    """
    import pandas as pd

    from pyspark.sql.pandas.types import to_arrow_schema

    evolved_pa = to_arrow_schema(evolved)
    out_cols = [f.name for f in evolved.fields]
    keys_b = list(table.manifest().key_cols)

    def write_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import os as _os
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        b = int(pdf["__b"].iloc[0])
        if stat_cols:
            st = {
                "n_keys": len(pdf),
                "n_events": int(pdf[stat_cols[0]].sum()),
                "n_deletes": int(pdf[stat_cols[1]].sum()),
                "min_lsn": int(pdf[stat_cols[2]].min()),
                "max_lsn": int(pdf[stat_cols[3]].max()),
                "bytes_in": int(pdf[stat_cols[4]].sum()),
            }
        else:
            st = {
                "n_keys": len(pdf), "n_events": 0, "n_deletes": 0,
                "min_lsn": None, "max_lsn": None, "bytes_in": 0,
            }
        pdf = pdf.sort_values(keys_b)
        dfp = pdf.copy()
        for c in out_cols:
            if c not in dfp.columns:
                dfp[c] = None
        t = _pa.Table.from_pandas(
            dfp[out_cols], schema=evolved_pa, preserve_index=False
        )
        # normalized tombstone marker, independent of the caller's
        # delete_op token — the read path only ever checks 'D'
        op_norm = _pa.array(
            [("D" if v == delete_op else "U") for v in pdf[op_col]],
            type=_pa.string(),
        )
        t = t.append_column("__op", op_norm)
        final = _os.path.join(txn, f"b{b:05d}.parquet")
        tmp = f"{final}.{_uuid.uuid4().hex}.tmp"
        _pq.write_table(t, tmp)
        _os.rename(tmp, final)
        return pd.DataFrame(
            [{"bucket": b, "rows": t.num_rows, "file": final, **st}]
        )

    # Same partition pinning as spj_merge_frame: per-bucket delta-file
    # writes carry a constant I/O term AQE's byte-based coalescing
    # would serialize.
    if aligned:
        return _aligned_bucket_apply(upd, write_bucket, table)
    return (
        upd.repartition(int(table.manifest().num_buckets), F.col("__b"))
        .groupBy("__b")
        .applyInPandas(write_bucket, schema=SPJ_STATS_SCHEMA)
    )


def _mor_delta_write(
    table: LakeTable,
    upd: DataFrame,
    op_col: str,
    delete_op: str,
    evolved: T.StructType,
    stat_cols: tuple[str, ...] | None = None,
    aligned: bool = False,
) -> PendingMerge:
    m = table.manifest()
    txn = table.new_txn_dir()
    res = mor_delta_frame(
        table, upd, op_col, delete_op, evolved, txn, stat_cols=stat_cols,
        aligned=aligned,
    ).collect()  # bounded: one row per affected bucket

    affected = sorted(int(r["bucket"]) for r in res)
    new_files = {int(r["bucket"]): [r["file"]] for r in res if r["rows"]}
    new_counts = {int(r["bucket"]): int(r["rows"]) for r in res if r["rows"]}
    rows_before = sum(m.row_counts.get(str(b), 0) for b in affected)
    stats = MergeStats(
        affected_buckets=affected,
        rows_before=rows_before,
        # for MoR this is DELTA rows appended (incl. tombstones) — the
        # merged table size is only known at read/compact time
        rows_after=sum(new_counts.values()),
        files_written=len(new_files),
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
        bucket_stats={
            int(r["bucket"]): {
                "n_keys": int(r["n_keys"]),
                "n_events": int(r["n_events"]),
                "n_deletes": int(r["n_deletes"]),
                "min_lsn": r["min_lsn"],
                "max_lsn": r["max_lsn"],
                "bytes_in": int(r["bytes_in"]),
            }
            for r in res
        },
        mode="mor",
    )
