"""SCD Type-2 history target for the CDC replay stream.

LWW replay keeps each key's LAST version; an SCD2 (slowly-changing-
dimension type 2) target keeps EVERY version as a validity interval —
the warehouse shape for "what did this row look like at commit X".
Reference analog: the common DataX deployment pattern of landing
otsstreamreader's op-typed change records (MultiVerModeRecordSender
.java:83-121) into an append-only history table via a writer without
upsert keys (mysqlwriter writeMode=insert, mysqlwriter/doc/
mysqlwriter.md); there the warehouse closes intervals with follow-up
SQL — here the engine maintains the intervals itself, incrementally
and exactly-once.

Table shape — one row per (key, version interval):

    <key cols>  payload...  commit  lsn          <- the version's own
                                                    event = valid_from
    valid_to_commit  valid_to_lsn   (NULL = still open)
    is_current                      (valid_to IS NULL)

* identity key   = key_cols + (lsn,)  — ``lsn`` is the log's total
  order, so (key, lsn) names exactly one version interval;
* bucket routing = key_cols only (``LakeTable.create(bucket_cols=)``):
  a key's entire history co-locates in one bucket even though the
  identity key differs per version, so "the open rows of this epoch's
  keys" is a bucket-pruned read, never a table scan. With
  ``is_current`` in ``stats_cols``, files holding only closed history
  (max(is_current)=false — the steady state after compaction sorts)
  are skipped by file stats on top of the bucket pruning.

Epoch apply — the same exactly-once discipline as the LWW engine:

1. scan the epoch's events (op I/U/D, totally ordered by
   ``order_cols`` = (commit, lsn));
2. read the CURRENT open rows of exactly the affected keys
   (bucket-pruned + stats-pruned + broadcast-semi-joined);
3. union the open rows (each stamped at its own (commit, lsn) =
   valid_from) with the new events, and window per key ordered by
   (commit, lsn): ``valid_to = LEAD(commit, lsn)``; a delete event
   closes its predecessor and emits no row; the last non-delete
   version stays open (``is_current``);
4. MERGE the rewritten + new interval rows. Default strategy is
   MERGE-ON-READ (``Scd2Config.strategy="mor"``): a history table
   GROWS monotonically, so a copy-on-write epoch would rewrite
   ever-larger bucket files — O(table) per epoch. MoR instead
   appends O(batch) delta files (closed history never conflicts;
   the only per-key collision is the open row vs its own closed
   rewrite, which later-delta-wins resolves correctly), and
   ``compact_every`` folds the deltas on a cadence so read
   amplification stays bounded. ``strategy="spj"`` remains for
   small/cold tables where one file per bucket beats delta stacks;
5. two-phase commit with the ``last_epoch`` manifest watermark —
   crash replay / duplicate epochs are no-ops, same gate as replay.

Order guard: every new event must sort STRICTLY AFTER the affected
key's open row (the engine's epoch-contiguity gate guarantees this on
an in-order log). A violation would silently rewrite closed history,
so it is detected IN the apply pass (an Observation on the same job —
no extra scan) and aborts before the commit; the written txn files
are orphans, exactly like any pre-commit crash.

Scale: step 3's window shuffles O(epoch events + affected open rows)
— batch-sized, never table-sized; step 4's default MoR write is
O(batch) regardless of table size, and the periodic compaction is
the only table-sized job (amortized over ``compact_every`` epochs,
the same trade merge-on-read ingest makes everywhere). At 10^10
events the table grows with TOTAL VERSIONS (that is what SCD2
stores), but an epoch never pays for history it didn't touch.
"""

from __future__ import annotations

import glob
import os
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable, bucket_expr_for

VALID_TO_SUFFIX = "valid_to_"


class Scd2OrderError(RuntimeError):
    """An epoch carried an event at or before an affected key's open
    row — applying it would rewrite closed history."""


@dataclass(frozen=True)
class Scd2Config:
    keys: tuple[str, ...] = ("repo", "path")
    order_cols: tuple[str, ...] = ("commit", "lsn")
    op_col: str = "op"
    delete_op: str = "D"
    num_buckets: int = 32
    hash_fn: str = "murmur3"
    shard_manifest_buckets: int | None = None
    # "mor" (default): O(batch) delta appends + periodic fold — the
    # only write shape whose epoch cost does not grow with the
    # monotonically-growing history. "spj": bucket-local CoW, one
    # file per bucket — right for small/cold tables.
    strategy: str = "mor"
    compact_every: int | None = 8  # fold deltas every N epochs (mor)

    def __post_init__(self) -> None:
        if not self.keys or not self.order_cols:
            raise ValueError("keys and order_cols must be non-empty")
        overlap = set(self.keys) & set(self.order_cols)
        if overlap:
            raise ValueError(f"keys and order_cols overlap: {sorted(overlap)}")
        if self.strategy not in ("mor", "spj"):
            raise ValueError(f"strategy must be 'mor' or 'spj', got {self.strategy!r}")
        if self.compact_every is not None and self.compact_every < 1:
            raise ValueError(f"compact_every must be >= 1, got {self.compact_every}")

    @property
    def seq_col(self) -> str:
        """The totally-ordered column that extends the identity key
        (the last order col — the LSN)."""
        return self.order_cols[-1]


@dataclass
class Scd2EpochResult:
    epoch: int
    skipped: bool = False
    versions_written: int = 0
    keys_touched: int = 0
    phase_ms: dict = field(default_factory=dict)


@dataclass
class Scd2Engine:
    """Replays an ``epoch=N``-partitioned changelog into an SCD2
    history table, one exactly-once epoch at a time."""

    spark: SparkSession
    events_root: str
    table_root: str
    config: Scd2Config = field(default_factory=Scd2Config)

    # ---------- discovery / resume ----------
    def discover_epochs(self) -> list[int]:
        out = []
        for d in glob.glob(os.path.join(self.events_root, "epoch=*")):
            m = re.search(r"epoch=(\d+)$", d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def table(self) -> LakeTable:
        return LakeTable.load(self.spark, self.table_root)

    def resume_epoch(self) -> int:
        if not LakeTable.exists(self.table_root):
            return 0
        return self.table().last_epoch + 1

    def _ensure_table(self, ev: DataFrame) -> LakeTable:
        if LakeTable.exists(self.table_root):
            return self.table()
        cfg = self.config
        base = ev.drop(cfg.op_col).schema
        fields = list(base.fields)
        for c in cfg.order_cols[:-1]:
            fields.append(
                T.StructField(VALID_TO_SUFFIX + c, base[c].dataType, True)
            )
        fields.append(
            T.StructField(
                VALID_TO_SUFFIX + cfg.seq_col, base[cfg.seq_col].dataType, True
            )
        )
        fields.append(T.StructField("is_current", T.BooleanType(), True))
        return LakeTable.create(
            self.spark,
            self.table_root,
            schema=T.StructType(fields),
            key_cols=[*cfg.keys, cfg.seq_col],
            bucket_cols=list(cfg.keys),
            num_buckets=cfg.num_buckets,
            # open-row reads filter is_current; range reads filter the
            # validity interval — both columns prune at file level
            stats_cols=["is_current", cfg.seq_col],
            hash_fn=cfg.hash_fn,
            shard_buckets=cfg.shard_manifest_buckets,
        )

    # ---------- epoch apply ----------
    def apply_epoch(self, epoch: int) -> Scd2EpochResult:
        cfg = self.config
        t0 = time.monotonic()
        ev = self.spark.read.parquet(
            os.path.join(self.events_root, f"epoch={epoch}")
        )
        table = self._ensure_table(ev)
        m = table.manifest()
        last = m.last_epoch
        if epoch <= last:
            return Scd2EpochResult(epoch=epoch, skipped=True)
        if epoch != last + 1:
            raise ValueError(
                f"out-of-order epoch {epoch}; committed watermark is {last}"
            )

        keys = list(cfg.keys)
        order = list(cfg.order_cols)
        ph: dict[str, float] = {}

        # defensive re-delivery dedup: identical (key, order) tuples are
        # the same event delivered twice — keep one
        ev = ev.dropDuplicates([*keys, *order])

        # --- open rows of the affected keys (bucket- + stats-pruned) ---
        tp = time.monotonic()
        kdf = ev.select(*keys).distinct()
        affected = sorted(
            r["__b"]
            for r in kdf.select(
                bucket_expr_for(m).alias("__b")
            ).distinct().collect()
        )  # ≤ num_buckets ints — the same tiny collect the CoW merge does
        cur_open = (
            table.read(buckets=affected, filters=[("is_current", "=", True)])
            .join(F.broadcast(kdf), on=keys, how="left_semi")
        )
        ph["open_read"] = (time.monotonic() - tp) * 1000

        # --- stitch intervals: open rows re-enter at their own
        # valid_from; new events extend the timeline ---
        tp = time.monotonic()
        open_as_events = (
            cur_open.drop(
                "is_current", *[VALID_TO_SUFFIX + c for c in order]
            )
            .withColumn(cfg.op_col, F.lit("U"))
            .withColumn("__from_table", F.lit(True))
        )
        combined = open_as_events.unionByName(
            ev.withColumn("__from_table", F.lit(False)),
            allowMissingColumns=True,  # additive schema evolution
        )

        w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
        stitched = combined.withColumn("__rn", F.row_number().over(w))
        for c in order:
            stitched = stitched.withColumn(
                VALID_TO_SUFFIX + c, F.lead(c).over(w)
            )
        # an open row sorting anywhere but FIRST in its key's window
        # means the epoch carried an event at or before it — closed
        # history would be rewritten. Counted on the merge job itself.
        viol = (F.col("__from_table") & (F.col("__rn") > 1)).cast("long")
        obs = Observation(f"scd2-epoch-{epoch}")
        rows = (
            stitched.observe(
                obs,
                F.sum(viol).alias("n_viol"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .filter(F.col(cfg.op_col) != cfg.delete_op)
            .withColumn(
                "is_current",
                F.col(VALID_TO_SUFFIX + cfg.seq_col).isNull(),
            )
            .drop("__from_table", "__rn")
            .withColumn(cfg.op_col, F.lit("U"))
        )

        pending = merge_into(
            table,
            rows,
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,  # never present — pure upsert
            strategy=cfg.strategy,
        )
        ph["stitch_merge"] = (time.monotonic() - tp) * 1000

        n_viol = int(obs.get.get("n_viol") or 0)
        if n_viol:
            # abort BEFORE the pointer swap: the txn files are orphans,
            # the table is untouched — same contract as a pre-commit crash
            raise Scd2OrderError(
                f"epoch {epoch}: {n_viol} event(s) at or before an "
                f"affected key's open row — closed history is immutable; "
                f"replay the log in order"
            )

        tp = time.monotonic()
        pending.commit(summary={"last_epoch": epoch})
        ph["commit"] = (time.monotonic() - tp) * 1000

        if (
            cfg.strategy == "mor"
            and cfg.compact_every
            and (epoch + 1) % cfg.compact_every == 0
            and self.table().manifest().delta_files
        ):
            # fold the delta stack on a cadence: the one table-sized
            # job, amortized over compact_every O(batch) epochs
            tp = time.monotonic()
            self.table().compact()
            ph["compact"] = (time.monotonic() - tp) * 1000

        ph["total"] = (time.monotonic() - t0) * 1000
        # spj rewrites buckets (delta = net new interval rows); mor
        # appends exactly the epoch's interval rows as deltas
        written = (
            pending.stats.rows_after
            if pending.mode == "mor"
            else pending.stats.rows_after - pending.stats.rows_before
        )
        return Scd2EpochResult(
            epoch=epoch,
            versions_written=written,
            keys_touched=int(obs.get.get("n_rows") or 0),
            phase_ms=ph,
        )

    def run(self) -> list[Scd2EpochResult]:
        out = []
        for e in self.discover_epochs():
            if e < self.resume_epoch():
                out.append(Scd2EpochResult(epoch=e, skipped=True))
                continue
            out.append(self.apply_epoch(e))
        return out


def history_as_of(
    table: LakeTable, commit: str, lsn: int, cfg: Scd2Config | None = None
) -> DataFrame:
    """The table state AS OF a (commit, lsn) position, answered from
    the history alone: the version row whose validity interval covers
    the position. Closed intervals are [from, to); the open interval
    is [from, ∞)."""
    cfg = cfg or Scd2Config()
    order = list(cfg.order_cols)
    pos = F.struct(
        F.lit(commit).alias(order[0]), F.lit(lsn).alias(order[1])
    )
    frm = F.struct(*[F.col(c).alias(c) for c in order])
    to = F.struct(
        *[F.col(VALID_TO_SUFFIX + c).alias(c) for c in order]
    )
    return table.read().filter(
        (frm <= pos) & (F.col("is_current") | (to > pos))
    )
