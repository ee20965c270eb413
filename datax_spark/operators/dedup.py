"""Last-writer-wins dedup: one surviving event per key per micro-batch.

Semantics (SURVEY.md §2.5): within a batch of change events, the event
with the maximum ``(commit, lsn)`` per ``(repo, path)`` wins — the
Spark analog of otsstreamreader's per-key sequenceId ordering
(``MultiVerModeRecordSender.java:96-103``) combined with the RDBMS
writer's ON-DUPLICATE-KEY-UPDATE last-writer-wins apply
(``WriterUtil.java:150-170``).

Physical strategy — scale notes:

* The primary implementation is ``groupBy(keys).agg(max_by(row,
  order))`` — a hash aggregate, NOT a window. Spark plans it as
  partial_max_by (map-side combine) → shuffle on keys → final merge.
  A window (`row_number over partitionBy`) would shuffle EVERY event
  and sort whole partitions; max_by reduces each map partition to at
  most |distinct keys in partition| rows before the exchange — at
  10^10 events with a hot repo holding 30%+ of traffic this is the
  difference between shipping 3×10^9 rows and shipping ~|keys| rows.
* ``salt_buckets`` adds an explicit two-stage reduction (salt →
  per-(key,salt) max → unsalt → per-key max) for the case where even
  final-merge skew matters (one reducer owning the hot key's combined
  partials). With map-side combine the partial rows per key are
  bounded by #map-tasks, so the default is fine until task counts get
  huge; the salted path bounds reducer fan-in by ``salt_buckets``.
  This is the engine's anti-hotspot lever, replacing the reference's
  resource-mark round-robin (``JobAssignUtil.java:20-57``).

Ties are impossible in well-formed logs (lsn is a total order); if
they occur, struct comparison breaks them deterministically by the
remaining columns' order in ``order_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    salt_buckets: int | None = None,
) -> DataFrame:
    """Keep, per key, the row with the max ``order_cols`` tuple.

    Returns a DataFrame with the same columns as ``df`` (one row per
    distinct key). ``salt_buckets`` enables the two-stage salted
    reduction for hot-key skew.
    """
    payload = [c for c in df.columns if c not in keys]
    row = F.struct(*[F.col(c) for c in payload])
    order = F.struct(*[F.col(c) for c in order_cols])

    if not salt_buckets:
        agg = df.groupBy(*keys).agg(F.max_by(row, order).alias("__row"))
        return agg.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])

    # Stage 1: reduce within (key, salt) — spreads a hot key over
    # `salt_buckets` reducers. Salt is derived from the order column so
    # it is deterministic (replay-stable), uniform, and key-independent.
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets))
    )
    stage1 = (
        salted.groupBy(*keys, "__salt")
        .agg(F.max_by(row, order).alias("__row"))
        .select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])
    )
    # Stage 2: at most `salt_buckets` candidate rows per key remain.
    agg = stage1.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), F.struct(*[F.col(c) for c in order_cols])).alias("__row")
    )
    return agg.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])


STAT_COLS = (
    "__stat_n_events",
    "__stat_n_deletes",
    "__stat_min_lsn",
    "__stat_max_lsn",
    "__stat_bytes_in",
)


def lww_dedup_stats(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    lsn_col: str = "lsn",
    content_col: str | None = "content",
    salt_buckets: int | None = None,
) -> DataFrame:
    """LWW dedup that ALSO emits per-key lineage stats (``STAT_COLS``)
    in the SAME aggregation — count/deletes/min-max lsn/bytes ride the
    one shuffle as primitive map-side-combined aggregates, so the
    engine needs no separate lineage scan over the raw events (the
    replay driver previously paid a full extra pass per epoch for
    them). Bucket-level lineage = a tiny second agg over this output.

    ``salt_buckets`` gives the two-stage salted reduction WITH exact
    stats: every stat is an associative aggregate (count→sum, sum→sum,
    min→min, max→max), so stage 2 combines the per-(key, salt)
    partials losslessly — the winner row recompares by the order
    columns carried inside it. Sum of exact partials = the exact
    per-key stat; there is no approximation anywhere. (A previous
    engine revision believed salted stats impossible and paid a
    dedicated full lineage scan per salted epoch.)
    """
    payload = [c for c in df.columns if c not in keys]
    row = F.struct(*[F.col(c) for c in payload])
    order = F.struct(*[F.col(c) for c in order_cols])
    content = (
        F.coalesce(F.octet_length(content_col), F.lit(0))
        if content_col and content_col in df.columns
        else F.lit(0)
    )
    raw_stats = [
        F.count(F.lit(1)).alias(STAT_COLS[0]),
        F.sum((F.col(op_col) == delete_op).cast("long")).alias(STAT_COLS[1]),
        F.min(lsn_col).alias(STAT_COLS[2]),
        F.max(lsn_col).alias(STAT_COLS[3]),
        F.sum(content).alias(STAT_COLS[4]),
    ]
    if not salt_buckets:
        agg = df.groupBy(*keys).agg(F.max_by(row, order).alias("__row"), *raw_stats)
        return agg.select(
            *keys, *[F.col(f"__row.{c}").alias(c) for c in payload], *STAT_COLS
        )
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(salt_buckets)),
    )
    stage1 = salted.groupBy(*keys, "__salt").agg(
        F.max_by(row, order).alias("__row"), *raw_stats
    )
    order2 = F.struct(*[F.col(f"__row.{c}") for c in order_cols])
    agg = stage1.groupBy(*keys).agg(
        F.max_by(F.col("__row"), order2).alias("__row"),
        F.sum(STAT_COLS[0]).alias(STAT_COLS[0]),
        F.sum(STAT_COLS[1]).alias(STAT_COLS[1]),
        F.min(STAT_COLS[2]).alias(STAT_COLS[2]),
        F.max(STAT_COLS[3]).alias(STAT_COLS[3]),
        F.sum(STAT_COLS[4]).alias(STAT_COLS[4]),
    )
    return agg.select(
        *keys, *[F.col(f"__row.{c}").alias(c) for c in payload], *STAT_COLS
    )
