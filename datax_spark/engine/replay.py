"""Micro-batch CDC replay driver: the engine's JobContainer.

Lifecycle per epoch (the reference's fixed pipeline
``JobContainer.java:96-128`` init→prepare→split→schedule→post, recast
as a micro-batch loop):

    1. idempotence gate  — skip epochs <= the table's committed
       watermark (exactly-once; analog: otsstreamreader checkpoint
       recovery, ``OTSStreamReaderSlaveProxy.java:40-107``)
    2. read epoch slice  — parquet scan of ``events_root/epoch=N``
    3. LWW dedup + lineage stats — max-(commit,lsn) per (repo,path)
       with per-key offset/count/byte counters riding the SAME
       map-side-combined aggregation (operators.lww_dedup_stats); the
       salted two-stage variant for single-hot-key streams composes
       the same exact stats across its stages (sum/min/max of
       partials), so it rides the fused one-job epoch too
    4. vectorized transforms — Arrow pandas-UDF content transforms on
       the winning images only (never per-row Python; north_star
       requirement), computed lazily exactly once inside the merge
    5. MERGE              — bucket-pruned copy-on-write merge into the
       lake table (lake.merge_into), additive schema evolution
    6. two-phase commit   — atomic manifest swap carrying the epoch
       watermark (lake.LakeTable.commit)
    7. lineage metrics    — per-(epoch,bucket) offsets/rows/bytes/
       latency (engine.metrics), written idempotently

Crash-safety: a crash anywhere before step 6 leaves the previous
snapshot live; re-running the engine replays the epoch from scratch
and converges to the identical state (orphan data files are ignored,
``vacuum`` reclaims them). A crash after step 6 skips the epoch on
replay via the watermark. ``failpoints`` injects crashes between
phases for tests.
"""

from __future__ import annotations

import glob
import os
import re
import time
from collections.abc import Callable, Sequence
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from datax_spark.engine.metrics import write_epoch_metrics
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable
from datax_spark.operators.dedup import STAT_COLS, lww_dedup_stats


@contextmanager
def aligned_shuffle_confs(spark: SparkSession, num_buckets: int):
    """Pin the session confs that make the dedup aggregation's shuffle
    BE the bucket routing (see ReplayConfig.aligned_exchange): exactly
    ``num_buckets`` shuffle partitions, and AQE partition coalescing
    off so the runtime cannot merge them (coalescing would break the
    ``partition_id == bucket`` identity; everything else about AQE is
    left on). Confs are restored on exit — lazily-built plans must
    execute INSIDE this context."""
    conf = spark.conf
    pins = {
        "spark.sql.shuffle.partitions": str(int(num_buckets)),
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved: dict[str, str | None] = {}
    for k, v in pins.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


class ReplayCrash(RuntimeError):
    """Injected crash (tests only)."""


class DirtyDataError(RuntimeError):
    """Epoch exceeded the dirty-record limit (ErrorRecordChecker
    analog); raised BEFORE any table write, so replay is clean."""


class EpochAuditError(RuntimeError):
    """An audited epoch's candidate snapshot failed its audit_fn; the
    staged snapshot was dropped and the table is unchanged."""


def audit_gated_commit(
    table: "LakeTable",
    pending,
    epoch: int,
    summary: dict,
    audit_fn: Callable[[DataFrame], bool] | None,
    failpoints: Sequence[str] = (),
) -> int:
    """Phase-2 commit of an epoch/batch, optionally write-audit-publish
    gated: stage the snapshot, run the audit on the candidate state
    while readers still see the pre-epoch table, publish on True, drop
    and raise EpochAuditError on False. Shared by the batch replay
    driver and the streaming foreachBatch sink. Returns the published
    table version."""
    if audit_fn is None:
        return pending.commit(summary=summary)
    wid = f"epoch-{epoch}"
    if wid in table._wap_staged():
        # a prior attempt crashed between stage and publish: the
        # watermark never moved, so this retry owns the id — drop the
        # stale candidate and re-stage
        table.drop_wap(wid)
    table.wap_id = wid
    try:
        pending.commit(summary=summary)
    finally:
        table.wap_id = None
    if "after_stage" in failpoints:
        raise ReplayCrash("after_stage")
    if audit_fn(table.read(version=wid)):
        return table.publish_wap(wid)
    v = table.wap_version(wid)
    table.drop_wap(wid)
    raise EpochAuditError(
        f"epoch {epoch} failed audit; staged snapshot v{v} dropped, "
        f"table unchanged at v{table.current_version()}"
    )


@dataclass(frozen=True)
class ReplayConfig:
    keys: tuple[str, ...] = ("repo", "path")
    order_cols: tuple[str, ...] = ("commit", "lsn")
    op_col: str = "op"
    delete_op: str = "D"
    lsn_col: str = "lsn"
    num_buckets: int = 64
    # Salted two-stage dedup is OFF by default, deliberately: with
    # composite keys (repo, path), a hot *repo* does not produce a hot
    # *shuffle key* — its paths hash uniformly across reducers, so the
    # plain max_by hash-agg (map-side combined) already defeats
    # repo-level skew, and the salted path's extra shuffle measured
    # 2.4x slower at 4M events. Set salt_buckets when a SINGLE key
    # receives a pathological share of one epoch's events (e.g. keys
    # = (repo,) alone, or one file rewritten millions of times per
    # window) — then it bounds reducer fan-in at `salt_buckets`.
    salt_buckets: int | None = None
    # Arrow-vectorized content transforms, applied post-dedup to the
    # winning event images: each fn takes and returns a DataFrame.
    transforms: tuple[Callable[[DataFrame], DataFrame], ...] = ()
    # Dirty-data policy (ErrorRecordChecker.java:18-82 analog): events
    # with NULL in any key or order column cannot be keyed or ordered —
    # they are quarantined under <metrics_root>/../quarantine/epoch=N,
    # counted in EpochResult.n_dirty, and the epoch FAILS (before any
    # table write) when count > dirty_record_limit (None = unlimited).
    # Merge physical strategy. "spj" (default): storage-partitioned
    # merge — only the epoch batch shuffles; each bucket task reads its
    # own current files directly (no Exchange that scales with TABLE
    # size), and the unsalted path fuses dedup+transforms+merge+lineage
    # into ONE Spark job (see lake.merge.spj_merge_frame). Measured:
    # 323k vs 278k ev/s at 16M events/128 buckets, 2.1x at 4M/3-epoch,
    # 1.8x on 10 small epochs — identical sha256-verified state.
    # "shuffle": anti-join + re-bucketed CoW write, Catalyst/AQE own
    # skew and memory — the fallback when one bucket's batch+current
    # rows could exceed task memory (then raise num_buckets instead).
    # Both plans support the cross-batch order guard (the streaming
    # sink's stale-batch protection).
    # "spj_staged": diagnostic — the spj merge but with the two-job
    # staged structure (persisted dedup + separate lineage collect),
    # kept so fused-vs-staged can be A/B-measured in one noise window.
    # "mor": merge-on-read — each epoch APPENDS one delta file per
    # touched bucket (tombstones for deletes) and never reads or
    # rewrites the current table: write cost O(batch) instead of
    # O(touched buckets), the Iceberg v2 equality-delete shape. Reads
    # pay a bucket-local LWW merge until compaction folds deltas down;
    # set compact_every to bound that read amplification. The strategy
    # for write-rate-bound ingest whose epochs are much smaller than
    # the key space they touch.
    merge_strategy: str = "spj"
    # With merge_strategy="mor": fold pending deltas into fresh base
    # files (LakeTable.compact) after every N committed epochs — the
    # minor-compaction cadence that caps a reader's per-bucket merge at
    # N delta files. None = never (compaction left to a maintenance
    # job, Iceberg-style). The compaction is itself a snapshot commit,
    # so a crash between commit and compaction is harmless: the next
    # run simply compacts later.
    compact_every: int | None = None
    dirty_record_limit: int | None = None
    # Percentage limit (errorLimit.percentage): the epoch fails when
    # n_dirty / n_total exceeds this fraction, checked per epoch (the
    # reference checks once at job end; an epoch is this engine's job
    # unit). Reference parity (ErrorRecordChecker.java:18-45): setting
    # the RECORD limit DISABLES the percentage limit — the constructor
    # nulls percentageLimit whenever recordLimit is present — and the
    # fraction must lie in [0.0, 1.0].
    dirty_pct_limit: float | None = None
    quarantine: bool = True
    # File-level min/max/null stats harvested at every commit for these
    # columns (LakeTable stats_cols): lets downstream filtered reads
    # skip whole data files via the manifest (Iceberg scan planning).
    # Natural picks for a CDC table are the order columns — a
    # time-ranged read then touches only files whose commit/lsn bounds
    # overlap the range. Empty = stats off (the default).
    stats_cols: tuple[str, ...] = ()
    # Per-file bloom filters on these columns (LakeTable bloom_cols):
    # equality/IN reads — every point lookup — skip files whose bloom
    # proves the key absent, the pruning min/max can't give on
    # high-cardinality keys. Building them re-reads those columns of
    # each epoch's new files at commit, so reserve it for tables that
    # SERVE point reads. Empty = off (the default).
    bloom_cols: tuple[str, ...] = ()
    # Write-audit-publish epoch commits: when set, every epoch is
    # first STAGED (LakeTable WAP — manifest written, pointer
    # unmoved), then audit_fn(candidate_state_df) runs against the
    # staged snapshot while readers still see the pre-epoch state; a
    # True verdict fast-forward-publishes the pointer, False drops the
    # candidate and raises EpochAuditError with the table unchanged.
    # The data-quality circuit breaker downstream of the dirty-data
    # gate: dirty limits reject malformed EVENTS pre-write, the audit
    # rejects bad RESULTING STATE pre-publish (row-count collapse,
    # invariant violations, a bad upstream backfill). Exactly-once is
    # preserved: a crash between stage and publish leaves the
    # watermark unmoved, and the epoch's retry drops the stale staged
    # snapshot and re-runs.
    audit_fn: Callable[[DataFrame], bool] | None = None
    # Adaptive bucket-count evolution: when set, the engine rebuckets
    # the table (LakeTable.rebucket — one full rewrite committed as a
    # layout-only snapshot) after any epoch whose committed state
    # exceeds ``target_bucket_rows`` rows per bucket, doubling the
    # bucket count until back under target (capped at ``max_buckets``).
    # This automates the num_buckets dial that bounds BOTH the CoW
    # blast radius and per-task MoR merge memory: a stream that starts
    # at 64 buckets and grows to 10^9 keys steps to O(10^3-10^4)
    # buckets without operator action or downtime — readers keep the
    # old snapshot until the atomic pointer swap, the epoch watermark
    # carries through the rebucket commit, and the change feed streams
    # a rebucket as a zero-row heartbeat (it is provably layout-only).
    # Growth is geometric (powers of two), so the rewrite cost
    # amortizes: total rebucket work over a table's life is O(final
    # table size), like vector doubling. A crash between the epoch
    # commit and the rebucket is harmless — the threshold re-triggers
    # on the next applied epoch. None = manual (call rebucket()
    # yourself, the pre-existing behavior).
    target_bucket_rows: int | None = None
    max_buckets: int = 1 << 16
    # Derived-table maintenance: roots of AggViews (lake/matview.py)
    # the engine refreshes to the table's new head after every
    # committed epoch (and again at the end of run(), which heals a
    # crash that landed between an epoch commit and its view refresh —
    # each view's own synced-version watermark makes every refresh
    # idempotent and convergent, so views lag the table by at most
    # one crash window and never diverge). Create the views first
    # (AggView.create against the table root); the engine only
    # advances them.
    materialized_views: tuple[str, ...] = ()
    # Join-view maintenance (lake/joinview.py): (view_root, dim_root)
    # pairs — each view is a fact ⋈ dim of THIS engine's table against
    # the dimension LakeTable at dim_root, advanced to both tables'
    # heads on the same cadence/heal contract as materialized_views.
    # Create the views first (JoinView.create); the engine only
    # advances them. The dim side is maintained by whoever owns it
    # (another engine, a jobspec, manual merges) — its change feed is
    # read here, never written.
    join_views: tuple[tuple[str, str], ...] = ()
    # Refresh cadence for the attached views: refresh after every Nth
    # committed epoch (1 = every epoch). A view refresh costs roughly
    # one extra read of the epoch's touched buckets per diff side (the
    # change feed is a snapshot diff) — measured comparable to the
    # epoch apply itself when epochs touch every bucket — so bulk
    # backfills should raise this and let the views catch up in one
    # multi-epoch window; run() always heals views to head at the end
    # regardless of cadence, and the feed window composes across any
    # number of skipped epochs (the refresh is version-ranged, not
    # epoch-ranged).
    view_refresh_every: int = 1
    # Sharded manifest storage for the created table (LakeTable
    # shard_buckets; see lake/table.py): per-bucket metadata lives in
    # content-addressed shard files of this many consecutive buckets,
    # so a commit writes O(touched shards) of metadata instead of
    # re-serializing the whole table's file lists — pair with large
    # num_buckets / adaptive growth at 10^9+ key scale. None = the
    # single-file manifest (default; right for small layouts).
    shard_manifest_buckets: int | None = None
    # Flow control (job.setting.speed.record/byte analog — the
    # reference paces each channel with a per-second statistics window
    # and sleeps off the excess, Channel.java:176-239): after each
    # committed epoch, the run loop sleeps until the run's CUMULATIVE
    # applied events/bytes no longer exceed the caps. Epoch
    # granularity is this engine's batch analog of the reference's
    # 1-second window; within an epoch Spark runs at full speed
    # (pacing a distributed job mid-flight would just idle executors —
    # the meaningful contract is the sustained rate a downstream
    # system sees between commits). Both caps may be set; the
    # stricter one governs. None = unthrottled.
    max_events_per_sec: float | None = None
    max_bytes_per_sec: float | None = None
    # Bucket hash for tables this engine CREATES (existing tables keep
    # their manifest's hash_fn). Default murmur3 — Spark's own shuffle
    # hash — so the fused epoch can run EXCHANGE-ALIGNED (see below);
    # "xxhash64" reproduces the historical layout.
    hash_fn: str = "murmur3"
    # Exchange-aligned fused epochs: with a murmur3-bucketed table, the
    # dedup aggregation's shuffle is pinned to num_buckets partitions
    # (AQE coalescing off for the epoch job), which makes the agg's own
    # exchange land every key in the partition that IS its bucket —
    # the per-bucket merge then runs as mapInPandas with NO second
    # exchange. The whole epoch = ONE shuffle, and the map-side
    # partial reduction is preserved: at 10^10 events this deletes an
    # entire exchange of the deduped batch per epoch. None (default) =
    # auto: on exactly when the table's hash_fn is murmur3 and the
    # strategy is spj/mor unsalted (the fused path). False = always
    # the two-exchange plan; True = force (raises per-partition,
    # executor-side, if the table is not murmur3-bucketed or a
    # transform broke the partitioning).
    aligned_exchange: bool | None = None

    def __post_init__(self) -> None:
        if self.dirty_pct_limit is not None and not (
            0.0 <= self.dirty_pct_limit <= 1.0
        ):
            raise ValueError(
                f"dirty_pct_limit must be within [0.0, 1.0], got "
                f"{self.dirty_pct_limit} (ErrorRecordChecker.java:34-38)"
            )
        for cap in (self.max_events_per_sec, self.max_bytes_per_sec):
            if cap is not None and cap <= 0:
                raise ValueError(f"speed caps must be positive, got {cap}")
        if self.target_bucket_rows is not None and self.target_bucket_rows < 1:
            raise ValueError(
                f"target_bucket_rows must be >= 1, got {self.target_bucket_rows}"
            )
        if self.max_buckets < 1:
            raise ValueError(f"max_buckets must be >= 1, got {self.max_buckets}")
        from datax_spark.lake.table import BUCKET_HASH_FNS

        if self.hash_fn not in BUCKET_HASH_FNS:
            raise ValueError(
                f"hash_fn must be one of {BUCKET_HASH_FNS}, got {self.hash_fn!r}"
            )

    def throttle_wait(
        self, cum_events: int, cum_bytes: int, elapsed_sec: float
    ) -> float:
        """Seconds to sleep so cumulative throughput respects the
        caps: the earliest time the applied volume was ALLOWED to
        finish, minus the time it actually took (clamped at 0)."""
        target = 0.0
        if self.max_events_per_sec:
            target = max(target, cum_events / self.max_events_per_sec)
        if self.max_bytes_per_sec:
            target = max(target, cum_bytes / self.max_bytes_per_sec)
        return max(0.0, target - elapsed_sec)


def maybe_rebucket(table: "LakeTable", cfg: "ReplayConfig") -> int | None:
    """Post-commit adaptive bucket-count check (``ReplayConfig.
    target_bucket_rows``): when the committed state exceeds the
    per-bucket row target, rebucket to the smallest power-of-two
    multiple of the current count that gets back under target (capped
    at ``cfg.max_buckets``). Returns the new bucket count, or None if
    no rebucket was needed. Shared by the batch epoch driver and the
    streaming foreachBatch sink.

    Table size comes from the just-committed manifest's row counts —
    manifest metadata, no data read. For a MoR table the pending delta
    rows are counted too: an UPPER bound on live rows (deltas may
    shadow base rows or be tombstones), so growth can trigger slightly
    early — the safe direction — and the rebucket itself folds the
    deltas into exact-count base files."""
    if not cfg.target_bucket_rows:
        return None
    m = table.manifest()
    rows = sum(m.row_counts.values()) + sum(m.delta_row_counts.values())
    cur = int(m.num_buckets)
    if rows <= 0 or cur >= cfg.max_buckets or rows <= cfg.target_bucket_rows * cur:
        return None
    nb = cur
    while nb < cfg.max_buckets and rows > cfg.target_bucket_rows * nb:
        nb <<= 1
    nb = min(nb, cfg.max_buckets)
    if nb <= cur:
        return None
    table.rebucket(nb)
    return nb


@dataclass
class EpochResult:
    epoch: int
    skipped: bool
    n_events: int = 0
    n_keys: int = 0
    n_deletes: int = 0
    rows_after: int = 0
    affected_buckets: int = 0
    apply_ms: float = 0.0
    version: int | None = None
    phase_ms: dict = field(default_factory=dict)
    n_dirty: int = 0
    bytes_in: int = 0
    throttle_ms: float = 0.0  # flow-control sleep after this epoch
    rebucketed_to: int | None = None  # adaptive bucket evolution fired


@dataclass
class BootstrapResult:
    """Outcome of ``ReplayEngine.bootstrap`` (initial-snapshot load)."""

    skipped: bool
    bootstrap_lsn: int | None = None
    n_rows: int = 0
    n_dirty: int = 0
    rows_after: int = 0
    version: int | None = None
    apply_ms: float = 0.0
    rebucketed_to: int | None = None


@dataclass
class ChunkResult:
    """Outcome of ``ReplayEngine.bootstrap_chunk`` (one incremental-
    snapshot chunk of the DBLog-style chunked bootstrap)."""

    chunk_id: str
    skipped: bool
    n_rows: int = 0          # chunk rows offered (incl. dirty)
    n_applied: int = 0       # rows that reached the merge (post window/dedup)
    n_superseded: int = 0    # rows dropped by the watermark-window anti-join
    n_dirty: int = 0
    rows_after: int = 0
    version: int | None = None
    apply_ms: float = 0.0
    watermark_mode: bool = False  # lsn was assigned from low_lsn


@dataclass
class ReplayEngine:
    spark: SparkSession
    events_root: str
    table_root: str
    metrics_root: str
    config: ReplayConfig = field(default_factory=ReplayConfig)
    _views_cache: dict = field(default_factory=dict, repr=False)

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

    def _refresh_views(
        self,
        table: LakeTable,
        ph: dict | None = None,
        epoch: int | None = None,
    ) -> None:
        """Advance every registered materialized view to the table's
        current head. Idempotent per view (the synced-version
        watermark), so calling after every epoch AND once at run()'s
        end costs a manifest read when nothing changed. Views sitting
        at the SAME synced version (the steady state when they all
        ride every epoch) share ONE persisted change-feed read instead
        of one per view."""
        if not self.config.materialized_views and not self.config.join_views:
            return
        if (
            epoch is not None
            and self.config.view_refresh_every > 1
            and (epoch + 1) % self.config.view_refresh_every != 0
        ):
            return  # cadence skip; run()-end heal converges the tail
        import time as _time

        from collections import defaultdict

        from datax_spark.lake.matview import AggView

        tp = _time.monotonic()
        views = []
        for root in self.config.materialized_views:
            view = self._views_cache.get(root)
            if view is None:
                view = AggView.load(self.spark, root)
                self._views_cache[root] = view
            views.append(view)
        head = table.current_version()
        by_v0 = defaultdict(list)
        for v in views:
            by_v0[v.synced_version()].append(v)
        for v0, group in by_v0.items():
            if v0 == head:
                continue  # already synced
            if len(group) == 1:
                group[0].refresh(table, to_version=head)
                continue
            cdf = table.changes(v0, head, include_preimage=True).persist()
            try:
                for v in group:
                    v.refresh(table, to_version=head, shared_cdf=cdf)
            finally:
                cdf.unpersist()
        if self.config.join_views:
            from datax_spark.lake.joinview import JoinView

            for vroot, droot in self.config.join_views:
                view = self._views_cache.get(vroot)
                if view is None:
                    view = JoinView.load(self.spark, vroot)
                    self._views_cache[vroot] = view
                dim = self._views_cache.get(("dim", droot))
                if dim is None:
                    dim = LakeTable.load(self.spark, droot)
                    self._views_cache[("dim", droot)] = dim
                view.refresh(table, dim, left_to=head)
        if ph is not None:
            ph["views"] = (_time.monotonic() - tp) * 1000

    def quarantine_root(self) -> str:
        return os.path.join(os.path.dirname(self.metrics_root.rstrip("/")), "quarantine")

    def _ensure_table(self, first_epoch_df: DataFrame) -> LakeTable:
        if LakeTable.exists(self.table_root):
            return self.table()
        schema = first_epoch_df.drop(self.config.op_col).schema
        return LakeTable.create(
            self.spark,
            self.table_root,
            schema=schema,
            key_cols=list(self.config.keys),
            num_buckets=self.config.num_buckets,
            stats_cols=list(self.config.stats_cols),
            bloom_cols=list(self.config.bloom_cols),
            shard_buckets=self.config.shard_manifest_buckets,
            hash_fn=self.config.hash_fn,
        )

    def resume_epoch(self) -> int:
        """Next epoch to apply (checkpoint = committed manifest watermark)."""
        if not LakeTable.exists(self.table_root):
            return 0
        return self.table().last_epoch + 1

    # ---------- initial snapshot (full load -> binlog handoff) ----------
    def bootstrap(
        self,
        snapshot_df: DataFrame,
        watermark_lsn: int,
        failpoints: Sequence[str] = (),
    ) -> "BootstrapResult":
        """Seed the table from a consistent SOURCE SNAPSHOT, then hand
        off to the log tail: the Debezium initial-snapshot / DMS
        full-load+CDC shape, and the batch analog of the reference's
        bounded stream-export window — otsstreamreader exports
        [startTimestampMillis, end] (OTSStreamReaderConfig.java:26-47)
        precisely because the change stream EXPIRES
        (OTSStreamReaderChecker.java:39-58): state older than the
        retained log must come from a snapshot, and the tail must
        resume from the snapshot's position, never before it.

        ``snapshot_df`` is the source's live state — one row per key,
        NO op column — captured at log position ``watermark_lsn`` (the
        highest LSN reflected in the snapshot). It is bulk-loaded
        through the same fused dedup+merge path as an epoch (dup keys
        resolve LWW on the order columns; dirty rows quarantine under
        ``<quarantine>/epoch=bootstrap``), committed exactly-once with
        ``bootstrap_lsn`` in the manifest summary, and every later
        epoch/stream batch keeps only events with lsn > bootstrap_lsn
        (see apply_epoch): replaying the overlap would resurrect rows
        whose deletes expired from the log.

        Idempotent: a bootstrapped table returns ``skipped=True``; a
        crash before the commit leaves only invisible orphans and the
        retry re-runs cleanly. Must precede replay — bootstrapping a
        table with committed epochs raises (the snapshot would clobber
        newer state).
        """
        cfg = self.config
        t0 = time.monotonic()
        wlsn = int(watermark_lsn)
        if LakeTable.exists(self.table_root):
            m = self.table().manifest()
            prior = m.summary.get("bootstrap_lsn")
            if prior is not None:
                return BootstrapResult(skipped=True, bootstrap_lsn=int(prior))
            if m.last_epoch >= 0:
                raise ValueError(
                    f"cannot bootstrap: table at {self.table_root} already has "
                    f"committed epochs through {m.last_epoch}; the snapshot "
                    "would clobber newer replayed state"
                )
        if cfg.op_col in snapshot_df.columns:
            raise ValueError(
                f"snapshot must be STATE (no {cfg.op_col!r} column); an "
                "op-typed frame is a changelog — replay it as epochs instead"
            )
        missing = [
            c for c in (*cfg.keys, *cfg.order_cols)
            if c not in snapshot_df.columns
        ]
        if missing:
            raise ValueError(f"snapshot lacks key/order columns: {missing}")

        ev = snapshot_df.withColumn(cfg.op_col, F.lit("I"))
        table = self._ensure_table(ev)
        m = table.manifest()
        ph: dict[str, float] = {}

        dirty_pred = None
        for c in (*cfg.keys, *cfg.order_cols):
            p = F.col(c).isNull()
            dirty_pred = p if dirty_pred is None else (dirty_pred | p)
        obs = Observation("dirty_bootstrap")
        ev_obs = ev.observe(
            obs,
            F.sum(dirty_pred.cast("long")).alias("n_dirty"),
            F.count(F.lit(1)).alias("n_total"),
        )
        ev_clean = ev_obs.filter(~dirty_pred)

        deduped = lww_dedup_stats(
            ev_clean,
            keys=list(cfg.keys),
            order_cols=list(cfg.order_cols),
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,
            lsn_col=cfg.lsn_col,
            content_col="content" if "content" in ev.columns else None,
            salt_buckets=cfg.salt_buckets,
        )
        fused = cfg.merge_strategy in ("spj", "mor")
        if not fused:
            # the shuffle merge carries no fused lineage; the stat
            # counters must not reach the table's schema
            deduped = deduped.drop(*STAT_COLS)
        for fn in cfg.transforms:
            deduped = fn(deduped)

        aligned = cfg.aligned_exchange
        if aligned is None:
            aligned = fused and m.hash_fn == "murmur3"
        tp = time.monotonic()
        if aligned and fused:
            with aligned_shuffle_confs(self.spark, m.num_buckets):
                pending = merge_into(
                    table, deduped, op_col=cfg.op_col, delete_op=cfg.delete_op,
                    strategy=cfg.merge_strategy, stat_cols=STAT_COLS,
                    aligned=True,
                )
        else:
            pending = merge_into(
                table, deduped, op_col=cfg.op_col, delete_op=cfg.delete_op,
                strategy=cfg.merge_strategy,
                stat_cols=STAT_COLS if fused else None,
            )
        ph["fused_dedup_merge"] = (time.monotonic() - tp) * 1000
        n_dirty = self._resolve_dirty(
            "bootstrap", obs, ev, ev_obs, dirty_pred, ph
        )
        if "after_write" in failpoints:
            raise ReplayCrash("after_write")

        bs = pending.bucket_stats or {}
        apply_ms = (time.monotonic() - t0) * 1000.0
        rows = []
        for b in sorted(set(bs) | set(pending.stats.bucket_rows_after)):
            li = bs.get(b, {})
            rows.append(
                {
                    "epoch": -1,  # lineage slot for the initial load
                    "bucket": b,
                    "n_events": li.get("n_events", 0),
                    "n_deletes": li.get("n_deletes", 0),
                    "min_lsn": li.get("min_lsn"),
                    "max_lsn": li.get("max_lsn"),
                    "bytes_in": li.get("bytes_in", 0),
                    "n_keys_after_dedup": li.get("n_keys", 0),
                    "rows_after_merge": pending.stats.bucket_rows_after.get(b, 0),
                    "apply_ms": apply_ms,
                }
            )
        write_epoch_metrics(self.metrics_root, -1, rows)
        tp = time.monotonic()
        version = audit_gated_commit(
            table, pending, -1,
            {
                "last_epoch": -1,
                "bootstrap_lsn": wlsn,
                "bootstrap_rows": pending.stats.rows_after,
            },
            cfg.audit_fn, failpoints,
        )
        ph["commit"] = (time.monotonic() - tp) * 1000
        if "after_commit" in failpoints:
            raise ReplayCrash("after_commit")
        rebucketed = maybe_rebucket(table, cfg)
        return BootstrapResult(
            skipped=False,
            bootstrap_lsn=wlsn,
            # fused lineage when available; the shuffle strategy has no
            # per-bucket counters, so fall back to the merged row count
            n_rows=sum(r["n_events"] for r in rows) or pending.stats.rows_after,
            n_dirty=n_dirty,
            rows_after=pending.stats.rows_after,
            version=version,
            apply_ms=(time.monotonic() - t0) * 1000.0,
            rebucketed_to=rebucketed,
        )

    # ---------- incremental (chunked) bootstrap: DBLog-style ----------
    def begin_incremental_bootstrap(
        self,
        like_df: DataFrame,
        watermark_lsn: int,
        failpoints: Sequence[str] = (),
    ) -> "BootstrapResult":
        """Open a CHUNKED bootstrap: create the (empty) table and pin
        the tail-start watermark, so the log tail can begin replaying
        immediately while ``bootstrap_chunk`` fills in pre-watermark
        state key-range by key-range — the DBLog / Debezium
        incremental-snapshot shape (Andreakis & Papapanagiotou, "DBLog: A
        Watermark Based Change-Data-Capture Framework", 2019): at
        10^10 source rows a single consistent snapshot frame is
        unrealistic, so chunks load WHILE changes apply.

        ``like_df`` supplies the table schema (a zero-row slice is
        taken; pass any STATE-shaped frame — key/order/payload
        columns, no op column). ``watermark_lsn`` is the log position
        the tail starts after: epochs keep only lsn > watermark, and
        every chunk must be captured at/after it."""
        return self.bootstrap(like_df.limit(0), watermark_lsn, failpoints)

    def bootstrap_chunk(
        self,
        chunk_df: DataFrame,
        chunk_id: str,
        low_lsn: int,
        failpoints: Sequence[str] = (),
    ) -> "ChunkResult":
        """Apply ONE incremental-snapshot chunk while the log tail is
        (or has been) replaying — the DBLog chunk step re-expressed
        set-wise. ``chunk_df`` is a key-range slice of the source's
        live state (no op column) whose SELECT began at log position
        ``low_lsn`` (the chunk's low watermark: every event with
        lsn <= low_lsn is reflected in the chunk; events after it may
        or may not be).

        Correctness under interleaving (why this is safe without
        tombstones in the CoW table):

        * **Window suppression** (the DBLog trick): chunk rows whose
          key has ANY already-applied event with lsn > low_lsn are
          dropped — for those keys the table state is at least as new
          as the chunk's, and critically a key DELETED in that window
          must not be resurrected by its (older) chunk image. The
          window key set is computed from the applied epochs only,
          pruned via the lineage metrics' per-epoch [min_lsn, max_lsn]
          (chunks applied promptly scan only the couple of epochs that
          overlap their window, independent of total log size).
        * **Order guard**: surviving chunk rows merge through the
          cross-batch LWW guard (``WHEN MATCHED AND s.(commit,lsn) >
          t.(commit,lsn)``), so a chunk captured later than another's
          overlap, or racing a concurrent re-apply, resolves by order.
        * **Future events win**: any event not yet applied has
          lsn > tail >= the chunk rows' order, so the normal replay
          supersedes chunk state — a delete the chunk preceded still
          lands.

        If ``chunk_df`` lacks the ``lsn`` column (a plain SELECT from
        a source with no per-row log position — the realistic DBLog
        case), rows are stamped with ``lsn = low_lsn``
        (``watermark_mode``): ordering vs future events still holds
        because every unapplied event has lsn > tail >= low_lsn.

        Idempotent per ``chunk_id`` (committed ids are recorded in the
        manifest summary); a crash before commit leaves only invisible
        orphans and the retry re-runs cleanly. Lineage rows land in
        the metrics table under a negative epoch slot (-2, -3, ... in
        apply order; -1 is the full-snapshot slot)."""
        cfg = self.config
        t0 = time.monotonic()
        wl = int(low_lsn)
        if not chunk_id:
            raise ValueError("chunk_id must be a non-empty string")
        if cfg.op_col in chunk_df.columns:
            raise ValueError(
                f"chunk must be STATE (no {cfg.op_col!r} column); an "
                "op-typed frame is a changelog — replay it as epochs instead"
            )
        watermark_mode = cfg.lsn_col not in chunk_df.columns
        if watermark_mode:
            chunk_df = chunk_df.withColumn(cfg.lsn_col, F.lit(wl).cast("long"))
        missing = [
            c for c in (*cfg.keys, *cfg.order_cols)
            if c not in chunk_df.columns
        ]
        if missing:
            raise ValueError(f"chunk lacks key/order columns: {missing}")

        ev = chunk_df.withColumn(cfg.op_col, F.lit("I"))
        table = self._ensure_table(ev)
        m = table.manifest()
        applied = list(m.summary.get("bootstrap_chunks", []))
        if chunk_id in applied:
            return ChunkResult(chunk_id=chunk_id, skipped=True,
                               watermark_mode=watermark_mode)
        wlsn = m.summary.get("bootstrap_lsn")
        if wlsn is not None and wl < int(wlsn):
            raise ValueError(
                f"chunk low watermark {wl} predates the tail-start "
                f"watermark {wlsn}: its suppression window would need "
                "log that was never applied (capture chunks while "
                "tailing, never before begin_incremental_bootstrap)"
            )
        slot = -(2 + len(applied))  # metrics slot; -1 = full snapshot
        label = f"chunk-{chunk_id}"
        ph: dict[str, float] = {}

        # --- dirty split (same policy as epochs/bootstrap) ---
        dirty_pred = None
        for c in (*cfg.keys, *cfg.order_cols):
            p = F.col(c).isNull()
            dirty_pred = p if dirty_pred is None else (dirty_pred | p)
        obs = Observation(f"dirty_{label}")
        ev_obs = ev.observe(
            obs,
            F.sum(dirty_pred.cast("long")).alias("n_dirty"),
            F.count(F.lit(1)).alias("n_total"),
        )
        ev_clean = ev_obs.filter(~dirty_pred)

        # --- DBLog window suppression: drop chunk keys touched by any
        # APPLIED event with lsn > low watermark. Epoch pruning is
        # driver-side over the (tiny) lineage metrics, so the raw-event
        # scan is bounded by the chunk's window, not the log ---
        tp = time.monotonic()
        win_dirs = []
        if m.last_epoch >= 0:
            import pyarrow.parquet as _pq

            for d in sorted(glob.glob(os.path.join(self.metrics_root, "epoch=*"))):
                em = re.search(r"epoch=(-?\d+)$", d)
                if not em:
                    continue
                e = int(em.group(1))
                if e < 0 or e > m.last_epoch:
                    continue  # bootstrap slots / uncommitted epochs
                mx = None
                for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                    col = _pq.read_table(p, columns=["max_lsn"])["max_lsn"]
                    for v in col.to_pylist():
                        if v is not None and (mx is None or v > mx):
                            mx = v
                if mx is not None and mx > wl:
                    win_dirs.append(os.path.join(self.events_root, f"epoch={e}"))
        if win_dirs:
            win_keys = (
                self.spark.read.parquet(*win_dirs)
                .filter(F.col(cfg.lsn_col) > F.lit(wl))
                .select(*cfg.keys)
                .dropDuplicates(list(cfg.keys))
            )
            ev_clean = ev_clean.join(win_keys, on=list(cfg.keys), how="left_anti")
        ph["window_prune"] = (time.monotonic() - tp) * 1000

        # --- dedup (+ per-key lineage stats riding the same agg) ---
        stats_df = lww_dedup_stats(
            ev_clean,
            keys=list(cfg.keys),
            order_cols=list(cfg.order_cols),
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,
            lsn_col=cfg.lsn_col,
            content_col="content" if "content" in ev.columns else None,
            salt_buckets=cfg.salt_buckets,
        ).persist()
        deduped = stats_df.drop(*STAT_COLS)
        for fn in cfg.transforms:
            deduped = fn(deduped)
        try:
            from datax_spark.lake.table import bucket_expr_for

            # honor a bucket_cols layout (subset routing) when present;
            # otherwise route on cfg.keys (== the table's key_cols)
            bucket = bucket_expr_for(
                m, key_cols=list(m.bucket_cols) or list(cfg.keys)
            )
            tp = time.monotonic()
            lineage = {
                r["bucket"]: r.asDict()
                for r in stats_df.groupBy(bucket.alias("bucket"))
                .agg(
                    F.count(F.lit(1)).alias("n_keys"),
                    F.sum(STAT_COLS[0]).alias("n_events"),
                    F.sum(STAT_COLS[1]).alias("n_deletes"),
                    F.min(STAT_COLS[2]).alias("min_lsn"),
                    F.max(STAT_COLS[3]).alias("max_lsn"),
                    F.sum(STAT_COLS[4]).alias("bytes_in"),
                )
                .collect()
            }
            ph["dedup"] = (time.monotonic() - tp) * 1000
            n_dirty = self._resolve_dirty(label, obs, ev, ev_obs, dirty_pred, ph)
            try:
                n_total = int((obs.get or {}).get("n_total") or 0)
            except Exception:
                n_total = ev.count()
            if "after_dedup" in failpoints:
                raise ReplayCrash("after_dedup")

            # --- order-guarded merge: spj when the layout allows (the
            # current side never shuffles), shuffle when MoR deltas are
            # pending (the spj tasks read raw base files only) ---
            strat = "spj" if cfg.merge_strategy in ("spj", "mor", "spj_staged") else "shuffle"
            if strat == "spj" and m.delta_files:
                strat = "shuffle"
            tp = time.monotonic()
            pending = merge_into(
                table,
                deduped,
                op_col=cfg.op_col,
                delete_op=cfg.delete_op,
                order_cols=list(cfg.order_cols),
                affected_buckets=sorted(lineage) if strat == "shuffle" else None,
                strategy=strat,
            )
            ph["merge_write"] = (time.monotonic() - tp) * 1000
            if "after_write" in failpoints:
                raise ReplayCrash("after_write")

            apply_ms = (time.monotonic() - t0) * 1000.0
            rows = []
            for b in sorted(set(lineage) | set(pending.stats.bucket_rows_after)):
                li = lineage.get(b, {})
                rows.append(
                    {
                        "epoch": slot,
                        "bucket": b,
                        "n_events": li.get("n_events", 0),
                        "n_deletes": li.get("n_deletes", 0),
                        "min_lsn": li.get("min_lsn"),
                        "max_lsn": li.get("max_lsn"),
                        "bytes_in": li.get("bytes_in", 0),
                        "n_keys_after_dedup": li.get("n_keys", 0),
                        "rows_after_merge": pending.stats.bucket_rows_after.get(b, 0),
                        "apply_ms": apply_ms,
                    }
                )
            write_epoch_metrics(self.metrics_root, slot, rows)
            tp = time.monotonic()
            version = audit_gated_commit(
                table, pending, slot,
                {
                    "last_epoch": m.last_epoch,  # chunk commits never move the tail
                    "bootstrap_chunks": applied + [chunk_id],
                },
                cfg.audit_fn, failpoints,
            )
            ph["commit"] = (time.monotonic() - tp) * 1000
            if "after_commit" in failpoints:
                raise ReplayCrash("after_commit")
            n_applied = sum(r["n_events"] for r in rows)
        finally:
            stats_df.unpersist()
        rebucketed = maybe_rebucket(table, cfg)
        self._refresh_views(table)
        return ChunkResult(
            chunk_id=chunk_id,
            skipped=False,
            n_rows=n_total,
            n_applied=n_applied,
            n_superseded=max(n_total - n_dirty - n_applied, 0),
            n_dirty=n_dirty,
            rows_after=pending.stats.rows_after,
            version=version,
            apply_ms=(time.monotonic() - t0) * 1000.0,
            watermark_mode=watermark_mode,
        )

    # ---------- run ----------
    def run(
        self,
        through_epoch: int | None = None,
        failpoints: Sequence[str] = (),
    ) -> list[EpochResult]:
        cfg = self.config
        throttled = cfg.max_events_per_sec or cfg.max_bytes_per_sec
        t0 = time.monotonic()
        cum_ev = cum_b = 0
        results = []
        for e in self.discover_epochs():
            if through_epoch is not None and e > through_epoch:
                break
            r = self.apply_epoch(e, failpoints=failpoints)
            results.append(r)
            if throttled and not r.skipped:
                cum_ev += r.n_events
                cum_b += r.bytes_in
                wait = cfg.throttle_wait(cum_ev, cum_b, time.monotonic() - t0)
                if wait > 0:
                    r.throttle_ms = round(wait * 1000.0, 1)
                    time.sleep(wait)
        # heal views a previous run crashed between an epoch commit
        # and its refresh (no-op when every epoch above refreshed)
        if (cfg.materialized_views or cfg.join_views) and LakeTable.exists(
            self.table_root
        ):
            self._refresh_views(self.table())
        return results

    def _resolve_dirty(self, epoch, obs, ev, ev_obs, dirty_pred, ph) -> int:
        """Read the dirty/total counts off the epoch job's Observation,
        quarantine dirty rows, and enforce the error limits
        (ErrorRecordChecker.java:18-82 parity: record limit, when
        configured, is the only check). Raises DirtyDataError before
        the COMMIT point — nothing the epoch wrote is visible yet."""
        cfg = self.config
        try:
            got = obs.get or {}
            n_dirty = int(got.get("n_dirty") or 0)
            n_total = int(got.get("n_total") or 0)
        except Exception:
            # degenerate plans (e.g. every row dirty) can leave the
            # observation row unreadable; fall back to a direct count.
            # Logged + timed so the two extra full scans are
            # attributable in the per-epoch phase breakdown.
            import logging

            logging.getLogger(__name__).warning(
                "epoch %s: dirty-count observation unreadable; "
                "falling back to two extra event scans", epoch,
            )
            tf = time.monotonic()
            n_dirty = ev.filter(dirty_pred).count()
            n_total = ev.count()
            ph["dirty_fallback_scans"] = (time.monotonic() - tf) * 1000
        if n_dirty and cfg.quarantine:
            ev_obs.filter(dirty_pred).write.mode("overwrite").parquet(
                os.path.join(self.quarantine_root(), f"epoch={epoch}")
            )
        # Reference parity (ErrorRecordChecker.java:18-45): when the
        # record limit is configured it is the ONLY check — the
        # reference's constructor nulls percentageLimit in that case.
        if cfg.dirty_record_limit is not None and n_dirty > cfg.dirty_record_limit:
            raise DirtyDataError(
                f"epoch {epoch}: {n_dirty} dirty records exceed limit "
                f"{cfg.dirty_record_limit} (quarantined under "
                f"{self.quarantine_root()})"
            )
        if (
            cfg.dirty_record_limit is None
            and cfg.dirty_pct_limit is not None
            and n_total > 0
            and (n_dirty / n_total) > cfg.dirty_pct_limit
        ):
            raise DirtyDataError(
                f"epoch {epoch}: dirty fraction {n_dirty / n_total:.4f} "
                f"exceeds percentage limit {cfg.dirty_pct_limit} "
                f"(quarantined under {self.quarantine_root()})"
            )
        return n_dirty

    def _commit_epoch(
        self, table: LakeTable, pending, epoch: int, n_dirty: int,
        failpoints: Sequence[str] = (),
    ) -> int:
        return audit_gated_commit(
            table, pending, epoch,
            {"last_epoch": epoch, "n_dirty": n_dirty},
            self.config.audit_fn, failpoints,
        )

    def _apply_epoch_fused_spj(
        self, epoch, table, ev, ev_obs, ev_clean, obs, dirty_pred, t0, ph,
        failpoints,
    ) -> EpochResult:
        """ONE-Spark-job epoch for the storage-partitioned merge path:

            scan -> LWW dedup + per-key stats (one shuffle, map-side
            combined) -> Arrow transforms -> exchange by bucket ->
            per-bucket Arrow merge WITH fused per-bucket lineage ->
            tiny stats collect

        No persist, no separate bucket-stats job, no merge pre-pass —
        the two extra job launches the shuffle path pays (its anti-join
        needs the affected-bucket list and the lineage needs a second
        aggregation over the cached dedup output) cost ~1.5-2s of fixed
        per-epoch overhead on small epochs, which caps epoch frequency
        regardless of data size. The dirty gate runs after the job but
        BEFORE the commit point: a failed epoch leaves only invisible
        txn orphans (vacuum reclaims), identical crash semantics.

        Transforms see the ``__stat_*`` lineage columns here (they are
        aggregated inside the merge tasks afterwards); column-additive
        transforms — the mandated Arrow withColumn form — are
        unaffected."""
        cfg = self.config
        m = table.manifest()
        aligned = cfg.aligned_exchange
        if aligned is None:
            aligned = m.hash_fn == "murmur3"  # auto: on when the layout allows
        deduped = lww_dedup_stats(
            ev_clean,
            keys=list(cfg.keys),
            order_cols=list(cfg.order_cols),
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,
            lsn_col=cfg.lsn_col,
            content_col="content" if "content" in ev.columns else None,
            salt_buckets=cfg.salt_buckets,
        )
        for fn in cfg.transforms:
            deduped = fn(deduped)
        tp = time.monotonic()
        if aligned:
            # ONE-shuffle epoch: the dedup agg's exchange, pinned to
            # num_buckets partitions, IS the bucket routing — the merge
            # below adds no exchange at all (mapInPandas over the agg
            # output, asserted executor-side). The conf pins must be
            # live when merge_into's action runs, hence the context.
            with aligned_shuffle_confs(self.spark, m.num_buckets):
                pending = merge_into(
                    table,
                    deduped,
                    op_col=cfg.op_col,
                    delete_op=cfg.delete_op,
                    strategy=cfg.merge_strategy,
                    stat_cols=STAT_COLS,
                    aligned=True,
                )
        else:
            pending = merge_into(
                table,
                deduped,
                op_col=cfg.op_col,
                delete_op=cfg.delete_op,
                strategy=cfg.merge_strategy,  # "spj" or "mor" — same fused shape
                stat_cols=STAT_COLS,
            )
        ph["fused_dedup_merge"] = (time.monotonic() - tp) * 1000
        n_dirty = self._resolve_dirty(epoch, obs, ev, ev_obs, dirty_pred, ph)
        if "after_dedup" in failpoints:
            raise ReplayCrash("after_dedup")
        if "after_write" in failpoints:
            raise ReplayCrash("after_write")

        bs = pending.bucket_stats or {}
        apply_ms = (time.monotonic() - t0) * 1000.0
        rows = []
        for b in sorted(set(bs) | set(pending.stats.bucket_rows_after)):
            li = bs.get(b, {})
            rows.append(
                {
                    "epoch": epoch,
                    "bucket": b,
                    "n_events": li.get("n_events", 0),
                    "n_deletes": li.get("n_deletes", 0),
                    "min_lsn": li.get("min_lsn"),
                    "max_lsn": li.get("max_lsn"),
                    "bytes_in": li.get("bytes_in", 0),
                    "n_keys_after_dedup": li.get("n_keys", 0),
                    "rows_after_merge": pending.stats.bucket_rows_after.get(b, 0),
                    "apply_ms": apply_ms,
                }
            )
        tp = time.monotonic()
        write_epoch_metrics(self.metrics_root, epoch, rows)
        ph["metrics"] = (time.monotonic() - tp) * 1000
        tp = time.monotonic()
        version = self._commit_epoch(table, pending, epoch, n_dirty, failpoints)
        ph["commit"] = (time.monotonic() - tp) * 1000
        if "after_commit" in failpoints:
            raise ReplayCrash("after_commit")
        if (
            cfg.merge_strategy == "mor"
            and cfg.compact_every
            and (epoch + 1) % cfg.compact_every == 0
        ):
            tp = time.monotonic()
            version = table.compact()
            ph["compact"] = (time.monotonic() - tp) * 1000
        tp = time.monotonic()
        rebucketed = maybe_rebucket(table, cfg)
        if rebucketed:
            ph["rebucket"] = (time.monotonic() - tp) * 1000
        self._refresh_views(table, ph, epoch=epoch)
        return EpochResult(
            epoch=epoch,
            skipped=False,
            n_events=sum(r["n_events"] for r in rows),
            n_keys=sum(v.get("n_keys", 0) for v in bs.values()),
            n_deletes=sum(r["n_deletes"] for r in rows),
            rows_after=pending.stats.rows_after,
            affected_buckets=len(pending.stats.affected_buckets),
            apply_ms=apply_ms,
            version=version,
            phase_ms={k: round(v, 1) for k, v in ph.items()},
            n_dirty=n_dirty,
            bytes_in=sum(r["bytes_in"] for r in rows),
            rebucketed_to=rebucketed,
        )

    def apply_epoch(self, epoch: int, failpoints: Sequence[str] = ()) -> EpochResult:
        cfg = self.config
        t0 = time.monotonic()
        ev = self.spark.read.parquet(os.path.join(self.events_root, f"epoch={epoch}"))
        table = self._ensure_table(ev)

        m0 = table.manifest()
        last = m0.last_epoch
        wlsn = m0.summary.get("bootstrap_lsn")
        if epoch <= last:
            return EpochResult(epoch=epoch, skipped=True)  # exactly-once gate
        if epoch != last + 1 and not (last == -1 and wlsn is not None):
            # contiguity gate — EXCEPT the first epoch after a snapshot
            # bootstrap, which may start anywhere in the retained log
            # (the epochs before it expired; their effects are the
            # snapshot). From there on, contiguous as usual.
            raise ValueError(f"out-of-order epoch {epoch}; committed watermark is {last}")

        # --- snapshot-handoff gate: a bootstrapped table already
        # reflects every event with lsn <= bootstrap_lsn (the snapshot
        # position), so epoch scans keep only the log tail past it — a
        # plain parquet-pushed range predicate, which with lsn in
        # stats_cols skips whole pre-watermark files. Replaying the
        # overlap would be both wasted work and WRONG under log
        # retention: expired pre-watermark deletes leave orphan inserts
        # that would resurrect rows the snapshot correctly lacks (why
        # the reference bounds its export window to the stream's
        # un-expired range, OTSStreamReaderChecker.java:39-58).
        # NULL-lsn rows stay: they are dirty data and must still hit
        # the quarantine accounting below.
        if wlsn is not None:
            ev = ev.filter(
                (F.col(cfg.lsn_col) > F.lit(int(wlsn)))
                | F.col(cfg.lsn_col).isNull()
            )

        # lineage bucket ids follow the TABLE's live bucket count, not
        # cfg.num_buckets (which only seeds table creation): adaptive
        # rebucketing can have grown the layout since, and the merge
        # resolves its bucket count from the manifest the same way
        from datax_spark.lake.table import bucket_expr_for

        bucket = bucket_expr_for(
            m0, key_cols=list(m0.bucket_cols) or list(cfg.keys)
        )
        ph: dict[str, float] = {}

        # --- dirty-data split: NULL in any key/order column means the
        # event cannot be keyed or ordered. The count rides the dedup
        # job via an Observation (no extra scan); quarantine rows are
        # written (and the epoch failed) only when any exist.
        dirty_pred = None
        for c in (*cfg.keys, *cfg.order_cols):
            p = F.col(c).isNull()
            dirty_pred = p if dirty_pred is None else (dirty_pred | p)
        obs = Observation(f"dirty_epoch_{epoch}")
        ev_obs = ev.observe(
            obs,
            F.sum(dirty_pred.cast("long")).alias("n_dirty"),
            F.count(F.lit(1)).alias("n_total"),
        )
        ev_clean = ev_obs.filter(~dirty_pred)

        if cfg.merge_strategy in ("spj", "mor"):
            # the fused one-job epoch covers the salted dedup too: its
            # stats compose exactly across the two stages (sum/min/max
            # of per-(key,salt) partials), and stage 2's exchange is on
            # the bare keys, so the aligned plan applies unchanged
            return self._apply_epoch_fused_spj(
                epoch, table, ev, ev_obs, ev_clean, obs, dirty_pred, t0, ph,
                failpoints,
            )

        # --- dedup + per-key lineage stats in ONE logical reduction ---
        # Both the plain and the salted dedup ride the lineage counters
        # on the aggregation itself (lww_dedup_stats: primitive aggs,
        # map-side combined; the salted form composes exact partials
        # across its two stages) — no separate scan of the raw events.
        stats_df = lww_dedup_stats(
            ev_clean,
            keys=list(cfg.keys),
            order_cols=list(cfg.order_cols),
            op_col=cfg.op_col,
            delete_op=cfg.delete_op,
            lsn_col=cfg.lsn_col,
            content_col="content" if "content" in ev.columns else None,
            salt_buckets=cfg.salt_buckets,
        ).persist()

        # transforms apply lazily on top of the cached winners: the
        # merge is their only consumer, so they run exactly once and
        # the cache holds pre-transform rows (smaller).
        deduped = stats_df.drop(*STAT_COLS)
        for fn in cfg.transforms:
            deduped = fn(deduped)
        try:
            tp = time.monotonic()
            bucket_stats = (
                stats_df.groupBy(bucket.alias("bucket"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(STAT_COLS[0]).alias("n_events"),
                    F.sum(STAT_COLS[1]).alias("n_deletes"),
                    F.min(STAT_COLS[2]).alias("min_lsn"),
                    F.max(STAT_COLS[3]).alias("max_lsn"),
                    F.sum(STAT_COLS[4]).alias("bytes_in"),
                )
                .collect()
            )
            key_counts = {r["bucket"]: r["n"] for r in bucket_stats}
            lineage = {r["bucket"]: r.asDict() for r in bucket_stats}
            ph["dedup"] = (time.monotonic() - tp) * 1000

            n_dirty = self._resolve_dirty(epoch, obs, ev, ev_obs, dirty_pred, ph)
            if "after_dedup" in failpoints:
                raise ReplayCrash("after_dedup")

            # --- MERGE (phase 1: data files); affected buckets are
            # already known from key_counts — saves a discovery job ---
            tp = time.monotonic()
            pending = merge_into(
                table,
                deduped,
                op_col=cfg.op_col,
                delete_op=cfg.delete_op,
                affected_buckets=sorted(key_counts),
                # shuffle plan consumes the update frame twice (anti-join
                # keys + upsert projection): feed the anti-join from the
                # cached pre-transform frame so transforms run once. The
                # spj plan consumes it exactly once (inside the per-
                # bucket Arrow merge) and needs no such hint.
                update_keys=stats_df if cfg.merge_strategy == "shuffle" else None,
                strategy={"spj_staged": "spj"}.get(
                    cfg.merge_strategy, cfg.merge_strategy
                ),
            )
            ph["merge_write"] = (time.monotonic() - tp) * 1000
            if "after_write" in failpoints:
                raise ReplayCrash("after_write")

            # --- lineage metrics, written BEFORE the commit point so a
            # crash after commit leaves no metrics hole (the overwrite
            # in write_epoch_metrics makes a pre-commit crash replay
            # them cleanly) ---
            apply_ms = (time.monotonic() - t0) * 1000.0
            rows = []
            for b in sorted(set(lineage) | set(pending.stats.bucket_rows_after)):
                li = lineage.get(b, {})
                rows.append(
                    {
                        "epoch": epoch,
                        "bucket": b,
                        "n_events": li.get("n_events", 0),
                        "n_deletes": li.get("n_deletes", 0),
                        "min_lsn": li.get("min_lsn"),
                        "max_lsn": li.get("max_lsn"),
                        "bytes_in": li.get("bytes_in", 0),
                        "n_keys_after_dedup": key_counts.get(b, 0),
                        "rows_after_merge": pending.stats.bucket_rows_after.get(b, 0),
                        "apply_ms": apply_ms,
                    }
                )
            tp = time.monotonic()
            write_epoch_metrics(self.metrics_root, epoch, rows)
            ph["metrics"] = (time.monotonic() - tp) * 1000

            # --- commit (phase 2: atomic snapshot swap + epoch watermark) ---
            tp = time.monotonic()
            version = self._commit_epoch(
                table, pending, epoch, n_dirty, failpoints
            )
            ph["commit"] = (time.monotonic() - tp) * 1000
            if "after_commit" in failpoints:
                raise ReplayCrash("after_commit")
            tp = time.monotonic()
            rebucketed = maybe_rebucket(table, cfg)
            if rebucketed:
                ph["rebucket"] = (time.monotonic() - tp) * 1000
            self._refresh_views(table, ph, epoch=epoch)
        finally:
            stats_df.unpersist()

        return EpochResult(
            epoch=epoch,
            skipped=False,
            n_events=sum(r["n_events"] for r in rows),
            n_keys=sum(key_counts.values()),
            n_deletes=sum(r["n_deletes"] for r in rows),
            rows_after=pending.stats.rows_after,
            affected_buckets=len(pending.stats.affected_buckets),
            apply_ms=apply_ms,
            version=version,
            phase_ms={k: round(v, 1) for k, v in ph.items()},
            n_dirty=n_dirty,
            bytes_in=sum(r["bytes_in"] for r in rows),
            rebucketed_to=rebucketed,
        )
