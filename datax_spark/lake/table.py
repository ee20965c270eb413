"""LakeTable — a from-scratch snapshot-versioned table format.

No Iceberg runtime ships in this environment, so the engine implements
the same contract directly (public Iceberg spec concepts: versioned
manifests, atomic pointer swap, snapshot summary, schema evolution,
partition/bucket pruning):

* Data layout: ``data/txn-<uuid>/b=<bucket>/*.parquet`` — rows are
  hash-bucketed by key (``pmod(<hash_fn>(keys), num_buckets)``; the
  per-table ``Manifest.hash_fn`` is murmur3 — Spark's own shuffle
  hash, enabling exchange-aligned writes — or the historical
  xxhash64), the analog of an Iceberg bucket-partitioned table.
  Buckets bound the blast radius of copy-on-write merges: an epoch
  touching 12 of 256 buckets rewrites only those 12.
* Metadata: ``_manifests/v<NNNNNNNN>.json`` lists, per bucket, the
  parquet files of that snapshot plus schema, row counts, and a
  summary (committed epoch watermark). ``_manifests/_current`` is a
  one-line pointer file updated by atomic rename — the commit point.
* Commit protocol (two-phase, crash-safe): (1) write new data files
  under a fresh txn dir — invisible until referenced; (2) write
  manifest ``v{N}.json``; (3) atomically rename a tmp pointer over
  ``_current``. A crash before (3) leaves the table at the old
  snapshot with orphan files (cleaned by ``vacuum``); after (3) the
  new snapshot is live. Retention: ``expire_snapshots`` retires old
  manifests (Iceberg expire_snapshots), after which ``vacuum``
  reclaims the data files only they referenced. Exactly-once replay rides on the manifest's
  ``last_epoch`` watermark: re-applying an epoch <= watermark is a
  no-op. Reference analog: hdfswriter's tmp-dir + rename two-phase
  commit (``HdfsWriter.java:151-196,293-326``) and otsstreamreader's
  checkpoint status table (``RecordProcessor.java:186-239``) —
  unified here into one atomic metadata swap, as Iceberg does.
* Concurrency: single-writer driver loop (like the reference's
  JobContainer); commits still verify the parent pointer and raise on
  conflict (optimistic concurrency, Iceberg-style).

At 100 TB the same design holds: manifests stay small (file lists per
bucket; at very large file counts ``shard_buckets`` shards the
manifest into content-addressed per-bucket-range files — the Iceberg
manifest-list shape — so a commit writes O(touched buckets) of
metadata, not the whole file list), bucket pruning keeps merge I/O
proportional to the touched key space, and the atomic pointer swap is
a single rename on any HDFS-compatible store.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import threading
import uuid
from collections import defaultdict
from dataclasses import dataclass, field, replace as _dc_replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake import io as lake_io


class CommitConflictError(RuntimeError):
    pass


@dataclass
class Manifest:
    version: int
    parent: int | None
    schema_json: str
    num_buckets: int
    key_cols: list[str]
    files: dict[str, list[str]]  # bucket id (str) -> relative parquet paths
    row_counts: dict[str, int]  # bucket id (str) -> rows
    summary: dict = field(default_factory=dict)
    # Merge-on-read deltas (the Iceberg v2 equality-delete analog):
    # bucket id (str) -> ORDERED relative paths of delta files appended
    # by MoR epochs. List position is the apply sequence — later files
    # win LWW against earlier files and against the base. Delta rows
    # carry a ``__op`` column ('U' upsert / 'D' tombstone); base files
    # have no ``__op`` (read as alive). Empty for pure-CoW tables, so
    # pre-MoR manifests load unchanged.
    delta_files: dict[str, list[str]] = field(default_factory=dict)
    delta_row_counts: dict[str, int] = field(default_factory=dict)
    # Optional EVENT-ORDER resolution for the MoR read (set at create
    # time): when non-empty, the merged read picks each key's winner by
    # max (resolve_order..., apply sequence) instead of apply sequence
    # alone. With it, out-of-order DELIVERY is harmless — a late batch
    # carrying older images (or older tombstones) can never regress a
    # key, which is strictly stronger than the CoW cross-batch guard:
    # retained tombstones even suppress a delete-then-earlier-update
    # arrival, the case order-guarded CoW documents as unsupportable.
    # The reordering window it tolerates is bounded by compaction
    # (folded tombstones are gone — the Kafka compacted-topic
    # retention trade-off).
    resolve_order: list[str] = field(default_factory=list)
    # File-level column statistics (the Iceberg manifest
    # lower_bounds/upper_bounds/null_value_counts analog): for each
    # column named in ``stats_cols``, every BASE data file carries
    # [min, max, null_count] harvested from its parquet footer at
    # commit time — no data read, O(new files) footer metadata per
    # commit, exactly the per-file stats Iceberg writers persist.
    # ``read(filters=...)`` skips files whose bounds cannot satisfy a
    # conjunct; absent stats (pre-stats files, unharvestable types)
    # simply disable skipping for that file — never correctness.
    stats_cols: list[str] = field(default_factory=list)
    file_stats: dict[str, dict[str, list]] = field(default_factory=dict)
    # What produced THIS snapshot (per-snapshot, never inherited —
    # unlike ``summary``, which merges over the parent's): "" for data
    # commits, "compact" for layout-only rewrites (visible state
    # provably unchanged), "rebucket" for bucket-count changes. The
    # Iceberg snapshot-operation field; change-feed consumers use it
    # to skip diffing commits that cannot contain a changed key.
    operation: str = ""
    # Sharded manifest storage (the Iceberg manifest-list analog): when
    # set, the per-bucket metadata (files / row_counts / delta_* /
    # file_stats) is NOT stored in the snapshot file — it lives in
    # content-addressed shard files (``_manifests/shard-<sha>.json``),
    # each covering ``shard_buckets`` consecutive bucket ids, and the
    # snapshot holds only shard REFERENCES. A commit touching k buckets
    # rewrites only the shards containing them; every untouched shard
    # is referenced by name from the parent (content addressing makes
    # the reuse free and crash-safe — shards are immutable once
    # written). At 10^4 buckets × 10^5+ files this is the difference
    # between rewriting tens of MB of metadata per commit and writing
    # O(touched buckets): the single-file form's write cost grows with
    # TABLE size, the sharded form's with COMMIT size — the same
    # O(batch) property the data path already has. None = single-file
    # manifests (the default; small tables don't need the indirection).
    shard_buckets: int | None = None
    # Per-file KEY BLOOM FILTERS (the Delta bloom-filter-index /
    # Iceberg puffin-blob analog): for each column named in
    # ``bloom_cols``, every BASE data file carries a small bloom
    # filter over its non-null values, serialized into the manifest
    # as {"m": bits, "k": hashes, "b64": bitset}. Equality and IN
    # conjuncts (``read(filters=...)``, and therefore every
    # ``lookup``) skip files whose bloom proves the value absent —
    # the pruning dimension min/max bounds cannot provide when a
    # bucket's files all span the key range (high-cardinality keys
    # after interleaved writes). False positives only cost a read;
    # a file is never skipped while containing the value. Absent
    # blooms (pre-bloom files, unsupported value types) disable
    # skipping for that file — never correctness.
    bloom_cols: list[str] = field(default_factory=list)
    file_blooms: dict[str, dict[str, dict]] = field(default_factory=dict)
    # Bucket hash function: "xxhash64" (the historical default) or
    # "murmur3" — Spark's Murmur3Hash, the SAME function (seed 42)
    # Spark's shuffle HashPartitioning uses. A murmur3-bucketed table
    # earns EXCHANGE-ALIGNED writes: any upstream aggregation keyed on
    # ``key_cols`` whose shuffle runs with exactly ``num_buckets``
    # partitions lands every key in the partition that IS its bucket
    # (``partition_id = pmod(murmur3(keys), n) = bucket``), so the
    # bucket-local merge needs NO second exchange (see
    # merge.spj_merge_frame(aligned=True)). This is the table-format
    # side of Spark's storage-partitioned joins (SPARK-37375): pick the
    # layout hash to match the engine's partitioner and whole shuffles
    # disappear. Absent in pre-hash_fn manifests -> xxhash64.
    hash_fn: str = "xxhash64"
    # Optional bucket-routing columns: a PREFIX-style SUBSET of
    # ``key_cols`` (the Iceberg partition-spec-narrower-than-identity
    # analog). Empty (the default, and every pre-bucket_cols manifest)
    # means bucket on the full key. Setting it routes buckets on the
    # subset only, so rows sharing those columns CO-LOCATE even when
    # the full identity key differs — the layout a HISTORY table wants:
    # key (repo, path, valid_from_lsn) identifies one version interval,
    # but bucketing on (repo, path) keeps a key's whole history in one
    # bucket, making "open rows of these keys" a bucket-pruned read
    # instead of a table scan. Correctness invariant preserved: bucket
    # is a deterministic function of the key (subset ⊆ key), so every
    # merge/change-feed/lookup co-location guarantee still holds.
    # Exchange-aligned merges refuse bucket_cols tables (the dedup
    # shuffle hashes the FULL key, which no longer equals the bucket).
    bucket_cols: list[str] = field(default_factory=list)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    @property
    def last_epoch(self) -> int:
        return int(self.summary.get("last_epoch", -1))

    def _scalar_dict(self) -> dict:
        return {
            "version": self.version,
            "parent": self.parent,
            "schema_json": self.schema_json,
            "num_buckets": self.num_buckets,
            "key_cols": self.key_cols,
            "summary": self.summary,
            "resolve_order": self.resolve_order,
            "stats_cols": self.stats_cols,
            "bloom_cols": self.bloom_cols,
            "operation": self.operation,
            "shard_buckets": self.shard_buckets,
            "hash_fn": self.hash_fn,
            "bucket_cols": self.bucket_cols,
        }

    def to_json(self) -> str:
        """Single-file (unsharded) serialization — also the legacy
        on-disk form every pre-shard manifest uses."""
        return json.dumps(
            {
                **self._scalar_dict(),
                "files": self.files,
                "row_counts": self.row_counts,
                "delta_files": self.delta_files,
                "delta_row_counts": self.delta_row_counts,
                "file_stats": self.file_stats,
                "file_blooms": self.file_blooms,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        return cls(**json.loads(s))

    # ---------- sharded form ----------
    def shard_index(self, bucket: int) -> int:
        return bucket // int(self.shard_buckets)

    def num_shards(self) -> int:
        return -(-self.num_buckets // int(self.shard_buckets))

    def shard_payload(self, si: int) -> dict:
        """The shard file body for shard index ``si``: the five
        per-bucket dicts restricted to its bucket range, keys sorted so
        the JSON is byte-deterministic (shard names are content
        hashes). ``file_stats`` entries ride with the bucket whose
        ``files`` list contains them."""
        lo, hi = si * self.shard_buckets, (si + 1) * self.shard_buckets
        buckets: dict[str, dict] = {}
        stats: dict[str, dict] = {}
        blooms: dict[str, dict] = {}
        for b in set(self.files) | set(self.delta_files):
            if not (lo <= int(b) < hi):
                continue
            e: dict = {}
            if self.files.get(b):
                e["files"] = self.files[b]
                e["rows"] = int(self.row_counts.get(b, 0))
                for p in self.files[b]:
                    if p in self.file_stats:
                        stats[p] = self.file_stats[p]
                    if p in self.file_blooms:
                        blooms[p] = self.file_blooms[p]
            if self.delta_files.get(b):
                e["delta_files"] = self.delta_files[b]
                e["delta_rows"] = int(self.delta_row_counts.get(b, 0))
            if e:
                buckets[b] = e
        out = {"buckets": buckets, "file_stats": stats}
        if blooms:
            out["file_blooms"] = blooms
        return out

    def merge_shard_payload(self, payload: dict) -> None:
        for b, e in payload.get("buckets", {}).items():
            if e.get("files"):
                self.files[b] = e["files"]
                self.row_counts[b] = int(e.get("rows", 0))
            if e.get("delta_files"):
                self.delta_files[b] = e["delta_files"]
                self.delta_row_counts[b] = int(e.get("delta_rows", 0))
        self.file_stats.update(payload.get("file_stats", {}))
        self.file_blooms.update(payload.get("file_blooms", {}))


def load_manifest(manifest_dir: str, version: int) -> Manifest:
    """Load a snapshot manifest from disk, resolving shard references
    when the snapshot is sharded — the one loader every consumer
    (LakeTable, the lake_changes streaming source) goes through. The
    returned Manifest is fully materialized either way, so nothing
    downstream cares which on-disk form it came from."""
    with open(os.path.join(manifest_dir, f"v{version:08d}.json")) as fh:
        d = json.load(fh)
    shards = d.pop("shards", None)
    if shards is None:
        return Manifest(**d)
    m = Manifest(
        **d,
        files={},
        row_counts={},
        delta_files={},
        delta_row_counts={},
        file_stats={},
        file_blooms={},
    )
    # each distinct shard file once; bucket ids are globally unique
    # across payloads, so merge order is irrelevant
    for name in dict.fromkeys(shards.values()):
        with open(os.path.join(manifest_dir, name)) as fh:
            m.merge_shard_payload(json.load(fh))
    return m


BUCKET_HASH_FNS = ("xxhash64", "murmur3")


def bucket_expr_for(
    m: "Manifest",
    num_buckets: int | None = None,
    key_cols: list[str] | None = None,
):
    """The ONE bucket-assignment expression every writer and reader
    uses: ``pmod(<hash_fn>(key_cols...), num_buckets)``. Centralized so
    a table's ``hash_fn`` (see :class:`Manifest`) is honored at every
    site — a single site computing the wrong hash would silently route
    keys to the wrong bucket files. ``murmur3`` is ``F.hash`` — the
    exact expression inside Spark's shuffle HashPartitioning — which is
    what makes exchange-aligned merges possible; ``xxhash64`` is the
    historical default (better 64-bit dispersion, but opaque to the
    partitioner)."""
    nb = num_buckets or m.num_buckets
    keys = key_cols or m.bucket_cols or m.key_cols
    cols = [F.col(k) for k in keys]
    if m.hash_fn == "murmur3":
        return F.pmod(F.hash(*cols), F.lit(nb)).cast("int")
    return F.pmod(F.xxhash64(*cols), F.lit(nb)).cast("int")


def conform_arrow(t, schema):
    """Project an Arrow table onto ``schema``: present columns cast,
    absent columns (files written before a schema evolution) null-
    filled — the parquet reader's missing-column semantics, applied
    executor-side."""
    import pyarrow as pa

    arrays = []
    for f in schema:
        if f.name in t.column_names:
            arrays.append(t.column(f.name).cast(f.type))
        else:
            arrays.append(pa.nulls(t.num_rows, type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def composite_key_array(tbl, keys: list[str]):
    """Injective composite-key encoding over Arrow key columns, one
    kernel for every consumer (pandas elementwise concat is
    numpy-str_-backed and silently strips NUL bytes): each key part is
    LENGTH-PREFIXED ("3:abc;2:de"), so arbitrary key bytes cannot
    collide — a plain separator would make ("r\\x00", "a") and
    ("r", "\\x00a") encode identically. Keys must be non-null (they
    are the table's primary key; the replay dirty gate enforces it).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    kc = None
    for k in keys:
        s = pc.cast(tbl.column(k), pa.string())
        part = pc.binary_join_element_wise(
            pc.cast(pc.binary_length(s), pa.string()), s, ":"
        )
        kc = part if kc is None else pc.binary_join_element_wise(kc, part, ";")
    return kc


def bucket_state_arrow(
    base_files: list[str],
    delta_files: list[str],
    keys: list[str],
    resolve: list[str],
    pa_schema,
    prefilter: list[tuple] | None = None,
):
    """Arrow-side LWW state of ONE bucket: base files ⊕ ordered delta
    files, winner per key by max (resolve_order..., apply sequence),
    tombstoned keys dropped. Returns a ``pa.Table`` with exactly
    ``pa_schema``'s columns (alive winners only). Pure Arrow — runs
    inside executor tasks with no Spark session, so both the MoR
    merged read (:meth:`LakeTable._read_merged_buckets`) and the
    streaming change-feed source share one resolution kernel.

    Base files share one consistent snapshot (a key appears in at most
    one of them), so they all take sequence 0 and (key, seq) stays
    unique; delta files win by list position. ``prefilter`` (key-column
    conjuncts only — the caller guarantees LWW safety) pushes into the
    parquet reads for row-group pruning."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    parts = []
    for seq, f in [(0, p) for p in base_files] + [
        (i + 1, p) for i, p in enumerate(delta_files)
    ]:
        t = pq.read_table(f, filters=prefilter)
        if not t.num_rows:
            continue
        op = (
            t.column("__op").cast(pa.string())
            if "__op" in t.column_names
            else pa.nulls(t.num_rows, type=pa.string())
        )
        ct = conform_arrow(t, pa_schema)
        ct = ct.append_column("__op", op).append_column(
            "__seq", pa.array([seq] * t.num_rows, type=pa.int64())
        )
        parts.append(ct)
    if not parts:
        return pa_schema.empty_table()
    tbl = pa.concat_tables(parts)
    tbl = tbl.append_column("__k", composite_key_array(tbl, keys))
    # winner per key: max (resolve_order..., seq) when the table opted
    # into event-order resolution (see Manifest.resolve_order), else
    # max apply sequence
    idx = pc.sort_indices(
        tbl,
        sort_keys=[
            ("__k", "ascending"),
            *[(c, "descending") for c in resolve],
            ("__seq", "descending"),
        ],
    )
    tbl = tbl.take(idx).combine_chunks()
    karr = tbl.column("__k").chunk(0) if tbl.column("__k").num_chunks else None
    if karr is None or not len(karr):
        return pa_schema.empty_table()
    # winner per key = first row of each sorted key run
    first = pa.concat_arrays(
        [
            pa.array([True]),
            pc.not_equal(karr.slice(1), karr.slice(0, len(karr) - 1)),
        ]
    )
    win = tbl.filter(first)
    alive = win.filter(
        pc.or_kleene(
            pc.is_null(win.column("__op")),
            pc.not_equal(win.column("__op"), "D"),
        )
    )
    return alive.select(pa_schema.names).combine_chunks()


def _payload_fingerprint(tbl, payload: list[str]):
    """Injective row fingerprint over the payload columns of an Arrow
    table, for change detection: each part encodes validity + length +
    value ("1:3:abc"; null is "0:0:"), so NULL vs the literal NUL
    string vs empty string all stay distinct and arbitrary value bytes
    cannot collide across column boundaries. Same Arrow-kernel-only
    discipline as :func:`composite_key_array` (pandas elementwise
    concat strips NUL bytes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not payload:
        return pa.array([""] * tbl.num_rows, type=pa.string())
    fp = None
    for c in payload:
        s = pc.cast(tbl.column(c), pa.string())
        valid = pc.if_else(pc.is_null(s), pa.scalar("0"), pa.scalar("1"))
        s = pc.fill_null(s, "")
        part = pc.binary_join_element_wise(
            valid, pc.cast(pc.binary_length(s), pa.string()), s, ":"
        )
        fp = part if fp is None else pc.binary_join_element_wise(fp, part, ";")
    return fp


def bucket_changes_arrow(old, new, keys: list[str], pa_schema, commit_version: int):
    """Arrow-side change rows between two LWW states of ONE bucket
    (both produced by :func:`bucket_state_arrow`, so each key appears
    at most once per side): one output row per key whose state
    differs, with ``_change_type`` in {insert, update, delete} and
    ``_commit_version`` stamped. Inserts/updates carry the new image;
    deletes carry the old image — the same contract as the batch
    :meth:`LakeTable.changes`, but computed with zero Spark exchange:
    both snapshots co-locate a key in the same bucket, so the diff is
    a local sort + run-compare, never a join.

    Shape: concat(old tagged side=0, new tagged side=1), sort by
    (composite key, side); a key-run of length 1 is an insert or
    delete by side, a run of length 2 is an update iff the payload
    fingerprints differ."""
    import pyarrow as pa
    import pyarrow.compute as pc

    payload = [n for n in pa_schema.names if n not in keys]
    out_schema = pa.schema(
        list(pa_schema)
        + [pa.field("_change_type", pa.string()), pa.field("_commit_version", pa.int64())]
    )
    if old.num_rows == 0 and new.num_rows == 0:
        return out_schema.empty_table()

    def tag(t, side):
        t = t.append_column("__fp", _payload_fingerprint(t, payload))
        return t.append_column(
            "__side", pa.array([side] * t.num_rows, type=pa.int8())
        )

    t = pa.concat_tables([tag(old, 0), tag(new, 1)])
    t = t.append_column("__k", composite_key_array(t, keys))
    idx = pc.sort_indices(
        t, sort_keys=[("__k", "ascending"), ("__side", "ascending")]
    )
    t = t.take(idx).combine_chunks()
    n = t.num_rows
    k = t.column("__k").chunk(0)
    fp = t.column("__fp").chunk(0)
    false1 = pa.array([False])
    if n == 1:
        same_prev = same_next = fp_eq_prev = false1
    else:
        eq = pc.equal(k.slice(1), k.slice(0, n - 1))
        same_prev = pa.concat_arrays([false1, eq])
        same_next = pa.concat_arrays([eq, false1])
        fp_eq_prev = pa.concat_arrays(
            [false1, pc.equal(fp.slice(1), fp.slice(0, n - 1))]
        )
    is_new = pc.equal(t.column("__side"), pa.scalar(1, pa.int8()))
    is_old = pc.invert(is_new)
    delete = pc.and_(is_old, pc.invert(same_next))
    insert = pc.and_(is_new, pc.invert(same_prev))
    update = pc.and_(pc.and_(is_new, same_prev), pc.invert(fp_eq_prev))
    keep = pc.or_(delete, pc.or_(insert, update))
    label = pc.if_else(
        delete, pa.scalar("delete"), pc.if_else(insert, pa.scalar("insert"), pa.scalar("update"))
    )
    res = t.append_column("_change_type", label).filter(keep)
    cols = [res.column(nm) for nm in pa_schema.names]
    cols.append(res.column("_change_type"))
    cols.append(pa.array([commit_version] * res.num_rows, type=pa.int64()))
    return pa.Table.from_arrays(cols, schema=out_schema)


def manifest_changed_buckets(parent: "Manifest | None", child: "Manifest") -> list[int]:
    """Bucket ids whose base or delta file lists differ between a
    parent and child snapshot — data files are immutable, so an
    identical list proves the bucket holds no changed key. Parent None
    (the first snapshot) makes every bucket of the child changed."""
    all_b = set(child.files) | set(child.delta_files)
    if parent is None:
        return sorted(int(b) for b in all_b)
    all_b |= set(parent.files) | set(parent.delta_files)
    return sorted(
        int(b)
        for b in all_b
        if parent.files.get(b) != child.files.get(b)
        or parent.delta_files.get(b) != child.delta_files.get(b)
    )


def harvest_file_stats(paths: list[str], stats_cols: list[str]) -> dict[str, dict[str, list]]:
    """Per-file [min, max, null_count] for ``stats_cols``, read from
    parquet FOOTERS only (row-group statistics folded per file) — the
    stats an Iceberg writer persists into its manifest, harvested at
    commit time with zero data pages read. A column whose footer lacks
    min/max (unsupported physical type, stats disabled) gets
    ``[None, None, nulls]``: pruning treats missing bounds as
    "could match", so absent stats can never cost correctness.

    Only JSON-stable types are kept (int/float/str/bool) — binary or
    nested mins would not round-trip through the manifest.
    """
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        per_col: dict[str, list] = {}
        for c in stats_cols:
            if c not in idx:
                continue  # pre-evolution file: column absent => all null
            mn = mx = None
            nulls = 0
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None:
                    ok = False
                    break
                nulls += st.null_count or 0
                if not st.has_min_max:
                    # all-null row group carries no bounds; fine
                    continue
                lo, hi = st.min, st.max
                if not isinstance(lo, (int, float, str, bool)):
                    ok = False
                    break
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            if ok:
                per_col[c] = [mn, mx, nulls]
        if per_col:
            out[p] = per_col
    return out


# ---------- per-file bloom filters (Delta bloom index analog) ----------
# k=7 hash probes with ~10 bits per value gives ~0.8% false positives;
# the bitset is capped so one (file, column) bloom can never bloat a
# manifest past ~512 KiB — past the cap the fpp degrades gracefully,
# which costs reads, never answers.
_BLOOM_K = 7
_BLOOM_BITS_PER_VALUE = 10
_BLOOM_MAX_BITS = 1 << 22


def _bloom_encode(v) -> bytes | None:
    """Canonical bytes for a bloomable value; None = type not covered
    (floats, bools, nested) — both build and probe sides return None
    for the same inputs, so an unprobeable value can never be skipped.
    The type prefix keeps int 5 and string '5' from colliding."""
    if v is None or isinstance(v, bool):
        return None
    if isinstance(v, int):
        return b"i:" + str(v).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, bytes):
        return b"b:" + v
    return None


def _bloom_positions(enc: bytes, m_bits: int) -> list[int]:
    # double hashing over the two halves of one blake2b digest —
    # deterministic across processes (no PYTHONHASHSEED dependence)
    d = hashlib.blake2b(enc, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % m_bits for i in range(_BLOOM_K)]


def _harvest_one_bloom(path: str, bloom_cols: list[str]) -> dict[str, dict] | None:
    """One file's blooms (executor-side unit of work)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    present = [c for c in bloom_cols if c in pf.schema_arrow.names]
    if not present:
        return None
    tbl = pf.read(columns=present)
    per_col: dict[str, dict] = {}
    for c in present:
        # distinct values only: identical bits, fewer hash rounds (and
        # the m sizing tracks distincts, which is what fpp depends on)
        vals = {v for v in tbl.column(c).to_pylist() if v is not None}
        encs = []
        ok = True
        for v in vals:
            e = _bloom_encode(v)
            if e is None:
                ok = False
                break
            encs.append(e)
        if not ok:
            continue
        m_bits = min(
            max(64, -(-len(encs) * _BLOOM_BITS_PER_VALUE // 8) * 8),
            _BLOOM_MAX_BITS,
        )
        bits = bytearray(m_bits // 8)
        for e in encs:
            for pos in _bloom_positions(e, m_bits):
                bits[pos >> 3] |= 1 << (pos & 7)
        per_col[c] = {
            "m": m_bits,
            "k": _BLOOM_K,
            "b64": base64.b64encode(bytes(bits)).decode(),
        }
    return per_col or None


def harvest_file_blooms(
    paths: list[str],
    bloom_cols: list[str],
    spark: SparkSession | None = None,
) -> dict[str, dict[str, dict]]:
    """Build per-file bloom filters over ``bloom_cols`` for new data
    files at commit time. Unlike footer stats this reads the bloom
    columns' data pages (column-pruned — only those columns), so the
    cost is O(new rows) per commit on an opt-in feature; a column with
    any un-encodable value in a file simply gets no bloom there
    (conservative: that file is never skipped).

    With a ``spark`` session the harvest runs ONE TASK PER FILE on the
    executors (the value hashing is CPU-bound Python — serial on the
    driver it would gate commit latency at exactly the epoch sizes
    where blooms matter); only the finished bloom dicts (~KB each)
    return to the driver. Without a session (tests, tiny metadata
    jobs) it runs inline."""
    if spark is not None and len(paths) > 1:
        cols = list(bloom_cols)
        pairs = (
            spark.sparkContext.parallelize(paths, len(paths))
            .map(lambda p: (p, _harvest_one_bloom(p, cols)))
            .collect()
        )
        return {p: b for p, b in pairs if b}
    out: dict[str, dict[str, dict]] = {}
    for p in paths:
        b = _harvest_one_bloom(p, bloom_cols)
        if b:
            out[p] = b
    return out


def _bloom_may_match(bloom: dict, op: str, val) -> bool:
    """Probe one file's bloom for an equality/IN conjunct. True = the
    file may contain a matching value; only a definite all-probes-miss
    answers False. Non-equality ops never consult blooms."""
    if op in ("=", "=="):
        vals = [val]
    elif op == "in":
        vals = list(val)
    else:
        return True
    m_bits = int(bloom["m"])
    bits = base64.b64decode(bloom["b64"])
    for v in vals:
        enc = _bloom_encode(v)
        if enc is None:
            return True
        if all(
            bits[pos >> 3] & (1 << (pos & 7))
            for pos in _bloom_positions(enc, m_bits)
        ):
            return True
    return False


# file-skipping conjunct evaluation: True = file may contain matches,
# False = provably empty for this conjunct. ``bounds`` is the manifest
# triple [min, max, null_count]; min/max of None with null_count > 0
# means the file's column is entirely null.
def _bounds_may_match(bounds: list, op: str, val) -> bool:
    mn, mx, _nulls = bounds
    if op == "is_null":
        return _nulls is None or _nulls > 0
    if mn is None or mx is None:
        # no bounds: only all-null files reach here with a positive
        # null_count; any value predicate then fails, but is_not_null
        # style checks are handled above/below conservatively
        return op == "is_not_null" and (_nulls is None)
    if op == "is_not_null":
        return True
    try:
        if op in ("=", "=="):
            return mn <= val <= mx
        if op == "<":
            return mn < val
        if op == "<=":
            return mn <= val
        if op == ">":
            return mx > val
        if op == ">=":
            return mx >= val
        if op == "in":
            return any(mn <= v <= mx for v in val)
    except TypeError:
        return True  # incomparable value/bounds types: never prune
    return True  # unknown op: never prune


def _file_may_match(
    per_col: dict[str, list],
    filters: list[tuple],
    blooms: dict[str, dict] | None = None,
) -> bool:
    """AND of per-conjunct bounds + bloom checks for one file. A
    conjunct on a column with no harvested stats/bloom is
    conservatively satisfiable."""
    for col, op, *rest in filters:
        val = rest[0] if rest else None
        bounds = per_col.get(col)
        if bounds is not None and not _bounds_may_match(bounds, op, val):
            return False
        bloom = (blooms or {}).get(col)
        if bloom is not None and not _bloom_may_match(bloom, op, val):
            return False
    return True


def _filters_to_column(filters: list[tuple]):
    """The same conjuncts as a Spark Column, applied to the scan so
    ``read(filters=...)`` is exactly ``read().filter(...)`` no matter
    what the stats allowed to be skipped."""
    cond = None
    for col, op, *rest in filters:
        c = F.col(col)
        v = rest[0] if rest else None
        if op in ("=", "=="):
            e = c == v
        elif op == "<":
            e = c < v
        elif op == "<=":
            e = c <= v
        elif op == ">":
            e = c > v
        elif op == ">=":
            e = c >= v
        elif op == "in":
            e = c.isin(list(v))
        elif op == "is_null":
            e = c.isNull()
        elif op == "is_not_null":
            e = c.isNotNull()
        else:
            raise ValueError(f"unsupported filter op: {op!r}")
        cond = e if cond is None else cond & e
    return cond


def zorder_expr(cols: list[str], bounds: dict[str, tuple], bits: int = 16):
    """Z-value (Morton) Column for multi-dimensional clustering — the
    Delta OPTIMIZE ZORDER BY / Iceberg z-order rewrite analog, as a
    pure JVM expression tree (whole-stage codegen, no UDF): each
    column is linearly binned into ``bits`` bits over its [min, max]
    ``bounds``, then the columns' bits are interleaved so sorting by
    the z-value clusters rows that are close in EVERY dimension.
    Nulls bin to 0 (cluster together at the origin). Numeric columns
    only — a caller with strings should bin them first (e.g. xxhash).
    """
    k = len(cols)
    bins = []
    for c in cols:
        mn, mx = bounds[c]
        span = float(mx) - float(mn)
        if span <= 0:
            bins.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(span)
            * F.lit(float((1 << bits) - 1))
        )
        clamped = F.least(
            F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1))
        )
        bins.append(F.coalesce(F.floor(clamped), F.lit(0)).cast("long"))
    if bits * k > 63:
        raise ValueError(f"z-value needs bits*cols <= 63, got {bits}*{k}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bins):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


# Per-table commit locks: _write_manifest's parent check + pointer
# rename must be one atomic compare-and-swap or two writers could both
# pass the check and the loser's rename would silently clobber the
# winner (lost update). Two layers make the CAS physical:
#   1. an in-process reentrant lock per table root (cheap, fair);
#   2. the storage backend's CROSS-PROCESS commit lock underneath it
#      (lake/io.py: flock / O_EXCL lockfile on LocalFS; a deployment
#      on an object store swaps in a conditional-put backend — exactly
#      the catalog CAS Iceberg requires).
# Two engine processes (a replay job ‖ a nightly compaction) therefore
# serialize at the pointer swap; the loser re-reads the head and
# rebases (PendingMerge.commit(rebase=True)) or raises
# CommitConflictError — never a silent lost update.
class _TableCommitLock:
    def __init__(self, root: str):
        self._rlock = threading.RLock()
        self._root = root
        self._depth = 0
        self._cm = None

    def __enter__(self):
        self._rlock.acquire()
        try:
            if self._depth == 0:
                self._cm = lake_io.get_backend().commit_lock(self._root)
                self._cm.__enter__()
            self._depth += 1
        except BaseException:
            self._rlock.release()
            raise
        return self

    def __exit__(self, exc_type, exc, tb):
        try:
            self._depth -= 1
            if self._depth == 0 and self._cm is not None:
                cm, self._cm = self._cm, None
                cm.__exit__(exc_type, exc, tb)
        finally:
            self._rlock.release()
        return False


_COMMIT_LOCKS_GUARD = threading.Lock()
_COMMIT_LOCKS: dict[str, _TableCommitLock] = {}


def _commit_lock(root: str) -> _TableCommitLock:
    key = os.path.realpath(root)
    with _COMMIT_LOCKS_GUARD:
        lk = _COMMIT_LOCKS.get(key)
        if lk is None:
            lk = _COMMIT_LOCKS[key] = _TableCommitLock(key)
        return lk


def _atomic_write(path: str, data: str) -> None:
    lake_io.get_backend().atomic_write(path, data)


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # Write-audit-publish: when set (Iceberg's spark.wap.id), every
        # commit through this handle STAGES its snapshot — the manifest
        # file is written but the branch pointer does not move — until
        # publish_wap() fast-forwards (or cherry-picks) it onto main.
        self.wap_id: str | None = None

    # ---------- lifecycle ----------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 64,
        resolve_order: list[str] | None = None,
        stats_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        shard_buckets: int | None = None,
        hash_fn: str = "xxhash64",
        bucket_cols: list[str] | None = None,
    ) -> "LakeTable":
        """``resolve_order`` (e.g. ``["commit", "lsn"]``) opts the
        table into event-order MoR resolution: merged reads pick each
        key's winner by max (resolve_order..., apply sequence), making
        out-of-order delta delivery unable to regress a key. The
        columns must exist in ``schema`` and be non-null on every
        written row (they are the event's order tuple).

        ``stats_cols`` opts the table into file-level min/max/null
        statistics (the Iceberg manifest bounds analog): every commit
        harvests those columns' bounds from the new files' parquet
        footers, and ``read(filters=...)`` skips files the bounds
        prove empty. Pick the columns queries range over (event time,
        LSN, a monotone id) — not every payload column.

        ``bloom_cols`` opts the table into per-file BLOOM filters (the
        Delta bloom-filter-index analog): equality/IN conjuncts skip
        files whose bloom proves the value absent — the point-lookup
        pruning min/max can't give on high-cardinality keys whose
        range every file spans. Pick the columns point reads probe
        (primary keys); building them reads those columns once per
        commit, so it's a serving-table feature, not a default.

        ``shard_buckets`` opts the table into SHARDED manifest storage
        (see :class:`Manifest`): per-bucket metadata lives in
        content-addressed shard files of that many consecutive
        buckets each, and a commit rewrites only the shards it
        touches. The dial for very large layouts (10^3+ buckets);
        small tables should leave it None."""
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        t = cls(spark, root)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {root}")
        names = {f.name for f in schema.fields}
        for c in resolve_order or ():
            if c not in names:
                raise ValueError(f"resolve_order column {c!r} not in schema")
        for c in stats_cols or ():
            if c not in names:
                raise ValueError(f"stats_cols column {c!r} not in schema")
        for c in bloom_cols or ():
            if c not in names:
                raise ValueError(f"bloom_cols column {c!r} not in schema")
        if shard_buckets is not None and shard_buckets < 1:
            raise ValueError(f"shard_buckets must be >= 1, got {shard_buckets}")
        if hash_fn not in BUCKET_HASH_FNS:
            raise ValueError(
                f"hash_fn must be one of {BUCKET_HASH_FNS}, got {hash_fn!r}"
            )
        if bucket_cols is not None:
            if not bucket_cols:
                raise ValueError("bucket_cols must be a non-empty subset of key_cols")
            bad = [c for c in bucket_cols if c not in key_cols]
            if bad:
                raise ValueError(
                    f"bucket_cols must be a subset of key_cols={list(key_cols)}; "
                    f"not keys: {bad}"
                )
            if list(bucket_cols) == list(key_cols):
                bucket_cols = None  # full-key routing is the default form
        m = Manifest(
            version=0,
            parent=None,
            schema_json=json.dumps(schema.jsonValue()),
            num_buckets=num_buckets,
            key_cols=list(key_cols),
            files={},
            row_counts={},
            summary={"last_epoch": -1},
            resolve_order=list(resolve_order or ()),
            stats_cols=list(stats_cols or ()),
            bloom_cols=list(bloom_cols or ()),
            shard_buckets=shard_buckets,
            hash_fn=hash_fn,
            bucket_cols=list(bucket_cols or ()),
        )
        t._write_manifest(m, expected_parent=None)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        if t.current_version() is None:
            raise FileNotFoundError(f"no table at {root}")
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "_manifests", "_current"))

    # ---------- metadata ----------
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def current_version(self) -> int | None:
        ptr = os.path.join(self._manifest_dir(), "_current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return int(fh.read().strip())

    def manifest(self, version: int | str | None = None) -> Manifest:
        """Load a snapshot manifest: the current one, an explicit
        version number, or a named ref (tag) — every read surface
        (``read``/``lookup``/``changes``/``files_df``) resolves through
        here, so tags — and staged WAP ids, for audit reads — work as
        AS-OF targets everywhere."""
        if isinstance(version, str):
            try:
                version = self.ref_version(version)
            except KeyError:
                version = self.wap_version(version)
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError("table has no committed snapshot")
        return load_manifest(self._manifest_dir(), v)

    @property
    def last_epoch(self) -> int:
        return self.manifest().last_epoch

    def _write_manifest(self, m: Manifest, expected_parent: int | None) -> int:
        """CAS commit. Returns the FINAL snapshot version — callers
        must use the return value, not ``m.version``: staged WAP
        snapshots occupy version numbers, so the number a caller
        computed as ``parent+1`` may be re-allocated under the lock.
        With ``self.wap_id`` set the snapshot is staged (manifest file
        written, pointer untouched) under that id."""
        # transient hint from commit()/commit_deltas(): buckets whose
        # metadata changed vs the parent — lets the sharded writer
        # reuse the parent's shard references for everything else
        # without serializing the whole table's metadata. None = no
        # hint (create/rebucket/rollback): serialize every shard.
        dirty = getattr(m, "_dirty_buckets", None)
        with _commit_lock(self.root):  # check + swap = one CAS
            cur = self.current_version()
            if cur != expected_parent:
                raise CommitConflictError(
                    f"commit conflict: current={cur}, expected parent={expected_parent}"
                )
            vs = self.versions()
            nxt = (max(vs) + 1) if vs else 0
            if nxt > m.version:
                m = _dc_replace(m, version=nxt)
            if m.shard_buckets:
                body = json.dumps(
                    {**m._scalar_dict(), "shards": self._write_shards(m, dirty)},
                    indent=1,
                )
            else:
                body = m.to_json()
            _atomic_write(
                os.path.join(self._manifest_dir(), f"v{m.version:08d}.json"), body
            )
            if self.wap_id is None:
                _atomic_write(os.path.join(self._manifest_dir(), "_current"), str(m.version))
            else:
                staged = self._wap_staged()
                if self.wap_id in staged:
                    raise ValueError(
                        f"wap id {self.wap_id!r} already has a staged snapshot "
                        f"v{staged[self.wap_id]} (publish or drop it first)"
                    )
                staged[self.wap_id] = m.version
                _atomic_write(self._wap_path(), json.dumps(staged, indent=1))
        return m.version

    def _snapshot_raw(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir(), f"v{version:08d}.json")) as fh:
            return json.load(fh)

    def _write_shards(self, m: Manifest, dirty: set[int] | None) -> dict[str, str]:
        """Write the shard files a sharded snapshot references and
        return its shard map (shard index -> filename). Shards are
        content-addressed (``shard-<sha16>.json`` of the
        sort_keys-canonical payload) and immutable: a shard whose
        content already exists is not rewritten, and a shard none of
        whose buckets are ``dirty`` reuses the PARENT's reference
        without even being serialized — so commit metadata cost is
        O(touched shards), not O(table). Crash-safe by construction:
        shard files land before the snapshot file, which lands before
        the pointer swap; a crash leaves unreferenced shard orphans
        that ``vacuum`` reclaims."""
        import hashlib

        parent_shards: dict[str, str] | None = None
        if dirty is not None and m.parent is not None:
            try:
                praw = self._snapshot_raw(m.parent)
                if praw.get("shard_buckets") == m.shard_buckets:
                    parent_shards = praw.get("shards")
            except FileNotFoundError:
                parent_shards = None
        dirty_shards = (
            {b // m.shard_buckets for b in dirty} if dirty is not None else None
        )
        shards: dict[str, str] = {}
        for si in range(m.num_shards()):
            if (
                parent_shards is not None
                and dirty_shards is not None
                and si not in dirty_shards
                and str(si) in parent_shards
            ):
                shards[str(si)] = parent_shards[str(si)]
                continue
            blob = json.dumps(m.shard_payload(si), sort_keys=True)
            name = f"shard-{hashlib.sha256(blob.encode()).hexdigest()[:16]}.json"
            path = os.path.join(self._manifest_dir(), name)
            if not os.path.exists(path):
                _atomic_write(path, blob)
            shards[str(si)] = name
        return shards

    # ---------- data ----------
    def bucket_expr(self, num_buckets: int | None = None, key_cols: list[str] | None = None):
        return bucket_expr_for(self.manifest(), num_buckets, key_cols)

    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        filters: list[tuple] | None = None,
    ) -> DataFrame:
        """Read the snapshot, optionally pruned to a bucket subset.

        The explicit manifest schema makes old files (written before a
        schema evolution) come back null-filled for new columns — the
        parquet reader's missing-column semantics.

        Buckets with pending merge-on-read deltas are merged at read
        time (base ⊕ ordered deltas, LWW per key, tombstones dropped)
        via :meth:`_read_merged_buckets`; delta-free buckets stay a
        plain parquet scan with full pushdown. A compacted or pure-CoW
        table therefore pays zero MoR read cost.

        ``filters`` is a list of conjuncts ``(col, op[, value])`` with
        op in {=, <, <=, >, >=, in, is_null, is_not_null}. Semantics
        are exactly ``read().filter(AND(conjuncts))`` — the manifest's
        per-file stats additionally let the scan SKIP base files whose
        [min, max, null_count] bounds prove the conjunction empty
        (Iceberg scan planning). MoR buckets are never file-pruned:
        their LWW resolution needs every image of a key, so they merge
        first and filter after — correctness over skipping. One safe
        exception: conjuncts on KEY columns push into the merge tasks'
        parquet reads (row-group pruning) — a key's columns are
        constant across all its images, so pre-filtering by key keeps
        every image of every surviving key and LWW is unaffected.
        """
        m = self.manifest(version)
        want = None if buckets is None else {str(b) for b in buckets}
        sel = [b for b in (set(m.files) | set(m.delta_files)) if want is None or b in want]
        delta_b = sorted(int(b) for b in sel if m.delta_files.get(b))
        base_only = [b for b in sel if not m.delta_files.get(b)]
        rel = [p for b in base_only for p in m.files.get(b, [])]
        key_safe = None
        if filters:
            rel = [
                p
                for p in rel
                if _file_may_match(
                    m.file_stats.get(p, {}), filters, m.file_blooms.get(p)
                )
            ]
            # key columns exist in every file (they predate any schema
            # evolution) and these ops map 1:1 onto pyarrow's filters
            key_safe = [
                f
                for f in filters
                if f[0] in m.key_cols
                and f[1] in ("=", "==", "<", "<=", ">", ">=", "in")
            ] or None
        paths = [os.path.join(self.root, p) for p in rel]
        parts = []
        if paths:
            parts.append(self.spark.read.schema(m.schema).parquet(*paths))
        if delta_b:
            parts.append(self._read_merged_buckets(m, delta_b, prefilter=key_safe))
        if not parts:
            out = self.spark.createDataFrame([], m.schema)
        else:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        if filters:
            out = out.filter(_filters_to_column(filters))
        return out

    def plan_files(
        self,
        filters: list[tuple],
        buckets: list[int] | None = None,
        version: int | None = None,
    ) -> tuple[list[str], list[str]]:
        """Scan planning only: (kept, skipped) relative base-file paths
        for a filtered read — what Iceberg's planFiles reports. Lets
        tests and operators assert/observe skipping without reading
        data. MoR-bucket base files are always kept (see :meth:`read`).
        """
        m = self.manifest(version)
        want = None if buckets is None else {str(b) for b in buckets}
        kept: list[str] = []
        skipped: list[str] = []
        for b in set(m.files) | set(m.delta_files):
            if want is not None and b not in want:
                continue
            mor = bool(m.delta_files.get(b))
            for p in m.files.get(b, []):
                if not mor and not _file_may_match(
                    m.file_stats.get(p, {}), filters, m.file_blooms.get(p)
                ):
                    skipped.append(p)
                else:
                    kept.append(p)
        return sorted(kept), sorted(skipped)

    def _read_merged_buckets(
        self,
        m: Manifest,
        bucket_ids: list[int],
        prefilter: list[tuple] | None = None,
    ) -> DataFrame:
        """Merge-on-read scan of the buckets that carry delta files —
        the read half of the MoR contract (Iceberg v2 equality-delete
        apply, done storage-partitioned).

        Physical shape: the ONLY thing that enters a Spark exchange is
        the tiny bucket-id list; each task then reads its buckets'
        base + delta files executor-side with Arrow and resolves LWW
        locally (``mapInArrow``, zero pandas, so column types survive
        bit-exactly). Per key the winner is the row with the highest
        apply sequence (base = 0, deltas = manifest order); winners
        whose ``__op`` is the tombstone 'D' are dropped. Memory per
        task = one bucket's base+delta rows — the same ``num_buckets``
        dial as the CoW blast radius, and reads never shuffle table
        data regardless of table size.

        ``prefilter`` (key-column conjuncts only — the caller
        guarantees LWW safety) is handed to the Arrow parquet reads,
        so a point lookup on a delta-carrying bucket decodes only the
        row groups whose stats can match instead of the whole bucket.
        """
        from pyspark.sql.pandas.types import to_arrow_schema

        root = self.root
        keys = list(m.key_cols)
        resolve = list(m.resolve_order)
        schema = m.schema
        pa_schema = to_arrow_schema(schema)
        file_plan = {
            b: (
                [os.path.join(root, p) for p in m.files.get(str(b), [])],
                [os.path.join(root, p) for p in m.delta_files[str(b)]],
            )
            for b in bucket_ids
        }

        def merge_read(batches):
            for batch in batches:
                for b in batch.column(0).to_pylist():
                    base, deltas = file_plan[b]
                    alive = bucket_state_arrow(
                        base, deltas, keys, resolve, pa_schema, prefilter
                    )
                    if alive.num_rows:
                        yield from alive.to_batches()

        bl = self.spark.createDataFrame(
            [(b,) for b in bucket_ids], "bucket int"
        ).repartition(len(bucket_ids), F.col("bucket"))
        return bl.mapInArrow(merge_read, schema=schema)

    def lookup(self, key_values: list[tuple], version: int | None = None) -> DataFrame:
        """Keyed point read: the current rows for an explicit set of
        primary keys — the serving-path analog of otsreader's keyed
        GetRange (``OtsReaderSlaveProxy.java`` keyed scan), done with
        bucket pruning instead of an index: the requested keys hash to
        at most ``len(key_values)`` buckets, so the scan touches
        O(|touched buckets|) files regardless of table size, then a
        broadcast semi-join keeps exactly the requested keys.

        MoR-aware (goes through :meth:`read`, so pending deltas are
        merged and tombstoned keys correctly come back absent) and
        time-travel-aware (``version``). The bucket computation is one
        tiny Spark job over the key list itself, using the same JVM
        xxhash64 as the writer — never reimplemented driver-side.

        Beyond bucket pruning, the requested key VALUES are pushed as
        per-column ``IN`` literal predicates (a bounded point-lookup
        list): Catalyst pushes them to the parquet scan (row-group
        stats / dictionary pruning — surgical after a sorted
        compaction), and when the table keeps manifest stats on a key
        column they also skip whole files. The per-column conjunction
        is a superset of the requested tuples; the broadcast semi-join
        stays the exact arbiter.
        """
        m = self.manifest(version)
        # tuples are positional: field order must follow key_cols, not
        # the table schema
        by_name = {f.name: f for f in m.schema.fields}
        kschema = T.StructType([by_name[k] for k in m.key_cols])
        if not key_values:
            return self.spark.createDataFrame([], m.schema)
        kdf = self.spark.createDataFrame(key_values, kschema)
        bexpr = bucket_expr_for(m)
        bs = sorted(
            r[0] for r in kdf.select(bexpr.alias("__b")).distinct().collect()
        )  # bounded by |key_values| — a point-lookup list, not data
        kflt = [
            (k, "in", sorted({kv[i] for kv in key_values}))
            for i, k in enumerate(m.key_cols)
        ]
        return self.read(buckets=bs, version=version, filters=kflt).join(
            F.broadcast(kdf), on=list(m.key_cols), how="left_semi"
        )

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        include_preimage: bool = False,
    ) -> DataFrame:
        """Change data feed between two snapshots (the Delta CDF /
        Iceberg changelog-scan surface for this table format): one row
        per key whose state differs, with ``_change_type`` in
        {insert, update, delete}. Inserts/updates carry the TO-side
        image; deletes carry the FROM-side image.

        ``include_preimage=True`` switches updates to the Delta CDF
        two-row form — ``update_preimage`` (FROM-side image) followed
        by ``update_postimage`` (TO-side) — which is what retraction
        consumers (incremental aggregate maintenance, downstream
        signed-delta sinks) need: every feed row then carries weight
        +1 (insert / update_postimage) or -1 (delete /
        update_preimage), and any sum/count decomposable aggregate of
        the table state is exactly the running signed sum of the feed.

        Physical shape: both snapshots are bucket-partitioned on the
        same key hash, so the full-outer join shuffles on the keys
        once per side and AQE handles any skew; payload comparison is
        one xxhash64 per side, never column-by-column Python. On a
        real cluster with storage-partitioned joins the shuffles
        disappear entirely (both sides share the bucket layout).

        Bucket-pruned from the manifests alone: data files are
        immutable, so a bucket whose base and delta file lists are
        IDENTICAL in both snapshots cannot contain a changed key — the
        diff reads only buckets the manifests prove touched. A small
        epoch's change feed over a 10^10-row table therefore costs the
        touched buckets, not the table (the same O(changed data)
        property the merge has). Falls back to the full diff across a
        rebucket boundary, where bucket ids aren't comparable.
        """
        from datax_spark.operators.schema_evolution import union_by_name

        mf = self.manifest(from_version)
        m = self.manifest(to_version)
        keys = m.key_cols
        buckets = self._changed_buckets_between(mf, m)
        old = union_by_name(self.read(version=from_version, buckets=buckets), m.schema)
        new = union_by_name(self.read(version=to_version, buckets=buckets), m.schema)
        payload = [f.name for f in m.schema.fields if f.name not in keys]

        def tag(df: DataFrame, side: str) -> DataFrame:
            img = F.struct(*[F.col(c) for c in payload]).alias(f"__img_{side}")
            # xxhash64 SKIPS null inputs, so (null, x) and (x, null)
            # would collide; stringify with a null sentinel instead so
            # every field position contributes to the hash
            h = F.xxhash64(
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in payload
                ]
            ).alias(f"__h_{side}")
            return df.select(*keys, img, h)

        j = tag(old, "a").join(tag(new, "b"), on=keys, how="full_outer")
        change = (
            F.when(F.col("__h_a").isNull(), F.lit("insert"))
            .when(F.col("__h_b").isNull(), F.lit("delete"))
            .when(F.col("__h_a") != F.col("__h_b"), F.lit("update"))
        )
        if not include_preimage:
            img = F.when(
                F.col("__h_b").isNull(), F.col("__img_a")
            ).otherwise(F.col("__img_b"))
            return (
                j.withColumn("_change_type", change)
                .filter(F.col("_change_type").isNotNull())
                .select(
                    *keys,
                    *[img.getField(c).alias(c) for c in payload],
                    "_change_type",
                )
            )
        # two-row update form: explode each diff row into its
        # (change_type, image) emissions — still one join, one pass
        pair = lambda t, img_col: F.struct(  # noqa: E731
            F.lit(t).alias("t"), F.col(img_col).alias("img")
        )
        emissions = (
            F.when(change == "insert", F.array(pair("insert", "__img_b")))
            .when(change == "delete", F.array(pair("delete", "__img_a")))
            .when(
                change == "update",
                F.array(
                    pair("update_preimage", "__img_a"),
                    pair("update_postimage", "__img_b"),
                ),
            )
        )
        e = j.select(*keys, F.explode(emissions).alias("__e"))
        return e.select(
            *keys,
            *[F.col("__e.img").getField(c).alias(c) for c in payload],
            F.col("__e.t").alias("_change_type"),
        )

    def _changed_buckets_between(
        self, mf: "Manifest", m: "Manifest"
    ) -> list[int] | None:
        """Buckets that can contain a changed key between two
        snapshots, proven from manifests alone; None = cannot prove
        (rebucket in the window), meaning read everything.

        Walks the PARENT CHAIN from ``m`` back to ``mf`` so that
        layout-only commits (``operation`` "compact" or "rebucket") in
        the window contribute nothing — without this, a nightly
        compaction rewrites every file list and the next incremental
        sync of a 10^10-row table would re-read the world to find zero
        changes. Falls back to the direct file-list compare
        (conservative, still correct) when the walk needs an expired
        manifest or ``mf`` is not an ancestor of ``m``."""
        if mf.num_buckets != m.num_buckets:
            return None
        changed: set[int] = set()
        c = m
        while c.version != mf.version:
            if c.parent is None:
                c = None  # mf is not an ancestor: fall back
                break
            try:
                p = self.manifest(c.parent)
            except FileNotFoundError:
                c = None  # window history expired: fall back
                break
            if c.operation not in ("compact", "rebucket"):
                if p.num_buckets != m.num_buckets or c.num_buckets != m.num_buckets:
                    # a data commit (incl. a rollback across a
                    # rebucket) under a different bucket layout than
                    # the endpoints: its bucket ids are incomparable
                    return None
                changed.update(manifest_changed_buckets(p, c))
            c = p
        if c is not None:
            return sorted(changed)
        return manifest_changed_buckets(mf, m)

    def files_df(self, version: int | None = None) -> DataFrame:
        """Files metadata table (the Iceberg ``files`` metadata-table
        surface): one row per live data file of the snapshot — bucket,
        kind ('base' or 'delta'), apply sequence (deltas only; the MoR
        resolution order), relative path, and the manifest's harvested
        stats as a ``col -> [min, max, null_count]`` JSON string when
        the table keeps stats. Metadata-only: built from the manifest,
        no data or footer reads — at any table size this is
        O(live files) driver memory, the same as the manifest itself.
        """
        m = self.manifest(version)
        rows = []
        for b in sorted(set(m.files) | set(m.delta_files), key=int):
            for p in m.files.get(b, []):
                st = m.file_stats.get(p)
                rows.append(
                    (int(b), "base", None, p, json.dumps(st) if st else None)
                )
            for i, p in enumerate(m.delta_files.get(b, [])):
                rows.append((int(b), "delta", i + 1, p, None))
        return self.spark.createDataFrame(
            rows,
            "bucket int, kind string, seq int, path string, stats_json string",
        )

    def new_txn_dir(self) -> str:
        d = os.path.join(self.root, "data", f"txn-{uuid.uuid4().hex[:12]}")
        os.makedirs(d, exist_ok=True)
        return d

    def commit(
        self,
        replaced_buckets: list[int],
        new_files: dict[int, list[str]],
        new_row_counts: dict[int, int],
        schema: T.StructType | None = None,
        summary: dict | None = None,
        base_version: int | None = None,
        operation: str = "",
    ) -> int:
        """Commit a new snapshot: replaced buckets take the new file
        lists; untouched buckets carry over from the parent. Atomic.

        A replaced bucket's pending MoR delta files are cleared from
        the new snapshot — a rewrite produced its files from the
        MERGED read, so the deltas are baked in (this is exactly
        Iceberg's rewrite_data_files dropping applied delete files).

        ``base_version`` anchors optimistic concurrency: if another
        commit landed since the writer read that version, raise
        CommitConflictError instead of silently clobbering it.
        """
        if base_version is not None and self.current_version() != base_version:
            raise CommitConflictError(
                f"commit conflict: table moved from v{base_version} "
                f"to v{self.current_version()} since this merge started"
            )
        parent = self.manifest()
        files = dict(parent.files)
        counts = dict(parent.row_counts)
        dfiles = dict(parent.delta_files)
        dcounts = dict(parent.delta_row_counts)
        for b in replaced_buckets:
            files.pop(str(b), None)
            counts.pop(str(b), None)
            dfiles.pop(str(b), None)
            dcounts.pop(str(b), None)
        stats = dict(parent.file_stats)
        blooms = dict(parent.file_blooms)
        for b, fs in new_files.items():
            rel = [os.path.relpath(f, self.root) for f in fs]
            if rel:
                files[str(b)] = rel
                counts[str(b)] = int(new_row_counts.get(b, 0))
            if parent.stats_cols:
                harvested = harvest_file_stats(fs, parent.stats_cols)
                for f, r in zip(fs, rel):
                    if f in harvested:
                        stats[r] = harvested[f]
        if parent.bloom_cols:
            # one executor-parallel harvest over ALL the commit's new
            # files (per-bucket calls would be one tiny job each)
            all_abs = [f for fs in new_files.values() for f in fs]
            built = harvest_file_blooms(all_abs, parent.bloom_cols, self.spark)
            for f, b in built.items():
                blooms[os.path.relpath(f, self.root)] = b
        live = {p for fl in files.values() for p in fl}
        stats = {p: s for p, s in stats.items() if p in live}
        blooms = {p: s for p, s in blooms.items() if p in live}
        m = Manifest(
            version=parent.version + 1,
            parent=parent.version,
            schema_json=json.dumps((schema or parent.schema).jsonValue()),
            num_buckets=parent.num_buckets,
            key_cols=parent.key_cols,
            files=files,
            row_counts=counts,
            summary={**parent.summary, **(summary or {})},
            delta_files=dfiles,
            delta_row_counts=dcounts,
            resolve_order=parent.resolve_order,
            stats_cols=parent.stats_cols,
            file_stats=stats,
            bloom_cols=parent.bloom_cols,
            file_blooms=blooms,
            operation=operation,
            shard_buckets=parent.shard_buckets,
            hash_fn=parent.hash_fn,
            bucket_cols=parent.bucket_cols,
        )
        m._dirty_buckets = {int(b) for b in replaced_buckets} | {
            int(b) for b in new_files
        }
        return self._write_manifest(m, expected_parent=parent.version)

    def commit_deltas(
        self,
        new_delta_files: dict[int, list[str]],
        new_delta_rows: dict[int, int],
        schema: T.StructType | None = None,
        summary: dict | None = None,
        base_version: int | None = None,
    ) -> int:
        """Commit a merge-on-read epoch: APPEND each bucket's new delta
        files to its ordered delta list, leaving every base file
        untouched. The write cost of the snapshot is O(epoch batch) —
        independent of table size — which is the whole point of MoR;
        readers pay the merge until ``compact()`` folds the deltas
        down. Atomic pointer swap, same two-phase crash contract as
        :meth:`commit`."""
        if base_version is not None and self.current_version() != base_version:
            raise CommitConflictError(
                f"commit conflict: table moved from v{base_version} "
                f"to v{self.current_version()} since this merge started"
            )
        parent = self.manifest()
        dfiles = dict(parent.delta_files)
        dcounts = dict(parent.delta_row_counts)
        for b, fs in new_delta_files.items():
            rel = [os.path.relpath(f, self.root) for f in fs]
            if rel:
                dfiles[str(b)] = [*dfiles.get(str(b), []), *rel]
                dcounts[str(b)] = int(dcounts.get(str(b), 0)) + int(
                    new_delta_rows.get(b, 0)
                )
        m = Manifest(
            version=parent.version + 1,
            parent=parent.version,
            schema_json=json.dumps((schema or parent.schema).jsonValue()),
            num_buckets=parent.num_buckets,
            key_cols=parent.key_cols,
            files=dict(parent.files),
            row_counts=dict(parent.row_counts),
            summary={**parent.summary, **(summary or {})},
            delta_files=dfiles,
            delta_row_counts=dcounts,
            resolve_order=parent.resolve_order,
            stats_cols=parent.stats_cols,
            file_stats=dict(parent.file_stats),
            bloom_cols=parent.bloom_cols,
            file_blooms=dict(parent.file_blooms),
            shard_buckets=parent.shard_buckets,
            hash_fn=parent.hash_fn,
            bucket_cols=parent.bucket_cols,
        )
        m._dirty_buckets = {int(b) for b in new_delta_files}
        return self._write_manifest(m, expected_parent=parent.version)

    def total_rows(self) -> int:
        return sum(self.manifest().row_counts.values())

    def _folded_delete_ord(self, m: "Manifest", buckets) -> list | None:
        """Max resolve-order among MoR tombstones a rewrite is about to
        fold away (``buckets=None`` → all), max'd with any previously
        recorded fold. Folding a tombstone ends its retention window:
        an event OLDER than the folded delete arriving later could
        silently resurrect the key, so the fold boundary persists in
        the summary (``max_folded_delete_ord``) for feed-order guards
        (``StreamReplay.delete_order_check``) to check against."""
        prev = m.summary.get("max_folded_delete_ord")
        prev = list(prev) if prev is not None else None
        if not m.resolve_order:
            return prev
        keys = m.delta_files if buckets is None else {
            str(b): m.delta_files.get(str(b), []) for b in buckets
        }
        dpaths = [os.path.join(self.root, p) for fs in keys.values() for p in fs]
        if not dpaths:
            return prev
        row = (
            self.spark.read.parquet(*dpaths)
            .filter(F.col("__op") == "D")
            .agg(F.max(F.struct(*[F.col(c) for c in m.resolve_order])))
            .first()[0]
        )
        folded = list(row) if row is not None else None
        if prev is not None and (folded is None or folded < prev):
            return prev
        return folded

    def compact(
        self,
        buckets: list[int] | None = None,
        target_file_rows: int | None = None,
        sort_cols: list[str] | None = None,
        zorder_cols: list[str] | None = None,
    ) -> int:
        """Maintenance: rewrite each (selected) bucket's files into a
        clean sorted layout, commit as a new snapshot. The visible data
        is unchanged — only the physical layout. Two jobs in one pass,
        both Iceberg's rewrite_data_files: multi-file CoW buckets get
        a fresh layout, and merge-on-read buckets have their pending
        deltas FOLDED into a fresh base (the rewrite reads the merged
        view, and the commit clears the applied delta files), which
        resets MoR read amplification to zero. Returns the new
        snapshot version.

        ``sort_cols`` + ``target_file_rows`` together are the Iceberg
        sort-order compaction: rows sort by ``sort_cols`` within each
        bucket (default: the key columns) and the writer rolls over a
        new file every ``target_file_rows`` rows, so a bucket's files
        carry DISJOINT sort-column ranges. With ``stats_cols`` on the
        sort column, a range-filtered read then skips all but ~one file
        per bucket — at 100 TB the difference between a bucket scan and
        a file read. Without ``target_file_rows`` each bucket comes
        back as a single file (the pre-existing behavior).

        ``zorder_cols`` (mutually exclusive with ``sort_cols``) sorts
        by the interleaved-bit z-value of 2+ numeric columns instead —
        the Delta OPTIMIZE ZORDER BY analog: files end up clustered in
        EVERY listed dimension at once, so range reads on any single
        one of them skip files (a lexicographic sort only serves its
        leading column). Column bounds for the binning come free from
        the manifest when ``stats_cols`` covers the z-order columns,
        else one min/max aggregation of the data being rewritten.
        """
        import pyarrow.parquet as _pq
        from pyspark.sql import functions as _F

        m = self.manifest()
        names = {f.name for f in m.schema.fields}
        if sort_cols and zorder_cols:
            raise ValueError("sort_cols and zorder_cols are mutually exclusive")
        if zorder_cols is not None and len(zorder_cols) < 2:
            raise ValueError("zorder_cols needs >= 2 columns (use sort_cols for 1)")
        for c in (*(sort_cols or ()), *(zorder_cols or ())):
            if c not in names:
                raise ValueError(f"sort/zorder column {c!r} not in schema")
        for c in zorder_cols or ():
            dt = m.schema[c].dataType
            if not isinstance(dt, T.NumericType):
                raise ValueError(
                    f"zorder_cols must be numeric; {c!r} is {dt.simpleString()} "
                    "(bin strings first, e.g. via xxhash64)"
                )
        if target_file_rows is not None and target_file_rows < 1:
            raise ValueError("target_file_rows must be >= 1")
        cand = (
            buckets
            if buckets is not None
            else sorted({int(x) for x in m.files} | {int(x) for x in m.delta_files})
        )
        todo = [
            b
            for b in cand
            if len(m.files.get(str(b), [])) > 1
            or m.delta_files.get(str(b))
            or target_file_rows is not None
        ]
        if not todo:
            return m.version
        txn = self.new_txn_dir()
        df = self.read(buckets=todo).withColumn("__b", bucket_expr_for(m))
        if zorder_cols:
            # materialize the z-value as a real column (readers ignore
            # it via the explicit manifest schema)
            df = df.withColumn("__z", self._zorder_column(m, df, zorder_cols, todo))
            sort_names = ["__z"]
        else:
            sort_names = list(sort_cols or m.key_cols)
        # the sort MUST lead with __b: the partitioned write requires
        # ordering by its partition column, and a sort that does not
        # already satisfy it is superseded by the write's own Sort —
        # silently discarding the data ordering. With __b leading, the
        # requirement is a satisfied prefix and the sort survives.
        writer = (
            df.repartition(len(todo), _F.col("__b"))
            .sortWithinPartitions("__b", *sort_names)
            .write.mode("overwrite")
        )
        if target_file_rows is not None:
            # the task streams its sorted partition and rolls a new
            # file every N rows => files inherit disjoint sort ranges
            writer = writer.option("maxRecordsPerFile", target_file_rows)
        writer.partitionBy("__b").parquet(txn)
        new_files: dict[int, list[str]] = {}
        new_counts: dict[int, int] = {}
        import glob as _glob
        import re as _re

        for d in _glob.glob(os.path.join(txn, "__b=*")):
            b = int(_re.search(r"__b=(\d+)$", d).group(1))
            files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
            rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
            if rows:
                new_files[b] = files
                new_counts[b] = rows
        summary: dict = {"compacted": len(todo)}
        folded = self._folded_delete_ord(m, todo)
        if folded is not None:
            summary["max_folded_delete_ord"] = folded
        return self.commit(
            replaced_buckets=todo,
            new_files=new_files,
            new_row_counts=new_counts,
            summary=summary,
            base_version=m.version,
            # layout-only: visible state provably unchanged — lets
            # change-feed consumers skip diffing this commit entirely
            operation="compact",
        )

    def _zorder_column(self, m: Manifest, df: DataFrame, cols: list[str], todo: list[int]):
        """Z-value sort Column for :meth:`compact`'s z-order mode.
        Bounds per column come from the manifest's file stats when they
        cover every file being rewritten (zero extra work), else from
        one min/max aggregation of ``df``."""
        bounds: dict[str, tuple] = {}
        todo_files = [p for b in todo for p in m.files.get(str(b), [])]
        mor = any(m.delta_files.get(str(b)) for b in todo)
        manifest_ok = (
            not mor
            and todo_files
            and all(c in m.stats_cols for c in cols)
            and all(
                c in m.file_stats.get(p, {})
                and m.file_stats[p][c][0] is not None
                for p in todo_files
                for c in cols
            )
        )
        if manifest_ok:
            for c in cols:
                bounds[c] = (
                    min(m.file_stats[p][c][0] for p in todo_files),
                    max(m.file_stats[p][c][1] for p in todo_files),
                )
        else:
            row = df.agg(
                *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
                *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
            ).collect()[0]
            for i, c in enumerate(cols):
                mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
                if mn is None or mx is None:
                    mn = mx = 0
                bounds[c] = (mn, mx)
        return zorder_expr(cols, bounds)

    def rebucket(self, new_num_buckets: int) -> int:
        """Bucket-count evolution (the Iceberg partition-spec-evolution
        analog for this format): rewrite the table under a new key-hash
        bucket count and commit it as one snapshot. The dial that keeps
        CoW blast radius and per-task merge memory bounded as a table
        grows — a stream that starts at 64 buckets and reaches 10^9
        keys rebuckets to O(10^3-10^4) without downtime: readers keep
        the old snapshot until the atomic pointer swap, and the epoch
        watermark carries over so replay/resume is unaffected.

        One full-table rewrite (scan -> exchange on the new bucket
        hash -> sorted write), the same cost as a full compaction.
        Returns the new snapshot version.
        """
        import glob as _glob
        import re as _re

        import pyarrow.parquet as _pq
        from pyspark.sql import functions as _F

        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        m = self.manifest()
        if new_num_buckets == m.num_buckets:
            return m.version
        txn = self.new_txn_dir()
        bucket = bucket_expr_for(m, num_buckets=new_num_buckets)
        (
            self.read()
            .withColumn("__b", bucket)
            .repartition(new_num_buckets, _F.col("__b"))
            # __b leads so the partitioned write's required ordering is
            # a satisfied prefix — otherwise the key sort is superseded
            .sortWithinPartitions("__b", *m.key_cols)
            .write.mode("overwrite")
            .partitionBy("__b")
            .parquet(txn)
        )
        files: dict[str, list[str]] = {}
        counts: dict[str, int] = {}
        for d in _glob.glob(os.path.join(txn, "__b=*")):
            b = _re.search(r"__b=(\d+)$", d).group(1)
            fs = sorted(_glob.glob(os.path.join(d, "*.parquet")))
            rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in fs)
            if rows:
                files[b] = [os.path.relpath(f, self.root) for f in fs]
                counts[b] = rows
        stats: dict[str, dict[str, list]] = {}
        blooms: dict[str, dict[str, dict]] = {}
        if m.stats_cols:
            for b, rel in files.items():
                absf = [os.path.join(self.root, p) for p in rel]
                harvested = harvest_file_stats(absf, m.stats_cols)
                for f, r in zip(absf, rel):
                    if f in harvested:
                        stats[r] = harvested[f]
        if m.bloom_cols:
            all_abs = [
                os.path.join(self.root, p) for rel in files.values() for p in rel
            ]
            built = harvest_file_blooms(all_abs, m.bloom_cols, self.spark)
            for f, b in built.items():
                blooms[os.path.relpath(f, self.root)] = b
        nm = Manifest(
            version=m.version + 1,
            parent=m.version,
            schema_json=m.schema_json,
            num_buckets=new_num_buckets,
            key_cols=m.key_cols,
            files=files,
            row_counts=counts,
            summary={
                **m.summary,
                "rebucketed_from": m.num_buckets,
                # a rebucket folds ALL pending deltas (read() above is
                # the merged view; no delta_files carry over) — record
                # the retention-window boundary like compact() does
                **(
                    {"max_folded_delete_ord": f}
                    if (f := self._folded_delete_ord(m, None)) is not None
                    else {}
                ),
            },
            resolve_order=m.resolve_order,
            stats_cols=m.stats_cols,
            operation="rebucket",
            file_stats=stats,
            bloom_cols=m.bloom_cols,
            file_blooms=blooms,
            shard_buckets=m.shard_buckets,
            hash_fn=m.hash_fn,
            bucket_cols=m.bucket_cols,
        )
        return self._write_manifest(nm, expected_parent=m.version)

    def versions(self) -> list[int]:
        """All snapshot versions that still have a manifest, ascending."""
        out = []
        for fn in os.listdir(self._manifest_dir()):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    # ---------- refs (named snapshots) ----------
    def _refs_path(self) -> str:
        return os.path.join(self._manifest_dir(), "_refs.json")

    def refs(self) -> dict[str, int]:
        """Named snapshot refs (the Iceberg tag surface): name ->
        version. Tagged snapshots are pinned — ``expire_snapshots``
        never retires them, so ``vacuum`` keeps their data files and
        reads through a tag stay valid across retention cycles."""
        if not os.path.exists(self._refs_path()):
            return {}
        with open(self._refs_path()) as fh:
            return {k: int(v) for k, v in json.load(fh).items()}

    def ref_version(self, name: str) -> int:
        refs = self.refs()
        if name not in refs:
            raise KeyError(f"no ref named {name!r} (have: {sorted(refs)})")
        return refs[name]

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg ``create_tag``).
        Defaults to the current snapshot. Re-tagging an existing name
        moves it. Returns the tagged version."""
        with _commit_lock(self.root):
            v = self.current_version() if version is None else int(version)
            if v not in self.versions():
                raise ValueError(f"cannot tag {name!r}: no snapshot v{v}")
            refs = self.refs()
            refs[name] = v
            _atomic_write(self._refs_path(), json.dumps(refs, indent=1))
        return v

    def drop_tag(self, name: str) -> None:
        with _commit_lock(self.root):
            refs = self.refs()
            if name not in refs:
                raise KeyError(f"no ref named {name!r}")
            del refs[name]
            _atomic_write(self._refs_path(), json.dumps(refs, indent=1))

    # ---------- write-audit-publish (staged snapshots) ----------
    def _wap_path(self) -> str:
        return os.path.join(self._manifest_dir(), "_wap.json")

    def _wap_staged(self) -> dict[str, int]:
        if not os.path.exists(self._wap_path()):
            return {}
        with open(self._wap_path()) as fh:
            return {k: int(v) for k, v in json.load(fh).items()}

    def wap_version(self, wap_id: str) -> int:
        """Version of the snapshot staged under ``wap_id`` — the audit
        target: ``read(version=table.wap_version(id))`` (or just
        ``read(version=id)``) sees the candidate state while main keeps
        serving the published snapshot."""
        staged = self._wap_staged()
        if wap_id not in staged:
            raise KeyError(f"no staged snapshot for wap id {wap_id!r} (have: {sorted(staged)})")
        return staged[wap_id]

    def publish_wap(self, wap_id: str) -> int:
        """Publish a staged snapshot (Iceberg ``cherrypick_snapshot``
        on a WAP-staged commit). Fast path: if main has not moved since
        the snapshot was staged, the publish is a pointer fast-forward
        — zero data work. If main HAS moved and the staged snapshot is
        a pure MoR delta append (no base-file changes vs its parent),
        its new delta files are re-applied onto the current head — the
        append cherry-pick Iceberg allows; event-order ``resolve_order``
        tables keep LWW exact under the re-ordering, apply-seq tables
        inherit the head's ordering. Any other divergence raises
        CommitConflictError: re-run the write against the new head
        (CoW rewrites bake parent images into their files, so
        re-pointing them would silently drop the interleaved commit).
        Returns the published main version."""
        with _commit_lock(self.root):
            v = self.wap_version(wap_id)
            m = self.manifest(v)
            cur = self.current_version()
            staged = self._wap_staged()
            if cur == m.parent:
                _atomic_write(os.path.join(self._manifest_dir(), "_current"), str(v))
                del staged[wap_id]
                _atomic_write(self._wap_path(), json.dumps(staged, indent=1))
                return v
            parent = self.manifest(m.parent)
            delta_only = (
                m.files == parent.files
                and m.row_counts == parent.row_counts
                and m.num_buckets == parent.num_buckets
                and all(
                    m.delta_files.get(b, [])[: len(fs)] == fs
                    for b, fs in parent.delta_files.items()
                )
            )
            if not delta_only:
                raise CommitConflictError(
                    f"cannot publish wap {wap_id!r}: main moved v{m.parent}->v{cur} "
                    "and the staged snapshot rewrites base files (re-stage against "
                    "the new head)"
                )
            head = self.manifest()
            if m.schema_json != head.schema_json or m.num_buckets != head.num_buckets:
                raise CommitConflictError(
                    f"cannot publish wap {wap_id!r}: schema/bucket layout changed "
                    "under the staged delta append"
                )
            new_deltas = {
                int(b): [
                    os.path.join(self.root, p)
                    for p in fs[len(parent.delta_files.get(b, [])):]
                ]
                for b, fs in m.delta_files.items()
            }
            new_rows = {
                int(b): int(m.delta_row_counts.get(b, 0))
                - int(parent.delta_row_counts.get(b, 0))
                for b in m.delta_files
            }
            # commit through a clean handle: the caller's wap_id (if
            # any) must not re-stage the publish itself
            pub = LakeTable(self.spark, self.root)
            out = pub.commit_deltas(
                new_delta_files={b: fs for b, fs in new_deltas.items() if fs},
                new_delta_rows={b: n for b, n in new_rows.items() if n},
                summary={**m.summary, "cherry_picked_from": v},
                base_version=head.version,
            )
            del staged[wap_id]
            _atomic_write(self._wap_path(), json.dumps(staged, indent=1))
            # the staged manifest is superseded by the cherry-picked one
            os.remove(os.path.join(self._manifest_dir(), f"v{v:08d}.json"))
            return out

    def drop_wap(self, wap_id: str) -> None:
        """Abandon a staged snapshot: the audit failed. Its manifest is
        removed; data files it alone referenced become orphans that the
        next ``vacuum()`` reclaims."""
        with _commit_lock(self.root):
            staged = self._wap_staged()
            if wap_id not in staged:
                raise KeyError(f"no staged snapshot for wap id {wap_id!r}")
            v = staged.pop(wap_id)
            _atomic_write(self._wap_path(), json.dumps(staged, indent=1))
            os.remove(os.path.join(self._manifest_dir(), f"v{v:08d}.json"))

    def rollback(self, version: int | str) -> int:
        """Roll the table back to an earlier snapshot (Iceberg's
        ``rollback_to_snapshot``): commit a NEW snapshot whose entire
        content — file lists, row counts, pending MoR deltas, schema,
        bucket layout, file stats, and the summary's epoch watermark —
        is the target's. History is preserved (the rolled-past
        snapshots stay time-travelable until expired) and the commit
        goes through the same CAS pointer swap as any write, so a
        rollback races cleanly against concurrent committers.

        Because the ``last_epoch`` watermark reverts with the content,
        a ReplayEngine resumed on the rolled-back table re-consumes
        every epoch after the target and converges to the same final
        state — the CDC reset-and-replay story, with the exactly-once
        gate intact. Accepts a version number or a tag name."""
        t = self.manifest(version)
        cur = self.manifest()
        if t.version == cur.version:
            raise ValueError(f"table is already at snapshot v{t.version}")
        m = Manifest(
            version=cur.version + 1,
            parent=cur.version,
            schema_json=t.schema_json,
            num_buckets=t.num_buckets,
            key_cols=t.key_cols,
            files=dict(t.files),
            row_counts=dict(t.row_counts),
            summary={**t.summary, "rollback_of": t.version},
            operation="rollback",
            delta_files=dict(t.delta_files),
            delta_row_counts=dict(t.delta_row_counts),
            resolve_order=t.resolve_order,
            stats_cols=t.stats_cols,
            file_stats=dict(t.file_stats),
            bloom_cols=t.bloom_cols,
            file_blooms=dict(t.file_blooms),
            shard_buckets=t.shard_buckets,
            hash_fn=t.hash_fn,
            bucket_cols=t.bucket_cols,
        )
        return self._write_manifest(m, expected_parent=cur.version)

    def delete_where(
        self,
        filters: list[tuple] | None = None,
        condition=None,
        strategy: str = "shuffle",
    ) -> int:
        """Row-level predicate delete (the Iceberg/Delta ``DELETE FROM
        ... WHERE`` surface; retention sweeps, GDPR erasure). The
        matching rows' KEYS are collected distributed-side and applied
        as ordinary delete events through the engine's own MERGE, so
        the deletion is a first-class snapshot commit: it appears in
        the change feed as ``delete`` rows, incremental views retract,
        replicas converge, and time travel before the commit still
        sees the data (couple with ``expire_snapshots`` + ``vacuum``
        for physical erasure).

        ``filters`` takes the conjunct-tuple form of :meth:`read` —
        per-file [min,max,null_count] stats and key blooms SKIP files
        the predicate provably misses, so a retention sweep over a
        stats-indexed column scans the matching tail, not the table.
        ``condition`` accepts an arbitrary Column / SQL string instead
        (full scan of every bucket's data, no pruning — the predicate
        is opaque). Exactly one of the two.

        ``strategy``: ``"shuffle"`` (CoW rewrite of affected buckets,
        default) or ``"mor"`` — O(matched keys) tombstone deltas, the
        right shape when a TTL sweep touches most buckets of a huge
        table and the rewrite should be deferred to compaction.

        Returns the number of rows deleted (0 = no commit made).
        """
        from datax_spark.lake.merge import merge_into

        if (filters is None) == (condition is None):
            raise ValueError("pass exactly one of filters= or condition=")
        m = self.manifest()
        if filters is not None:
            matched = self.read(filters=filters)
        else:
            cond = F.expr(condition) if isinstance(condition, str) else condition
            matched = self.read().filter(cond)
        # tombstones must carry the matched row's OWN resolve-order
        # column values: a MoR read resolves LWW winners by those
        # columns (NULLs sort last and would lose to the very base row
        # being deleted — a silent no-op delete); at equal order the
        # delta's higher sequence breaks the tie toward the tombstone
        carry = list(m.resolve_order or ())
        keys = matched.select(*m.key_cols, *carry).persist()
        try:
            n = keys.count()
            if n == 0:
                return 0
            null_payload = [
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in m.schema.fields
                if f.name not in m.key_cols and f.name not in carry
            ]
            up = keys.select(
                *m.key_cols, *carry, *null_payload, F.lit("D").alias("__op")
            )
            pm = merge_into(
                self, up, op_col="__op", delete_op="D", strategy=strategy
            )
            pm.commit(
                summary={
                    "delete_where": str(
                        filters if filters is not None else condition
                    ),
                    "rows_deleted": n,
                }
            )
            return n
        finally:
            keys.unpersist()

    def update_where(
        self,
        assignments: dict[str, object],
        filters: list[tuple] | None = None,
        condition=None,
        strategy: str = "shuffle",
    ) -> int:
        """Row-level predicate update (the Iceberg/Delta ``UPDATE ...
        SET ... WHERE`` surface), the sibling of :meth:`delete_where`
        and the same shape: matching rows are re-emitted as upsert
        events through the engine's own MERGE, so the update is a
        first-class snapshot commit the change feed reports as
        ``update`` rows and downstream views/replicas absorb
        incrementally.

        ``assignments`` maps column name → new value: a Column, a SQL
        expression string, or a non-string literal. A plain string is
        ALWAYS parsed as a SQL expression (``{"lsn": "lsn + 1"}`` —
        expressions see the row's OLD values, SQL UPDATE semantics);
        to assign a string literal pass ``F.lit("archived")``. An
        expression string naming no known column fails analysis
        loudly rather than guessing.
        Key columns cannot be assigned — a key change is a delete +
        insert, which is a statement about identity the caller must
        make explicitly. Predicate forms and ``strategy`` as in
        :meth:`delete_where`. Returns rows updated (0 = no commit).
        """
        from pyspark.sql import Column

        from datax_spark.lake.merge import merge_into

        if (filters is None) == (condition is None):
            raise ValueError("pass exactly one of filters= or condition=")
        m = self.manifest()
        bad = set(assignments) & set(m.key_cols)
        if bad:
            raise ValueError(
                f"cannot assign key column(s) {sorted(bad)} — delete and "
                "re-insert to change a row's identity"
            )
        unknown = set(assignments) - {f.name for f in m.schema.fields}
        if unknown:
            raise ValueError(f"unknown column(s) {sorted(unknown)}")
        if filters is not None:
            matched = self.read(filters=filters)
        else:
            cond = F.expr(condition) if isinstance(condition, str) else condition
            matched = self.read().filter(cond)
        types = {f.name: f.dataType for f in m.schema.fields}

        def value_of(c: str):
            v = assignments[c]
            if isinstance(v, Column):
                raw = v
            elif isinstance(v, str):
                raw = F.expr(v)
            else:
                raw = F.lit(v)
            # SQL UPDATE semantics: an assignment value that cannot be
            # represented in the column's type FAILS the statement —
            # try_cast + assert, so a typo'd expression can never
            # silently NULL the column across every matched row
            # (plain .cast() does exactly that under non-ANSI Spark)
            casted = raw.try_cast(types[c])
            ok = raw.isNull() | casted.isNotNull()
            return F.when(ok, casted).otherwise(
                F.raise_error(
                    F.lit(
                        f"update_where: assignment for column '{c}' does "
                        f"not cast to {types[c].simpleString()}"
                    )
                )
            )

        up = matched.select(
            *[
                value_of(f.name).alias(f.name)
                if f.name in assignments
                else F.col(f.name)
                for f in m.schema.fields
            ],
            F.lit("U").alias("__op"),
        ).persist()
        try:
            n = up.count()
            if n == 0:
                return 0
            pm = merge_into(
                self, up, op_col="__op", delete_op="D", strategy=strategy
            )
            pm.commit(
                summary={
                    "update_where": str(
                        filters if filters is not None else condition
                    ),
                    "rows_updated": n,
                }
            )
            return n
        finally:
            up.unpersist()

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Retire old snapshots (Iceberg's expire_snapshots): delete the
        manifest files of all but the newest ``keep_last`` versions (the
        current snapshot is always kept). Time travel and ``changes()``
        into the expired range stop working by design; data files that
        were referenced only by expired snapshots become orphans that
        the next ``vacuum()`` reclaims. Under CoW every epoch rewrites
        whole buckets, so without expiration storage grows linearly
        with epochs — this is the retention dial. Tagged snapshots
        (``tag``) are pinned and never expire. Returns the expired
        versions.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        cur = self.current_version()
        keep = (
            set(vs[-keep_last:])
            | {cur}
            | set(self.refs().values())
            | set(self._wap_staged().values())
        )
        expired = [v for v in vs if v not in keep]
        for v in expired:
            os.remove(os.path.join(self._manifest_dir(), f"v{v:08d}.json"))
        return expired

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO live snapshot manifest —
        orphans from crashed commits and files released by
        ``expire_snapshots``. Files referenced by any retained snapshot
        are kept, so time travel across the retained range survives a
        vacuum (Iceberg's remove_orphan_files contract). Manifest SHARD
        files referenced by no live snapshot (crashed commits, expired
        history, superseded WAP stages) are reclaimed the same way.
        Returns the removed paths."""
        live: set[str] = set()
        live_shards: set[str] = set()
        for v in self.versions():
            m = self.manifest(v)
            live |= {os.path.join(self.root, p) for fs in m.files.values() for p in fs}
            live |= {
                os.path.join(self.root, p)
                for fs in m.delta_files.values()
                for p in fs
            }
            live_shards |= set(self._snapshot_raw(v).get("shards", {}).values())
        removed = []
        data_dir = os.path.join(self.root, "data")
        for dirpath, _dirnames, filenames in os.walk(data_dir):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                if p not in live and fn.endswith(".parquet"):
                    os.remove(p)
                    removed.append(p)
        for fn in os.listdir(self._manifest_dir()):
            if (
                fn.startswith("shard-")
                and fn.endswith(".json")
                and fn not in live_shards
            ):
                p = os.path.join(self._manifest_dir(), fn)
                os.remove(p)
                removed.append(p)
        return removed
