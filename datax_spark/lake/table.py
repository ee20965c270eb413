"""LakeTable — a from-scratch snapshot-versioned table format.

No Iceberg runtime ships in this environment, so the engine implements
the same contract directly (public Iceberg spec concepts: versioned
manifests, atomic pointer swap, snapshot summary, schema evolution,
partition/bucket pruning):

* Data layout: ``data/txn-<uuid>/b=<bucket>/*.parquet`` — rows are
  hash-bucketed by key (``pmod(xxhash64(keys), num_buckets)``), the
  analog of an Iceberg bucket-partitioned table. Buckets bound the
  blast radius of copy-on-write merges: an epoch touching 12 of 256
  buckets rewrites only those 12.
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
bucket; at very large file counts you would shard the manifest as
Iceberg does), bucket pruning keeps merge I/O proportional to the
touched key space, and the atomic pointer swap is a single rename on
any HDFS-compatible store.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


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

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    @property
    def last_epoch(self) -> int:
        return int(self.summary.get("last_epoch", -1))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "parent": self.parent,
                "schema_json": self.schema_json,
                "num_buckets": self.num_buckets,
                "key_cols": self.key_cols,
                "files": self.files,
                "row_counts": self.row_counts,
                "summary": self.summary,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        return cls(**json.loads(s))


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)  # atomic on POSIX / HDFS rename semantics


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------- lifecycle ----------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 64,
    ) -> "LakeTable":
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        t = cls(spark, root)
        if t.current_version() is not None:
            raise FileExistsError(f"table already exists at {root}")
        m = Manifest(
            version=0,
            parent=None,
            schema_json=json.dumps(schema.jsonValue()),
            num_buckets=num_buckets,
            key_cols=list(key_cols),
            files={},
            row_counts={},
            summary={"last_epoch": -1},
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

    def manifest(self, version: int | None = None) -> Manifest:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError("table has no committed snapshot")
        with open(os.path.join(self._manifest_dir(), f"v{v:08d}.json")) as fh:
            return Manifest.from_json(fh.read())

    @property
    def last_epoch(self) -> int:
        return self.manifest().last_epoch

    def _write_manifest(self, m: Manifest, expected_parent: int | None) -> None:
        cur = self.current_version()
        if cur != expected_parent:
            raise CommitConflictError(
                f"commit conflict: current={cur}, expected parent={expected_parent}"
            )
        _atomic_write(
            os.path.join(self._manifest_dir(), f"v{m.version:08d}.json"), m.to_json()
        )
        _atomic_write(os.path.join(self._manifest_dir(), "_current"), str(m.version))

    # ---------- data ----------
    def bucket_expr(self, num_buckets: int | None = None, key_cols: list[str] | None = None):
        m = self.manifest()
        nb = num_buckets or m.num_buckets
        keys = key_cols or m.key_cols
        return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(nb)).cast("int")

    def read(self, buckets: list[int] | None = None, version: int | None = None) -> DataFrame:
        """Read the snapshot, optionally pruned to a bucket subset.

        The explicit manifest schema makes old files (written before a
        schema evolution) come back null-filled for new columns — the
        parquet reader's missing-column semantics.
        """
        m = self.manifest(version)
        items = m.files.items()
        if buckets is not None:
            want = {str(b) for b in buckets}
            items = [(b, fs) for b, fs in m.files.items() if b in want]
        paths = [os.path.join(self.root, p) for _, fs in items for p in fs]
        if not paths:
            return self.spark.createDataFrame([], m.schema)
        return self.spark.read.schema(m.schema).parquet(*paths)

    def changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change data feed between two snapshots (the Delta CDF /
        Iceberg changelog-scan surface for this table format): one row
        per key whose state differs, with ``_change_type`` in
        {insert, update, delete}. Inserts/updates carry the TO-side
        image; deletes carry the FROM-side image.

        Physical shape: both snapshots are bucket-partitioned on the
        same key hash, so the full-outer join shuffles on the keys
        once per side and AQE handles any skew; payload comparison is
        one xxhash64 per side, never column-by-column Python. On a
        real cluster with storage-partitioned joins the shuffles
        disappear entirely (both sides share the bucket layout).
        """
        from datax_spark.operators.schema_evolution import union_by_name

        m = self.manifest(to_version)
        keys = m.key_cols
        old = union_by_name(self.read(version=from_version), m.schema)
        new = union_by_name(self.read(version=to_version), m.schema)
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
    ) -> int:
        """Commit a new snapshot: replaced buckets take the new file
        lists; untouched buckets carry over from the parent. Atomic.

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
        for b in replaced_buckets:
            files.pop(str(b), None)
            counts.pop(str(b), None)
        for b, fs in new_files.items():
            rel = [os.path.relpath(f, self.root) for f in fs]
            if rel:
                files[str(b)] = rel
                counts[str(b)] = int(new_row_counts.get(b, 0))
        m = Manifest(
            version=parent.version + 1,
            parent=parent.version,
            schema_json=json.dumps((schema or parent.schema).jsonValue()),
            num_buckets=parent.num_buckets,
            key_cols=parent.key_cols,
            files=files,
            row_counts=counts,
            summary={**parent.summary, **(summary or {})},
        )
        self._write_manifest(m, expected_parent=parent.version)
        return m.version

    def total_rows(self) -> int:
        return sum(self.manifest().row_counts.values())

    def compact(self, buckets: list[int] | None = None, target_file_rows: int | None = None) -> int:
        """Maintenance: rewrite each (selected) bucket's files into one
        sorted file, commit as a new snapshot. Data is unchanged — only
        the file layout. The small-file problem is inherent to CoW
        epochs (each epoch adds a file per touched bucket); periodic
        compaction restores one-file-per-bucket reads, like Iceberg's
        rewrite_data_files. Returns the new snapshot version.
        """
        import pyarrow.parquet as _pq
        from pyspark.sql import functions as _F

        m = self.manifest()
        todo = [b for b in (buckets if buckets is not None else sorted(int(x) for x in m.files))
                if str(b) in m.files and len(m.files[str(b)]) > 1]
        if not todo:
            return m.version
        txn = self.new_txn_dir()
        df = self.read(buckets=todo).withColumn(
            "__b",
            _F.pmod(_F.xxhash64(*[_F.col(k) for k in m.key_cols]), _F.lit(m.num_buckets)).cast("int"),
        )
        (
            df.repartition(len(todo), _F.col("__b"))
            .sortWithinPartitions(*m.key_cols)
            .write.mode("overwrite")
            .partitionBy("__b")
            .parquet(txn)
        )
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
        return self.commit(
            replaced_buckets=todo,
            new_files=new_files,
            new_row_counts=new_counts,
            summary={"compacted": len(todo)},
            base_version=m.version,
        )

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
        bucket = _F.pmod(
            _F.xxhash64(*[_F.col(k) for k in m.key_cols]), _F.lit(new_num_buckets)
        ).cast("int")
        (
            self.read()
            .withColumn("__b", bucket)
            .repartition(new_num_buckets, _F.col("__b"))
            .sortWithinPartitions(*m.key_cols)
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
        nm = Manifest(
            version=m.version + 1,
            parent=m.version,
            schema_json=m.schema_json,
            num_buckets=new_num_buckets,
            key_cols=m.key_cols,
            files=files,
            row_counts=counts,
            summary={**m.summary, "rebucketed_from": m.num_buckets},
        )
        self._write_manifest(nm, expected_parent=m.version)
        return nm.version

    def versions(self) -> list[int]:
        """All snapshot versions that still have a manifest, ascending."""
        out = []
        for fn in os.listdir(self._manifest_dir()):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Retire old snapshots (Iceberg's expire_snapshots): delete the
        manifest files of all but the newest ``keep_last`` versions (the
        current snapshot is always kept). Time travel and ``changes()``
        into the expired range stop working by design; data files that
        were referenced only by expired snapshots become orphans that
        the next ``vacuum()`` reclaims. Under CoW every epoch rewrites
        whole buckets, so without expiration storage grows linearly
        with epochs — this is the retention dial. Returns the expired
        versions.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        cur = self.current_version()
        keep = set(vs[-keep_last:]) | {cur}
        expired = [v for v in vs if v not in keep]
        for v in expired:
            os.remove(os.path.join(self._manifest_dir(), f"v{v:08d}.json"))
        return expired

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO live snapshot manifest —
        orphans from crashed commits and files released by
        ``expire_snapshots``. Files referenced by any retained snapshot
        are kept, so time travel across the retained range survives a
        vacuum (Iceberg's remove_orphan_files contract). Returns the
        removed paths."""
        live: set[str] = set()
        for v in self.versions():
            m = self.manifest(v)
            live |= {os.path.join(self.root, p) for fs in m.files.values() for p in fs}
        removed = []
        data_dir = os.path.join(self.root, "data")
        for dirpath, _dirnames, filenames in os.walk(data_dir):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                if p not in live and fn.endswith(".parquet"):
                    os.remove(p)
                    removed.append(p)
        return removed
