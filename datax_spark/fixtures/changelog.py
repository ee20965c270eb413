"""Deterministic distributed change-event generator (FIXTURES.md F1/F2).

Model: the reference's synthetic source plugin, streamreader
(``streamreader/.../StreamReader.java:94-166,239-305`` — per-column
constant/random specs), scaled up: instead of driver-side row loops we
derive every column as a deterministic JVM-side expression of the
global row id (``spark.range`` + ``xxhash64``), so generation is fully
distributed and reproducible at any scale — the same recipe would
produce 10^10 events on a 1000-executor cluster with zero driver work.

Event-log semantics mirror otsstreamreader's op-typed change rows
(``MultiVerModeRecordSender.java:83-121``): key ``(repo, path)``, op in
{I,U,D}, total-order ``lsn`` (sequenceId analog), ``commit`` monotone
per repo, ops ordered by ``(commit, lsn)``.

Required fixture patterns (FIXTURES.md F2) and how they are produced:
* hot-key skew: repo_000 receives ~32% of events (explicit CDF split);
* multiple updates per key per epoch / delete-then-reinsert /
  update-after-delete: keys are drawn from a small per-repo path pool,
  so collisions, deletes and resurrections occur densely;
* out-of-file-order events: rows are shuffled by a hash before writing,
  so parquet row order differs from (commit, lsn) order;
* schema evolution: epochs >= ``evolve_from_epoch`` carry an extra
  ``lang_variant`` column (earlier epoch files lack the column);
* null bucket: ~1/37 of events have NULL ``lang``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "ts", "rs", "md"]
EXTS = {"python": "py", "java": "java", "go": "go", "ts": "ts", "rs": "rs", "md": "md"}


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int = 100_000
    n_repos: int = 200
    paths_per_repo: int = 400
    events_per_epoch: int = 20_000
    evolve_from_epoch: int | None = None  # epochs >= this gain lang_variant
    seed: int = 42

    @property
    def n_epochs(self) -> int:
        return (self.n_events + self.events_per_epoch - 1) // self.events_per_epoch


def _h(col, salt: int, seed: int):
    """Deterministic non-negative hash of a column."""
    return F.abs(F.xxhash64(col, F.lit(seed * 1_000_003 + salt)))


def events_df(
    spark: SparkSession,
    spec: ChangelogSpec,
    lsn_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Build the change-event DataFrame (no writes, fully distributed).

    Every column is a pure function of ``lsn``, so ``lsn_range``
    generates an exact SLICE of the full log — the rows for
    ``lo <= lsn < hi`` are bit-identical to the same rows of a full
    generation. This is what lets disk-bounded scale ladders
    (tools/scale_rolling.py) materialize one epoch at a time instead
    of the whole 10^8+-event log."""
    lo, hi = lsn_range if lsn_range is not None else (0, spec.n_events)
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        (hi - lo + spec.events_per_epoch - 1) // spec.events_per_epoch,
    )
    df = spark.range(lo, hi, 1, n_parts).withColumnRenamed("id", "lsn")

    # --- repo: explicit skewed CDF (top repo ~32%, next two ~10%/7%) ---
    u = (_h(F.col("lsn"), 1, spec.seed) % 1_000_000) / 1_000_000.0
    tail_idx = 3 + (_h(F.col("lsn"), 2, spec.seed) % F.lit(max(spec.n_repos - 3, 1)))
    repo_idx = (
        F.when(u < 0.32, F.lit(0))
        .when(u < 0.42, F.lit(1))
        .when(u < 0.49, F.lit(2))
        .otherwise(tail_idx)
    )
    df = df.withColumn("__repo_idx", repo_idx.cast("long"))

    # --- lang + path (path pool per repo => dense key collisions) ---
    pid = _h(F.col("lsn"), 3, spec.seed) % spec.paths_per_repo
    # lang is a function of (repo, path-id) so a key's lang is stable
    lang_idx = _h(F.concat_ws("|", F.col("__repo_idx"), pid), 4, spec.seed) % len(LANGS)
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    ext_arr = F.array(*[F.lit(EXTS[x]) for x in LANGS])
    df = (
        df.withColumn("repo", F.format_string("repo_%03d", F.col("__repo_idx")))
        .withColumn("__pid", pid)
        .withColumn("__lang", F.element_at(lang_arr, (lang_idx + 1).cast("int")))
        .withColumn(
            "path",
            F.format_string(
                "dir%d/dir%d/file_%04d.%s",
                F.col("__pid") % 7,
                F.col("__pid") % 13,
                F.col("__pid"),
                F.element_at(ext_arr, (lang_idx + 1).cast("int")),
            ),
        )
    )

    # --- op mix: 20% I, 68% U, 12% D ---
    r = _h(F.col("lsn"), 5, spec.seed) % 100
    op = F.when(r < 20, "I").when(r < 88, "U").otherwise("D")
    df = df.withColumn("op", op)

    # --- commit: 40 hex chars, lexicographically monotone in lsn ---
    # (12-hex zero-padded lsn prefix + 28 hash chars) => ordering by
    # commit == ordering by lsn, monotone within every repo.
    df = df.withColumn(
        "commit",
        F.concat(
            F.lpad(F.lower(F.hex(F.col("lsn"))), 12, "0"),
            F.substring(F.sha2(F.concat_ws("|", "repo", "path", "lsn"), 256), 1, 28),
        ),
    )

    # --- content: deterministic pseudo-code, 64..1024 chars ---
    body = F.sha2(F.concat_ws("|", "repo", "path", "commit", F.lit(spec.seed)), 256)
    clen = (64 + _h(F.col("lsn"), 6, spec.seed) % 961).cast("int")
    content = F.substring(
        F.concat(
            F.format_string("def fn_%04d(x):  # %s\n", F.col("__pid"), F.col("repo")),
            F.repeat(F.concat(body, F.lit(" ")), 20),
        ),
        1,
        clen,
    )

    # --- null bucket + D-op nulling ---
    lang = F.when(_h(F.col("lsn"), 7, spec.seed) % 37 == 0, F.lit(None)).otherwise(
        F.col("__lang")
    )
    is_del = F.col("op") == "D"
    df = (
        df.withColumn("lang", F.when(is_del, F.lit(None)).otherwise(lang))
        .withColumn("content", F.when(is_del, F.lit(None)).otherwise(content))
        .withColumn("epoch", (F.col("lsn") / spec.events_per_epoch).cast("long"))
    )

    if spec.evolve_from_epoch is not None:
        variant = F.concat_ws(
            "-", F.col("__lang"), F.format_string("v%d", _h(F.col("lsn"), 8, spec.seed) % 3)
        )
        df = df.withColumn(
            "lang_variant",
            F.when(is_del | (F.col("epoch") < spec.evolve_from_epoch), F.lit(None)).otherwise(
                variant
            ),
        )

    base_cols = ["repo", "path", "op", "commit", "lsn", "lang", "content", "epoch"]
    if spec.evolve_from_epoch is not None:
        base_cols.append("lang_variant")
    # shuffle file order away from lsn order (ordering must come from
    # (commit, lsn), never from row position — SURVEY.md §3.3)
    return df.select(*base_cols).repartition(n_parts, _h(F.col("lsn"), 9, spec.seed))


def write_events(spark: SparkSession, spec: ChangelogSpec, root: str) -> list[int]:
    """Write the event log partitioned by epoch; returns epoch ids.

    Epochs before ``evolve_from_epoch`` are written WITHOUT the
    ``lang_variant`` column (true schema evolution mid-stream: early
    files have the old schema, later files the new one).
    """
    df = events_df(spark, spec)
    if spec.evolve_from_epoch is None:
        df.write.mode("overwrite").partitionBy("epoch").parquet(root)
    else:
        old = df.filter(F.col("epoch") < spec.evolve_from_epoch).drop("lang_variant")
        new = df.filter(F.col("epoch") >= spec.evolve_from_epoch)
        old.write.mode("overwrite").partitionBy("epoch").parquet(root)
        new.write.mode("append").partitionBy("epoch").parquet(root)
    return list(range(spec.n_epochs))
