"""Document deduplication operators: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design:
* Exact dedup is a hash groupBy (map-side combine → tiny shuffle).
* MinHash signatures are computed entirely JVM-side — shingling via
  ``sequence``+``transform``+``substring`` and per-permutation minima
  via ``array_min(transform(xxhash64))`` — so the signature stage is
  whole-stage-codegen'd, no Python. LSH banding then explodes to
  (band, band_hash) and self-joins per band bucket: candidate
  generation is O(sum of bucket^2) instead of O(n^2) — the standard
  shingle→minhash→band→bucket-join pipeline, all shuffles on band
  hashes which are uniform by construction (no skew).
* SimHash runs as an Arrow pandas UDF (per-bit majority vote over
  token hashes is not expressible as cheap Column algebra).
* Verification of candidate pairs (true Jaccard) is JVM-side
  ``array_intersect``/``array_union`` on distinct-shingle arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------- exact ----------
def exact_dedup(df: DataFrame, text_col: str, id_col: str, extra_aggs=()) -> DataFrame:
    """One representative (min id) per exact text; keeps dup count.

    Groups by ``sha2(text, 256)`` — a 32-byte shuffle key — NOT the raw
    text column: at corpus scale the group-by key would otherwise carry
    the full document through the exchange (document-length× more
    shuffle bytes for the identical answer; collisions are cryptographic-
    negligible). ``extra_aggs`` lets callers carry group-constant
    attributes (e.g. ``min(length(text))``) without rejoining the text.
    Output: ``text_sha256, keep_id, n_dups`` + extras.
    """
    return df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha256")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
        *extra_aggs,
    )


# ---------- shingling (JVM-side) ----------
def shingle_array(col: Column | str, k: int = 5) -> Column:
    """Array of all k-char shingles of a string (empty if too short)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - (k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.substring(c, i, k))


def word_shingle_array(col: Column | str, k: int = 3) -> Column:
    """Array of all k-word shingles (space-joined) — entirely JVM-side.

    Word shingles are the standard unit for LLM-corpus near-dedup
    (k-word Jaccard): a ~300-char doc yields ~50 word shingles vs ~300
    char-5 shingles, so the explode+hash stage shrinks ~6x while the
    similarity signal on natural text stays equivalent."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    n = F.size(toks) - (k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))


def _shingles(col: Column | str, k: int, mode: str) -> Column:
    if mode == "char":
        return shingle_array(col, k)
    if mode == "word":
        return word_shingle_array(col, k)
    raise ValueError(f"unknown shingle mode: {mode}")


def minhash_signature(col: Column | str, num_hashes: int = 64, k: int = 5, seed: int = 42) -> Column:
    """MinHash signature: per permutation p, min over shingles of
    xxhash64(shingle, seed_p). Entirely JVM-side."""
    sh = F.array_distinct(shingle_array(col, k))
    parts = [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(seed * 7919 + p))))
        for p in range(num_hashes)
    ]
    return F.array(*parts)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    shingle_mode: str = "char",
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    Physical strategy (scale-critical): the naive form — a signature
    column with ``num_hashes`` array traversals each re-hashing the
    shingle *strings* — costs num_hashes × |shingles| string hashes
    per doc. Instead: explode distinct shingles, hash each string ONCE
    (xxhash64), then take ``num_hashes`` per-permutation minima as
    plain aggregates ``min(xxhash64(h, p))`` over the int64 — all
    map-side-combined (partial min) before the shuffle, so the
    exchange carries one row per doc, and whole-stage codegen covers
    the entire stage. ~20x faster than the array form at 500 docs and
    the gap widens with doc length.
    """
    mins = _minhash_mins(df, text_col, id_col, num_hashes, k, seed, shingle_mode)
    return _candidates_from_mins(mins, num_hashes, bands)


def _minhash_mins(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int, k: int, seed: int,
    mode: str = "char",
) -> DataFrame:
    """(__id, __m0..__m{n-1}) signature frame — hash each shingle once,
    then per-permutation minima as plain map-side-combined aggregates."""
    from datax_spark.functions.util import spread

    df = spread(df)  # narrow scans serialize the explode onto one core
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(_shingles(text_col, k, mode))).alias("__s"),
    )
    hashed = sh.select("__id", F.xxhash64("__s", F.lit(seed)).alias("__h"))
    return hashed.groupBy("__id").agg(
        *[F.min(F.xxhash64("__h", F.lit(p))).alias(f"__m{p}") for p in range(num_hashes)]
    )


def _candidates_from_mins(
    mins: DataFrame,
    num_hashes: int,
    bands: int,
    carry_sig: bool = False,
    dedupe: bool = True,
) -> DataFrame:
    """Band-bucket self-join over the signature frame. With
    ``carry_sig`` each side also carries its full signature array
    through the join (≈8·num_hashes bytes per banded row of extra
    shuffle) so downstream stages can estimate similarity without a
    second scan of the corpus — cheaper than re-deriving the
    signatures, which would repeat the full shingle+hash pass."""
    from pyspark import StorageLevel

    # The self-join references ``mins`` twice, and without
    # materialization Spark plans TWO complete scan→explode→hash→
    # min-agg subtrees (exchange reuse cannot fire once one side
    # becomes a BroadcastExchange) — two full shingle+hash passes over
    # the corpus where one suffices. Persist the signature frame: one
    # narrow ~8·num_hashes-byte row per doc, so at corpus scale it is
    # O(docs) not O(text); MEMORY_AND_DISK spills rather than
    # recomputes, and Spark's ContextCleaner reclaims the cache once
    # the result frame is garbage-collected. The corpus is shingled
    # and hashed exactly ONCE (asserted in tools/dump_plans.py: a
    # single documents scan in the candidates plan).
    mins = mins.persist(StorageLevel.MEMORY_AND_DISK)
    rows = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"__m{b * rows + r}") for r in range(rows)], F.lit(b)
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    sig_cols = (
        [F.array(*[F.col(f"__m{p}") for p in range(num_hashes)]).alias("sig")]
        if carry_sig
        else []
    )
    banded = mins.select("__id", F.explode(band_structs).alias("e"), *sig_cols).select(
        "__id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"),
        *(["sig"] if carry_sig else []),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pair_cols = [F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")]
    if carry_sig:
        pair_cols += [F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")]
    out = (
        a.join(b, on=["band", "bh"], how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(*pair_cols)
    )
    return out.distinct() if dedupe else out


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, k: int = 5) -> DataFrame:
    """Exact k-gram Jaccard for candidate pairs (verification stage).

    ``df_pairs`` has (id_a, id_b); ``docs`` maps id -> text. The doc
    side is joined twice; Spark broadcast-joins it automatically when
    small, else sort-merge on ids.
    """
    from datax_spark.functions.util import spread

    sh = spread(docs).select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingle_array(text_col, k)).alias("__sh"),
    )
    j = (
        df_pairs.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.when(union == 0, F.lit(0.0)).otherwise(inter / union).alias("jaccard"),
    )


def _jaccard_hashed(
    df_pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, k: int, seed: int,
    mode: str = "char",
) -> DataFrame:
    """Exact Jaccard over xxhash64'd shingle sets: identical to the
    string form up to hash collisions (~|sh|^2/2^64 per doc, negligible)
    but array_intersect/array_union run over int64 instead of strings —
    markedly cheaper at verification scale."""
    from datax_spark.functions.util import spread

    sh = spread(docs).select(
        F.col(id_col).alias("__id"),
        F.array_distinct(
            F.transform(_shingles(text_col, k, mode), lambda s: F.xxhash64(s, F.lit(seed)))
        ).alias("__sh"),
    )
    j = (
        df_pairs.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.when(union == 0, F.lit(0.0)).otherwise(inter / union).alias("jaccard"),
    )


def ngram_jaccard_exact_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str | None = None,
    threshold: float = 0.2,
    k: int = 5,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact all-pairs k-gram Jaccard — the O(n^2) BASELINE (per group
    when ``group_col`` is given, global otherwise). Exists as the
    oracle/recall reference for ``minhash_dedup``; the ``max_rows``
    guardrail refuses inputs where the candidate join would explode —
    route through ``minhash_lsh_candidates`` at scale, or pass
    ``max_rows=None`` to force all-pairs."""
    if max_rows is not None:
        n = docs.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"ngram_jaccard_exact_pairs is O(n^2) and input exceeds "
                f"max_rows={max_rows}; use minhash_dedup (LSH-bucketed "
                f"scale path) or pass max_rows=None explicitly"
            )
    ids = docs.select(F.col(id_col), *( [F.col(group_col)] if group_col else [] ))
    cond = [group_col] if group_col else []
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), on=cond) if cond else
        ids.alias("a").crossJoin(ids.alias("b"))
    )
    pairs = pairs.filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    j = ngram_jaccard(pairs, docs, text_col, id_col, k=k)
    return j.filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    prefilter_margin: float | None = None,
    shingle_mode: str = "char",
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → band → bucket join →
    signature prefilter → exact Jaccard verify. Returns confirmed
    pairs with exact jaccard >= threshold.

    ``prefilter_margin`` (OPT-IN, default None = every banded
    candidate is exact-verified): between banding and the exact
    verify, the signature-agreement fraction (an unbiased Jaccard
    estimator the 64 minhashes already provide) drops candidates
    estimated below ``threshold - margin``. Banding at the default
    16x4 config is deliberately permissive (high recall down to
    s~0.5), so low-sim bucket collisions dominate the candidate set;
    the estimator costs 64 integer compares per pair against the
    exact verify's set intersection over ~|text| hashed shingles —
    measured 2x on the 5k-doc corpus and the gap widens with
    candidate volume. The trade: a true pair at s=threshold is
    missed with probability P(Binomial(64, s) < 64*(s-margin)) —
    ~0.8% at exactly-threshold with margin 0.15, ~0 for
    comfortably-above-threshold pairs — which is why it is opt-in
    rather than a silent default recall change."""
    mins = _minhash_mins(df, text_col, id_col, num_hashes, k, seed, shingle_mode)
    if prefilter_margin is None:
        cands = _candidates_from_mins(mins, num_hashes, bands)
    else:
        # dedupe AFTER the estimator filter: the filter runs on the raw
        # (possibly multi-band-duplicated) pairs — 64 int compares per
        # row — so the distinct hashes only the tiny surviving id pairs
        # instead of signature-laden wide rows
        cands = _candidates_from_mins(
            mins, num_hashes, bands, carry_sig=True, dedupe=False
        )
        est = F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
        ) / F.lit(float(num_hashes))
        cands = (
            cands.filter(est >= threshold - prefilter_margin)
            .select("id_a", "id_b")
            .distinct()
        )
    return _jaccard_hashed(cands, df, text_col, id_col, k, seed, shingle_mode).filter(
        F.col("jaccard") >= threshold
    )


# ---------- SimHash (Arrow UDF) ----------
@pandas_udf(T.LongType())
def simhash64(s: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-batched).

    Per batch: token FNV hashes are memoized (natural-language token
    distributions repeat heavily, so most tokens hash once per batch)
    and the per-bit majority vote is a single numpy broadcast over the
    token-hash array — no per-bit Python loop."""
    import numpy as np

    cache: dict[str, int] = {}

    def fnv64(tok: str) -> int:
        h = cache.get(tok)
        if h is None:
            # deterministic across processes (builtin hash() is seeded)
            h = 1469598103934665603
            for ch in tok.encode("utf-8"):
                h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            cache[tok] = h
        return h

    shifts = np.arange(64, dtype=np.uint64)

    def sh(text: str | None) -> int | None:
        if text is None:
            return None
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter((fnv64(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        v = int((((votes > 0).astype(np.uint64)) << shifts).sum(dtype=np.uint64))
        return v - (1 << 64) if v >= (1 << 63) else v

    return s.map(sh).astype("Int64")
