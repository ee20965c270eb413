"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force baseline, entirely JVM-side
  (``zip_with`` dot product + ``aggregate`` fold): correct at any
  scale, O(n·d) per query, one pass, no Python.
* ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH.
  Signatures come from a deterministic numpy matrix applied in one
  Arrow pandas UDF (matrix-vector products batch-vectorized); search
  touches only the query's bucket (optionally multi-probe), so cost
  drops from O(n) to O(n / 2^bits) rows scanned. At 100 TB you would
  persist the bucketed table partitioned by signature and get
  partition pruning on the probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim(vec_col: Column | str, query: list[float]) -> Column:
    """Cosine similarity of an array<float> column vs a literal query."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = F.transform(v, lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = _dot(v, q)
    nv = F.sqrt(_dot(v, v))
    nq = float(np.sqrt(np.dot(query, query)))
    return F.when(nv == 0, F.lit(0.0)).otherwise(dot / (nv * F.lit(nq)))


def cosine_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine similarity (deterministic tie-break
    on id). orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps only its local top-k, the driver merges k·p rows."""
    return (
        df.select(F.col(id_col), cosine_sim(vec_col, query).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


def _planes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def hyperplane_signature_udf(dim: int, bits: int = 12, seed: int = 42):
    """Arrow pandas UDF: array<float> -> int LSH bucket signature."""
    planes = _planes(dim, bits, seed)

    @pandas_udf(T.IntegerType())
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.map(lambda x: np.asarray(x, dtype=np.float64)).values)
        bitsarr = (mat @ planes.T) > 0  # (n, bits) — one BLAS call per Arrow batch
        weights = 1 << np.arange(bits)
        return pd.Series((bitsarr @ weights).astype(np.int32))

    return sig


def cosine_pair(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns (JVM-side)."""
    av = F.transform(a, lambda x: x.cast("double"))
    bv = F.transform(b, lambda x: x.cast("double"))
    dot = _dot(av, bv)
    na, nb = F.sqrt(_dot(av, av)), F.sqrt(_dot(bv, bv))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine >= threshold) — the brute-force O(n^2) BASELINE, entirely
    JVM-side. Deliberately quadratic: it exists as the oracle/recall
    reference for ``embedding_near_dup_lsh`` (the scale path). The
    ``max_rows`` guardrail refuses inputs where n^2 would silently
    explode (100k rows is already 5e9 pairs); pass ``max_rows=None``
    only when you truly mean all-pairs."""
    if max_rows is not None:
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs is O(n^2) and input exceeds "
                f"max_rows={max_rows}; use embedding_near_dup_lsh (the "
                f"bucketed scale path) or pass max_rows=None explicitly"
            )
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = cosine_pair(F.col("__va"), F.col("__vb"))
    return pairs.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
    bits: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: random-hyperplane signature →
    bucket self-join (candidates share all `bits` signs; collision
    probability rises with cosine) → exact cosine verify. Candidate
    generation is O(sum bucket^2) instead of O(n^2); recall is tunable
    via `bits` (fewer bits → bigger buckets → higher recall, more
    verification work) or by multi-probing as in lsh_bucket_topk.

    Pass ``dim`` explicitly to keep the pipeline fully lazy; when
    omitted it is inferred with a single-row Spark job (Spark arrays
    carry no fixed size in the schema) — avoid that in hot paths."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig = hyperplane_signature_udf(dim=dim, bits=bits, seed=seed)
    s = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), sig(F.col(vec_col)).alias("__sig")
    )
    a = s.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__sig").alias("__sa"))
    b = s.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__sig").alias("__sb"))
    cand = a.join(b, (F.col("__sa") == F.col("__sb")) & (F.col("id_a") < F.col("id_b")))
    sim = cosine_pair(F.col("__va"), F.col("__vb"))
    return cand.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def _kmeans(sample: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Tiny deterministic k-means (numpy, driver-side) for IVF coarse
    centroids. Training on a bounded sample is the standard IVF recipe
    (and the analog of the reference's sample-based range estimation,
    ``SingleTableSplitUtil.java:298-393``)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


def centroid_assign_udf(centroids: np.ndarray):
    """Arrow pandas UDF: array<float> -> nearest-centroid id (one
    matrix product per batch)."""
    cent = centroids.astype(np.float64)
    cent_sq = (cent**2).sum(axis=1)

    @pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        mat = np.stack(v.map(lambda x: np.asarray(x, dtype=np.float64)).values)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d = -2.0 * (mat @ cent.T) + cent_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    sample_size: int = 1024,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: train coarse centroids on a deterministic sample
    (driver-side, bounded — split-planning-sized work), assign every
    vector to its nearest centroid (Arrow UDF, one BLAS call per
    batch), then brute-force cosine only inside the query's ``n_probe``
    nearest clusters. At 100 TB you would persist the table partitioned
    by ``__cluster`` and get partition pruning on the probe, scanning
    ~n_probe/n_clusters of the data.

    ``centroids`` supplies a pre-trained coarse quantizer (the
    standard IVF deployment shape — the quantizer is trained offline
    once, not per query); when omitted, a bounded-sample k-means
    trains one inline."""
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        sample_rows = (
            df.select(vec_col).orderBy(id_col).limit(sample_size).collect()
        )
        sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
        cent = _kmeans(sample, n_clusters, seed)
    q = np.asarray(query, dtype=np.float64)
    qd = ((cent - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in qd.argsort()[:n_probe]]

    assign = centroid_assign_udf(cent)
    clustered = df.withColumn("__cluster", assign(F.col(vec_col)))
    cand = clustered.filter(F.col("__cluster").isin(probe))
    return cosine_topk(cand, vec_col, id_col, query, k)


def lsh_bucket_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    bits: int = 12,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """ANN top-k: scan only the query's hyperplane bucket (plus
    ``multiprobe`` single-bit-flip neighbor buckets for recall)."""
    dim = len(query)
    planes = _planes(dim, bits, seed)
    qsig = int(((np.asarray(query) @ planes.T) > 0) @ (1 << np.arange(bits)))
    probe = [qsig] + [qsig ^ (1 << b) for b in range(min(multiprobe, bits))]
    sig = hyperplane_signature_udf(dim, bits, seed)
    bucketed = df.withColumn("__sig", sig(F.col(vec_col)))
    cand = bucketed.filter(F.col("__sig").isin(probe))
    return cosine_topk(cand, vec_col, id_col, query, k)
