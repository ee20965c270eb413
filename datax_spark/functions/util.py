"""Small shared helpers for the functions package."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition NARROW inputs before compute-heavy
    per-row work (shingle explosion, Arrow UDF batches, long
    expression chains).

    A small parquet table often arrives as a single scan partition
    (one row group -> one task), which serializes everything
    downstream onto one core — measured 6x on the 5k-doc corpus
    (shingle explode 2.9s -> 0.5s at local[32]). At real scale inputs
    already have >= parallelism partitions and this is a no-op; the
    repartition only fires when the input is narrower than the
    cluster, so the extra exchange is bounded by the (small) input.
    """
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
