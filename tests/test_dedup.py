"""LWW dedup: plain vs salted equivalence, delete/resurrect ordering."""

import pyspark.sql.functions as F

from datax_spark.operators import lww_dedup


def _events(spark):
    rows = [
        # key A: update at lsn 3 wins over lsn 1, despite file order
        ("r1", "a", "U", "c03", 3, "new"),
        ("r1", "a", "U", "c01", 1, "old"),
        # key B: delete at lsn 5 wins (later re-insert in next batch)
        ("r1", "b", "I", "c02", 2, "b0"),
        ("r1", "b", "D", "c05", 5, None),
        # key C: delete then re-insert at higher lsn => resurrect
        ("r2", "c", "D", "c04", 4, None),
        ("r2", "c", "I", "c06", 6, "c-back"),
    ]
    return spark.createDataFrame(rows, "repo string, path string, op string, commit string, lsn long, content string")


def test_lww_plain(spark):
    out = lww_dedup(_events(spark), ["repo", "path"], ["commit", "lsn"])
    got = {(r.repo, r.path): (r.op, r.lsn, r.content) for r in out.collect()}
    assert got[("r1", "a")] == ("U", 3, "new")
    assert got[("r1", "b")] == ("D", 5, None)  # delete wins within batch
    assert got[("r2", "c")] == ("I", 6, "c-back")  # resurrect


def test_salted_equals_plain(spark):
    df = _events(spark)
    plain = lww_dedup(df, ["repo", "path"], ["commit", "lsn"]).orderBy("repo", "path")
    salted = lww_dedup(df, ["repo", "path"], ["commit", "lsn"], salt_buckets=4).orderBy(
        "repo", "path"
    )
    assert plain.collect() == salted.collect()


def test_salted_equals_plain_large(spark):
    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 7).cast("string").alias("repo"),
            (F.col("id") % 97).cast("string").alias("path"),
            F.lit("U").alias("op"),
            F.lpad(F.hex(F.col("id")), 12, "0").alias("commit"),
            F.col("id").alias("lsn"),
            F.sha2(F.col("id").cast("string"), 256).alias("content"),
        )
    )
    plain = lww_dedup(df, ["repo", "path"], ["commit", "lsn"])
    salted = lww_dedup(df, ["repo", "path"], ["commit", "lsn"], salt_buckets=16)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    assert salted.count() == 679  # one row per distinct (id%7, id%97) key


def test_quadratic_baseline_guardrails(spark):
    """The exact all-pairs baselines refuse inputs whose n^2 candidate
    join would explode; max_rows=None forces them through."""
    import pytest

    from datax_spark.functions.dedup_text import ngram_jaccard_exact_pairs
    from datax_spark.functions.similarity import embedding_near_dup_pairs

    docs = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id").cast("string")).alias("text"),
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        ngram_jaccard_exact_pairs(docs, "text", "doc_id", max_rows=5)
    assert ngram_jaccard_exact_pairs(
        docs, "text", "doc_id", threshold=0.0, max_rows=None
    ).count() == 45

    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * 0 + 1.0).cast("float")] * 4).alias("embedding"),
    )
    with pytest.raises(ValueError, match="O\\(n\\^2\\)"):
        embedding_near_dup_pairs(emb, "embedding", "vec_id", max_rows=5)
    assert embedding_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.5, max_rows=None
    ).count() == 45


def test_salted_stats_equal_unsalted(spark):
    """The salted two-stage lww_dedup_stats composes EXACT stats: same
    winners and identical per-key counters as the one-stage form."""
    import pandas as pd

    from datax_spark.operators.dedup import lww_dedup_stats

    rows = []
    for i in range(5_000):
        rows.append((
            f"r{i % 7}", f"p{i % 113}", f"c{i % 41:02d}", i,
            "D" if i % 17 == 0 else "U", f"body-{i % 29}" * (i % 5),
        ))
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lsn long, op string, content string"
    )
    kw = dict(
        keys=["repo", "path"], order_cols=["commit", "lsn"],
        op_col="op", delete_op="D", lsn_col="lsn", content_col="content",
    )
    plain = lww_dedup_stats(df, **kw).toPandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    salted = lww_dedup_stats(df, **kw, salt_buckets=8).toPandas().sort_values(
        ["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        plain, salted[plain.columns], check_dtype=False
    )
