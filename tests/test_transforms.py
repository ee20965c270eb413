"""dx_* transformer semantics vs the reference's FilterTransformer /
SubstrTransformer / PadTransformer / ReplaceTransformer null rules."""

import pyspark.sql.functions as F
import pytest

from datax_spark.functions import TransformChain, dx_filter, dx_json, dx_pad, dx_replace, dx_substr


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "hello world", 10.0),
        (2, None, 3.0),
        (3, "abc", None),
        (4, "null", 7.5),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def _vals(df, col="s"):
    return {r["id"]: r[col] for r in df.collect()}


def test_substr(spark, df):
    out = _vals(df.withColumn("s", dx_substr("s", 1, 3)))
    assert out[1] == "ell"
    assert out[2] is None  # null passes through (SubstrTransformer)
    assert out[3] == "bc"  # clamps to end


def test_pad(spark, df):
    left = _vals(df.withColumn("s", dx_pad("s", "l", 5, "xy")))
    assert left[1] == "hello"  # truncates when longer
    assert left[2] == "xyxyx"  # null treated as ''
    assert left[3] == "xyabc"
    with pytest.raises(ValueError):
        dx_pad("s", "m", 5, "x")


def test_replace(spark, df):
    out = _vals(df.withColumn("s", dx_replace("s", 1, 3, "XY")))
    assert out[1] == "hXYo world"
    assert out[2] is None  # null passes through
    assert out[3] == "aXY"


def test_filter_comparisons_null_rules(spark, df):
    # numeric >: null never matches => row 3 kept; 10.0 > 5 dropped
    assert set(_vals(dx_filter(df, "v", ">", "5"))) == {2, 3}
    # = "null" matches actual NULL (FilterTransformer doEqual)
    assert set(_vals(dx_filter(df, "s", "=", "null"))) == {1, 3}  # drops 2 (NULL) and 4 ("null")
    # != : drops rows where s != value; NULL matches (drops) unless value=="null"
    assert set(_vals(dx_filter(df, "s", "!=", "abc"))) == {3}
    # value=="null": NULL kept, the literal string "null" kept (equal), others dropped
    assert set(_vals(dx_filter(df, "s", "!=", "null"))) == {2, 4}


def test_filter_like_anchored(spark, df):
    # Java String.matches is full-match: "hello" does NOT match "hello world"…
    kept = dx_filter(df, "s", "like", "hello")
    assert set(_vals(kept)) == {1, 2, 3, 4}  # no full match => nothing dropped
    kept2 = dx_filter(df, "s", "like", "hello.*")
    assert set(_vals(kept2)) == {2, 3, 4}  # row 1 dropped; NULL kept
    # not like: drops non-matching AND NULL rows (doNotLike)
    kept3 = dx_filter(df, "s", "not like", "hello.*")
    assert set(_vals(kept3)) == {1}


def test_json_and_chain(spark):
    df = spark.createDataFrame(
        [(1, '{"a": {"b": 7}, "name": "x"}'), (2, None)], "id long, j string"
    )
    out = _vals(df.withColumn("b", dx_json("j", "a.b")), col="b")
    assert out[1] == "7" and out[2] is None

    chain = TransformChain(
        [
            {"name": "dx_json", "column": "j", "paras": ["name"], "as": "name"},
            {"name": "dx_filter", "column": "id", "paras": [">", "1"]},
        ]
    )
    res = chain.apply(df).collect()
    assert len(res) == 1 and res[0]["name"] == "x"


def test_chain_stays_codegen(spark, df):
    """The whole dx_* chain must collapse into the scan's projection —
    no Python round-trip (SURVEY.md §2.4: Catalyst folds the chain)."""
    chain = TransformChain(
        [
            {"name": "dx_substr", "column": "s", "paras": [0, 4]},
            {"name": "dx_pad", "column": "s", "paras": ["r", 8, "_"]},
            {"name": "dx_filter", "column": "id", "paras": ["<", "100"]},
        ]
    )
    plan = chain.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dx_encryption_roundtrip_and_determinism(spark):
    from datax_spark.functions.transforms import dx_encryption
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("alpha",), ("alpha",), ("beta",), (None,)], ["v"]
    )
    key = "0123456789abcdef"
    enc = df.select("v", dx_encryption("v", key, "encrypt").alias("ct"))
    # deterministic (ECB): identical plaintext -> identical ciphertext
    cts = [r["ct"] for r in enc.filter(F.col("v") == "alpha").collect()]
    assert cts[0] == cts[1]
    rt = enc.select("v", dx_encryption("ct", key, "decrypt").alias("pt"))
    for r in rt.collect():
        assert r["pt"] == r["v"]
