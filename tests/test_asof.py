"""As-of join operator (operators/asof.py): union+window formulation
must match pandas merge_asof / a per-row reference scan — backward and
forward, inclusive matches, tolerance, multi-column lexicographic ts,
and SCD2 interval containment (closed intervals reject)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.operators.asof import asof_enrich_scd2, asof_join

LEFT = [
    # (k, ts, lv)
    ("a", 10, "l1"),
    ("a", 20, "l2"),
    ("a", 25, "l3"),
    ("b", 5, "l4"),
    ("b", 50, "l5"),
    ("c", 7, "l6"),   # key with no right rows at all
]
RIGHT = [
    # (k, ts, rv)
    ("a", 10, "r1"),  # equal-ts: inclusive match for l1
    ("a", 22, "r2"),
    ("b", 30, "r3"),
    ("b", 49, "r4"),
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "k string, ts long, lv string")
    r = spark.createDataFrame(RIGHT, "k string, ts long, rv string")
    return l, r


def _pandas_asof(direction, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]).sort_values("ts")
    m = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        tolerance=tolerance, suffixes=("", "_r"),
    )
    return m.sort_values(["k", "ts"]).reset_index(drop=True)[["k", "ts", "lv", "rv"]]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    l, r = _dfs(spark)
    got = (
        asof_join(l, r, on=["k"], left_ts="ts", direction=direction)
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    want = _pandas_asof(direction)
    pd.testing.assert_frame_equal(got[["k", "ts", "lv", "rv"]], want)


def test_asof_inner_drops_misses(spark):
    l, r = _dfs(spark)
    got = asof_join(l, r, on=["k"], left_ts="ts", how="inner").collect()
    assert all(x["rv"] is not None for x in got)
    want = _pandas_asof("backward")
    assert len(got) == int(want["rv"].notna().sum())


def test_asof_tolerance(spark):
    l, r = _dfs(spark)
    got = {
        (x["k"], x["ts"]): x["rv"]
        for x in asof_join(
            l, r, on=["k"], left_ts="ts", tolerance=F.lit(3)
        ).collect()
    }
    want = _pandas_asof("backward", tolerance=3)
    wmap = {
        (row.k, row.ts): (None if pd.isna(row.rv) else row.rv)
        for row in want.itertuples()
    }
    assert got == wmap
    # l2 (ts=20) had match r1@10 without tolerance; gap 10 > 3 -> miss
    assert got[("a", 20)] is None


def test_asof_multicol_lexicographic_ts(spark):
    """(commit, lsn) tuples: ties on the first column resolve on the
    second, exactly the engine's LWW order."""
    l = spark.createDataFrame(
        [("a", 2, 5, "l1"), ("a", 2, 1, "l2")],
        "k string, commit long, lsn long, lv string",
    )
    r = spark.createDataFrame(
        [("a", 1, 9, "rA"), ("a", 2, 3, "rB"), ("a", 3, 0, "rC")],
        "k string, commit long, lsn long, rv string",
    )
    got = {
        x["lv"]: x["rv"]
        for x in asof_join(
            l, r, on=["k"], left_ts=["commit", "lsn"]
        ).collect()
    }
    # l1 @(2,5): rB @(2,3) <= (2,5) and is latest; l2 @(2,1): rA @(1,9)
    assert got == {"l1": "rB", "l2": "rA"}


def test_asof_validation_and_projection(spark):
    l, r = _dfs(spark)
    with pytest.raises(ValueError, match="collision"):
        asof_join(l, r.withColumnRenamed("rv", "lv"), on=["k"], left_ts="ts")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            l, r, on=["k"], left_ts=["ts", "ts"], tolerance=F.lit(1)
        )
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, on=["k"], left_ts="ts", direction="sideways")
    with pytest.raises(ValueError, match="nearest"):
        asof_join(l, r, on=["k"], left_ts=["ts", "ts"], direction="nearest")
    got = asof_join(
        l, r, on=["k"], left_ts="ts", right_prefix="m_",
        right_cols=["rv", "ts"], right_ts="ts",
    )
    assert set(got.columns) == {"k", "ts", "lv", "m_rv", "m_ts"}
    row = {x["lv"]: x for x in got.collect()}
    assert row["l2"]["m_ts"] == 10  # the match's own ts carried out


def test_asof_plan_is_window_not_range_join(spark):
    """The physical plan must be exchange+sort+window — never a
    BroadcastNestedLoopJoin (the naive non-equi range-join shape)."""
    l, r = _dfs(spark)
    plan = asof_join(l, r, on=["k"], left_ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


HIST = [
    # (k, vf, vt, attr): [valid_from, valid_to) versions; None = open
    ("a", 10, 20, "v1"),
    ("a", 20, 30, "v2"),   # closed at 30, then a GAP (deleted)
    ("a", 40, None, "v3"),  # re-created, open
    ("b", 5, 15, "w1"),     # closed, never re-created
]
FACTS = [
    ("a", 9), ("a", 10), ("a", 25), ("a", 30), ("a", 35), ("a", 99),
    ("b", 10), ("b", 15), ("b", 20), ("c", 1),
]


def _scd2_reference(k, ts):
    for (hk, vf, vt, attr) in HIST:
        if hk == k and vf <= ts and (vt is None or ts < vt):
            return attr
    return None


@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_enrich_scd2_interval_containment(spark, how):
    fact = spark.createDataFrame(FACTS, "k string, ts long")
    hist = spark.createDataFrame(
        HIST, "k string, vf long, vt long, attr string"
    )
    got = asof_enrich_scd2(
        fact, hist, on=["k"], fact_ts="ts",
        valid_from="vf", valid_to="vt", right_prefix="d_", how=how,
    ).collect()
    want = {(k, ts): _scd2_reference(k, ts) for (k, ts) in FACTS}
    if how == "left":
        assert len(got) == len(FACTS)
        for x in got:
            assert x["d_attr"] == want[(x["k"], x["ts"])], (x["k"], x["ts"])
    else:
        assert {(x["k"], x["ts"]) for x in got} == {
            kt for kt, v in want.items() if v is not None
        }
        for x in got:
            assert x["d_attr"] == want[(x["k"], x["ts"])]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_exclusive_matches_pandas(spark, direction):
    """inclusive=False == pandas allow_exact_matches=False: the
    equal-ts right row (a@10/r1@10) must be skipped."""
    l, r = _dfs(spark)
    got = (
        asof_join(l, r, on=["k"], left_ts="ts", direction=direction,
                  inclusive=False)
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    lp = pd.DataFrame(LEFT, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]).sort_values("ts")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction=direction,
                      allow_exact_matches=False, suffixes=("", "_r"))
        .sort_values(["k", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lv", "rv"]], want[["k", "ts", "lv", "rv"]]
    )


def test_asof_null_timestamps_never_match(spark):
    """Review finding: NULL-ts right rows must not match 'before
    everything' backward (and both directions must agree); NULL-ts
    left rows are always misses."""
    l = spark.createDataFrame(
        [("a", 5, "l5"), ("a", None, "lN")], "k string, ts long, lv string"
    )
    r = spark.createDataFrame(
        [("a", None, "rN"), ("a", 10, "r10")], "k string, ts long, rv string"
    )
    for direction in ("backward", "forward"):
        got = {
            x["lv"]: x["rv"]
            for x in asof_join(
                l, r, on=["k"], left_ts="ts", direction=direction
            ).collect()
        }
        want_l5 = None if direction == "backward" else "r10"
        assert got == {"l5": want_l5, "lN": None}, (direction, got)


def test_asof_enrich_scd2_inner_with_null_attr(spark):
    """Review finding: inner matchedness comes from the join flag, not
    payload nullability — a matched version with a NULL attribute
    stays; an unmatched fact drops even with right_cols=[]."""
    fact = spark.createDataFrame([("a", 15), ("z", 1)], "k string, ts long")
    hist = spark.createDataFrame(
        [("a", 10, None, None)],
        T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("vf", T.LongType()),
            T.StructField("vt", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]),
    )
    got = asof_enrich_scd2(
        fact, hist, on=["k"], fact_ts="ts", valid_from="vf", valid_to="vt",
        right_prefix="d_", how="inner",
    ).collect()
    assert [(x["k"], x["ts"], x["d_attr"]) for x in got] == [("a", 15, None)]
    got2 = asof_enrich_scd2(
        fact, hist, on=["k"], fact_ts="ts", valid_from="vf", valid_to="vt",
        right_cols=[], how="inner",
    ).collect()
    assert [x["k"] for x in got2] == ["a"]


@pytest.mark.parametrize("inclusive,tol", [(True, None), (False, None), (True, 7)])
def test_asof_nearest_matches_pandas(spark, inclusive, tol):
    """direction='nearest' == pandas merge_asof nearest (ties to the
    backward side), incl. allow_exact_matches=False and tolerance."""
    l, r = _dfs(spark)
    got = (
        asof_join(
            l, r, on=["k"], left_ts="ts", direction="nearest",
            inclusive=inclusive,
            tolerance=None if tol is None else F.lit(tol),
        )
        .toPandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    lp = pd.DataFrame(LEFT, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]).sort_values("ts")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest",
                      allow_exact_matches=inclusive, tolerance=tol,
                      suffixes=("", "_r"))
        .sort_values(["k", "ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lv", "rv"]], want[["k", "ts", "lv", "rv"]]
    )


def test_asof_ts_type_mismatch_raises(spark):
    """r3 ADVICE: incomparable ts types (int vs string) must fail
    upfront — unionByName + window sort would silently coerce into
    wrong matches. Safe widenings (int vs bigint) stay allowed."""
    left = spark.createDataFrame([("a", 5)], "k string, ts int")
    right_bad = spark.createDataFrame(
        [("a", "3", 9)], "k string, ts string, v int")
    with pytest.raises(ValueError, match="not comparable"):
        asof_join(left, right_bad, on=["k"], left_ts="ts")
    right_ok = spark.createDataFrame(
        [("a", 3, 9)], "k string, ts bigint, v int")
    out = asof_join(left, right_ok, on=["k"], left_ts="ts").collect()
    assert len(out) == 1 and out[0]["v"] == 9
