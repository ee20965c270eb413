"""Incremental join-view maintenance (lake/joinview.py): after every
commit on either source + refresh, the view must equal a from-scratch
equi-join of the two tables' synced snapshots — including fact
fk-changes, fact deletes, dim updates/inserts/deletes (inner retracts,
left null-fills), NULL fks, and both sides changing in one window."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake import LakeTable, merge_into
from datax_spark.lake.joinview import JoinView, JoinViewSpec

FACT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)

DIM_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("rank", T.LongType()),
    ]
)


def _fact(spark, root):
    return LakeTable.create(
        spark, root, FACT_SCHEMA, key_cols=["repo", "path"], num_buckets=4
    )


def _dim(spark, root):
    return LakeTable.create(
        spark, root, DIM_SCHEMA, key_cols=["lang"], num_buckets=2
    )


def _apply(table, spark, schema, rows, deletes=(), del_width=1):
    data = [(*r, "U") for r in rows] + [
        (
            *(d if isinstance(d, tuple) else (d,)),
            *([None] * (len(schema.fields) - del_width)),
            "D",
        )
        for d in deletes
    ]
    df = spark.createDataFrame(
        data, T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    )
    merge_into(table, df).commit()


def _expected(fact, dim, how, prefix="d_"):
    d = dim.read().select(
        F.col("lang").alias("__dl"),
        F.col("family").alias(f"{prefix}family"),
        F.col("rank").alias(f"{prefix}rank"),
    )
    return (
        fact.read()
        .join(d, on=F.col("lang") == F.col("__dl"), how=how)
        .select("repo", "path", "lang", "size", f"{prefix}family", f"{prefix}rank")
    )


def _assert_matches(view, fact, dim, how):
    cols = ["repo", "path", "lang", "size", "d_family", "d_rank"]
    got = view.read().select(*cols).toPandas()
    want = _expected(fact, dim, how).toPandas()
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)
    want = want.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


def _mkview(spark, root, fact, dim, how):
    return JoinView.create(
        spark,
        str(root),
        fact,
        dim,
        JoinViewSpec(on=(("lang", "lang"),), how=how, right_prefix="d_"),
        num_buckets=4,
    )


FACTS0 = [
    ("r1", "a.py", "py", 10),
    ("r1", "b.rs", "rs", 20),
    ("r2", "c.py", "py", 30),
    ("r2", "d.go", "go", 40),  # go missing from dim initially
]
DIMS0 = [("py", "script", 1), ("rs", "compiled", 2)]


@pytest.mark.parametrize("how", ["inner", "left"])
def test_joinview_tracks_both_sources_through_churn(spark, tmp_path, how):
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    view = _mkview(spark, tmp_path / "view", fact, dim, how)

    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    r = view.refresh(fact, dim)
    assert not r.skipped and r.rows_upserted > 0
    _assert_matches(view, fact, dim, how)

    # fact churn: update (size), fk-change (py -> rs), delete, insert
    _apply(
        fact,
        spark,
        FACT_SCHEMA,
        [("r1", "a.py", "py", 11), ("r2", "c.py", "rs", 31), ("r3", "e.py", "py", 50)],
        deletes=[("r1", "b.rs")],
        del_width=2,
    )
    view.refresh(fact, dim)
    _assert_matches(view, fact, dim, how)

    # dim churn: update a referenced key, insert the missing one
    _apply(dim, spark, DIM_SCHEMA, [("py", "scripting", 1), ("go", "compiled", 3)])
    r = view.refresh(fact, dim)
    assert not r.skipped
    _assert_matches(view, fact, dim, how)

    # dim delete: inner retracts its fact rows, left nulls them
    _apply(dim, spark, DIM_SCHEMA, [], deletes=["rs"])
    r = view.refresh(fact, dim)
    _assert_matches(view, fact, dim, how)
    if how == "inner":
        assert r.rows_deleted > 0

    # both sides change in one refresh window
    _apply(fact, spark, FACT_SCHEMA, [("r3", "f.go", "go", 60)], del_width=2)
    _apply(dim, spark, DIM_SCHEMA, [("go", "native", 4)])
    view.refresh(fact, dim)
    _assert_matches(view, fact, dim, how)

    # idempotent: nothing new
    assert view.refresh(fact, dim).skipped


@pytest.mark.parametrize("how", ["inner", "left"])
def test_joinview_null_fk(spark, tmp_path, how):
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    view = _mkview(spark, tmp_path / "view", fact, dim, how)
    _apply(
        fact,
        spark,
        FACT_SCHEMA,
        [("r1", "a.py", "py", 10), ("r1", "x", None, 99)],
        del_width=2,
    )
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    view.refresh(fact, dim)
    _assert_matches(view, fact, dim, how)
    rows = {r["path"]: r for r in view.read().collect()}
    if how == "inner":
        assert "x" not in rows
    else:
        assert rows["x"]["d_family"] is None


def test_joinview_stepped_equals_jump(spark, tmp_path):
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    v_step = _mkview(spark, tmp_path / "vs", fact, dim, "inner")
    v_jump = _mkview(spark, tmp_path / "vj", fact, dim, "inner")
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    _apply(fact, spark, FACT_SCHEMA, [("r1", "a.py", "rs", 12)], del_width=2)
    _apply(dim, spark, DIM_SCHEMA, [("go", "compiled", 3)], deletes=["py"])
    # step through every (left, right) version pair on one view
    for lv in fact.versions():
        v_step.refresh(fact, dim, left_to=lv, right_to=min(lv, dim.current_version()))
    v_step.refresh(fact, dim)
    v_jump.refresh(fact, dim)
    a = v_step.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = v_jump.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    _assert_matches(v_step, fact, dim, "inner")


def test_joinview_marker_only_window(spark, tmp_path):
    """A source commit with zero net key changes (identical upsert)
    advances the watermark pair without a data commit."""
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    view = _mkview(spark, tmp_path / "view", fact, dim, "inner")
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    view.refresh(fact, dim)
    _apply(fact, spark, FACT_SCHEMA, [FACTS0[0]], del_width=2)  # no-op image
    r = view.refresh(fact, dim)
    assert not r.skipped and r.rows_upserted == 0 and r.rows_deleted == 0
    assert view.synced_versions() == (
        fact.current_version(),
        dim.current_version(),
    )
    _assert_matches(view, fact, dim, "inner")


def test_joinview_refresh_across_rollback_and_rebuild(spark, tmp_path):
    """rollback() commits a NEW snapshot, so the change feed diffs
    across it and refresh converges without special-casing; rebuild()
    converges from any view state."""
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    view = _mkview(spark, tmp_path / "view", fact, dim, "inner")
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    view.refresh(fact, dim)
    _apply(fact, spark, FACT_SCHEMA, [("r9", "z.py", "py", 1)], del_width=2)
    view.refresh(fact, dim)
    fact.rollback(fact.current_version() - 1)  # retracts r9/z.py
    r = view.refresh(fact, dim)
    assert r.rows_deleted == 1
    _assert_matches(view, fact, dim, "inner")
    view.rebuild(fact, dim)
    _assert_matches(view, fact, dim, "inner")


def test_joinview_projection_and_validation(spark, tmp_path):
    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    # n:1 violated: join on a non-key dim column
    with pytest.raises(ValueError, match="n:1"):
        JoinView.create(
            spark, str(tmp_path / "v1"), fact, dim,
            JoinViewSpec(on=(("lang", "family"),)),
        )
    # collision without prefix
    fact2 = LakeTable.create(
        spark,
        str(tmp_path / "fact2"),
        T.StructType(FACT_SCHEMA.fields + [T.StructField("rank", T.LongType())]),
        key_cols=["repo", "path"],
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="collision"):
        JoinView.create(
            spark, str(tmp_path / "v2"), fact2, dim,
            JoinViewSpec(on=(("lang", "lang"),)),
        )
    # join column listed in right_cols
    with pytest.raises(ValueError, match="join column"):
        JoinView.create(
            spark, str(tmp_path / "v3"), fact, dim,
            JoinViewSpec(on=(("lang", "lang"),), right_cols=("lang", "rank")),
        )
    # type mismatch
    with pytest.raises(ValueError, match="types differ"):
        JoinView.create(
            spark, str(tmp_path / "v4"), fact, dim,
            JoinViewSpec(on=(("size", "lang"),)),
        )
    # explicit projections: fk auto-included, prefix applied
    v = JoinView.create(
        spark, str(tmp_path / "v5"), fact, dim,
        JoinViewSpec(
            on=(("lang", "lang"),),
            left_cols=("size",),
            right_cols=("family",),
            right_prefix="dim_",
        ),
    )
    got = [f.name for f in v.table.manifest().schema.fields]
    assert got == ["repo", "path", "lang", "size", "dim_family"]
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    v.refresh(fact, dim)
    rows = {
        (r["repo"], r["path"]): r["dim_family"] for r in v.read().collect()
    }
    assert rows[("r1", "a.py")] == "script"


def test_joinview_engine_attached_refresh_and_crash_heal(spark, tmp_path):
    """ReplayConfig.join_views: the engine advances a registered
    fact ⋈ dim view after every committed epoch (fact side) and to
    the dim's head on every refresh; a crash between an epoch commit
    and its refresh leaves the view behind, and the next run() heals
    it — and a dim-only change is picked up by a run() with nothing
    to apply (the heal refreshes both sides)."""
    from datax_spark.engine.replay import ReplayConfig, ReplayCrash, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.fixtures.changelog import LANGS

    ev = str(tmp_path / "events")
    write_events(
        spark,
        ChangelogSpec(n_events=9000, events_per_epoch=3000,
                      evolve_from_epoch=2, seed=5),
        ev,
    )
    roots = dict(
        events_root=ev, table_root=str(tmp_path / "t"),
        metrics_root=str(tmp_path / "m"),
    )
    ReplayEngine(spark, **roots, config=ReplayConfig(num_buckets=8)).run(
        through_epoch=0
    )
    fact = LakeTable.load(spark, roots["table_root"])
    dim = _dim(spark, str(tmp_path / "dim"))
    _apply(dim, spark, DIM_SCHEMA, [(x, f"fam_{x}", i) for i, x in enumerate(LANGS)])
    view = JoinView.create(
        spark, str(tmp_path / "view"), fact, dim,
        JoinViewSpec(on=(("lang", "lang"),), how="left", right_prefix="d_"),
        num_buckets=4,
    )

    def recompute():
        d = dim.read().select(
            F.col("lang").alias("__dl"),
            F.col("family").alias("d_family"),
            F.col("rank").alias("d_rank"),
        )
        cols = [f.name for f in view.table.manifest().schema.fields]
        return (
            fact.read()
            .join(d, on=F.col("lang") == F.col("__dl"), how="left")
            .select(*cols)
            .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
        )

    def got():
        return (
            view.read().toPandas()
            .sort_values(["repo", "path"]).reset_index(drop=True)
        )

    cfg = ReplayConfig(
        num_buckets=8, join_views=((str(tmp_path / "view"), str(tmp_path / "dim")),)
    )
    eng = ReplayEngine(spark, **roots, config=cfg)
    eng.run(through_epoch=1)
    assert view.synced_versions() == (
        fact.current_version(), dim.current_version()
    )
    pd.testing.assert_frame_equal(got(), recompute(), check_dtype=False)

    # crash AFTER the epoch-2 commit, BEFORE the view refresh
    with pytest.raises(ReplayCrash):
        eng.apply_epoch(2, failpoints=["after_commit"])
    assert view.synced_versions()[0] < fact.current_version()
    ReplayEngine(spark, **roots, config=cfg).run()
    assert view.synced_versions()[0] == fact.current_version()
    pd.testing.assert_frame_equal(got(), recompute(), check_dtype=False)

    # dim-only change: a run() with nothing left to apply still heals
    _apply(dim, spark, DIM_SCHEMA, [("python", "script", 0)], deletes=["md"])
    ReplayEngine(spark, **roots, config=cfg).run()
    assert view.synced_versions() == (
        fact.current_version(), dim.current_version()
    )
    pd.testing.assert_frame_equal(got(), recompute(), check_dtype=False)


def test_joinview_composes_two_dims(spark, tmp_path):
    """A JoinView's output is itself a LakeTable, so a second view can
    join it to ANOTHER dimension — multi-dim star enrichment as
    stacked single-dim views, each maintained incrementally (the same
    closure-under-composition the matview cascade has)."""
    owner_schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("owner", T.StringType()),
    ])
    fact = _fact(spark, str(tmp_path / "fact"))
    dim_lang = _dim(spark, str(tmp_path / "dl"))
    dim_owner = LakeTable.create(
        spark, str(tmp_path / "do"), owner_schema, key_cols=["repo"],
        num_buckets=2,
    )
    v1 = _mkview(spark, tmp_path / "v1", fact, dim_lang, "left")
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim_lang, spark, DIM_SCHEMA, DIMS0)
    _apply(dim_owner, spark, owner_schema,
           [("r1", "alice"), ("r2", "bob")])
    v1.refresh(fact, dim_lang)
    v2 = JoinView.create(
        spark, str(tmp_path / "v2"), v1.table, dim_owner,
        JoinViewSpec(on=(("repo", "repo"),), how="left", right_prefix="o_"),
        num_buckets=4,
    )
    v2.refresh(v1.table, dim_owner)

    def check():
        got = {
            (r["repo"], r["path"]): (r["d_family"], r["o_owner"])
            for r in v2.read().collect()
        }
        d = {k: f for k, f, _ in DIMS_NOW}
        o = dict(OWNERS_NOW)
        want = {
            (rp, p): (d.get(lg), o.get(rp))
            for (rp, p, lg, _sz) in FACTS_NOW
        }
        assert got == want, (got, want)

    global DIMS_NOW, OWNERS_NOW, FACTS_NOW
    DIMS_NOW = [("py", "script", 1), ("rs", "compiled", 2)]
    OWNERS_NOW = [("r1", "alice"), ("r2", "bob")]
    FACTS_NOW = list(FACTS0)
    check()

    # churn every level: fact fk change, lang dim update, owner insert
    _apply(fact, spark, FACT_SCHEMA, [("r3", "e.rs", "rs", 50)], del_width=2)
    _apply(dim_lang, spark, DIM_SCHEMA, [("py", "scripting", 1)])
    _apply(dim_owner, spark, owner_schema, [("r3", "carol")])
    v1.refresh(fact, dim_lang)
    v2.refresh(v1.table, dim_owner)
    DIMS_NOW = [("py", "scripting", 1), ("rs", "compiled", 2)]
    OWNERS_NOW = [("r1", "alice"), ("r2", "bob"), ("r3", "carol")]
    FACTS_NOW = FACTS0 + [("r3", "e.rs", "rs", 50)]
    check()


def test_joinview_cli_replay_spec(spark, tmp_path, capsys):
    """The CLI replay spec's join_views entry attaches (view_root,
    dim_root) pairs exactly like ReplayConfig.join_views."""
    import json as _json

    from datax_spark.cli import main
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import LANGS, ChangelogSpec, write_events

    ev = str(tmp_path / "events")
    write_events(
        spark,
        ChangelogSpec(n_events=6000, events_per_epoch=2000, seed=3,
                      evolve_from_epoch=None),
        ev,
    )
    roots = dict(
        events_root=ev, table_root=str(tmp_path / "t"),
        metrics_root=str(tmp_path / "m"),
    )
    ReplayEngine(spark, **roots, config=ReplayConfig(num_buckets=8)).run(
        through_epoch=0
    )
    fact = LakeTable.load(spark, roots["table_root"])
    dim = _dim(spark, str(tmp_path / "dim"))
    _apply(dim, spark, DIM_SCHEMA,
           [(x, f"fam_{x}", i) for i, x in enumerate(LANGS)])
    view = JoinView.create(
        spark, str(tmp_path / "view"), fact, dim,
        JoinViewSpec(on=(("lang", "lang"),), how="left", right_prefix="d_"),
        num_buckets=4,
    )
    spec = tmp_path / "job.json"
    spec.write_text(_json.dumps({
        "replay": {
            **roots,
            "num_buckets": 8,
            "join_views": [[str(tmp_path / "view"), str(tmp_path / "dim")]],
        }
    }))
    assert main(["--job", str(spec)]) == 0
    assert view.synced_versions() == (
        fact.current_version(), dim.current_version()
    )
    assert fact.current_version() > 1  # the CLI actually applied epochs


def test_aggview_over_joinview_enriched_rollup(spark, tmp_path):
    """Cross-type view composition: an AggView maintained over a
    JoinView's table — group the enriched fact by a DIM attribute
    (per-family size stats). Fact churn, dim churn (which MOVES fact
    rows between groups without touching the fact!), and deletes all
    flow through both incremental maintenance layers."""
    from pyspark.sql import functions as F

    from datax_spark.lake.matview import AggView, AggViewSpec

    fact = _fact(spark, str(tmp_path / "fact"))
    dim = _dim(spark, str(tmp_path / "dim"))
    v1 = _mkview(spark, tmp_path / "v1", fact, dim, "left")
    _apply(fact, spark, FACT_SCHEMA, FACTS0, del_width=2)
    _apply(dim, spark, DIM_SCHEMA, DIMS0)
    v1.refresh(fact, dim)
    v2 = AggView.create(
        spark, str(tmp_path / "v2"), v1.table,
        AggViewSpec(group_cols=("d_family",), sum_cols=("size",),
                    max_cols=("size",), group_fill=(("d_family", "@miss"),)),
        num_buckets=2,
    )
    v2.refresh(v1.table)

    def check():
        got = sorted(tuple(r) for r in v2.read().collect())
        want = sorted(
            tuple(r)
            for r in v1.table.read()
            .withColumn("d_family", F.coalesce("d_family", F.lit("@miss")))
            .groupBy("d_family")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("size").alias("sum_size"),
                 F.max("size").alias("max_size"))
            .collect()
        )
        assert got == want, (got, want)

    check()
    # dim-side churn MOVES fact rows between rollup groups: py rows
    # leave 'script' for 'scripting'; rs dim dies -> rows go to @miss
    _apply(dim, spark, DIM_SCHEMA, [("py", "scripting", 1)], deletes=["rs"])
    _apply(fact, spark, FACT_SCHEMA, [("r9", "z.py", "py", 70)],
           deletes=[("r2", "d.go")], del_width=2)
    v1.refresh(fact, dim)
    v2.refresh(v1.table)
    check()
