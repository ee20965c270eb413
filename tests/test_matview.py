"""Incremental aggregate-view maintenance (lake/matview.py): after
every source commit + refresh, the view must equal a from-scratch
GROUP BY over the source's current state — including retraction
(deletes / group-moving updates), min/max dirty-group recompute, SQL
null semantics, and group disappearance."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake import LakeTable, merge_into
from datax_spark.lake.matview import AggView, AggViewSpec

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)

SPEC = AggViewSpec(
    group_cols=("repo", "lang"),
    sum_cols=("size",),
    min_cols=("size",),
    max_cols=("size",),
)


def _src(spark, root):
    return LakeTable.create(
        spark, root, SCHEMA, key_cols=["repo", "path"], num_buckets=4
    )


def _batch(spark, rows, deletes=()):
    """rows: (repo, path, lang, size) upserts; deletes: (repo, path)."""
    data = [(*r, "U") for r in rows] + [
        (r, p, None, None, "D") for (r, p) in deletes
    ]
    return spark.createDataFrame(
        data,
        T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())]),
    )


def _expected(source):
    return (
        source.read()
        .groupBy("repo", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("size").alias("sum_size"),
            F.min("size").alias("min_size"),
            F.max("size").alias("max_size"),
        )
    )


def _assert_view_matches(view, source):
    got = (
        view.read()
        .toPandas()
        .sort_values(["repo", "lang"])
        .reset_index(drop=True)
    )
    want = (
        _expected(source)
        .toPandas()
        .sort_values(["repo", "lang"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_matview_tracks_source_through_churn(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)

    # v1: plain inserts across two groups
    merge_into(src, _batch(spark, [
        ("r1", "a.py", "py", 10),
        ("r1", "b.py", "py", 30),
        ("r1", "c.rs", "rs", 7),
        ("r2", "d.py", "py", 5),
    ]), op_col="op").commit()
    r = view.refresh(src)
    assert not r.skipped and r.groups_recomputed == 0
    _assert_view_matches(view, src)

    # v2: update that MOVES a row between groups (lang change) and
    # bumps a measure — retraction from (r1,py), addition to (r1,rs)
    merge_into(src, _batch(spark, [("r1", "b.py", "rs", 31)]), op_col="op").commit()
    r = view.refresh(src)
    _assert_view_matches(view, src)
    # b.py held (r1,py)'s max=30 -> that group must have been recomputed
    assert r.groups_recomputed >= 1

    # v3: delete the row holding a group MIN (dirty-min path) plus a
    # harmless insert (clean arithmetic path) in the same window
    merge_into(src, _batch(spark, [("r2", "e.py", "py", 50)],
                           deletes=[("r1", "a.py")]), op_col="op").commit()
    r = view.refresh(src)
    _assert_view_matches(view, src)

    # v4: delete EVERY row of a group -> the view row must disappear
    merge_into(src, _batch(spark, [], deletes=[("r1", "c.rs"), ("r1", "b.py")]),
               op_col="op").commit()
    r = view.refresh(src)
    assert r.groups_deleted >= 1
    _assert_view_matches(view, src)
    live = {(x["repo"], x["lang"]) for x in view.read().collect()}
    assert ("r1", "rs") not in live

    # idempotence: already synced -> no-op, state unchanged
    r2 = view.refresh(src)
    assert r2.skipped
    _assert_view_matches(view, src)


def test_matview_null_measures_match_sql_semantics(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)

    # a group whose sizes are ALL NULL: sum/min/max must read as NULL
    merge_into(src, _batch(spark, [
        ("r1", "a.md", "md", None),
        ("r1", "b.md", "md", None),
        ("r1", "c.py", "py", 4),
    ]), op_col="op").commit()
    view.refresh(src)
    _assert_view_matches(view, src)
    row = {(r["repo"], r["lang"]): r for r in view.read().collect()}
    assert row[("r1", "md")]["n_rows"] == 2
    assert row[("r1", "md")]["sum_size"] is None

    # the null group gains a value, the py group's value goes null
    merge_into(src, _batch(spark, [
        ("r1", "b.md", "md", 9),
        ("r1", "c.py", "py", None),
    ]), op_col="op").commit()
    view.refresh(src)
    _assert_view_matches(view, src)


def test_matview_rejects_null_group_keys(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)
    merge_into(src, _batch(spark, [("r1", "a", None, 3)]), op_col="op").commit()
    with pytest.raises(ValueError, match="NULL in a group key"):
        view.refresh(src)


def test_matview_rebuild_after_divergence(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)
    merge_into(src, _batch(spark, [("r1", "a.py", "py", 10),
                                   ("r1", "b.rs", "rs", 2)]), op_col="op").commit()
    view.refresh(src)
    merge_into(src, _batch(spark, [("r2", "c.py", "py", 8)],
                           deletes=[("r1", "b.rs")]), op_col="op").commit()
    view.rebuild(src)  # full recompute path must also converge
    _assert_view_matches(view, src)
    assert view.synced_version() == src.current_version()
    assert view.refresh(src).skipped


def test_matview_load_roundtrip_and_persistence(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)
    merge_into(src, _batch(spark, [("r1", "a.py", "py", 10)]), op_col="op").commit()
    v2 = AggView.load(spark, str(tmp_path / "view"))  # fresh handle
    assert v2.spec == SPEC
    v2.refresh(src)
    _assert_view_matches(v2, src)


def test_changes_include_preimage_two_row_updates(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    merge_into(src, _batch(spark, [("r1", "a.py", "py", 10)]), op_col="op").commit()
    merge_into(src, _batch(spark, [("r1", "a.py", "rs", 11)],
                           deletes=[]), op_col="op").commit()
    cdf = src.changes(1, 2, include_preimage=True).collect()
    kinds = sorted(r["_change_type"] for r in cdf)
    assert kinds == ["update_postimage", "update_preimage"]
    by = {r["_change_type"]: r for r in cdf}
    assert by["update_preimage"]["lang"] == "py"
    assert by["update_preimage"]["size"] == 10
    assert by["update_postimage"]["lang"] == "rs"
    assert by["update_postimage"]["size"] == 11
    # default (single-row) form unchanged
    one = src.changes(1, 2).collect()
    assert [r["_change_type"] for r in one] == ["update"]
    assert one[0]["lang"] == "rs"


def test_matview_group_fill_sentinel_null_groups(spark, tmp_path):
    """NULL group keys via sentinel encoding (group_fill): the NULL
    group is maintained like any other — including retraction — and
    reads back as the sentinel."""
    spec = AggViewSpec(
        group_cols=("repo", "lang"), sum_cols=("size",),
        min_cols=("size",), max_cols=("size",),
        group_fill=(("lang", "@null"),),
    )
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, spec, num_buckets=4)
    merge_into(src, _batch(spark, [
        ("r1", "a", None, 5),
        ("r1", "b", None, 9),
        ("r1", "c", "py", 1),
    ]), op_col="op").commit()
    view.refresh(src)
    rows = {(r["repo"], r["lang"]): r for r in view.read().collect()}
    assert rows[("r1", "@null")]["n_rows"] == 2
    assert rows[("r1", "@null")]["sum_size"] == 14
    # retract the null group's max -> dirty recompute on the sentinel
    merge_into(src, _batch(spark, [], deletes=[("r1", "b")]), op_col="op").commit()
    r = view.refresh(src)
    assert r.groups_recomputed >= 1
    rows = {(r["repo"], r["lang"]): r for r in view.read().collect()}
    assert rows[("r1", "@null")]["n_rows"] == 1
    assert rows[("r1", "@null")]["max_size"] == 5
    want = (
        spec.fill(src.read())
        .groupBy("repo", "lang")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("size").alias("sum_size"),
             F.min("size").alias("min_size"), F.max("size").alias("max_size"))
        .toPandas().sort_values(["repo", "lang"]).reset_index(drop=True)
    )
    got = view.read().toPandas().sort_values(["repo", "lang"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_matview_engine_attached_refresh_and_crash_heal(spark, tmp_path):
    """ReplayConfig.materialized_views: the engine advances registered
    views after every committed epoch; a crash between an epoch commit
    and its refresh leaves the view behind, and the next run() heals
    it (idempotent watermarked refresh)."""
    from datax_spark.engine.replay import ReplayConfig, ReplayCrash, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.table import LakeTable

    ev = str(tmp_path / "events")
    write_events(
        spark,
        ChangelogSpec(n_events=9000, events_per_epoch=3000,
                      evolve_from_epoch=2, seed=5),
        ev,
    )
    spec = AggViewSpec(
        group_cols=("repo", "lang"), sum_cols=("lsn",),
        min_cols=("lsn",), max_cols=("lsn",),
        group_fill=(("lang", "@null"),),
    )
    roots = dict(
        events_root=ev, table_root=str(tmp_path / "t"),
        metrics_root=str(tmp_path / "m"),
    )
    # table must exist before a view over it can: epoch 0 unadorned
    ReplayEngine(spark, **roots, config=ReplayConfig(num_buckets=8)).run(
        through_epoch=0
    )
    table = LakeTable.load(spark, roots["table_root"])
    view = AggView.create(spark, str(tmp_path / "view"), table, spec, num_buckets=4)

    cfg = ReplayConfig(
        num_buckets=8, materialized_views=(str(tmp_path / "view"),)
    )
    eng = ReplayEngine(spark, **roots, config=cfg)
    r = eng.run(through_epoch=1)
    assert any(not x.skipped for x in r)
    assert view.synced_version() == table.current_version()

    def recompute():
        return (
            spec.fill(table.read())
            .groupBy("repo", "lang")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"),
                 F.min("lsn").alias("min_lsn"), F.max("lsn").alias("max_lsn"))
            .toPandas().sort_values(["repo", "lang"]).reset_index(drop=True)
        )

    got = view.read().toPandas().sort_values(["repo", "lang"]).reset_index(drop=True)
    want = recompute()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)

    # crash AFTER the epoch-2 commit, BEFORE the view refresh
    with pytest.raises(ReplayCrash):
        eng.apply_epoch(2, failpoints=["after_commit"])
    assert view.synced_version() < table.current_version()  # view lags

    # a fresh run has nothing to apply but heals the views at the end
    ReplayEngine(spark, **roots, config=cfg).run()
    assert view.synced_version() == table.current_version()
    got = view.read().toPandas().sort_values(["repo", "lang"]).reset_index(drop=True)
    want = recompute()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_matview_engine_multiple_views_share_one_feed(spark, tmp_path):
    """Several views at the same synced version ride ONE persisted
    change-feed read per epoch (engine _refresh_views grouping) and
    each still equals its own recompute."""
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.table import LakeTable

    ev = str(tmp_path / "events")
    write_events(
        spark,
        ChangelogSpec(n_events=6000, events_per_epoch=3000, seed=3),
        ev,
    )
    roots = dict(
        events_root=ev, table_root=str(tmp_path / "t"),
        metrics_root=str(tmp_path / "m"),
    )
    ReplayEngine(spark, **roots, config=ReplayConfig(num_buckets=8)).run(
        through_epoch=0
    )
    table = LakeTable.load(spark, roots["table_root"])
    v_rich = AggView.create(
        spark, str(tmp_path / "v_rich"), table,
        AggViewSpec(group_cols=("repo", "lang"), sum_cols=("lsn",),
                    min_cols=("lsn",), max_cols=("lsn",),
                    group_fill=(("lang", "@null"),)),
        num_buckets=4,
    )
    v_lang = AggView.create(
        spark, str(tmp_path / "v_lang"), table,
        AggViewSpec(group_cols=("lang",), group_fill=(("lang", "@null"),)),
        num_buckets=4,
    )
    cfg = ReplayConfig(
        num_buckets=8,
        materialized_views=(str(tmp_path / "v_rich"), str(tmp_path / "v_lang")),
    )
    ReplayEngine(spark, **roots, config=cfg).run()
    assert v_rich.synced_version() == table.current_version()
    assert v_lang.synced_version() == table.current_version()

    got_rich = sorted(tuple(r) for r in v_rich.read().collect())
    want_rich = sorted(
        tuple(r)
        for r in v_rich.spec.fill(table.read())
        .groupBy("repo", "lang")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"),
             F.min("lsn").alias("min_lsn"), F.max("lsn").alias("max_lsn"))
        .collect()
    )
    assert got_rich == want_rich
    got_lang = sorted(tuple(r) for r in v_lang.read().collect())
    want_lang = sorted(
        tuple(r)
        for r in v_lang.spec.fill(table.read())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )
    assert got_lang == want_lang


def test_matview_cascaded_rollup(spark, tmp_path):
    """Views cascade: a second-level view over a first-level view's
    table (rollup (repo,lang) -> (repo)) refreshes incrementally from
    the FIRST view's change feed — a view is itself a LakeTable, so
    the machinery is closed under composition."""
    src = _src(spark, str(tmp_path / "src"))
    v1 = AggView.create(spark, str(tmp_path / "v1"), src, SPEC, num_buckets=4)
    merge_into(src, _batch(spark, [
        ("r1", "a.py", "py", 10), ("r1", "b.rs", "rs", 2),
        ("r2", "c.py", "py", 7), ("r2", "d.py", "py", 1),
    ]), op_col="op").commit()
    v1.refresh(src)
    # level 2: per-repo file count and total size, over v1's table
    v2 = AggView.create(
        spark, str(tmp_path / "v2"), v1.table,
        AggViewSpec(group_cols=("repo",), sum_cols=("n_rows", "sum_size")),
        num_buckets=4,
    )
    v2.refresh(v1.table)

    # churn: delete one row, move another between groups
    merge_into(src, _batch(spark, [("r2", "d.py", "rs", 3)],
                           deletes=[("r1", "a.py")]), op_col="op").commit()
    v1.refresh(src)
    v2.refresh(v1.table)

    got = {r["repo"]: (r["n_rows"], r["sum_n_rows"], r["sum_sum_size"])
           for r in v2.read().collect()}
    want = {
        r["repo"]: (r["g"], r["n"], r["s"])
        for r in src.read()
        .groupBy("repo")
        .agg(
            F.countDistinct("lang").alias("g"),
            F.count(F.lit(1)).alias("n"),
            F.sum("size").alias("s"),
        )
        .collect()
    }
    assert got == want


def test_matview_over_mor_source(spark, tmp_path):
    """A view over a merge-on-read source: the change feed resolves
    base+deltas, so refreshes see the LWW-merged state — including
    across a compaction (layout-only commits contribute no changes)."""
    mor_schema = T.StructType(SCHEMA.fields + [T.StructField("lsn", T.LongType())])
    ev_schema = T.StructType(mor_schema.fields + [T.StructField("op", T.StringType())])

    def _mor_batch(rows):
        # rows: (repo, path, lang, size, lsn, op) — deletes carry lsn
        return spark.createDataFrame(rows, ev_schema)

    src = LakeTable.create(
        spark, str(tmp_path / "src"), mor_schema, key_cols=["repo", "path"],
        num_buckets=4, resolve_order=["lsn"],
    )
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)
    merge_into(src, _mor_batch([
        ("r1", "a.py", "py", 10, 1, "U"), ("r1", "b.rs", "rs", 2, 2, "U"),
    ]), op_col="op", strategy="mor").commit()
    view.refresh(src)
    _assert_view_matches(view, src)

    merge_into(src, _mor_batch([
        ("r1", "a.py", "py", 99, 3, "U"),
        ("r1", "b.rs", None, None, 4, "D"),
    ]), op_col="op", strategy="mor").commit()
    view.refresh(src)
    _assert_view_matches(view, src)
    assert src.manifest().delta_files  # still un-compacted deltas

    src.compact()  # layout-only: refresh must see zero changes
    r = view.refresh(src)
    assert r.groups_changed == 0
    _assert_view_matches(view, src)


def test_matview_double_refresh_never_double_applies(spark, tmp_path):
    """Two maintainers refreshing one view: every refresh re-reads the
    synced marker from the CURRENT manifest (not a cached handle
    snapshot), so the second application of the same window is a
    skipped no-op — never a double apply. A genuine mid-flight race is
    the lake commit conflict, covered by
    test_lake.py::test_commit_rebase_concurrent_writers."""
    src = _src(spark, str(tmp_path / "src"))
    view = AggView.create(spark, str(tmp_path / "view"), src, SPEC, num_buckets=4)
    merge_into(src, _batch(spark, [("r1", "a.py", "py", 10)]), op_col="op").commit()

    a = AggView.load(spark, str(tmp_path / "view"))
    b = AggView.load(spark, str(tmp_path / "view"))  # loaded BEFORE a's refresh
    r_a = a.refresh(src)
    assert not r_a.skipped
    r_b = b.refresh(src)  # stale handle, same window
    assert r_b.skipped  # marker re-read from the manifest -> no-op
    _assert_view_matches(view, src)


def test_matview_view_refresh_cadence(spark, tmp_path):
    """view_refresh_every=2: odd epochs skip the refresh (no 'views'
    phase), the run()-end heal still leaves the view at head and
    correct — the feed window composes across skipped epochs."""
    from datax_spark.engine.replay import ReplayConfig, ReplayEngine
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.lake.table import LakeTable

    ev = str(tmp_path / "events")
    write_events(
        spark,
        ChangelogSpec(n_events=9000, events_per_epoch=3000, seed=11),
        ev,
    )
    roots = dict(
        events_root=ev, table_root=str(tmp_path / "t"),
        metrics_root=str(tmp_path / "m"),
    )
    ReplayEngine(spark, **roots, config=ReplayConfig(num_buckets=8)).run(
        through_epoch=0
    )
    table = LakeTable.load(spark, roots["table_root"])
    view = AggView.create(
        spark, str(tmp_path / "view"), table,
        AggViewSpec(group_cols=("repo",), sum_cols=("lsn",)),
        num_buckets=4,
    )
    cfg = ReplayConfig(
        num_buckets=8,
        materialized_views=(str(tmp_path / "view"),),
        view_refresh_every=2,
    )
    res = ReplayEngine(spark, **roots, config=cfg).run()
    applied = {r.epoch: r for r in res if not r.skipped}
    assert 1 in applied and 2 in applied
    assert "views" in applied[1].phase_ms     # (1+1) % 2 == 0 -> refreshed
    assert "views" not in applied[2].phase_ms  # cadence skip
    assert view.synced_version() == table.current_version()  # end heal
    got = sorted(tuple(r) for r in view.read().collect())
    want = sorted(
        tuple(r)
        for r in table.read().groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"))
        .collect()
    )
    assert got == want
