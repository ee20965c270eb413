"""CLI maintenance job kind: the Iceberg-procedures surface driven by
a DataX-style JSON spec — compact, rebucket, tag, rollback, expire,
vacuum, in order, each its own snapshot commit."""

import json

from pyspark.sql import types as T

from datax_spark.cli import main
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("content", T.StringType()),
    ]
)


def _ups(spark, rows):
    ev_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("op", T.StringType())]
    )
    return spark.createDataFrame(
        [(r, p, l, c, "U") for r, p, l, c in rows], ev_schema
    )


def _state(t):
    return sorted(
        tuple(r) for r in t.read().select("repo", "path", "lsn", "content").collect()
    )


def test_cli_maintenance_pipeline(spark, tmp_path, capsys):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=4)
    merge_into(t, _ups(spark, [("r1", "a", 1, "x"), ("r2", "b", 2, "y")])).commit()
    merge_into(t, _ups(spark, [("r1", "a", 3, "x2"), ("r3", "c", 4, "z")])).commit()
    before = _state(t)

    spec = tmp_path / "mt.json"
    spec.write_text(
        json.dumps(
            {
                "maintenance": {
                    "table_root": root,
                    "actions": [
                        {"tag": {"name": "pre"}},
                        {"compact": {}},
                        {"rebucket": {"num_buckets": 8}},
                        {"vacuum": {}},
                    ],
                }
            }
        )
    )
    assert main(["--job", str(spec), "--dry-run"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["actions"] == ["tag", "compact", "rebucket", "vacuum"]

    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kinds = [next(iter(a)) for a in out["applied"]]
    assert kinds == ["tag", "compact", "rebucket", "vacuum"]

    t2 = LakeTable.load(spark, root)
    assert t2.manifest().num_buckets == 8
    assert _state(t2) == before  # layout-only pipeline: data unchanged

    # rollback by the tag name restores the pre-maintenance snapshot
    rb = tmp_path / "rb.json"
    rb.write_text(
        json.dumps(
            {
                "maintenance": {
                    "table_root": root,
                    "actions": [{"rollback": {"version": "pre"}}],
                }
            }
        )
    )
    assert main(["--job", str(rb)]) == 0
    t3 = LakeTable.load(spark, root)
    assert t3.manifest().num_buckets == 4  # pre-rebucket layout restored
    assert _state(t3) == before


def test_cli_maintenance_unknown_action(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=2)
    merge_into(t, _ups(spark, [("r", "p", 1, "v")])).commit()
    spec = tmp_path / "bad.json"
    spec.write_text(
        json.dumps(
            {"maintenance": {"table_root": root, "actions": [{"defrag": {}}]}}
        )
    )
    import pytest

    with pytest.raises(ValueError, match="unknown maintenance action"):
        main(["--job", str(spec)])


def test_cli_matview_job_kind(spark, tmp_path, capsys):
    """{"matview": ...} job: create-on-first-run + incremental refresh,
    idempotent re-run, maintained state equals a recompute."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    vroot = str(tmp_path / "v")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], num_buckets=4)
    merge_into(t, _ups(spark, [("r1", "a", 1, "x"), ("r2", "b", 2, "y")])).commit()

    spec = tmp_path / "mv.json"
    spec.write_text(json.dumps({
        "matview": {
            "source_root": root,
            "view_root": vroot,
            "spec": {"group_cols": ["repo"], "sum_cols": ["lsn"],
                     "max_cols": ["lsn"]},
            "num_buckets": 4,
        }
    }))
    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["created"] and not out["skipped"]

    # source advances; re-run the SAME spec file (the scheduled shape)
    merge_into(t, _ups(spark, [("r1", "c", 9, "z"), ("r3", "d", 5, "w")])).commit()
    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["created"] and not out["skipped"]
    assert out["synced_to"] == t.current_version()

    from datax_spark.lake.matview import AggView

    got = sorted(tuple(r) for r in AggView.load(spark, vroot).read().collect())
    want = sorted(
        tuple(r)
        for r in t.read()
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("lsn").alias("sum_lsn"),
             F.max("lsn").alias("max_lsn"))
        .collect()
    )
    assert got == want

    # third run: nothing changed -> no-op
    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"]
