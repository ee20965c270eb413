"""E2E: the north rule's deployment form — ``spark-submit --py-files``.

Packages ``datax_spark`` into a zip, launches a FRESH Spark JVM via the
real ``spark-submit`` (tools/submit_replay.sh), replays a changelog
through the CLI, then verifies from this process that (a) the submitted
``--master`` was honored (get_spark must not clobber it — that is the
bug class that silently turns a 4N-executor run into local mode) and
(b) the final table state is sha256-equal to the sequential pandas
oracle. Reference analog: ``Engine.java:117-170`` is also a cold-start
CLI entry; the reference ships plugins as jars, we ship a py-files zip.
"""

from __future__ import annotations

import json
import os
import subprocess

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datax_spark.fixtures import ChangelogSpec, write_events
from datax_spark.lake.table import LakeTable
from datax_spark.oracle import sequential_apply

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = ChangelogSpec(
    n_events=6_000,
    n_repos=25,
    paths_per_repo=60,
    events_per_epoch=2_000,
    evolve_from_epoch=2,
    seed=23,
)
COLS = ["repo", "path", "commit", "lsn", "lang", "h", "lang_variant"]


def test_spark_submit_py_files_replay(spark, tmp_path):
    events = str(tmp_path / "events")
    write_events(spark, SPEC, events)
    job = {
        "replay": {
            "events_root": events,
            "table_root": str(tmp_path / "table"),
            "metrics_root": str(tmp_path / "metrics"),
            "num_buckets": 8,
        }
    }
    job_path = tmp_path / "job.json"
    job_path.write_text(json.dumps(job))

    env = dict(os.environ)
    env.pop("PYSPARK_GATEWAY_PORT", None)  # never inherit our gateway
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "submit_replay.sh"),
         str(job_path), "local[4]"],
        capture_output=True, text=True, timeout=480, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, proc.stdout[-2000:]
    res = json.loads(json_lines[-1])
    assert res["mode"] == "replay"
    # the submitted master, not get_spark's local default
    assert res["master"] == "local[4]"
    assert res["epochs_applied"] == list(range(SPEC.n_epochs))

    tbl = LakeTable.load(spark, str(tmp_path / "table"))
    got = (
        tbl.read()
        .withColumn("h", F.sha2("content", 256))
        .select(*COLS)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = sequential_apply(events).rename(columns={"content_sha256": "h"})
    exp = exp[COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.fillna("∅"), exp.fillna("∅"), check_dtype=False
    )


def test_submitted_session_would_keep_cluster_master(monkeypatch):
    """Unit guard for the same property without a JVM launch: when the
    spark-submit gateway env is present, get_spark must not inject a
    local master or local sizing conf into the builder."""
    from pyspark.sql import SparkSession

    from datax_spark.session import get_spark

    captured: dict[str, str] = {}

    class FakeBuilder:
        def master(self, m):
            captured["master"] = m
            return self

        def appName(self, n):
            return self

        def config(self, k, v):
            captured[k] = v
            return self

        def getOrCreate(self):
            raise RuntimeError("stop-before-jvm")

    monkeypatch.setattr(SparkSession, "builder", FakeBuilder())
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    with pytest.raises(RuntimeError, match="stop-before-jvm"):
        get_spark("t")
    assert "master" not in captured
    assert "spark.sql.shuffle.partitions" not in captured
    assert "spark.default.parallelism" not in captured
    assert "spark.driver.memory" not in captured
    # semantic conf still applied
    assert captured["spark.sql.adaptive.enabled"] == "true"

    captured.clear()
    monkeypatch.delenv("PYSPARK_GATEWAY_PORT")
    with pytest.raises(RuntimeError, match="stop-before-jvm"):
        get_spark("t", cores=4)
    assert captured["master"] == "local[4]"
    assert captured["spark.sql.shuffle.partitions"] == "8"
