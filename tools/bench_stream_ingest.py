"""Streaming-ingest throughput: drain a changelog through the
Structured Streaming sink (``streaming/replay_stream.py``) and verify
the final table against the independent DuckDB LWW replay — the
stream-shaped companion to ``tools/scale_check.py`` (same fixture,
same verification gate, same no-transform config, so the batch and
streaming numbers compare directly).

Micro-batch shaping vs correctness (module docstring of
``replay_stream.py``): the fixture hash-scatters LSNs across each
epoch's files, so a CoW plan needs batch boundaries aligned to epoch
directories (a delete in batch i followed by an EARLIER update in
batch j>i would resurrect the key); ``merge_strategy="mor"`` resolves
winners by event order at read time, so ANY file-grained batching is
correct — that arm is the true streaming cadence story and the
default here.

Usage: python tools/bench_stream_ingest.py [n_events] [n_epochs]
           [cpus] [merge_strategy] [buckets] [batches_per_epoch]

merge_strategy: mor (default; batches_per_epoch may be > 1) or
spj/shuffle (batches_per_epoch forced to 1, mft = files per epoch —
fail-loud if the epoch dirs have unequal file counts).
Prints one JSON line with per-arm wall, events/s, batch count and a
pure-CPU control.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    merge_strategy = sys.argv[4] if len(sys.argv) > 4 else "mor"
    buckets = int(sys.argv[5]) if len(sys.argv) > 5 else 128
    batches_per_epoch = int(sys.argv[6]) if len(sys.argv) > 6 else 2

    from pyspark.sql import types as T

    from datax_spark.engine.replay import ReplayConfig
    from datax_spark.fixtures.changelog import ChangelogSpec, write_events
    from datax_spark.session import get_spark
    from datax_spark.streaming.replay_stream import StreamReplay

    spark = get_spark("bench-stream-ingest", cores=cpus)

    def cpu_control() -> float:
        t0 = time.monotonic()
        spark.range(0, 100_000_000 * cpus, 1, cpus * 4).selectExpr(
            "sum(cast(xxhash64(id) as double))"
        ).collect()
        return round(time.monotonic() - t0, 3)

    spec = ChangelogSpec(
        n_events=n_events,
        n_repos=max(200, n_events // 20_000),
        paths_per_repo=400,
        events_per_epoch=-(-n_events // n_epochs),
        evolve_from_epoch=max(1, n_epochs - 2),
        seed=42,
    )
    root = tempfile.mkdtemp(prefix="datax_stream_bench_")
    try:
        write_events(spark, spec, os.path.join(root, "events"))  # untimed

        per_epoch = [
            len(glob.glob(os.path.join(root, "events", f"epoch={e}", "*.parquet")))
            for e in range(spec.n_epochs)
        ]
        if merge_strategy == "mor":
            # MoR tolerates ANY file-grained batching (read-time event-
            # order resolution) — stream the raw hash-scattered layout
            stream_root = os.path.join(root, "events")
            mft = max(1, max(per_epoch) // max(1, batches_per_epoch))
        else:
            # CoW requires event-order-contiguous batches (the engine's
            # delete_order_check fails loudly otherwise): stage the log
            # as one flat dir written epoch-by-epoch — a binlog/WAL
            # tail IS offset-ordered, this models that feed. The file
            # source batches by (mod time, path); sequential writes
            # with equal file counts make batch k exactly epoch k.
            stream_root = os.path.join(root, "events_ordered")
            files_per_epoch = cpus
            for e in range(spec.n_epochs):
                (
                    spark.read.option("mergeSchema", "true")
                    .parquet(os.path.join(root, "events", f"epoch={e}"))
                    .repartition(files_per_epoch)
                    .write.mode("append")
                    .parquet(stream_root)
                )
                time.sleep(1.05)  # distinct mod-times per epoch
            mft = files_per_epoch

        # the stream's schema must carry the evolved column even though
        # the earliest files lack it (they batch first): merged infer,
        # missing columns null-filled by the file source per batch
        schema = T.StructType(
            [
                f
                for f in spark.read.option("mergeSchema", "true")
                .parquet(os.path.join(root, "events"))
                .schema.fields
                if f.name != "epoch"
            ]
        )

        controls = [cpu_control()]
        sr = StreamReplay(
            spark,
            stream_root,
            os.path.join(root, "table"),
            os.path.join(root, "ckpt"),
            config=ReplayConfig(num_buckets=buckets, merge_strategy=merge_strategy),
            max_files_per_trigger=mft,
            schema=schema,
        )
        t0 = time.monotonic()
        sr.run_available_now()
        drain_sec = time.monotonic() - t0
        controls.append(cpu_control())
        n_batches = len(sr.applied_batches)

        print(
            json.dumps(
                {
                    "phase": "drain_done",
                    "n_events": n_events,
                    "merge_strategy": merge_strategy,
                    "drain_sec": round(drain_sec, 2),
                    "events_per_sec": round(n_events / drain_sec, 1),
                    "n_batches": n_batches,
                    "max_files_per_trigger": mft,
                }
            ),
            flush=True,
        )

        # DATAX_STREAM_VERIFY=join: stop after the measured drain and
        # KEEP the root for tools/verify_existing_join.py — its own
        # process gets the whole box (the inline arg_max below shares
        # RAM with this process's spent 48g JVM, which OOM'd an 8M
        # verify); the join formulation is also the only spillable one
        # at >=128M events.
        if os.environ.get("DATAX_STREAM_VERIFY") == "join":
            spark.stop()
            print(json.dumps({"phase": "root_kept", "root": root}), flush=True)
            return

        # ---- verification: merged read (MoR resolves deltas) vs the
        # independent DuckDB LWW replay of the raw log ----
        t1 = time.monotonic()
        got = (
            sr.table()
            .read()
            .selectExpr(
                "repo", "path", "commit", "lsn", "lang", "lang_variant",
                "sha2(content, 256) AS content_sha256",
            )
            .toPandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        spark.stop()

        import duckdb

        con = duckdb.connect()
        con.execute("SET memory_limit='24GB'")
        con.execute("SET threads=8")
        con.execute("SET preserve_insertion_order=false")
        # in-memory DuckDB has spilling DISABLED unless a temp dir is
        # set — without it the scan+sort hits the limit and aborts
        os.makedirs(os.path.join(root, "duck_spill"), exist_ok=True)
        con.execute(f"SET temp_directory='{root}/duck_spill'")
        want = con.execute(
            f"""
            WITH ev AS (
              SELECT repo, path, commit, lsn, lang, lang_variant, op,
                     sha256(content) AS content_sha256,
                     commit || lpad(CAST(lsn AS VARCHAR), 20, '0') AS ord
              FROM read_parquet(
                  '{root}/events/epoch=*/*.parquet', union_by_name = true)
            ),
            last AS (
              SELECT repo, path,
                     arg_max(struct_pack(
                         commit := commit, lsn := lsn, lang := lang,
                         lang_variant := lang_variant,
                         content_sha256 := content_sha256,
                         op := op), ord) AS r
              FROM ev GROUP BY repo, path
            )
            SELECT repo, path, r.commit AS commit, r.lsn AS lsn,
                   r.lang AS lang, r.lang_variant AS lang_variant,
                   r.content_sha256 AS content_sha256
            FROM last WHERE r.op <> 'D'
            ORDER BY repo, path
            """
        ).df().reset_index(drop=True)
        verify_sec = time.monotonic() - t1

        import pandas as pd

        got["lsn"] = got["lsn"].astype("int64")
        want["lsn"] = want["lsn"].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        print(
            json.dumps(
                {
                    "n_events": n_events,
                    "n_epochs": n_epochs,
                    "cpus": cpus,
                    "merge_strategy": merge_strategy,
                    "buckets": buckets,
                    "drain_sec": round(drain_sec, 2),
                    "events_per_sec": round(n_events / drain_sec, 1),
                    "n_batches": n_batches,
                    "max_files_per_trigger": mft,
                    "final_rows": int(len(got)),
                    "verified": "sha256_frame_equal_vs_duckdb_lww",
                    "verify_sec": round(verify_sec, 2),
                    "cpu_control_sec": controls,
                }
            )
        )
    finally:
        if os.environ.get("DATAX_STREAM_VERIFY") != "join":
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
