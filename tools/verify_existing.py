"""Re-run ONLY the verification phase of tools/scale_check.py against a
replay root that already finished its (measured, flushed) replay.

A large scale_check run flushes ``{"phase": "replay_done", ...}`` before
verification precisely so a killed verify cannot destroy the measurement;
this tool picks the verify back up from the surviving ``<root>/{events,
table}`` directories instead of paying the multi-minute fixture write +
replay again.

Usage: python tools/verify_existing.py <root> [cpus]
Prints the same final JSON line scale_check.py would have printed
(minus the replay timing, which the caller already holds).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import duckdb

    from datax_spark.lake.table import LakeTable
    from datax_spark.session import get_spark

    spark = get_spark("verify-existing", cores=cpus)
    t1 = time.monotonic()
    tbl = LakeTable(spark, os.path.join(root, "table"))
    got = (
        tbl.read()
        .selectExpr(
            "repo", "path", "commit", "lsn", "lang", "lang_variant",
            "sha2(content, 256) AS content_sha256",
        )
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    final_buckets = int(tbl.manifest().num_buckets)
    # snapshot in hand: release the JVM + Arrow workers before the
    # memory-hungry DuckDB scan (same discipline as scale_check.py)
    spark.stop()

    con = duckdb.connect()
    con.execute("SET memory_limit='20GB'")
    con.execute("SET threads=6")
    con.execute("SET preserve_insertion_order=false")
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
                "root": root,
                "final_rows": int(len(got)),
                "verified": "sha256_frame_equal_vs_duckdb_lww",
                "verify_sec": round(verify_sec, 2),
                "final_buckets": final_buckets,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
