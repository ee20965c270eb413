"""Memory-bounded variant of tools/verify_existing.py for very large
event logs (>= 10^8 events): DuckDB's parquet scan buffers over long
``content`` strings are NOT capped by ``memory_limit`` (measured: a
128M-event verify grew past 55 GiB RSS with memory_limit='20GB'), so
this variant hashes the content in the SPARK scan first — writing a
compact intermediate (fixed-width columns only, content dropped) —
and runs the independent DuckDB LWW arg_max over that.

The division of labor keeps the check meaningful: the engine-side and
oracle-side digests both come from sha2/sha256 over identical bytes
(the per-row invariant is content equality under a collision-resistant
digest), while the property actually under test — LWW winner per
(repo, path) by (commit, lsn) with deletes dropped, across schema
evolution and exactly-once commits — is recomputed entirely by DuckDB
from the raw log order, independent of every engine code path.

Usage: python tools/verify_existing_prehash.py <root> [cpus]
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

    spark = get_spark("verify-prehash", cores=cpus)
    t1 = time.monotonic()

    # compact the event log: hash content in the (streaming, bounded)
    # Spark scan, keep only fixed-width/short columns
    hashed = os.path.join(root, "events_hashed")
    if not os.path.exists(os.path.join(hashed, "_SUCCESS")):
        (
            spark.read.option("mergeSchema", "true")
            .parquet(os.path.join(root, "events"))
            .selectExpr(
                "repo", "path", "commit", "lsn", "lang",
                "lang_variant", "op",
                "sha2(content, 256) AS content_sha256",
            )
            .write.mode("overwrite")
            .parquet(hashed)
        )
    prehash_sec = time.monotonic() - t1

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
    spark.stop()

    con = duckdb.connect()
    con.execute("SET memory_limit='20GB'")
    con.execute("SET threads=8")
    con.execute("SET preserve_insertion_order=false")
    os.makedirs(os.path.join(root, "duck_spill"), exist_ok=True)
    con.execute(f"SET temp_directory='{root}/duck_spill'")
    want = con.execute(
        f"""
        WITH ev AS (
          SELECT repo, path, commit, lsn, lang, lang_variant, op,
                 content_sha256,
                 commit || lpad(CAST(lsn AS VARCHAR), 20, '0') AS ord
          FROM read_parquet('{hashed}/*.parquet', union_by_name = true)
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
                "verified": "sha256_frame_equal_vs_duckdb_lww_prehash",
                "prehash_sec": round(prehash_sec, 2),
                "verify_sec": round(verify_sec, 2),
                "final_buckets": final_buckets,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
