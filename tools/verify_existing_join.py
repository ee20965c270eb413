"""Strictly memory-bounded verification of a finished scale replay.

The ``arg_max(struct_pack(...), ord)`` oracle in
``verify_existing_prehash.py`` keeps a per-group struct in the DuckDB
aggregate hash table, and that state does not spill — measured: a
128M-event verify grew past 89 GiB RSS with ``memory_limit='20GB'``.
This variant reformulates the same LWW winner query with primitives
that DO spill / stay bounded:

  1. ``max(ord)`` per (repo, path)          -- simple scalar agg, spillable
  2. join events back on (repo, path, ord)  -- build side = #keys rows
  3. winners with op <> 'D'

and compares against the engine's final table entirely inside DuckDB
(symmetric EXCEPT ALL counts) so no 10^6-row pandas frame is ever
materialised. The engine state is exported once from Spark as a
compact parquet (content replaced by sha2) before the JVM is released.

``ord = commit || lpad(lsn)`` is unique per (repo, path) because the
fixture's LSN is unique per event, so the max-ord join selects exactly
one winner row per key — same winner the arg_max picked.

Requires the prehash intermediate (``<root>/events_hashed`` with
_SUCCESS) from verify_existing_prehash.py; computes it if missing.

Usage: python tools/verify_existing_join.py <root> [cpus]
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

    t0 = time.monotonic()
    hashed = os.path.join(root, "events_hashed")
    state = os.path.join(root, "engine_state_hashed")

    # Both exports done on a previous (interrupted) run: the raw
    # events/ and table/ may have been reclaimed for disk — the DuckDB
    # comparison needs only the two hashed exports, so skip Spark.
    exports_done = os.path.exists(
        os.path.join(hashed, "_SUCCESS")
    ) and os.path.exists(os.path.join(state, "_SUCCESS"))
    final_buckets = None
    if not exports_done:
        spark = get_spark("verify-join", cores=cpus)
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
        tbl = LakeTable(spark, os.path.join(root, "table"))
        if not os.path.exists(os.path.join(state, "_SUCCESS")):
            (
                tbl.read()
                .selectExpr(
                    "repo", "path", "commit", "lsn", "lang", "lang_variant",
                    "sha2(content, 256) AS content_sha256",
                )
                .write.mode("overwrite")
                .parquet(state)
            )
        final_buckets = int(tbl.manifest().num_buckets)
        spark.stop()
    export_sec = time.monotonic() - t0

    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute("SET threads=8")
    con.execute("SET preserve_insertion_order=false")
    # spill dir overridable: a 256M-event verify spills >55 GB during
    # the scan+join CTE, which can exceed the root volume — point
    # DATAX_VERIFY_SPILL at a roomier mount (e.g. /dev/shm) there
    spill = os.environ.get(
        "DATAX_VERIFY_SPILL", os.path.join(root, "duck_spill")
    )
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")

    cols = "repo, path, commit, lsn, lang, lang_variant, content_sha256"
    want_sql = f"""
        WITH ev AS (
          SELECT repo, path, commit, lsn, lang, lang_variant, op,
                 content_sha256,
                 commit || lpad(CAST(lsn AS VARCHAR), 20, '0') AS ord
          FROM read_parquet('{hashed}/*.parquet', union_by_name = true)
        ),
        mx AS (
          SELECT repo, path, max(ord) AS mord
          FROM ev GROUP BY repo, path
        ),
        last AS (
          SELECT ev.repo, ev.path, ev.commit, ev.lsn, ev.lang,
                 ev.lang_variant, ev.op, ev.content_sha256
          FROM ev
          JOIN mx ON ev.repo = mx.repo AND ev.path = mx.path
                 AND ev.ord = mx.mord
        )
        SELECT {cols} FROM last WHERE op <> 'D'
    """
    got_sql = (
        f"SELECT repo, path, commit, CAST(lsn AS BIGINT) AS lsn, lang,"
        f" lang_variant, content_sha256"
        f" FROM read_parquet('{state}/*.parquet')"
    )
    # materialize the oracle once (O(#keys) compact rows) so the heavy
    # 128M-row scan+join CTE is evaluated a single time
    con.execute(f"CREATE TEMPORARY TABLE want AS {want_sql}")
    want_rows, got_rows, miss_a, miss_b = con.execute(
        f"""
        SELECT
          (SELECT count(*) FROM want),
          (SELECT count(*) FROM ({got_sql})),
          (SELECT count(*) FROM ((SELECT * FROM want) EXCEPT ALL ({got_sql}))),
          (SELECT count(*) FROM (({got_sql}) EXCEPT ALL (SELECT * FROM want)))
        """
    ).fetchone()
    verify_sec = time.monotonic() - t0

    ok = miss_a == 0 and miss_b == 0 and want_rows == got_rows
    print(
        json.dumps(
            {
                "root": root,
                "final_rows": int(got_rows),
                "oracle_rows": int(want_rows),
                "missing_vs_oracle": int(miss_a),
                "extra_vs_oracle": int(miss_b),
                "verified": (
                    "sha256_set_equal_vs_duckdb_lww_join" if ok else "FAILED"
                ),
                "export_sec": round(export_sec, 2),
                "verify_sec": round(verify_sec, 2),
                "final_buckets": final_buckets,
            }
        ),
        flush=True,
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
