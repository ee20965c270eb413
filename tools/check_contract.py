"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet, and compares
row-count + order-insensitive values (columns sorted by name, floats
canonicalized). Rows-only entries (no oracle) just require a stable
non-failing run.

Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from datax_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            cols = df.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(rows)} rows  ({dt:.1f}s)")
            if len(rows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows from rows-only query")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(cols)} vs {sorted(ocols)}")
            continue
        if len(rows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(rows)} vs {len(orows)}")
            continue
        a, b = frame_key(rows, cols), frame_key(orows, ocols)
        if a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"ok    {name}: {len(rows)} rows match  ({dt:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
