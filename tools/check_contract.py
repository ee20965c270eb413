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


def arrow_type_name(t) -> str:
    """Canonical physical-type name for the driver's typed value-hash.

    The driver hashes typed values, so DuckDB HUGEINT (decimal128) vs
    Spark BIGINT (int64) mismatches even when Python-level values are
    identical ints. Compare at the Arrow level to catch that locally.
    """
    import pyarrow as pa

    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_name(t.value_type)}>"
    return str(t)


def type_mismatches(spark_df, o_schema) -> list[str]:
    """Compare Arrow column types of a Spark result vs the oracle's
    Arrow schema (obtained from the single oracle execution)."""
    try:
        s_schema = spark_df.limit(0).toArrow().schema
    except Exception:  # noqa: BLE001 — typed check is best-effort
        return []
    s_types = {f.name: arrow_type_name(f.type) for f in s_schema}
    o_types = {f.name: arrow_type_name(f.type) for f in o_schema}
    return [
        f"{c}: spark={s_types[c]} oracle={o_types[c]}"
        for c in sorted(set(s_types) & set(o_types))
        if s_types[c] != o_types[c]
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
    only = sys.argv[2:]  # optional query-name filter(s) for iteration
    if only:
        qs = {k: v for k, v in qs.items() if any(s in k for s in only)}
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
            # one execution serves values AND the typed-schema check
            otable = con.execute(oracles[name]).fetch_arrow_table()
            ocols = otable.column_names
            orows = [tuple(d[c] for c in ocols) for d in otable.to_pylist()]
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
            continue
        tm = type_mismatches(df, otable.schema)
        if tm:
            failures.append(name)
            print(f"FAIL  {name}: typed-hash mismatch: {tm}")
        else:
            print(f"ok    {name}: {len(rows)} rows match  ({dt:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
