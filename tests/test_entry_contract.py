"""Driver-contract conformance: queries() vs oracle_sql() via DuckDB,
exactly the way the driver compares (row count + schema names +
order-insensitive canonicalized values).

Full sweep at sf0.01 lives in tools/check_contract.py; here we run
every oracle-checked query at sf0.001 for speed and skip the heavy
rows-only pipelines (covered by their own tests / the checker).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def compare(spark_df, con, sql):
    rows = [tuple(r) for r in spark_df.collect()]
    cols = spark_df.columns
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(cols) == sorted(ocols), f"columns {sorted(cols)} vs {sorted(ocols)}"
    assert len(rows) == len(orows), f"rowcount {len(rows)} vs {len(orows)}"

    def key(rs, cs):
        order = sorted(range(len(cs)), key=lambda i: cs[i])
        return sorted(tuple(canon(r[i]) for i in order) for r in rs)

    assert key(rows, cols) == key(orows, ocols)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


def test_contract_shape():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    compare(fn(spark, SF_DIR), duck, entrymod.oracle_sql()[name])
