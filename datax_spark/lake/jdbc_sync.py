"""Incremental lake-to-RDBMS replication — the reference's flagship
job shape (CDC tail -> mysqlwriter upsert) closed downstream of the
lake.

A DataX deployment's most common pipeline is "replicate a changing
source into a MySQL-family target" (mysqlwriter writeMode
replace/update, WriterUtil.java:113-170, fed by an incremental reader
such as otsstreamreader). Here the increment comes from the
LakeTable change-data feed (``LakeTable.changes`` — one net row per
changed key between two snapshots) and the apply is ONE JDBC
transaction that also advances the consumer watermark row, so the
RDBMS replica is exactly-once by the target's own ACID semantics
rather than by idempotent retries:

* crash BEFORE the transaction: stage tables may linger (they are
  rewritten with overwrite on the next run); target and watermark
  untouched.
* crash INSIDE the transaction: rollback — target and watermark
  untouched, the next run re-reads the same feed window.
* crash AFTER commit: the watermark row already points at the new
  source version, so the next run is a no-op for that window.

Scale: the stage writes are executor-parallel Spark JDBC writes (the
reference's channel-parallel INSERT batches); the feed itself is
bucket-pruned from the manifests, so a small epoch against a 10^10-row
table stages O(changed keys). The driver-side swap is set-wise SQL on
the target (DELETE .. WHERE EXISTS / INSERT .. SELECT), which the
database executes as bulk operations — the same contract as the staged
upsert in ``sinks.writers`` (set-wise REPLACE INTO).

Additive schema evolution flows through: payload columns that appear
on the source mid-stream are ALTER TABLE ADD COLUMN'd on the target
inside the same apply transaction (old rows read NULL, matching the
lake's union_by_name semantics). Types come from
``p["evolveColumnTypes"]`` when given, else a conservative Spark-type
mapping.

If the replica's consumed snapshot has been retired by
``expire_snapshots`` on the source (the incremental window is gone),
the sync falls back to a REPAIR: stage the full current snapshot and
swap the whole table inside one transaction — O(table) but convergent,
including deletes that happened in the lost window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import LakeTable
from datax_spark.sinks.writers import _q, jdbc_execute


@dataclass
class JdbcSyncResult:
    synced_to: int  # source version the target now reflects
    mode: str  # seed | incremental | repair | noop
    upserts: int
    deletes: int


# conservative Spark->ANSI mapping for ALTER TABLE ADD COLUMN when the
# caller gives no evolveColumnTypes entry; strings get a bounded
# VARCHAR because several dialects (Derby included) map unbounded
# text to non-comparable LOB types
_SQL_TYPE = {
    "string": "VARCHAR(4000)",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "byte": "SMALLINT",
    "double": "DOUBLE",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BLOB",
}


def _sql_type(f: T.StructField, overrides: dict[str, str]) -> str:
    if f.name in overrides:
        return overrides[f.name]
    s = f.dataType.simpleString()
    if s.startswith("decimal"):
        return s.upper()
    try:
        return _SQL_TYPE[s]
    except KeyError:
        raise ValueError(
            f"no SQL type mapping for evolved column {f.name}: {s}; "
            "pass evolveColumnTypes={'%s': '<SQL TYPE>'}" % f.name
        )


def _conn(spark, url: str, p: dict):
    jvm = spark._jvm
    if "driver" in p:
        # make sure the driver is registered before the first driver-
        # side connection (Spark's own JDBC path does this lazily)
        jvm.java.lang.Class.forName(p["driver"])
    props = jvm.java.util.Properties()
    for k in ("user", "password"):
        if k in p:
            props.setProperty(k, str(p[k]))
    return jvm.java.sql.DriverManager.getConnection(url, props)


def _query_scalar(spark, url: str, sql: str, p: dict):
    """Driver-side scalar SELECT (watermark / stage counts)."""
    conn = _conn(spark, url, p)
    try:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            return rs.getLong(1) if rs.next() else None
        finally:
            st.close()
    finally:
        conn.close()


def _target_columns(spark, url: str, table: str, p: dict) -> list[str] | None:
    """Live column names of the target table via JDBC metadata (None
    if the table does not exist). Spark's JDBC writer creates tables
    from an unquoted dbtable (dialect case-folds it — Derby uppercases)
    but QUOTES the columns, so column case is preserved exactly."""
    conn = _conn(spark, url, p)
    try:
        rs = conn.getMetaData().getColumns(None, None, table.upper(), None)
        cols = []
        while rs.next():
            cols.append(rs.getString("COLUMN_NAME"))
        return cols or None
    finally:
        conn.close()


def _split_col_types(ddl: str) -> list[tuple[str, str]]:
    """Parse a Spark createTableColumnTypes DDL string into
    (column, type) pairs, paren-aware so DECIMAL(10,2) survives."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    out = []
    for part in parts:
        part = part.strip()
        if not part:
            continue
        name, _, typ = part.partition(" ")
        out.append((name.strip().strip('"'), typ.strip()))
    return out


def _filter_col_types(ddl: str | None, cols: list[str]) -> str | None:
    """Restrict a createTableColumnTypes string to the given columns —
    a stage table carrying only the key columns must not mention
    payload columns Spark would fail to find."""
    if not ddl:
        return None
    kept = [
        f"{name} {typ}" for name, typ in _split_col_types(ddl) if name in cols
    ]
    return ", ".join(kept) or None


def _stage_write(df: DataFrame, url: str, table: str, p: dict) -> None:
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("overwrite")
    )
    for k in ("user", "password", "driver", "batchsize"):
        if k in p:
            w = w.option(k, p[k])
    ctt = _filter_col_types(p.get("createTableColumnTypes"), df.columns)
    if ctt:
        w = w.option("createTableColumnTypes", ctt)
    w.save()


def jdbc_sync(
    source: LakeTable,
    p: dict,
    to_version: int | str | None = None,
) -> JdbcSyncResult:
    """Bring the JDBC table ``p["table"]`` at ``p["url"]`` up to the
    source lake table's ``to_version`` (default: current snapshot).

    First call seeds the target with the full snapshot and creates the
    one-row watermark table ``<table>_dx_sync``; later calls apply only
    the change feed between the watermarked source version and
    ``to_version``, as one transaction that also advances the
    watermark. ``p`` additionally accepts user / password / driver /
    batchsize / createTableColumnTypes (applied to the seed and stage
    writes, filtered per table) and evolveColumnTypes (SQL types for
    ALTER TABLE ADD COLUMN on additive source evolution).
    """
    spark = source.spark
    url, table = p["url"], p["table"]
    wm_table = f"{table}_dx_sync"
    ups_table = f"{table}_dx_ups"
    del_table = f"{table}_dx_del"
    sm = source.manifest(to_version)
    head = int(sm.version)
    keys = sm.key_cols
    data_cols = [f.name for f in sm.schema.fields]

    wm = _query_scalar(
        spark, url, f'SELECT "synced_version" FROM {wm_table}', p
    ) if _target_columns(spark, url, wm_table, p) else None

    if wm is None:
        # Seed: full snapshot, executor-parallel overwrite write (this
        # both creates and fills the target), then create+fill the
        # watermark table in one transaction. A crash in between just
        # re-seeds on the next run (overwrite is idempotent).
        snap = source.read(version=head)
        _stage_write(snap, url, table, p)
        n = _query_scalar(spark, url, f"SELECT COUNT(*) FROM {table}", p)
        jdbc_execute(
            spark, url,
            [
                f'CREATE TABLE {wm_table} ("synced_version" BIGINT)',
                f"INSERT INTO {wm_table} VALUES ({head})",
            ],
            table, p, transactional=True,
        )
        return JdbcSyncResult(head, "seed", int(n or 0), 0)

    wm = int(wm)
    if wm == head:
        return JdbcSyncResult(head, "noop", 0, 0)
    if wm > head:
        raise ValueError(
            f"JDBC target {table} is at source v{wm}, ahead of requested "
            f"v{head} (re-seed by dropping {table} and {wm_table})"
        )

    # additive schema evolution: columns on the source the target lacks
    live = _target_columns(spark, url, table, p) or []
    overrides = p.get("evolveColumnTypes", {})
    alters = [
        f"ALTER TABLE {table} ADD COLUMN {_q(f.name)} {_sql_type(f, overrides)}"
        for f in sm.schema.fields
        if f.name not in live
    ]

    try:
        feed = source.changes(wm, head)
        mode = "incremental"
    except FileNotFoundError:
        feed = None
        mode = "repair"

    if mode == "incremental":
        _stage_write(
            feed.filter(F.col("_change_type") != "delete").select(*data_cols),
            url, ups_table, p,
        )
        _stage_write(
            feed.filter(F.col("_change_type") == "delete").select(*keys),
            url, del_table, p,
        )
        n_ups = int(_query_scalar(spark, url, f"SELECT COUNT(*) FROM {ups_table}", p) or 0)
        n_del = int(_query_scalar(spark, url, f"SELECT COUNT(*) FROM {del_table}", p) or 0)
        on_ups = " AND ".join(f"{ups_table}.{_q(k)} = {table}.{_q(k)}" for k in keys)
        on_del = " AND ".join(f"{del_table}.{_q(k)} = {table}.{_q(k)}" for k in keys)
        cols = ", ".join(_q(c) for c in data_cols)
        jdbc_execute(
            spark, url,
            [
                *alters,
                f"DELETE FROM {table} WHERE EXISTS "
                f"(SELECT 1 FROM {del_table} WHERE {on_del})",
                f"DELETE FROM {table} WHERE EXISTS "
                f"(SELECT 1 FROM {ups_table} WHERE {on_ups})",
                f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {ups_table}",
                f'UPDATE {wm_table} SET "synced_version" = {head}',
                f"DROP TABLE {ups_table}",
                f"DROP TABLE {del_table}",
            ],
            table, p, transactional=True,
        )
        return JdbcSyncResult(head, mode, n_ups, n_del)

    # repair: the incremental window was expired on the source — stage
    # the full snapshot and swap the whole table atomically
    _stage_write(source.read(version=head).select(*data_cols), url, ups_table, p)
    n_ups = int(_query_scalar(spark, url, f"SELECT COUNT(*) FROM {ups_table}", p) or 0)
    cols = ", ".join(_q(c) for c in data_cols)
    jdbc_execute(
        spark, url,
        [
            *alters,
            f"DELETE FROM {table}",
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {ups_table}",
            f'UPDATE {wm_table} SET "synced_version" = {head}',
            f"DROP TABLE {ups_table}",
        ],
        table, p, transactional=True,
    )
    return JdbcSyncResult(head, "repair", n_ups, 0)
