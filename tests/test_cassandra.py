"""cassandrareader/writer against an in-process fake speaking the real
CQL native protocol v4 frames over TCP: STARTUP→READY, QUERY with
paging (page size + paging state), BATCH (UNLOGGED), RESULT Rows with
typed option-id metadata, ERROR frames.

The fake evaluates exactly the statement shapes the plugins emit —
system.local partitioner, system_schema.columns metadata, token-range
SELECTs, INSERTs — and "tokens" rows with its own deterministic int64
hash (the client never computes tokens, it only divides the ring, so
any server-side token function exercises the split correctly).
"""

from __future__ import annotations

import hashlib
import re
import socket
import struct
import threading
from datetime import datetime, timezone

import pytest

from datax_spark.sources.cassandra import (
    CqlConnection,
    CqlError,
    build_select,
    cassandra_read,
    cassandra_write,
    token_slices,
)
from datax_spark.sinks.writers import write_sink
from datax_spark.sources.readers import read_source

TYPE_IDS = {"varchar": 0x0D, "bigint": 0x02, "int": 0x09, "double": 0x07,
            "boolean": 0x04, "timestamp": 0x0B}


def _enc_cell(type_id: int, v) -> bytes | None:
    if v is None:
        return None
    if type_id in (0x0D, 0x01):
        return str(v).encode("utf-8")
    if type_id == 0x02:
        return struct.pack(">q", int(v))
    if type_id == 0x09:
        return struct.pack(">i", int(v))
    if type_id == 0x07:
        return struct.pack(">d", float(v))
    if type_id == 0x04:
        return b"\x01" if v else b"\x00"
    if type_id == 0x0B:
        return struct.pack(">q", int(v.timestamp() * 1000))
    raise ValueError(f"fake cannot encode type 0x{type_id:02x}")


def _token64(values: tuple) -> int:
    h = hashlib.sha1("|".join(str(v) for v in values).encode()).digest()
    return struct.unpack(">q", h[:8])[0]


class FakeCassandra:
    def __init__(self, users: dict[str, str] | None = None):
        # (ks, table) -> {"pks": [...], "cols": {name: type_id}, "rows": [dict]}
        self.tables: dict[tuple, dict] = {}
        self.users = users or {}
        self.lock = threading.Lock()
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._accepting = True
        threading.Thread(target=self._accept, daemon=True).start()

    def create_table(self, ks, table, pks, cols):
        with self.lock:
            self.tables[(ks, table)] = {"pks": pks, "cols": cols, "rows": []}

    def close(self):
        self._accepting = False
        self.srv.close()

    def _accept(self):
        while self._accepting:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    @staticmethod
    def _recv_exact(conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        return buf

    def _serve(self, conn):
        state: dict = {}  # per-connection auth state
        with conn:
            while True:
                try:
                    hdr = self._recv_exact(conn, 9)
                except ConnectionError:
                    return
                ver, _, stream, opcode, blen = struct.unpack(">BBhBi", hdr)
                body = self._recv_exact(conn, blen) if blen else b""
                try:
                    rop, rbody = self.handle(opcode, body, state)
                except Exception as e:  # surface as a server ERROR frame
                    rop = 0x00
                    msg = str(e).encode()
                    rbody = struct.pack(">i", 0x2200) + struct.pack(">H", len(msg)) + msg
                conn.sendall(
                    struct.pack(">BBhBi", 0x84, 0, stream, rop, len(rbody)) + rbody
                )

    # ---- frame handlers

    def handle(self, opcode, body, state=None):
        state = {"authed": True} if state is None else state
        if opcode == 0x01:  # STARTUP
            if self.users:
                auth = "org.apache.cassandra.auth.PasswordAuthenticator"
                b = auth.encode()
                return 0x03, struct.pack(">H", len(b)) + b  # AUTHENTICATE
            state["authed"] = True
            return 0x02, b""
        if opcode == 0x0F:  # AUTH_RESPONSE: SASL PLAIN \0user\0password
            n = struct.unpack_from(">i", body, 0)[0]
            token = body[4 : 4 + max(n, 0)]
            parts = token.split(b"\x00")
            if (
                len(parts) == 3
                and self.users.get(parts[1].decode()) == parts[2].decode()
            ):
                state["authed"] = True
                return 0x10, struct.pack(">i", -1)  # AUTH_SUCCESS, null token
            raise ValueError("Provided username/password are incorrect")
        if self.users and not state.get("authed"):
            raise ValueError("You have not logged in")
        if opcode == 0x07:  # QUERY
            n = struct.unpack_from(">i", body, 0)[0]
            cql = body[4 : 4 + n].decode("utf-8")
            i = 4 + n + 2  # skip consistency
            flags = body[i]
            i += 1
            page_size = None
            offset = 0
            if flags & 0x04:
                page_size = struct.unpack_from(">i", body, i)[0]
                i += 4
            if flags & 0x08:
                m = struct.unpack_from(">i", body, i)[0]
                offset = int(body[i + 4 : i + 4 + m].decode())
                i += 4 + m
            return self.run_query(cql, page_size, offset)
        if opcode == 0x0D:  # BATCH
            _, count = struct.unpack_from(">BH", body, 0)
            i = 3
            for _ in range(count):
                assert body[i] == 0
                n = struct.unpack_from(">i", body, i + 1)[0]
                cql = body[i + 5 : i + 5 + n].decode("utf-8")
                self.run_query(cql, None, 0)
                i += 5 + n + 2
            return 0x08, struct.pack(">i", 1)  # Void
        raise ValueError(f"fake: unsupported opcode 0x{opcode:02x}")

    # ---- constrained CQL evaluation (only the shapes the plugins emit)

    def run_query(self, cql, page_size, offset):
        cql = cql.strip().rstrip(";")
        if re.fullmatch(r"SELECT partitioner FROM system\.local", cql):
            return self._rows(
                [("partitioner", 0x0D)],
                [["org.apache.cassandra.dht.Murmur3Partitioner"]],
                page_size, offset,
            )
        m = re.fullmatch(
            r"SELECT column_name, kind, position FROM system_schema\.columns "
            r"WHERE keyspace_name = '(\w+)' AND table_name = '(\w+)'", cql)
        if m:
            t = self.tables.get((m.group(1), m.group(2)))
            rows = []
            if t:
                for j, pk in enumerate(t["pks"]):
                    rows.append([pk, "partition_key", j])
                for c in t["cols"]:
                    if c not in t["pks"]:
                        rows.append([c, "regular", -1])
            return self._rows(
                [("column_name", 0x0D), ("kind", 0x0D), ("position", 0x09)],
                rows, page_size, offset,
            )
        m = re.fullmatch(r"INSERT INTO (\w+)\.(\w+) \(([^)]*)\) VALUES \((.*)\)", cql)
        if m:
            t = self.tables[(m.group(1), m.group(2))]
            names = [c.strip() for c in m.group(3).split(",")]
            vals = self._parse_literals(m.group(4))
            doc = dict(zip(names, vals))
            with self.lock:
                key = tuple(doc.get(pk) for pk in t["pks"])
                t["rows"] = [
                    r for r in t["rows"]
                    if tuple(r.get(pk) for pk in t["pks"]) != key
                ] + [doc]  # upsert semantics
            return 0x08, struct.pack(">i", 1)
        m = re.fullmatch(r"SELECT ([\w,]+) FROM (\w+)\.(\w+)(?: where (.*?))?"
                         r"( ALLOW FILTERING)?", cql)
        if m:
            cols_req = m.group(1).split(",")
            t = self.tables[(m.group(2), m.group(3))]
            rows = list(t["rows"])
            cond = m.group(4)
            if cond:
                for clause in cond.split(" AND "):
                    tm = re.fullmatch(r"token\(([\w,]+)\) (>|<=) (-?\d+)", clause)
                    if tm:
                        pks = tm.group(1).split(",")
                        bound = int(tm.group(3))
                        if tm.group(2) == ">":
                            rows = [r for r in rows
                                    if _token64(tuple(r[k] for k in pks)) > bound]
                        else:
                            rows = [r for r in rows
                                    if _token64(tuple(r[k] for k in pks)) <= bound]
                        continue
                    em = re.fullmatch(r"(\w+) = '([^']*)'", clause)
                    if em:
                        rows = [r for r in rows if r.get(em.group(1)) == em.group(2)]
                        continue
                    raise ValueError(f"fake: unsupported clause {clause!r}")
            col_meta = [(c, t["cols"][c]) for c in cols_req]
            out = [[r.get(c) for c in cols_req] for r in rows]
            return self._rows(col_meta, out, page_size, offset)
        raise ValueError(f"fake: unsupported CQL {cql!r}")

    @staticmethod
    def _parse_literals(s: str) -> list:
        out: list = []
        i = 0
        while i < len(s):
            if s[i] == "'":
                j = i + 1
                buf = []
                while True:
                    if s[j] == "'" and j + 1 < len(s) and s[j + 1] == "'":
                        buf.append("'")
                        j += 2
                    elif s[j] == "'":
                        break
                    else:
                        buf.append(s[j])
                        j += 1
                out.append("".join(buf))
                i = j + 1
            else:
                j = s.find(",", i)
                tok = (s[i:j] if j != -1 else s[i:]).strip()
                if tok:
                    if tok == "null":
                        out.append(None)
                    elif tok in ("true", "false"):
                        out.append(tok == "true")
                    elif re.fullmatch(r"-?\d+", tok):
                        out.append(int(tok))
                    else:
                        out.append(float(tok))
                i = (j if j != -1 else len(s))
            if i < len(s) and s[i] == ",":
                i += 1
            while i < len(s) and s[i] == " ":
                i += 1
        return out

    def _rows(self, col_meta, rows, page_size, offset):
        page = rows[offset : offset + page_size] if page_size else rows[offset:]
        more = page_size is not None and offset + len(page) < len(rows)
        flags = 0x0001 | (0x0002 if more else 0)
        body = struct.pack(">iii", 2, flags, len(col_meta))
        if more:
            state = str(offset + len(page)).encode()
            body += struct.pack(">i", len(state)) + state
        body += struct.pack(">H", 2) + b"ks" + struct.pack(">H", 1) + b"t"
        for name, tid in col_meta:
            nb = name.encode()
            body += struct.pack(">H", len(nb)) + nb + struct.pack(">H", tid)
        body += struct.pack(">i", len(page))
        for r in page:
            for j, (_, tid) in enumerate(col_meta):
                cell = _enc_cell(tid, r[j])
                if cell is None:
                    body += struct.pack(">i", -1)
                else:
                    body += struct.pack(">i", len(cell)) + cell
        return 0x08, body


@pytest.fixture()
def cass():
    srv = FakeCassandra()
    srv.create_table(
        "code", "repos",
        pks=["repo"],
        cols={"repo": 0x0D, "path": 0x0D, "stars": 0x02, "score": 0x07,
              "active": 0x04, "updated": 0x0B},
    )
    yield srv
    srv.close()


def _seed(cass, n=24):
    t = cass.tables[("code", "repos")]
    for i in range(n):
        t["rows"].append({
            "repo": f"r{i}", "path": f"p{i}.py", "stars": i,
            "score": i / 4.0, "active": i % 2 == 0,
            "updated": datetime(2024, 1, 1 + i % 28, tzinfo=timezone.utc),
        })


READ_CONF_COLS = ["repo", "path", "stars", "score", "active", "updated"]


def _conf(cass, **kw):
    base = {
        "host": "127.0.0.1", "port": cass.port,
        "keyspace": "code", "table": "repos",
        "column": READ_CONF_COLS, "parallelism": 4,
    }
    base.update(kw)
    return base


# ----------------------------------------------------------------- units

def test_token_slices_cover_ring():
    sl = token_slices("org.apache.cassandra.dht.Murmur3Partitioner", 4)
    assert sl[0][0] == -(2**63) and sl[-1][1] == 2**63 - 1
    for (_, hi), (lo, _) in zip(sl, sl[1:]):
        assert hi == lo  # contiguous: (lo, hi] slices partition the ring
    assert token_slices("unknown.Partitioner", 4) == []
    big = token_slices("org.apache.cassandra.dht.RandomPartitioner", 3)
    assert big[0][0] == -1 and big[-1][1] == 2**127


def test_build_select_shapes():
    q = build_select("ks.t", ["a", "b"], ["a"], -10, 10, None, False)
    assert q == "SELECT a,b FROM ks.t where token(a) > -10 AND token(a) <= 10;"
    q2 = build_select("ks.t", ["a"], ["a", "c"], None, None, "b = 'x'", True)
    assert q2 == "SELECT a FROM ks.t where b = 'x' ALLOW FILTERING;"


def test_protocol_error_frame(cass):
    conn = CqlConnection("127.0.0.1", cass.port)
    try:
        with pytest.raises(CqlError, match="unsupported CQL"):
            conn.query("DROP TABLE code.repos")
    finally:
        conn.close()


# ----------------------------------------------------------------- e2e

def test_read_token_split_covers_all_rows(spark, cass):
    _seed(cass)
    got = cassandra_read(spark, _conf(cass)).orderBy("stars")
    rows = [tuple(r) for r in got.collect()]
    assert len(rows) == 24  # 4 token slices, no dup, no loss
    assert rows[0][0] == "r0" and rows[0][2] == 0
    assert rows[3][3] == 0.75 and rows[3][4] is False
    # Spark returns session-local (UTC) naive datetimes
    assert rows[1][5] == datetime(2024, 1, 2)


def test_read_paging_and_user_where(spark, cass):
    _seed(cass)
    got = cassandra_read(spark, _conf(
        cass, pageSize=5, where="repo = 'r7'", allowFiltering=True,
        parallelism=2,
    ))
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["repo"] == "r7"
    # token( in the user where disables splitting (single task)
    got2 = cassandra_read(spark, _conf(
        cass, where="token(repo) > -9223372036854775808", parallelism=8,
    ))
    assert got2.count() == 24


def test_write_insert_upsert_roundtrip(spark, cass):
    df = spark.createDataFrame(
        [("a", "x.py", 5, 1.5, True),
         ("b", "y.py", 9, 2.5, False)],
        "repo string, path string, stars long, score double, active boolean",
    ).coalesce(2)
    conf = {"host": "127.0.0.1", "port": cass.port, "keyspace": "code",
            "table": "repos", "batchSize": 2}
    assert write_sink(df, "cassandrawriter", conf) == {"written": 2, "dirty": 0}
    # upsert: same partition key overwrites (Cassandra LWW semantics)
    df2 = spark.createDataFrame(
        [("a", "z.py", 50, 0.5, False)],
        "repo string, path string, stars long, score double, active boolean",
    )
    write_sink(df2, "cassandrawriter", conf)
    with cass.lock:
        rows = {r["repo"]: r for r in cass.tables[("code", "repos")]["rows"]}
    assert len(rows) == 2
    assert rows["a"]["stars"] == 50 and rows["a"]["path"] == "z.py"
    assert rows["b"]["stars"] == 9

    back = read_source(spark, "cassandrareader", _conf(cass, parallelism=2))
    assert {tuple(r)[:3] for r in back.collect()} == {
        ("a", "z.py", 50), ("b", "y.py", 9)
    }


def test_string_escaping_roundtrip(spark, cass):
    df = spark.createDataFrame(
        [("it's", "a,'b'", 1, 0.0, True)],
        "repo string, path string, stars long, score double, active boolean",
    )
    conf = {"host": "127.0.0.1", "port": cass.port, "keyspace": "code",
            "table": "repos"}
    cassandra_write(df, conf)
    with cass.lock:
        r = cass.tables[("code", "repos")]["rows"][0]
    assert r["repo"] == "it's" and r["path"] == "a,'b'"


def test_guards(spark, cass):
    # credentials against a server that never asks for auth are simply
    # unused (mirrors the real driver); missing host still fails
    assert cassandra_read(
        spark, _conf(cass, username="u", password="p")).count() == 0
    with pytest.raises(ValueError, match="host"):
        cassandra_write(
            spark.createDataFrame([("x",)], "a string"),
            {"keyspace": "k", "table": "t"},
        )


# --------------------------------------------------- PLAIN password auth


@pytest.fixture()
def authed_cass():
    srv = FakeCassandra(users={"app": "s3cret"})
    srv.create_table(
        "code", "repos",
        pks=["repo"],
        cols={"repo": 0x0D, "path": 0x0D, "stars": 0x02, "score": 0x07,
              "active": 0x04, "updated": 0x0B},
    )
    yield srv
    srv.close()


def test_auth_read_end_to_end(spark, authed_cass):
    """AUTHENTICATE→AUTH_RESPONSE(SASL PLAIN)→AUTH_SUCCESS on the
    planner AND every executor connection; token-sliced read complete."""
    _seed(authed_cass)
    got = cassandra_read(
        spark, _conf(authed_cass, username="app", password="s3cret"))
    assert got.count() == 24


def test_auth_write_end_to_end(spark, authed_cass):
    df = spark.createDataFrame([("rA", "x.py")], "repo string, path string")
    cassandra_write(df, {
        "host": "127.0.0.1", "port": authed_cass.port,
        "keyspace": "code", "table": "repos",
        "column": ["repo", "path"],
        "username": "app", "password": "s3cret",
    })
    with authed_cass.lock:
        assert authed_cass.tables[("code", "repos")]["rows"][0]["repo"] == "rA"


def test_auth_missing_or_wrong_credentials(spark, authed_cass):
    from datax_spark.sources.cassandra import CqlConnection, CqlError

    with pytest.raises(ValueError, match="requires authentication"):
        CqlConnection("127.0.0.1", authed_cass.port)
    with pytest.raises(CqlError, match="incorrect"):
        CqlConnection("127.0.0.1", authed_cass.port,
                      username="app", password="wrong")
    # unauthenticated commands on an auth-required server are refused
    # (the fake enforces login like a real coordinator)
    with pytest.raises(Exception, match="authentication|logged in"):
        cassandra_read(spark, _conf(authed_cass))
