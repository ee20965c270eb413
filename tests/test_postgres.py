"""PG-family writer/reader (adbpgwriter, hologresjdbcwriter,
postgresqlreader/writer) against an in-process fake speaking the real
frontend/backend protocol v3 over TCP: startup + MD5 auth, the
simple-query cycle (RowDescription/DataRow/CommandComplete/
ReadyForQuery), the COPY IN sub-protocol, ErrorResponse.

The fake evaluates exactly the statement shapes the plugins emit —
schema probes, min/max splitPk probes, ranged SELECTs, multi-row
INSERT ... ON CONFLICT DO NOTHING / DO UPDATE SET (the hologres
IGNORE/UPDATE/REPLACE forms), COPY ... FROM STDIN, TRUNCATE."""

from __future__ import annotations

import datetime as dt
import hashlib
import re
import socket
import struct
import threading

import pytest

from datax_spark.sinks.writers import write_sink
from datax_spark.sources.postgres import (
    PgConnection,
    PgError,
    copy_escape,
    copy_unescape,
    oid_to_spark_type,
    pg_read,
    pg_write,
    sql_literal,
)
from datax_spark.sources.readers import read_source

OIDS = {"long": 20, "int": 23, "double": 701, "string": 25,
        "boolean": 16, "date": 1082, "timestamp": 1114}


def _tokenize_values(s: str):
    """Parse `(lit, lit), (lit, ...)` into python tuples."""
    rows, cur, i = [], [], 0
    while i < len(s):
        c = s[i]
        if c in " ,\n":
            i += 1
        elif c == "(":
            cur = []
            i += 1
        elif c == ")":
            rows.append(tuple(cur))
            i += 1
        elif c == "'":
            j = i + 1
            out = []
            while True:
                if s[j] == "'":
                    if j + 1 < len(s) and s[j + 1] == "'":
                        out.append("'")
                        j += 2
                    else:
                        break
                else:
                    out.append(s[j])
                    j += 1
            cur.append("".join(out))
            i = j + 1
        else:
            m = re.match(r"[-+0-9.eE]+|NULL|TRUE|FALSE", s[i:])
            tok = m.group(0)
            if tok == "NULL":
                cur.append(None)
            elif tok in ("TRUE", "FALSE"):
                cur.append(tok == "TRUE")
            elif re.fullmatch(r"[-+]?\d+", tok):
                cur.append(int(tok))
            else:
                cur.append(float(tok))
            i += len(tok)
    return rows


class FakePg:
    def __init__(self, users: dict[str, str] | None = None,
                 auth: str = "md5"):
        self.auth = auth
        # table -> {"cols": [(name, sparktype)], "pk": [names], "rows": {pk: dict}}
        self.tables: dict[str, dict] = {}
        self.users = users or {}
        self.lock = threading.Lock()
        self.queries: list[str] = []
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._accepting = True
        threading.Thread(target=self._accept, daemon=True).start()

    def create_table(self, name, cols, pk):
        with self.lock:
            self.tables[name] = {"cols": list(cols), "pk": list(pk), "rows": {}}

    def rows(self, name):
        with self.lock:
            return sorted(
                self.tables[name]["rows"].values(),
                key=lambda r: tuple(
                    (v is None, v) for v in
                    (r[k] for k, _ in self.tables[name]["cols"])
                ),
            )

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

    def _msg(self, t: bytes, body: bytes = b"") -> bytes:
        return t + struct.pack(">i", len(body) + 4) + body

    def _scram_auth(self, conn, user: str) -> bool:
        """Server side of RFC 7677: DEMANDS SCRAM-SHA-256 — an
        md5-only client cannot pass this fake."""
        import base64
        import hmac as hmac_mod
        import os as os_mod

        expect_pwd = self.users.get(user)
        conn.sendall(self._msg(
            b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\x00\x00"))
        t = self._recv_exact(conn, 1)
        (m,) = struct.unpack(">i", self._recv_exact(conn, 4))
        body = self._recv_exact(conn, m - 4)
        assert t == b"p"
        z = body.index(b"\x00")
        assert body[:z] == b"SCRAM-SHA-256"
        (ln,) = struct.unpack_from(">i", body, z + 1)
        client_first = body[z + 5 : z + 5 + ln].decode()
        assert client_first.startswith("n,,")
        bare = client_first[3:]
        cattrs = dict(kv.split("=", 1) for kv in bare.split(","))
        cnonce = cattrs["r"]
        salt = b"scram-salt-0123"
        iters = 4096
        snonce = cnonce + base64.b64encode(os_mod.urandom(9)).decode()
        server_first = (f"r={snonce},s={base64.b64encode(salt).decode()},"
                        f"i={iters}")
        conn.sendall(self._msg(
            b"R", struct.pack(">i", 11) + server_first.encode()))
        t = self._recv_exact(conn, 1)
        (m,) = struct.unpack(">i", self._recv_exact(conn, 4))
        final = self._recv_exact(conn, m - 4).decode()
        assert t == b"p"
        fattrs = dict(kv.split("=", 1) for kv in final.split(","))
        assert fattrs["c"] == "biws" and fattrs["r"] == snonce
        proof = base64.b64decode(fattrs["p"])
        salted = hashlib.pbkdf2_hmac(
            "sha256", (expect_pwd or "").encode(), salt, iters)
        client_key = hmac_mod.new(
            salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = final.rsplit(",p=", 1)[0]
        auth_msg = f"{bare},{server_first},{without_proof}".encode()
        client_sig = hmac_mod.new(
            stored_key, auth_msg, hashlib.sha256).digest()
        recovered = bytes(a ^ b for a, b in zip(proof, client_sig))
        if expect_pwd is None or hashlib.sha256(
                recovered).digest() != stored_key:
            conn.sendall(self._msg(
                b"E", b"SFATAL\x00C28P01\x00M"
                b"password authentication failed\x00\x00"))
            return False
        server_key = hmac_mod.new(
            salted, b"Server Key", hashlib.sha256).digest()
        server_sig = hmac_mod.new(
            server_key, auth_msg, hashlib.sha256).digest()
        conn.sendall(self._msg(
            b"R", struct.pack(">i", 12)
            + b"v=" + base64.b64encode(server_sig)))
        return True

    def _serve(self, conn):
        try:
            with conn:
                (n,) = struct.unpack(">i", self._recv_exact(conn, 4))
                startup = self._recv_exact(conn, n - 4)
                (proto,) = struct.unpack_from(">i", startup, 0)
                assert proto == 196608
                kv = startup[4:].decode().split("\x00")
                params = dict(zip(kv[0::2], kv[1::2]))
                user = params.get("user", "")
                if self.users and self.auth == "scram":
                    if not self._scram_auth(conn, user):
                        return
                elif self.users:
                    salt = b"ab12"
                    conn.sendall(self._msg(b"R", struct.pack(">i", 5) + salt))
                    t = self._recv_exact(conn, 1)
                    (m,) = struct.unpack(">i", self._recv_exact(conn, 4))
                    pwd_msg = self._recv_exact(conn, m - 4)
                    assert t == b"p"
                    given = pwd_msg.rstrip(b"\x00").decode()
                    expect_pwd = self.users.get(user)
                    inner = hashlib.md5(
                        (expect_pwd or "").encode() + user.encode()
                    ).hexdigest()
                    expect = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
                    if expect_pwd is None or given != expect:
                        conn.sendall(self._msg(
                            b"E", b"SFATAL\x00C28P01\x00M"
                            b"password authentication failed\x00\x00"))
                        return
                conn.sendall(self._msg(b"R", struct.pack(">i", 0)))
                conn.sendall(self._msg(b"Z", b"I"))
                while True:
                    t = self._recv_exact(conn, 1)
                    (m,) = struct.unpack(">i", self._recv_exact(conn, 4))
                    body = self._recv_exact(conn, m - 4)
                    if t == b"X":
                        return
                    if t != b"Q":
                        continue
                    sql = body.rstrip(b"\x00").decode()
                    try:
                        self._run(conn, sql)
                    except Exception as e:
                        conn.sendall(self._msg(
                            b"E",
                            b"SERROR\x00C42601\x00M" + str(e).encode() + b"\x00\x00",
                        ))
                        conn.sendall(self._msg(b"Z", b"I"))
        except (ConnectionError, OSError):
            return

    # ---- constrained SQL evaluation

    def _row_desc(self, cols):
        out = struct.pack(">h", len(cols))
        for name, oid in cols:
            out += name.encode() + b"\x00"
            out += struct.pack(">ihihih", 0, 0, oid, -1, -1, 0)
        return self._msg(b"T", out)

    def _data_rows(self, conn, rows):
        for row in rows:
            out = struct.pack(">h", len(row))
            for v in row:
                if v is None:
                    out += struct.pack(">i", -1)
                else:
                    b = v.encode() if isinstance(v, str) else str(v).encode()
                    out += struct.pack(">i", len(b)) + b
            conn.sendall(self._msg(b"D", out))

    def _render(self, v):
        if v is None:
            return None
        if isinstance(v, bool):
            return "t" if v else "f"
        return str(v)

    def _eval_cond(self, cond, row):
        cond = cond.strip()
        m = re.fullmatch(r"\((.*)\) AND \((.*)\)", cond)
        if m:
            return self._eval_cond(m.group(1), row) and self._eval_cond(m.group(2), row)
        parts = re.split(r"\s+AND\s+", cond)
        if len(parts) > 1:
            return all(self._eval_cond(p, row) for p in parts)
        if cond in ("1 = 1", "1 = 0"):
            return cond == "1 = 1"
        m = re.fullmatch(r"(\w+) IS NULL", cond)
        if m:
            return row.get(m.group(1)) is None
        m = re.fullmatch(r"(\w+)\s*(>=|<=|<|>|=)\s*(-?\d+)", cond)
        if m:
            v = row.get(m.group(1))
            if v is None:
                return False
            val = int(m.group(3))
            return {">=": v >= val, "<=": v <= val, "<": v < val,
                    ">": v > val, "=": v == val}[m.group(2)]
        raise ValueError(f"fake: unsupported condition {cond!r}")

    def _run(self, conn, sql):
        with self.lock:
            self.queries.append(sql)
            q = sql.strip().rstrip(";")
            m = re.fullmatch(r"TRUNCATE TABLE (\w+)", q)
            if m:
                self.tables[m.group(1)]["rows"] = {}
                conn.sendall(self._msg(b"C", b"TRUNCATE TABLE\x00"))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            if q.startswith("ANALYZE"):
                conn.sendall(self._msg(b"C", b"ANALYZE\x00"))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            m = re.fullmatch(r"COPY (\w+) \(([^)]*)\) FROM STDIN", q)
            if m:
                t = self.tables[m.group(1)]
                cols = [c.strip() for c in m.group(2).split(",")]
                conn.sendall(self._msg(
                    b"G", struct.pack(">bh", 0, len(cols))
                    + struct.pack(f">{len(cols)}h", *([0] * len(cols)))))
                data = b""
                while True:
                    mt = self._recv_exact(conn, 1)
                    (ln,) = struct.unpack(">i", self._recv_exact(conn, 4))
                    b = self._recv_exact(conn, ln - 4)
                    if mt == b"d":
                        data += b
                    elif mt == b"c":
                        break
                    elif mt == b"f":
                        raise ValueError("copy failed by client")
                n = 0
                types = dict(t["cols"])
                for line in data.decode().split("\n"):
                    if not line:
                        continue
                    vals = [copy_unescape(x) for x in line.split("\t")]
                    rec = {}
                    for c, v in zip(cols, vals):
                        rec[c] = self._typed(types[c], v)
                    self._upsert(t, rec, on_conflict=None)
                    n += 1
                conn.sendall(self._msg(b"C", f"COPY {n}\x00".encode()))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            m = re.fullmatch(
                r"INSERT INTO (\w+) \(([^)]*)\) VALUES (.+?)"
                r"(?: ON CONFLICT \(([^)]*)\) (DO NOTHING|DO UPDATE SET .+))?",
                q, re.S)
            if m:
                t = self.tables[m.group(1)]
                cols = [c.strip() for c in m.group(2).split(",")]
                rows = _tokenize_values(m.group(3))
                conflict = m.group(5)
                n = 0
                for vals in rows:
                    rec = dict(zip(cols, vals))
                    n += self._upsert(t, rec, on_conflict=conflict)
                conn.sendall(self._msg(b"C", f"INSERT 0 {n}\x00".encode()))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            m = re.fullmatch(
                r"SELECT min\((\w+)\), max\((\w+)\) FROM (\w+)(?: WHERE (.+))?", q)
            if m:
                t = self.tables[m.group(3)]
                rows = list(t["rows"].values())
                if m.group(4):
                    rows = [r for r in rows if self._eval_cond(m.group(4), r)]
                vals = [r[m.group(1)] for r in rows if r[m.group(1)] is not None]
                cols = [("min", 20), ("max", 20)]
                conn.sendall(self._row_desc(cols))
                self._data_rows(conn, [
                    [None, None] if not vals else [str(min(vals)), str(max(vals))]
                ])
                conn.sendall(self._msg(b"C", b"SELECT 1\x00"))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            m = re.fullmatch(r"SELECT (.+) FROM (\w+) WHERE (.+)", q, re.S)
            if m:
                t = self.tables[m.group(2)]
                types = dict(t["cols"])
                cols = [c.strip() for c in m.group(1).split(",")]
                desc = [(c, OIDS[types[c]]) for c in cols]
                conn.sendall(self._row_desc(desc))
                n = 0
                for r in t["rows"].values():
                    if self._eval_cond(m.group(3), r):
                        self._data_rows(conn, [[self._render(r[c]) for c in cols]])
                        n += 1
                conn.sendall(self._msg(b"C", f"SELECT {n}\x00".encode()))
                conn.sendall(self._msg(b"Z", b"I"))
                return
            raise ValueError(f"fake: unsupported query {q!r}")

    def _typed(self, spark_type, v):
        if v is None:
            return None
        if spark_type in ("int", "long"):
            return int(v)
        if spark_type == "double":
            return float(v)
        if spark_type == "boolean":
            return v in ("t", "true", "1", True)
        return v

    def _upsert(self, t, rec, on_conflict):
        for c, _ in t["cols"]:
            rec.setdefault(c, None)
        key = tuple(rec[k] for k in t["pk"])
        if key in t["rows"] and on_conflict is not None:
            if on_conflict == "DO NOTHING":
                return 0
            # DO UPDATE SET c = EXCLUDED.c, ... -> full-row replace of
            # the named columns
            for part in on_conflict[len("DO UPDATE SET "):].split(","):
                c, src = part.split("=")
                c = c.strip()
                assert src.strip() == f"EXCLUDED.{c}"
                t["rows"][key][c] = rec[c]
            return 1
        t["rows"][key] = dict(rec)
        return 1


COLS = [("id", "long"), ("repo", "string"), ("score", "double"),
        ("active", "boolean"), ("day", "date"), ("at", "timestamp")]


@pytest.fixture()
def pg():
    srv = FakePg()
    srv.create_table("events", COLS, pk=["id"])
    yield srv
    srv.close()


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, repo string, score double, active boolean, "
              "day date, at timestamp")


ROWS = [
    (1, "r/a", 1.5, True, dt.date(2024, 1, 1), dt.datetime(2024, 1, 1, 8, 0, 0)),
    (2, "tab\there", 2.0, False, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 9, 0, 0)),
    (3, "nl\nthere", None, None, None, None),
]


# ----------------------------------------------------------------- units


def test_copy_escape_roundtrip():
    for v in ["x", "a\tb", "c\nd", "e\\f", "mix\t\n\\"]:
        assert copy_unescape(copy_escape(v)) == v
    assert copy_escape(None) == "\\N" and copy_unescape("\\N") is None
    assert copy_escape(True) == "t"
    assert sql_literal("it's") == "'it''s'"
    assert sql_literal(None) == "NULL" and sql_literal(2.5) == "2.5"
    # timestamp(n) fidelity: fractional seconds survive both renderers
    us = dt.datetime(2024, 3, 4, 5, 6, 7, 123456)
    assert copy_escape(us) == "2024-03-04 05:06:07.123456"
    assert sql_literal(us) == "'2024-03-04 05:06:07.123456'"
    assert copy_escape(dt.datetime(2024, 3, 4)) == "2024-03-04 00:00:00"
    assert oid_to_spark_type(1114) == "timestamp"
    with pytest.raises(ValueError):
        oid_to_spark_type(600)  # point


# ------------------------------------------------------------------- e2e


def test_copy_write_and_read_roundtrip(spark, pg):
    out = write_sink(_df(spark, ROWS), "adbpgwriter", {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": [c for c, _ in COLS], "batchSize": 2,
    })
    assert out == {"written": 3, "dirty": 0}
    got = pg.rows("events")
    assert got[1]["repo"] == "tab\there" and got[2]["repo"] == "nl\nthere"
    assert got[2]["score"] is None
    back = read_source(spark, "postgresqlreader", {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": [c for c, _ in COLS], "splitPk": "id", "parallelism": 2,
    })
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 3
    assert rows[2]["repo"] == "tab\there" and rows[2]["active"] is False
    assert rows[1]["day"] == dt.date(2024, 1, 1)
    assert rows[1]["at"] == dt.datetime(2024, 1, 1, 8, 0, 0)
    assert back.schema["score"].dataType.simpleString() == "double"


def test_microsecond_timestamp_roundtrip(spark, pg):
    ts = dt.datetime(2024, 3, 4, 5, 6, 7, 123456)
    write_sink(_df(spark, [(9, "micro", 1.0, True, dt.date(2024, 3, 4), ts)]),
               "adbpgwriter", {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": [c for c, _ in COLS],
    })
    assert pg.rows("events")[0]["at"] == "2024-03-04 05:06:07.123456"
    back = read_source(spark, "postgresqlreader", {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": [c for c, _ in COLS],
    })
    assert back.collect()[0]["at"] == ts


def test_hologres_write_modes(spark, pg):
    base = {"host": "127.0.0.1", "port": pg.port, "table": "events",
            "column": [c for c, _ in COLS], "conflictKeys": ["id"]}
    pg_write(_df(spark, ROWS), base)  # seed via COPY
    updated = [(2, "UPDATED", 9.9, True, dt.date(2024, 2, 2),
                dt.datetime(2024, 2, 2, 2, 2, 2)),
               (4, "new", 4.0, True, dt.date(2024, 2, 4),
                dt.datetime(2024, 2, 4, 4, 4, 4))]
    # IGNORE: existing row keeps its values, new row lands
    write_sink(_df(spark, updated), "hologresjdbcwriter",
               {**base, "writeMode": "ignore"})
    rows = {r["id"]: r for r in pg.rows("events")}
    assert rows[2]["repo"] == "tab\there" and rows[4]["repo"] == "new"
    # REPLACE (the default hologres mode): full-row upsert
    write_sink(_df(spark, updated), "hologresjdbcwriter",
               {**base, "writeMode": "replace"})
    rows = {r["id"]: r for r in pg.rows("events")}
    assert rows[2]["repo"] == "UPDATED" and rows[2]["score"] == 9.9
    assert len(rows) == 4
    with pytest.raises(ValueError, match="conflictKeys"):
        pg_write(_df(spark, ROWS), {**base, "conflictKeys": [],
                                    "writeMode": "update"})


def test_pre_post_sql_and_null_bucket(spark, pg):
    pg_write(_df(spark, ROWS), {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": [c for c, _ in COLS],
        "preSql": "TRUNCATE TABLE events", "postSql": ["ANALYZE events"],
    })
    assert pg.queries[0] == "TRUNCATE TABLE events"
    assert pg.queries[-1] == "ANALYZE events"
    # NULL-pk row lands in the NULL bucket exactly once on read
    with pg.lock:
        pg.tables["events"]["rows"][(None,)] = {
            "id": None, "repo": "orphan", "score": 0.0, "active": True,
            "day": None, "at": None,
        }
    got = pg_read(spark, {
        "host": "127.0.0.1", "port": pg.port, "table": "events",
        "column": ["id", "repo"], "splitPk": "id", "parallelism": 3,
    }).collect()
    assert sorted(r["repo"] for r in got if r["id"] is None) == ["orphan"]
    assert len(got) == 4
    assert any("id IS NULL" in qq for qq in pg.queries)


def test_md5_auth(spark):
    srv = FakePg(users={"app": "s3cret"})
    srv.create_table("t", [("id", "long")], pk=["id"])
    try:
        with pytest.raises(PgError, match="authentication failed"):
            PgConnection("127.0.0.1", srv.port, "app", "db", password="wrong")
        with pytest.raises(ValueError, match="password"):
            PgConnection("127.0.0.1", srv.port, "app", "db")
        ok = PgConnection("127.0.0.1", srv.port, "app", "db", password="s3cret")
        ok.close()
        pg_write(_df(spark, ROWS).select("id"), {
            "host": "127.0.0.1", "port": srv.port, "table": "t",
            "column": ["id"], "username": "app", "password": "s3cret",
        })
        assert len(srv.rows("t")) == 3
    finally:
        srv.close()


def test_scram_sha256_auth(spark):
    """A server that DEMANDS SCRAM-SHA-256 (modern PG's default
    password_encryption): full RFC 7677 round-trip incl. server
    signature verification; wrong password and missing user fail."""
    srv = FakePg(users={"app": "s3cret"}, auth="scram")
    srv.create_table("t", [("id", "long")], pk=["id"])
    try:
        with pytest.raises(PgError, match="authentication failed"):
            PgConnection("127.0.0.1", srv.port, "app", "db",
                         password="wrong")
        with pytest.raises(PgError, match="authentication failed"):
            PgConnection("127.0.0.1", srv.port, "ghost", "db",
                         password="s3cret")
        ok = PgConnection("127.0.0.1", srv.port, "app", "db",
                          password="s3cret")
        ok.close()
        # full writer path over a SCRAM-authenticated connection
        pg_write(_df(spark, ROWS).select("id"), {
            "host": "127.0.0.1", "port": srv.port, "table": "t",
            "column": ["id"], "username": "app", "password": "s3cret",
        })
        assert len(srv.rows("t")) == 3
    finally:
        srv.close()


def test_scram_plus_only_refused():
    """Channel-binding-only servers are refused loudly (no TLS)."""
    import socket as socket_mod
    import threading as threading_mod

    lsock = socket_mod.create_server(("127.0.0.1", 0))
    port = lsock.getsockname()[1]

    def serve():
        conn, _ = lsock.accept()
        with conn:
            hdr = conn.recv(4)
            (n,) = struct.unpack(">i", hdr)
            conn.recv(n - 4)
            body = struct.pack(">i", 10) + b"SCRAM-SHA-256-PLUS\x00\x00"
            conn.sendall(b"R" + struct.pack(">i", len(body) + 4) + body)

    threading_mod.Thread(target=serve, daemon=True).start()
    try:
        with pytest.raises(NotImplementedError, match="SCRAM-SHA-256"):
            PgConnection("127.0.0.1", port, "app", "db", password="x")
    finally:
        lsock.close()


def test_server_error_surfaces(pg):
    c = PgConnection("127.0.0.1", pg.port, "u", "db")
    try:
        with pytest.raises(PgError, match="unsupported query"):
            c.query("DROP TABLE events")
        # the connection stays usable after an error cycle
        cols, rows, _ = c.query("SELECT id FROM events WHERE 1 = 0")
        assert [n for n, _ in cols] == ["id"] and rows == []
    finally:
        c.close()
