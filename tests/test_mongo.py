"""mongodbreader/writer against an in-process fake mongod speaking the
real wire protocol (OP_MSG + BSON over TCP).

The fake implements the commands the plugins use — ``find``/
``getMore`` cursors, ``collStats``, ``splitVector``, ``insert``,
``update`` (upsert) — enough to drive the reference flow end to end:
ObjectId probe, splitVector split with skip/limit fallback, range
filters AND-combined with the user query, dotted document paths,
array splitter joins, and ReplaceOne-upsert writes.

The BSON codec is anchored against the byte vectors from the BSON
spec examples before the fake uses it on both sides.
"""

from __future__ import annotations

import datetime as dt
import socket
import struct
import threading

import pytest

from datax_spark.sources.mongo import (
    MongoCommandError,
    MongoWire,
    ObjectId,
    bson_decode,
    bson_encode,
    mongo_read,
    mongo_split_ranges,
    mongo_write,
)
from datax_spark.sinks.writers import write_sink
from datax_spark.sources.readers import read_source


# ------------------------------------------------------------- fake mongod

class FakeMongod:
    def __init__(self, deny_split_vector: bool = False,
                 users: dict[str, str] | None = None,
                 bad_server_sig: bool = False):
        self.colls: dict[tuple, list[dict]] = {}
        self.lock = threading.Lock()
        self.cursors: dict[int, list[dict]] = {}
        self._cur = 0
        self._conv = 0
        self.deny_split_vector = deny_split_vector
        self.users = users or {}
        self.bad_server_sig = bad_server_sig
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._accepting = True
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while self._accepting:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def close(self):
        self._accepting = False
        self.srv.close()

    # ---- request handling

    def _serve(self, conn: socket.socket):
        state: dict = {}  # per-connection auth/conversation state
        with conn:
            while True:
                try:
                    hdr = self._recv_exact(conn, 16)
                except ConnectionError:
                    return
                mlen, req_id, _, opcode = struct.unpack("<iiii", hdr)
                rest = self._recv_exact(conn, mlen - 16)
                assert opcode == 2013 and rest[4] == 0
                cmd, _ = bson_decode(rest, 5)
                reply = self.handle(cmd, state)
                body = bson_encode(reply)
                payload = struct.pack("<i", 0) + b"\x00" + body
                conn.sendall(
                    struct.pack("<iiii", 16 + len(payload), 1, req_id, 2013)
                    + payload
                )

    @staticmethod
    def _recv_exact(conn, n):
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("eof")
            buf += chunk
        return buf

    # ---- command implementations

    @staticmethod
    def _matches(doc: dict, flt: dict) -> bool:
        for k, cond in flt.items():
            if k == "$and":
                if not all(FakeMongod._matches(doc, c) for c in cond):
                    return False
                continue
            v = doc.get(k)
            if isinstance(cond, dict) and any(op.startswith("$") for op in cond):
                for op, bound in cond.items():
                    key_v = v.raw if isinstance(v, ObjectId) else v
                    key_b = bound.raw if isinstance(bound, ObjectId) else bound
                    if key_v is None:
                        return False
                    if op == "$gte" and not key_v >= key_b:
                        return False
                    if op == "$lt" and not key_v < key_b:
                        return False
                    if op == "$gt" and not key_v > key_b:
                        return False
                    if op == "$lte" and not key_v <= key_b:
                        return False
            else:
                if v != cond:
                    return False
        return True

    # ---- SCRAM-SHA-256 verifier (RFC 7677 server side)

    def _sasl_start(self, cmd: dict, state: dict) -> dict:
        import base64
        import hashlib
        import os

        payload = bytes(cmd["payload"]).decode()
        if not payload.startswith("n,,") or cmd.get("mechanism") != "SCRAM-SHA-256":
            return {"ok": 0.0, "code": 18, "errmsg": "authentication failed"}
        bare = payload[3:]
        attrs = dict(kv.split("=", 1) for kv in bare.split(","))
        user = attrs["n"].replace("=2C", ",").replace("=3D", "=")
        if user not in self.users:
            return {"ok": 0.0, "code": 18, "errmsg": "authentication failed"}
        snonce = attrs["r"] + base64.b64encode(os.urandom(12)).decode()
        salt = os.urandom(16)
        iters = 4096
        server_first = (
            f"r={snonce},s={base64.b64encode(salt).decode()},i={iters}"
        )
        with self.lock:
            self._conv += 1
            conv = self._conv
        state["scram"] = {
            "bare": bare,
            "server_first": server_first,
            "salted": hashlib.pbkdf2_hmac(
                "sha256", self.users[user].encode(), salt, iters
            ),
            "nonce": snonce,
        }
        state["conv"] = conv
        return {"ok": 1.0, "conversationId": conv, "done": False,
                "payload": server_first.encode()}

    def _sasl_continue(self, cmd: dict, state: dict) -> dict:
        import base64
        import hashlib
        import hmac

        sc = state.get("scram")
        if sc is None or cmd.get("conversationId") != state.get("conv"):
            return {"ok": 0.0, "code": 18, "errmsg": "no SASL conversation"}
        payload = bytes(cmd["payload"]).decode()
        if not payload:  # optional empty final exchange
            return {"ok": 1.0, "conversationId": state["conv"],
                    "done": True, "payload": b""}
        attrs = dict(kv.split("=", 1) for kv in payload.split(","))
        without_proof = payload[: payload.rindex(",p=")]
        auth_msg = (
            f"{sc['bare']},{sc['server_first']},{without_proof}".encode()
        )
        client_key = hmac.new(sc["salted"], b"Client Key", hashlib.sha256).digest()
        stored = hashlib.sha256(client_key).digest()
        sig = hmac.new(stored, auth_msg, hashlib.sha256).digest()
        expected = bytes(a ^ b for a, b in zip(client_key, sig))
        if attrs["r"] != sc["nonce"] or base64.b64decode(attrs["p"]) != expected:
            return {"ok": 0.0, "code": 18, "errmsg": "authentication failed"}
        server_key = hmac.new(sc["salted"], b"Server Key", hashlib.sha256).digest()
        v = base64.b64encode(
            hmac.new(server_key, auth_msg, hashlib.sha256).digest()
        ).decode()
        if self.bad_server_sig:
            v = base64.b64encode(b"\x00" * 32).decode()
        state["authed"] = True
        return {"ok": 1.0, "conversationId": state["conv"], "done": True,
                "payload": f"v={v}".encode()}

    def handle(self, cmd: dict, state: dict | None = None) -> dict:
        state = {"authed": True} if state is None else state
        if "saslStart" in cmd:
            return self._sasl_start(cmd, state)
        if "saslContinue" in cmd:
            return self._sasl_continue(cmd, state)
        if self.users and not state.get("authed"):
            return {"ok": 0.0, "code": 13,
                    "errmsg": "command requires authentication"}
        db = cmd.get("$db", "test")
        with self.lock:
            if "find" in cmd:
                coll = self.colls.get((db, cmd["find"]), [])
                docs = [d for d in coll if self._matches(d, cmd.get("filter", {}))]
                if cmd.get("sort"):
                    ((k, direction),) = list(cmd["sort"].items())
                    docs = sorted(
                        docs,
                        key=lambda d: d[k].raw if isinstance(d[k], ObjectId) else d[k],
                        reverse=direction < 0,
                    )
                if cmd.get("skip"):
                    docs = docs[int(cmd["skip"]) :]
                if cmd.get("limit"):
                    docs = docs[: int(cmd["limit"])]
                if cmd.get("projection"):
                    keep = [k for k, v in cmd["projection"].items() if v]
                    docs = [{k: d.get(k) for k in keep} for d in docs]
                bs = int(cmd.get("batchSize", 101))
                first, rest = docs[:bs], docs[bs:]
                cur_id = 0
                if rest:
                    self._cur += 1
                    cur_id = self._cur
                    self.cursors[cur_id] = rest
                return {"cursor": {"firstBatch": first, "id": cur_id,
                                   "ns": f"{db}.{cmd['find']}"}, "ok": 1.0}
            if "getMore" in cmd:
                cur_id = cmd["getMore"]
                pending = self.cursors.get(cur_id, [])
                bs = int(cmd.get("batchSize", 101))
                batch, rest = pending[:bs], pending[bs:]
                if rest:
                    self.cursors[cur_id] = rest
                    nxt = cur_id
                else:
                    self.cursors.pop(cur_id, None)
                    nxt = 0
                return {"cursor": {"nextBatch": batch, "id": nxt,
                                   "ns": f"{db}.{cmd['collection']}"}, "ok": 1.0}
            if "collStats" in cmd:
                coll = self.colls.get((db, cmd["collStats"]), [])
                return {"count": len(coll), "avgObjSize": 64, "ok": 1.0}
            if "splitVector" in cmd:
                if self.deny_split_vector:
                    return {"ok": 0.0, "code": 13, "errmsg": "Unauthorized"}
                ns = cmd["splitVector"]
                db2, coll_name = ns.split(".", 1)
                coll = self.colls.get((db2, coll_name), [])
                ids = sorted(
                    (d["_id"].raw if isinstance(d["_id"], ObjectId) else d["_id"])
                    for d in coll
                )
                if cmd.get("force") and "maxChunkSize" not in cmd:
                    # privilege probe / median split: single midpoint
                    pts = [ids[len(ids) // 2]] if ids else []
                else:
                    n = int(cmd.get("maxSplitPoints", 3))
                    step = max(1, len(ids) // (n + 1))
                    pts = [ids[i] for i in range(step, len(ids), step)][:n]
                keys = [
                    {"_id": ObjectId(x) if isinstance(x, bytes) else x}
                    for x in pts
                ]
                return {"splitKeys": keys, "ok": 1.0}
            if "insert" in cmd:
                coll = self.colls.setdefault((db, cmd["insert"]), [])
                coll.extend(cmd.get("documents", []))
                return {"n": len(cmd.get("documents", [])), "ok": 1.0}
            if "update" in cmd:
                coll = self.colls.setdefault((db, cmd["update"]), [])
                n = 0
                for u in cmd.get("updates", []):
                    q, doc = u["q"], u["u"]
                    hit = next((d for d in coll if self._matches(d, q)), None)
                    if hit is not None:
                        coll[coll.index(hit)] = {**doc}
                    elif u.get("upsert"):
                        coll.append({**q, **doc})
                    n += 1
                return {"n": n, "ok": 1.0}
            return {"ok": 0.0, "code": 59, "errmsg": "no such command"}


@pytest.fixture()
def mongod():
    srv = FakeMongod()
    yield srv
    srv.close()


def _oid(n: int) -> ObjectId:
    return ObjectId(n.to_bytes(12, "big"))


def _seed(srv: FakeMongod, n: int = 40):
    docs = []
    for i in range(n):
        docs.append(
            {
                "_id": _oid(i + 1),
                "repo": f"r{i % 4}",
                "stars": i,
                "score": i / 2.0,
                "active": i % 2 == 0,
                "tags": [f"t{i}", f"u{i}"],
                "meta": {"owner": {"name": f"dev{i}"}},
            }
        )
    srv.colls[("code", "repos")] = docs
    return docs


# ------------------------------------------------------------- unit: BSON

def test_bson_spec_vectors():
    # the two canonical examples from bsonspec.org
    assert bson_encode({"hello": "world"}) == (
        b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00"
    )
    assert bson_encode({"BSON": ["awesome", 5.05, 1986]}) == (
        b"1\x00\x00\x00\x04BSON\x00&\x00\x00\x00\x020\x00\x08\x00\x00\x00"
        b"awesome\x00\x011\x00333333\x14@\x102\x00\xc2\x07\x00\x00\x00\x00"
    )


def test_bson_roundtrip_all_types():
    doc = {
        "oid": _oid(7),
        "s": "héllo",
        "i32": 5,
        "i64": 2**40,
        "f": 2.5,
        "b": True,
        "none": None,
        "dt": dt.datetime(2024, 3, 5, 10, 0, 0, tzinfo=dt.timezone.utc),
        "arr": [1, "x", False],
        "nested": {"a": {"b": 3}},
        "bin": b"\x00\x01\xff",
    }
    got, end = bson_decode(bson_encode(doc))
    assert end == len(bson_encode(doc))
    assert got == doc


# ------------------------------------------------------------- unit: split

def test_split_ranges_split_vector(mongod):
    _seed(mongod)
    w = MongoWire("127.0.0.1", mongod.port)
    try:
        ranges, is_oid = mongo_split_ranges(w, "code", "repos", 4)
    finally:
        w.close()
    assert is_oid is True
    assert ranges[0][0] == "min" and ranges[-1][1] == "max"
    assert len(ranges) >= 2
    # interior bounds chain: each range's hi == next range's lo
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi == lo


def test_split_ranges_skip_limit_fallback():
    srv = FakeMongod(deny_split_vector=True)
    try:
        _seed(srv)
        w = MongoWire("127.0.0.1", srv.port)
        try:
            ranges, is_oid = mongo_split_ranges(w, "code", "repos", 4)
        finally:
            w.close()
        assert is_oid and len(ranges) == 4  # 3 sampled points + min/max ends
    finally:
        srv.close()


READ_COLS = [
    {"name": "repo", "type": "string"},
    {"name": "stars", "type": "long"},
    {"name": "score", "type": "double"},
    {"name": "active", "type": "bool"},
    {"name": "tags", "type": "array", "splitter": ","},
    {"name": "meta.owner.name", "type": "document"},
]


def _read_conf(mongod, **kw):
    base = {
        "address": [f"127.0.0.1:{mongod.port}"],
        "dbName": "code",
        "collectionName": "repos",
        "column": READ_COLS,
        "parallelism": 4,
    }
    base.update(kw)
    return base


# ------------------------------------------------------------- e2e read

def test_read_all_rows_typed(spark, mongod):
    docs = _seed(mongod)
    got = mongo_read(spark, _read_conf(mongod)).orderBy("stars")
    rows = [tuple(r) for r in got.collect()]
    assert len(rows) == len(docs)
    assert rows[0] == ("r0", 0, 0.0, True, "t0,u0", "dev0")
    assert rows[7] == ("r3", 7, 3.5, False, "t7,u7", "dev7")
    # ranges must partition: no dup, no loss
    assert len({r[1] for r in rows}) == len(docs)


def test_read_with_user_query_and(spark, mongod):
    _seed(mongod)
    got = mongo_read(
        spark, _read_conf(mongod, query='{"repo": "r2"}')
    )
    rows = got.collect()
    assert {r["repo"] for r in rows} == {"r2"}
    assert len(rows) == 10


def test_read_cursor_paging(spark, mongod):
    _seed(mongod)
    got = mongo_read(
        spark, _read_conf(mongod, parallelism=1, batchSize=7)
    )
    assert got.count() == 40  # find + multiple getMore round-trips


def test_read_empty_collection(spark, mongod):
    mongod.colls[("code", "repos")] = []
    got = mongo_read(spark, _read_conf(mongod))
    assert got.count() == 0


# ------------------------------------------------------------- e2e write

def test_write_insert_and_replace_upsert(spark, mongod):
    df = spark.createDataFrame(
        [("a", 1, "x,y"), ("b", 2, "z")],
        "k string, n long, tags string",
    )
    conf = {
        "address": [f"127.0.0.1:{mongod.port}"],
        "dbName": "code",
        "collectionName": "out",
        "column": [
            {"name": "k"}, {"name": "n"},
            {"name": "tags", "type": "array", "splitter": ","},
        ],
    }
    assert mongo_write(df, conf) == {"written": 2, "dirty": 0}
    with mongod.lock:
        docs = {d["k"]: d for d in mongod.colls[("code", "out")]}
    assert docs["a"]["n"] == 1 and docs["a"]["tags"] == ["x", "y"]

    # replace-upsert: existing key overwritten, new key inserted
    df2 = spark.createDataFrame(
        [("a", 10, "p"), ("c", 3, "q")], "k string, n long, tags string"
    )
    conf2 = {**conf, "writeMode": {"isReplace": "true", "replaceKey": "k"}}
    assert mongo_write(df2, conf2) == {"written": 2, "dirty": 0}
    with mongod.lock:
        docs = {d["k"]: d for d in mongod.colls[("code", "out")]}
    assert len(docs) == 3
    assert docs["a"]["n"] == 10 and docs["c"]["n"] == 3


def test_write_read_roundtrip_through_wire(spark, mongod):
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(25)], "k string, n long"
    ).coalesce(3)
    conf = {
        "address": [f"127.0.0.1:{mongod.port}"],
        "dbName": "code",
        "collectionName": "rt",
        "column": [{"name": "k"}, {"name": "n"}],
    }
    mongo_write(df, conf)
    # non-ObjectId _id-less docs: read back with parallelism 1
    got = read_source(
        spark, "mongodbreader",
        {**conf, "parallelism": 1,
         "column": [{"name": "k", "type": "string"},
                    {"name": "n", "type": "long"}]},
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        (f"k{i}", i) for i in range(25)
    )


def test_dispatch_and_guards(spark, mongod):
    _seed(mongod)
    df = read_source(spark, "mongodbreader", _read_conf(mongod, parallelism=2))
    assert df.count() == 40
    small = spark.createDataFrame([("x", 1)], "k string, n long")
    # auth is SCRAM now: credentials against a server with no such
    # user fail the handshake loudly (executor-side, Spark-wrapped)
    with pytest.raises(Exception, match="authentication failed"):
        write_sink(small, "mongodbwriter", {
            "address": [f"127.0.0.1:{mongod.port}"], "dbName": "d",
            "collectionName": "c", "userName": "u", "userPassword": "p",
        })
    with pytest.raises(ValueError, match="replaceKey"):
        mongo_write(small, {
            "address": [f"127.0.0.1:{mongod.port}"], "dbName": "d",
            "collectionName": "c", "column": [{"name": "k"}, {"name": "n"}],
            "writeMode": {"isReplace": "true"},
        })
    # the splitter guard fires executor-side; Spark surfaces it as a
    # PythonException wrapping the ValueError text
    with pytest.raises(Exception, match="splitter"):
        mongo_read(spark, _read_conf(
            mongod, column=[{"name": "tags", "type": "array"}]
        )).collect()


# ------------------------------------------------------ SCRAM-SHA-256 auth


def test_scram_auth_end_to_end_read(spark):
    """Server demands auth (code 13 unauthenticated); SCRAM-SHA-256
    over saslStart/saslContinue authenticates the planner AND every
    executor connection; the read comes back complete."""
    srv = FakeMongod(users={"app": "s3cret"})
    try:
        docs = _seed(srv)
        conf = _read_conf(srv, userName="app", userPassword="s3cret")
        got = mongo_read(spark, conf)
        assert got.count() == len(docs)
    finally:
        srv.close()


def test_scram_unauthenticated_rejected():
    srv = FakeMongod(users={"app": "s3cret"})
    try:
        _seed(srv)
        w = MongoWire("127.0.0.1", srv.port)
        try:
            with pytest.raises(MongoCommandError) as ei:
                w.ok_command("code", {"find": "repos", "filter": {}})
            assert ei.value.code == 13
            # same connection works after authenticating
            w.authenticate("app", "s3cret")
            assert w.ok_command("code", {"find": "repos", "filter": {},
                                         "batchSize": 5})["cursor"]["firstBatch"]
        finally:
            w.close()
    finally:
        srv.close()


def test_scram_wrong_password_fails():
    srv = FakeMongod(users={"app": "s3cret"})
    try:
        w = MongoWire("127.0.0.1", srv.port)
        try:
            with pytest.raises(MongoCommandError) as ei:
                w.authenticate("app", "wrong")
            assert ei.value.code == 18
            with pytest.raises(MongoCommandError):
                w.authenticate("ghost", "s3cret")
        finally:
            w.close()
    finally:
        srv.close()


def test_scram_client_verifies_server_signature():
    """A server that accepts the proof but cannot produce the right
    ServerSignature (doesn't actually know the credentials) must be
    rejected CLIENT-side."""
    srv = FakeMongod(users={"app": "s3cret"}, bad_server_sig=True)
    try:
        w = MongoWire("127.0.0.1", srv.port)
        try:
            with pytest.raises(IOError, match="server signature"):
                w.authenticate("app", "s3cret")
        finally:
            w.close()
    finally:
        srv.close()


def test_scram_non_ascii_password_refused():
    srv = FakeMongod(users={"app": "s3cret"})
    try:
        w = MongoWire("127.0.0.1", srv.port)
        try:
            with pytest.raises(NotImplementedError, match="SASLprep"):
                w.authenticate("app", "päss")
        finally:
            w.close()
    finally:
        srv.close()


def test_mongo_auth_config_validation():
    from datax_spark.sources.mongo import _creds

    assert _creds({}) is None
    assert _creds({"userName": "u", "userPassword": "p"}) == ("u", "p", "admin")
    assert _creds({"userName": "u", "userPassword": "p", "authDb": "code"}) == (
        "u", "p", "code")
    with pytest.raises(ValueError, match="BOTH"):
        _creds({"userName": "u"})
