"""GDB/Gremlin transport tests against an in-process fake Gremlin
Server speaking the real protocol: RFC 6455 websocket frames, mime-
prefixed GraphSON 1.0 request messages, 206-partial result frames."""

from __future__ import annotations

import base64
import hashlib
import json
import re
import socketserver
import struct
import threading

import pytest

from datax_spark.sources.gdb import (
    GremlinConnection,
    GremlinError,
    WebSocketClient,
    gdb_read,
    gdb_write,
)

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class FakeGremlinHandler(socketserver.BaseRequestHandler):
    def handle(self):
        try:
            self._handshake()
            while True:
                payload = self._recv_ws()
                if payload is None:
                    return
                mlen = payload[0]
                assert payload[1 : 1 + mlen] == b"application/json"
                msg = json.loads(payload[1 + mlen :].decode())
                users = getattr(self.server, "users", None)
                if msg["op"] == "authentication":
                    # PLAIN initial response \0user\0pwd (base64)
                    tok = base64.b64decode(msg["args"]["sasl"]).split(b"\x00")
                    ok = (
                        users and len(tok) == 3
                        and users.get(tok[1].decode()) == tok[2].decode()
                    )
                    if ok:
                        self._authed = True
                        pend = self._pending
                        self._pending = None
                        if pend is not None:
                            self._serve_eval(*pend)
                    else:
                        rid = (self._pending or (msg["requestId"], None))[0]
                        self._pending = None
                        self._send_json({
                            "requestId": rid,
                            "status": {"code": 401,
                                       "message": "Username and/or password are incorrect"},
                            "result": {"data": None, "meta": {}},
                        })
                    continue
                assert msg["op"] == "eval" and msg["processor"] == ""
                rid = msg["requestId"]
                if users and not getattr(self, "_authed", False):
                    self._pending = (rid, msg)
                    self._send_json({
                        "requestId": rid,
                        "status": {"code": 407, "message": "authenticate"},
                        "result": {"data": None, "meta": {}},
                    })
                    continue
                self._serve_eval(rid, msg)
        except (ConnectionError, OSError, AssertionError):
            pass

    _pending = None
    _authed = False

    def _serve_eval(self, rid, msg):
        try:
            data = self._eval(
                msg["args"]["gremlin"], msg["args"].get("bindings", {})
            )
            # exercise partial draining: first chunk as 206
            if isinstance(data, list) and len(data) > 2:
                self._send_json({
                    "requestId": rid,
                    "status": {"code": 206, "message": ""},
                    "result": {"data": data[:2], "meta": {}},
                })
                data = data[2:]
            self._send_json({
                "requestId": rid,
                "status": {"code": 200, "message": ""},
                "result": {"data": data, "meta": {}},
            })
        except _Dup as e:
            self._send_json({
                "requestId": rid,
                "status": {
                    "code": 500,
                    "message": f"GraphDuplicateIdException: {e}",
                },
                "result": {"data": None, "meta": {}},
            })

    # ---- websocket plumbing (server side)

    def _handshake(self):
        req = b""
        while b"\r\n\r\n" not in req:
            chunk = self.request.recv(4096)
            if not chunk:
                raise ConnectionError
            req += chunk
        key = ""
        for line in req.decode("latin-1").split("\r\n"):
            name, _, value = line.partition(":")
            if name.strip().lower() == "sec-websocket-key":
                key = value.strip()
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        self.request.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _recv_ws(self):
        hdr = self._recv_exact(2)
        if hdr is None:
            return None
        b0, b1 = struct.unpack(">BB", hdr)
        opcode = b0 & 0x0F
        n = b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._recv_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._recv_exact(8))
        assert b1 & 0x80, "client frames must be masked (RFC 6455)"
        mask = self._recv_exact(4)
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(self._recv_exact(n)))
        if opcode == 0x8:
            return None
        return data

    def _send_json(self, obj):
        payload = json.dumps(obj).encode()
        header = struct.pack(">B", 0x82)  # FIN + binary
        n = len(payload)
        if n < 126:
            header += struct.pack(">B", n)
        elif n < 1 << 16:
            header += struct.pack(">BH", 126, n)
        else:
            header += struct.pack(">BQ", 127, n)
        self.request.sendall(header + payload)

    # ---- the fixed DSL shapes the module emits

    def _eval(self, dsl, binds):
        srv = self.server
        m = re.fullmatch(r"g\.(V|E)\(\)\.groupCount\(\)\.by\(label\)", dsl)
        if m:
            store = srv.vertices if m.group(1) == "V" else srv.edges
            counts = {}
            for el in store.values():
                counts[el["label"]] = counts.get(el["label"], 0) + 1
            return [counts]
        m = re.fullmatch(
            r"g\.(V|E)\(\)\.hasLabel\(GDB___LABEL\)\.has\(id, "
            r"gt\(GDB___ID\)\)\.limit\(GDB___LIMIT\)\.id\(\)", dsl)
        if m:
            store = srv.vertices if m.group(1) == "V" else srv.edges
            ids = sorted(
                i for i, el in store.items()
                if el["label"] == binds["GDB___LABEL"] and i > binds["GDB___ID"]
            )
            return ids[: binds["GDB___LIMIT"]]
        m = re.fullmatch(
            r"g\.(V|E)\(\)\.hasLabel\(GDB___LABEL\)\.has\(id, "
            r"gte\(GDB___ID\)\)\.has\(id, lte\(GDB___ID_END\)\)(.*)", dsl)
        if m:
            vertex = m.group(1) == "V"
            store = srv.vertices if vertex else srv.edges
            projected = m.group(2)
            out = []
            for i in sorted(store):
                el = store[i]
                if el["label"] != binds["GDB___LABEL"]:
                    continue
                if not (binds["GDB___ID"] <= i <= binds["GDB___ID_END"]):
                    continue
                node = self._graphson(i, el, vertex)
                if projected:
                    pk_names = [
                        binds[b] for b in re.findall(r"GDB___PK\d+", projected)
                    ]
                    # propertyMap() with no keys returns every property
                    props = {
                        k: v for k, v in node.get("properties", {}).items()
                        if not pk_names or k in pk_names
                    }
                    out.append({"node": {k: v for k, v in node.items()
                                         if k != "properties"},
                                "props": props})
                else:
                    out.append(node)
            return out
        if dsl.startswith("g.addV(") or dsl.startswith("g.addE("):
            vertex = dsl.startswith("g.addV(")
            store = srv.vertices if vertex else srv.edges
            el_id = binds["GDB___id"]
            with srv.lock:
                if el_id in store:
                    raise _Dup(el_id)
                el = {"label": binds["GDB___label"], "props": {}}
                if not vertex:
                    el["from"] = binds["GDB___from"]
                    el["to"] = binds["GDB___to"]
                for pk in re.findall(r"GDB___PK\d+", dsl):
                    pv = pk.replace("PK", "PV")
                    el["props"].setdefault(binds[pk], []).append(binds[pv])
                store[el_id] = el
            return []
        m = re.fullmatch(r"g\.(V|E)\(GDB___id\)((?:\.property\(.*\))*)", dsl)
        if m:
            store = srv.vertices if m.group(1) == "V" else srv.edges
            el = store[binds["GDB___id"]]
            for pk in re.findall(r"GDB___PK\d+", dsl):
                el["props"][binds[pk]] = [binds[pk.replace("PK", "PV")]]
            return []
        raise AssertionError(f"fake server: unrecognized DSL {dsl!r}")

    def _graphson(self, el_id, el, vertex):
        srv = self.server
        if vertex:
            return {
                "id": el_id, "label": el["label"], "type": "vertex",
                "properties": {
                    k: [{"id": f"{el_id}|{k}|{j}", "value": v}
                        for j, v in enumerate(vals)]
                    for k, vals in el["props"].items()
                },
            }
        return {
            "id": el_id, "label": el["label"], "type": "edge",
            "outV": el["from"],
            "outVLabel": srv.vertices.get(el["from"], {}).get("label"),
            "inV": el["to"],
            "inVLabel": srv.vertices.get(el["to"], {}).get("label"),
            "properties": {k: vals[0] for k, vals in el["props"].items()},
        }


class _Dup(Exception):
    pass


class FakeGremlinServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, users: dict[str, str] | None = None):
        super().__init__(("127.0.0.1", 0), FakeGremlinHandler)
        self.vertices: dict[str, dict] = {}
        self.edges: dict[str, dict] = {}
        self.users = users  # None = open server; dict = SASL required
        self.lock = threading.Lock()
        threading.Thread(target=self.serve_forever, daemon=True).start()

    def add_vertex(self, vid, label, **props):
        self.vertices[vid] = {
            "label": label,
            "props": {k: v if isinstance(v, list) else [v]
                      for k, v in props.items()},
        }

    def add_edge(self, eid, label, frm, to, **props):
        self.edges[eid] = {
            "label": label, "from": frm, "to": to,
            "props": {k: [v] for k, v in props.items()},
        }

    def stop(self):
        self.shutdown()
        self.server_close()


@pytest.fixture()
def server():
    s = FakeGremlinServer()
    yield s
    s.stop()


def _addr(s):
    return {"host": s.server_address[0], "port": s.server_address[1]}


# ------------------------------------------------------------- transport

def test_websocket_handshake_and_submit(server):
    server.add_vertex("v1", "person", name="ann")
    server.add_vertex("v2", "person", name="bob")
    server.add_vertex("v3", "place", name="oslo")
    conn = GremlinConnection(**_addr(server))
    try:
        assert conn.submit("g.V().groupCount().by(label)") == [
            {"person": 2, "place": 1}
        ]
    finally:
        conn.close()


def test_partial_206_frames_are_drained(server):
    for i in range(7):
        server.add_vertex(f"v{i}", "n")
    conn = GremlinConnection(**_addr(server))
    try:
        ids = conn.submit(
            "g.V().hasLabel(GDB___LABEL).has(id, gt(GDB___ID))"
            ".limit(GDB___LIMIT).id()",
            {"GDB___LABEL": "n", "GDB___ID": "", "GDB___LIMIT": 100},
        )
        assert ids == [f"v{i}" for i in range(7)]  # 206 chunk + 200 tail
    finally:
        conn.close()


def test_sasl_auth_challenge_flow(spark):
    """r4: the Tinkerpop 407 challenge is answered with op=
    authentication (PLAIN \\0user\\0pwd), after which the pending eval
    resumes; wrong/missing credentials fail loudly on every path."""
    from datax_spark.sources.gdb import GremlinError

    s = FakeGremlinServer(users={"app": "s3cret"})
    try:
        s.add_vertex("p1", "person", name="ann", age=31)
        c = GremlinConnection(**_addr(s), username="app", password="s3cret")
        try:
            assert c.submit("g.V().groupCount().by(label)") == [{"person": 1}]
        finally:
            c.close()
        bad = GremlinConnection(**_addr(s), username="app", password="wrong")
        try:
            with pytest.raises(GremlinError, match="incorrect"):
                bad.submit("g.V().groupCount().by(label)")
        finally:
            bad.close()
        none = GremlinConnection(**_addr(s))
        try:
            with pytest.raises(GremlinError, match="no\\s+username/password"):
                none.submit("g.V().groupCount().by(label)")
        finally:
            none.close()
        # full authed read end-to-end (driver + executor connections)
        df = gdb_read(spark, {
            **_addr(s), "labelType": "VERTEX", "labels": ["person"],
            "username": "app", "password": "s3cret",
            "column": [
                {"name": "vid", "columnType": "primaryKey", "type": "string"},
                {"name": "name", "columnType": "vertexProperty", "type": "string"},
            ],
        })
        assert [(r["vid"], r["name"]) for r in df.collect()] == [("p1", "ann")]
    finally:
        s.stop()


# ------------------------------------------------------------------ read

def test_read_vertices_typed_props(server, spark):
    server.add_vertex("p1", "person", name="ann", age=31, score=1.5)
    server.add_vertex("p2", "person", name="bob", age=44)
    server.add_vertex("x1", "place", name="oslo")
    df = gdb_read(spark, {
        **_addr(server),
        "labelType": "VERTEX",
        "labels": ["person"],
        "column": [
            {"name": "vid", "columnType": "primaryKey", "type": "string"},
            {"name": "lbl", "columnType": "primaryLabel", "type": "string"},
            {"name": "name", "columnType": "vertexProperty", "type": "string"},
            {"name": "age", "columnType": "vertexProperty", "type": "long"},
            {"name": "score", "columnType": "vertexProperty", "type": "double"},
        ],
        "fetchBatchSize": 1,  # forces one range fetch per id
    })
    got = sorted(
        (r["vid"], r["lbl"], r["name"], r["age"], r["score"])
        for r in df.collect()
    )
    assert got == [("p1", "person", "ann", 31, 1.5),
                   ("p2", "person", "bob", 44, None)]


def test_read_discovers_labels_and_paginates(server, spark):
    for i in range(25):
        server.add_vertex(f"a{i:02d}", "alpha", n=i)
    for i in range(5):
        server.add_vertex(f"b{i}", "beta", n=i)
    df = gdb_read(spark, {
        **_addr(server),
        "labelType": "VERTEX",
        "column": [
            {"name": "vid", "columnType": "primaryKey", "type": "string"},
            {"name": "n", "columnType": "vertexProperty", "type": "long"},
        ],
        "RangeSplitSize": 8,  # multiple id pages per label
        "fetchBatchSize": 3,
    })
    assert df.rdd.getNumPartitions() == 2  # one task per label
    got = sorted(int(r["n"]) for r in df.collect())
    assert got == sorted(list(range(25)) + list(range(5)))


def test_read_edges_endpoints(server, spark):
    server.add_vertex("v1", "person")
    server.add_vertex("v2", "place")
    server.add_edge("e1", "visited", "v1", "v2", year=2024)
    df = gdb_read(spark, {
        **_addr(server),
        "labelType": "EDGE",
        "labels": ["visited"],
        "column": [
            {"name": "eid", "columnType": "primaryKey", "type": "string"},
            {"name": "src", "columnType": "srcPrimaryKey", "type": "string"},
            {"name": "srcl", "columnType": "srcPrimaryLabel", "type": "string"},
            {"name": "dst", "columnType": "dstPrimaryKey", "type": "string"},
            {"name": "dstl", "columnType": "dstPrimaryLabel", "type": "string"},
            {"name": "year", "columnType": "edgeProperty", "type": "long"},
        ],
    })
    assert [tuple(r) for r in df.collect()] == [
        ("e1", "v1", "person", "v2", "place", 2024)
    ]


def test_read_json_property_forms(server, spark):
    server.add_vertex("v1", "n", tag=["a", "b"], one="x")
    df = gdb_read(spark, {
        **_addr(server),
        "labelType": "VERTEX",
        "labels": ["n"],
        "column": [
            {"name": "j", "columnType": "vertexJsonProperty", "type": "string"},
        ],
    })
    j = json.loads(df.collect()[0]["j"])
    by_k = sorted(j["properties"], key=lambda e: (e["k"], e["v"]))
    assert by_k == [
        {"k": "one", "t": "string", "v": "x", "c": "single"},
        {"k": "tag", "t": "string", "v": "a", "c": "set"},
        {"k": "tag", "t": "string", "v": "b", "c": "set"},
    ]


# ----------------------------------------------------------------- write

def _people_df(spark):
    return spark.createDataFrame(
        [("p1", "person", "ann", 31), ("p2", "person", "bob", 44)],
        "vid string, lbl string, name string, age long",
    ).coalesce(1)


_W_COLS = [
    {"name": "vid", "columnType": "primaryKey"},
    {"name": "lbl", "columnType": "primaryLabel"},
    {"name": "name", "columnType": "vertexProperty"},
    {"name": "age", "columnType": "vertexProperty"},
]


def test_write_vertices_and_duplicate_modes(server, spark):
    df = _people_df(spark)
    base = {**_addr(server), "labelType": "VERTEX", "column": _W_COLS}
    assert gdb_write(df, {**base, "writeMode": "INSERT"}) == {
        "written": 2, "dirty": 0
    }
    assert server.vertices["p1"]["props"]["age"] == [31]

    # INSERT again: both ids duplicate -> dirty
    assert gdb_write(df, {**base, "writeMode": "INSERT"}) == {
        "written": 0, "dirty": 2
    }
    # SKIP: duplicates tolerated
    assert gdb_write(df, {**base, "writeMode": "SKIP"}) == {
        "written": 2, "dirty": 0
    }
    # MERGE: properties re-applied
    df2 = spark.createDataFrame(
        [("p1", "person", "ann-updated", 32)],
        "vid string, lbl string, name string, age long",
    )
    assert gdb_write(df2, {**base, "writeMode": "MERGE"}) == {
        "written": 1, "dirty": 0
    }
    assert server.vertices["p1"]["props"]["name"] == ["ann-updated"]
    assert server.vertices["p1"]["props"]["age"] == [32]


def test_write_edges_and_read_back(server, spark):
    server.add_vertex("v1", "person")
    server.add_vertex("v2", "place")
    edges = spark.createDataFrame(
        [("e1", "visited", "v1", "v2", 2024)],
        "eid string, lbl string, src string, dst string, year long",
    )
    res = gdb_write(edges, {
        **_addr(server), "labelType": "EDGE",
        "column": [
            {"name": "eid", "columnType": "primaryKey"},
            {"name": "lbl", "columnType": "primaryLabel"},
            {"name": "src", "columnType": "srcPrimaryKey"},
            {"name": "dst", "columnType": "dstPrimaryKey"},
            {"name": "year", "columnType": "edgeProperty"},
        ],
    })
    assert res == {"written": 1, "dirty": 0}
    back = gdb_read(spark, {
        **_addr(server), "labelType": "EDGE", "labels": ["visited"],
        "column": [
            {"name": "eid", "columnType": "primaryKey", "type": "string"},
            {"name": "src", "columnType": "srcPrimaryKey", "type": "string"},
            {"name": "dst", "columnType": "dstPrimaryKey", "type": "string"},
            {"name": "year", "columnType": "edgeProperty", "type": "long"},
        ],
    })
    assert [tuple(r) for r in back.collect()] == [("e1", "v1", "v2", 2024)]


def test_jobspec_dispatch(server, spark):
    from datax_spark.sources.readers import read_source
    from datax_spark.sinks.writers import write_sink

    df = _people_df(spark)
    res = write_sink(df, "gdbwriter", {
        **_addr(server), "labelType": "VERTEX", "column": _W_COLS,
    })
    assert res["written"] == 2
    back = read_source(spark, "gdbreader", {
        **_addr(server), "labelType": "VERTEX",
        "column": [
            {"name": "vid", "columnType": "primaryKey", "type": "string"},
            {"name": "name", "columnType": "vertexProperty", "type": "string"},
        ],
    })
    assert sorted((r["vid"], r["name"]) for r in back.collect()) == [
        ("p1", "ann"), ("p2", "bob")
    ]
