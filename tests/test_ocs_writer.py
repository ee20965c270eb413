"""ocswriter against an in-process fake memcached speaking the real
TEXT protocol over TCP.

The fake implements the five storage commands the writer uses
(set/add/replace/append/prepend — including NOT_STORED semantics and
pipelined batches) plus get for verification, enough to drive the
reference flow (OcsWriter.java prepare → buildKey/buildValue → commit)
end to end: delimiter joining, indexes key selection, writeMode
semantics, expireTime pass-through, dirty-record routing, and the
idempotent-vs-no-retry split.
"""

from __future__ import annotations

import socket
import threading

import pytest

from datax_spark.sinks.ocs_writer import kv_frame, write_ocs
from datax_spark.sinks.writers import write_sink


class FakeMemcached:
    """Minimal memcached text-protocol server (threaded, pipelining-safe)."""

    def __init__(self):
        self.store: dict[str, tuple[int, int, bytes]] = {}  # key -> (flags, exptime, data)
        self.lock = threading.Lock()
        self.drop_next: int = 0  # close the connection before the next N replies
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self._accepting = True
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        while self._accepting:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket):
        buf = b""
        with conn:
            while True:
                while b"\r\n" not in buf:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                line, buf = buf.split(b"\r\n", 1)
                parts = line.decode().split()
                if not parts:
                    continue
                cmd = parts[0]
                if cmd == "quit":
                    return
                if cmd == "get":
                    out = b""
                    with self.lock:
                        for k in parts[1:]:
                            if k in self.store:
                                flags, _, data = self.store[k]
                                out += (
                                    f"VALUE {k} {flags} {len(data)}\r\n".encode()
                                    + data
                                    + b"\r\n"
                                )
                    conn.sendall(out + b"END\r\n")
                    continue
                # storage command: <cmd> <key> <flags> <exptime> <bytes>
                key, flags, exptime, nbytes = (
                    parts[1], int(parts[2]), int(parts[3]), int(parts[4]),
                )
                while len(buf) < nbytes + 2:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                data, buf = buf[:nbytes], buf[nbytes + 2 :]
                if self.drop_next > 0:
                    self.drop_next -= 1
                    return  # simulate transport failure mid-batch
                with self.lock:
                    exists = key in self.store
                    if cmd == "set":
                        self.store[key] = (flags, exptime, data)
                        rep = b"STORED"
                    elif cmd == "add":
                        if exists:
                            rep = b"NOT_STORED"
                        else:
                            self.store[key] = (flags, exptime, data)
                            rep = b"STORED"
                    elif cmd == "replace":
                        if not exists:
                            rep = b"NOT_STORED"
                        else:
                            self.store[key] = (flags, exptime, data)
                            rep = b"STORED"
                    elif cmd == "append":
                        if not exists:
                            rep = b"NOT_STORED"
                        else:
                            f0, e0, d0 = self.store[key]
                            self.store[key] = (f0, e0, d0 + data)
                            rep = b"STORED"
                    elif cmd == "prepend":
                        if not exists:
                            rep = b"NOT_STORED"
                        else:
                            f0, e0, d0 = self.store[key]
                            self.store[key] = (f0, e0, data + d0)
                            rep = b"STORED"
                    else:
                        rep = b"ERROR"
                conn.sendall(rep + b"\r\n")

    def close(self):
        self._accepting = False
        self.srv.close()

    def text(self, key: str) -> str | None:
        with self.lock:
            item = self.store.get(key)
        return item[2].decode() if item else None


@pytest.fixture()
def mc():
    srv = FakeMemcached()
    yield srv
    srv.close()


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            ("r1", "a.py", "python", 12),
            ("r1", "b.py", "python", 7),
            ("r2", "a.go", "go", 3),
        ],
        "repo string, path string, lang string, stars int",
    ).coalesce(2)


DELIM = "|"


def _conf(mc, **kw):
    base = {
        "proxy": "127.0.0.1",
        "port": mc.port,
        "writeMode": "set",
        "indexes": "0,1",
        "fieldDelimiter": DELIM,
        "expireTime": 0,
    }
    base.update(kw)
    return base


def test_set_roundtrip_key_value_shapes(spark, docs, mc):
    stats = write_ocs(docs, _conf(mc))
    assert stats == {"written": 3, "dirty": 0, "dirtyReasons": {}}
    # key = indexes columns joined; value = ALL columns joined
    assert mc.text("r1|a.py") == "r1|a.py|python|12"
    assert mc.text("r2|a.go") == "r2|a.go|go|3"


def test_add_mode_not_stored_is_dirty_record(spark, docs, mc):
    write_ocs(docs.filter("repo='r1' and path='a.py'"), _conf(mc))  # pre-seed
    stats = write_ocs(docs, _conf(mc, writeMode="add"))
    assert stats["written"] == 2
    assert stats["dirtyReasons"] == {"commit not stored": 1}


def test_replace_mode_only_existing(spark, docs, mc):
    write_ocs(docs.filter("repo='r1' and path='a.py'"), _conf(mc))
    stats = write_ocs(docs, _conf(mc, writeMode="replace"))
    assert stats["written"] == 1
    assert stats["dirtyReasons"] == {"commit not stored": 2}


def test_append_concatenates_no_retry(spark, docs, mc):
    write_ocs(docs, _conf(mc))
    stats = write_ocs(docs.filter("repo='r1' and path='a.py'"), _conf(mc, writeMode="append"))
    assert stats["written"] == 1
    assert mc.text("r1|a.py") == "r1|a.py|python|12" * 2


def test_dirty_routing_delimiter_and_key_rules(spark, mc):
    rows = [
        ("ok", "v", 1),
        ("has|delim", "v", 2),       # delimiter in key component
        ("k2", "va|lue", 3),         # delimiter in value component
        (None, None, None),          # empty key (all-null key cols)
        ("white space", "v", 4),     # text-protocol invalid key
        ("x" * 300, "v", 5),         # key over 250 bytes
    ]
    sdf = _make(spark, rows)
    stats = write_ocs(sdf, {"proxy": "127.0.0.1", "port": mc.port,
                            "indexes": "0", "fieldDelimiter": "|"})
    assert stats["written"] == 1
    assert stats["dirty"] == 5
    assert stats["dirtyReasons"]["delimiter in data"] == 2
    assert stats["dirtyReasons"]["empty key"] == 1
    assert stats["dirtyReasons"]["whitespace/control in key"] == 1
    assert stats["dirtyReasons"]["key over 250 bytes"] == 1
    assert mc.text("ok") == "ok|v|1"


def _make(spark, rows):
    return spark.createDataFrame(rows, "k string, v string, n int")


def test_transport_retry_idempotent_set(spark, docs, mc):
    mc.drop_next = 1  # kill the first batch's connection mid-flight
    stats = write_ocs(docs.coalesce(1), _conf(mc))
    assert stats["written"] == 3  # retried and converged (set idempotent)


def test_expire_time_passthrough(spark, docs, mc):
    write_ocs(docs, _conf(mc, expireTime=3600))
    assert mc.store["r1|a.py"][1] == 3600


def test_kv_frame_null_value_components_render_empty(spark, mc):
    df = spark.createDataFrame([("k1", None, 9)], "k string, v string, n int")
    kv = kv_frame(df, {"indexes": "0", "fieldDelimiter": "|"}).collect()[0]
    assert kv["__key"] == "k1"
    assert kv["__value"] == "k1||9"  # StringUtils.join null -> empty
    assert kv["__dirty"] is None


def test_write_sink_dispatch(spark, docs, mc):
    stats = write_sink(docs, "ocswriter", _conf(mc))
    assert stats["written"] == 3


def test_invalid_config_rejected(spark, docs, mc):
    with pytest.raises(ValueError, match="writeMode"):
        write_ocs(docs, _conf(mc, writeMode="upsert"))
    with pytest.raises(ValueError, match="proxy"):
        write_ocs(docs, {"writeMode": "set"})
    with pytest.raises(ValueError, match="out of range"):
        write_ocs(docs, _conf(mc, indexes="0,9"))
    bin_df = docs.selectExpr("repo", "cast(path as binary) as path")
    with pytest.raises(ValueError, match="binary"):
        write_ocs(bin_df, _conf(mc, indexes="0"))
