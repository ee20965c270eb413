"""Kafka wire-protocol transport tests against an in-process fake
broker speaking the real versioned frames (Metadata v1, ListOffsets
v1, Fetch v2/v4, Produce v2/v3, magic-1 MessageSets AND KIP-98 v2
record batches incl. gzip)."""

from __future__ import annotations

import json
import shutil
import socket
import socketserver
import struct
import subprocess
import threading
import zlib

import pytest

from datax_spark.sources.kafka import (
    EARLIEST,
    LATEST,
    KafkaConnection,
    KafkaError,
    crc32c,
    decode_message_set,
    decode_records,
    encode_message_set,
    encode_record_batch_v2,
    kafka_read,
    kafka_write,
    project_json_value,
)


# ------------------------------------------------------------ fake broker

class _Log:
    def __init__(self):
        self.messages: list[tuple[int, bytes | None, bytes]] = []


class FakeKafkaHandler(socketserver.BaseRequestHandler):
    def handle(self):
        try:
            while True:
                hdr = self._recv(4)
                if hdr is None:
                    return
                (size,) = struct.unpack(">i", hdr)
                req = self._recv(size)
                api_key, api_version, corr = struct.unpack_from(">hhi", req, 0)
                i = 8
                (cid_len,) = struct.unpack_from(">h", req, i)
                i += 2 + max(cid_len, 0)
                body = req[i:]
                out = self._dispatch(api_key, api_version, body)
                resp = struct.pack(">i", corr) + out
                self.request.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError):
            pass

    def _recv(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _dispatch(self, api_key, api_version, body):
        srv = self.server
        if api_key == 3 and api_version == 1:
            return self._metadata(srv)
        if api_key == 2 and api_version == 1:
            return self._list_offsets(srv, body)
        if api_key == 1 and api_version == 2:
            return self._fetch(srv, body)
        if api_key == 1 and api_version == 4:
            return self._fetch_v4(srv, body)
        if api_key == 0 and api_version == 2:
            return self._produce(srv, body)
        if api_key == 0 and api_version == 3:
            return self._produce_v3(srv, body)
        raise AssertionError(f"unexpected api {api_key} v{api_version}")

    @staticmethod
    def _str(s):
        b = s.encode()
        return struct.pack(">h", len(b)) + b

    def _metadata(self, srv):
        host, port = srv.server_address
        out = struct.pack(">i", 1)  # one broker
        out += struct.pack(">i", 0) + self._str(host) + struct.pack(">i", port)
        out += struct.pack(">h", -1)  # rack null
        out += struct.pack(">i", 0)  # controller
        topics = {}
        for (t, p) in srv.logs:
            topics.setdefault(t, []).append(p)
        out += struct.pack(">i", len(topics))
        for t, pids in sorted(topics.items()):
            out += struct.pack(">h", 0) + self._str(t) + struct.pack(">b", 0)
            out += struct.pack(">i", len(pids))
            for pid in sorted(pids):
                out += struct.pack(">hii", 0, pid, 0)  # err, pid, leader 0
                out += struct.pack(">ii", 1, 0)  # replicas [0]
                out += struct.pack(">ii", 1, 0)  # isr [0]
        return out

    def _list_offsets(self, srv, body):
        r = struct.Struct(">i").unpack_from(body, 0)  # replica_id
        i = 4
        (ntop,) = struct.unpack_from(">i", body, i)
        i += 4
        assert ntop == 1 and r
        (tlen,) = struct.unpack_from(">h", body, i)
        topic = body[i + 2 : i + 2 + tlen].decode()
        i += 2 + tlen
        (nparts,) = struct.unpack_from(">i", body, i)
        i += 4
        assert nparts == 1
        pid, ts = struct.unpack_from(">iq", body, i)
        log = srv.logs[(topic, pid)]
        off = 0 if ts == -2 else len(log.messages)
        out = struct.pack(">i", 1) + self._str(topic) + struct.pack(">i", 1)
        out += struct.pack(">ihqq", pid, 0, -1, off)
        return out

    def _fetch(self, srv, body):
        i = 12  # replica, max_wait, min_bytes
        (ntop,) = struct.unpack_from(">i", body, i)
        i += 4
        assert ntop == 1
        (tlen,) = struct.unpack_from(">h", body, i)
        topic = body[i + 2 : i + 2 + tlen].decode()
        i += 2 + tlen
        i += 4  # one partition
        pid, offset, max_bytes = struct.unpack_from(">iqi", body, i)
        log = srv.logs[(topic, pid)]
        msgs = [
            (off, ts, key, val)
            for off, (ts, key, val) in enumerate(log.messages)
            if off >= offset
        ]
        ms = b""
        for off, ts, key, val in msgs:
            chunk = encode_message_set([(ts, key, val)], base_offset=off)
            ms += chunk
            if len(ms) >= max_bytes:
                # real brokers cut at max_bytes, possibly mid-message:
                # exercise the client's truncated-trailer handling
                ms = ms[: max_bytes + 7]
                break
        out = struct.pack(">i", 0)  # throttle
        out += struct.pack(">i", 1) + self._str(topic) + struct.pack(">i", 1)
        out += struct.pack(">ihq", pid, 0, len(log.messages))
        out += struct.pack(">i", len(ms)) + ms
        return out

    def _fetch_v4(self, srv, body):
        # replica(4) max_wait(4) min_bytes(4) max_bytes(4) isolation(1)
        i = 17
        (ntop,) = struct.unpack_from(">i", body, i)
        i += 4
        assert ntop == 1
        (tlen,) = struct.unpack_from(">h", body, i)
        topic = body[i + 2 : i + 2 + tlen].decode()
        i += 2 + tlen
        i += 4  # one partition
        pid, offset, max_bytes = struct.unpack_from(">iqi", body, i)
        log = srv.logs[(topic, pid)]
        msgs = [
            (off, ts, key, val)
            for off, (ts, key, val) in enumerate(log.messages)
            if off >= offset
        ]
        # serve v2 batches of up to 3 records each (exercises the
        # delta decoding); optionally gzip-compressed
        ms = b""
        comp = "gzip" if getattr(srv, "serve_gzip", False) else None
        for j in range(0, len(msgs), 3):
            chunk = msgs[j : j + 3]
            seg = encode_record_batch_v2(
                [(ts, key, val) for _off, ts, key, val in chunk],
                base_offset=chunk[0][0], compression=comp,
            )
            if getattr(srv, "serve_zstd", False):
                seg = _zstd_splice(seg)
            ms += seg
            if len(ms) >= max_bytes:
                ms = ms[: max_bytes + 9]  # cut mid-batch like a broker
                break
        out = struct.pack(">i", 0)  # throttle
        out += struct.pack(">i", 1) + self._str(topic) + struct.pack(">i", 1)
        out += struct.pack(">ihqq", pid, 0, len(log.messages), len(log.messages))
        out += struct.pack(">i", -1)  # aborted_transactions: null array
        out += struct.pack(">i", len(ms)) + ms
        return out

    def _produce_v3(self, srv, body):
        (tid_len,) = struct.unpack_from(">h", body, 0)  # transactional_id
        i = 2 + max(tid_len, 0)
        acks, _timeout = struct.unpack_from(">hi", body, i)
        i += 6
        (ntop,) = struct.unpack_from(">i", body, i)
        i += 4
        assert ntop == 1 and acks == -1
        (tlen,) = struct.unpack_from(">h", body, i)
        topic = body[i + 2 : i + 2 + tlen].decode()
        i += 2 + tlen
        i += 4  # one partition entry
        (pid,) = struct.unpack_from(">i", body, i)
        i += 4
        (n,) = struct.unpack_from(">i", body, i)
        i += 4
        ms = body[i : i + n]
        with srv.lock:
            log = srv.logs[(topic, pid)]
            base = len(log.messages)
            for _off, ts, key, val in decode_records(ms):
                log.messages.append((ts, key, val))
        out = struct.pack(">i", 1) + self._str(topic) + struct.pack(">i", 1)
        out += struct.pack(">ihqq", pid, 0, base, -1)
        out += struct.pack(">i", 0)  # throttle
        return out

    def _produce(self, srv, body):
        acks, _timeout = struct.unpack_from(">hi", body, 0)
        i = 6
        (ntop,) = struct.unpack_from(">i", body, i)
        i += 4
        assert ntop == 1 and acks == -1  # reference produces acks=all
        (tlen,) = struct.unpack_from(">h", body, i)
        topic = body[i + 2 : i + 2 + tlen].decode()
        i += 2 + tlen
        i += 4  # one partition entry
        (pid,) = struct.unpack_from(">i", body, i)
        i += 4
        (n,) = struct.unpack_from(">i", body, i)
        i += 4
        ms = body[i : i + n]
        with srv.lock:
            log = srv.logs[(topic, pid)]
            base = len(log.messages)
            for _off, ts, key, val in decode_message_set(ms):
                log.messages.append((ts, key, val))
        out = struct.pack(">i", 1) + self._str(topic) + struct.pack(">i", 1)
        out += struct.pack(">ihqq", pid, 0, base, -1)
        out += struct.pack(">i", 0)  # throttle
        return out


class FakeKafkaBroker(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, topics: dict[str, int]):
        super().__init__(("127.0.0.1", 0), FakeKafkaHandler)
        self.logs = {
            (t, p): _Log() for t, n in topics.items() for p in range(n)
        }
        self.lock = threading.Lock()
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()

    @property
    def bootstrap(self) -> str:
        h, p = self.server_address
        return f"{h}:{p}"

    def stop(self):
        self.shutdown()
        self.server_close()


@pytest.fixture()
def broker():
    b = FakeKafkaBroker({"events": 3})
    yield b
    b.stop()


# ------------------------------------------------------------- unit: codec

def test_message_set_byte_layout():
    ms = encode_message_set([(1234, b"k", b"v")], base_offset=7)
    # offset(8) size(4) crc(4) magic(1) attrs(1) ts(8) klen(4)+1 vlen(4)+1
    assert struct.unpack_from(">q", ms, 0)[0] == 7
    size = struct.unpack_from(">i", ms, 8)[0]
    assert size == len(ms) - 12 == 4 + 1 + 1 + 8 + 5 + 5
    crc = struct.unpack_from(">I", ms, 12)[0]
    assert crc == zlib.crc32(ms[16:]) & 0xFFFFFFFF
    assert ms[16] == 1 and ms[17] == 0  # magic 1, no codec
    assert struct.unpack_from(">q", ms, 18)[0] == 1234
    assert decode_message_set(ms) == [(7, 1234, b"k", b"v")]


def test_decode_rejects_corrupt_crc():
    ms = bytearray(encode_message_set([(0, None, b"payload")]))
    ms[-1] ^= 0xFF
    with pytest.raises(KafkaError):
        decode_message_set(bytes(ms))


def test_decode_stops_at_truncated_trailer():
    ms = encode_message_set([(0, None, b"a"), (0, None, b"b")], base_offset=0)
    cut = ms[: len(ms) - 3]  # second message torn mid-value
    got = decode_message_set(cut)
    assert [(o, v) for o, _, _, v in got] == [(0, b"a")]


def test_decode_rejects_unsupported_codec():
    # codec 5 is unknown → refuses loudly; codec 4 (zstd) now decodes,
    # so garbage zstd payload fails with the decoder's own error
    body = struct.pack(">bbq", 1, 5, 0) + struct.pack(">i", -1) + struct.pack(">i", 1) + b"x"
    msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
    ms = struct.pack(">qi", 0, len(msg)) + msg
    with pytest.raises(NotImplementedError):
        decode_message_set(ms)
    from datax_spark.sources.zstd import ZstdError

    body = struct.pack(">bbq", 1, 4, 0) + struct.pack(">i", -1) + struct.pack(">i", 1) + b"x"
    msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
    ms = struct.pack(">qi", 0, len(msg)) + msg
    with pytest.raises(ZstdError, match="magic|truncated"):
        decode_message_set(ms)


def _snappy_literal(data: bytes) -> bytes:
    """Hand-built raw snappy block: varint length + literal elements
    (a compressor is not needed to test the decoder)."""
    out = bytearray()
    n = len(data)
    while True:
        out.append(n & 0x7F | (0x80 if n > 0x7F else 0))
        n >>= 7
        if not n:
            break
    i = 0
    while i < len(data):
        chunk = data[i : i + 60]
        out.append((len(chunk) - 1) << 2)
        out += chunk
        i += 60
    return bytes(out)


def test_snappy_decompress_literals_and_copies():
    from datax_spark.sources.kafka import snappy_decompress, xerial_decompress

    assert snappy_decompress(_snappy_literal(b"hello world")) == b"hello world"
    assert snappy_decompress(_snappy_literal(b"x" * 200)) == b"x" * 200
    # copy element with overlap (RLE): literal 'ab' + copy1 len 8 off 2
    blk = bytes([10]) + bytes([(2 - 1) << 2]) + b"ab" + bytes([((8 - 4) << 2) | 1, 2])
    assert snappy_decompress(blk) == b"ababababab"
    # copy2 form: literal 'abcd' + 2-byte-offset copy of 4
    blk = bytes([8]) + bytes([(4 - 1) << 2]) + b"abcd" + bytes([((4 - 1) << 2) | 2, 4, 0])
    assert snappy_decompress(blk) == b"abcdabcd"
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4, ((4 - 4) << 2) | 1, 9]))  # off > produced
    with pytest.raises(ValueError, match="declared"):
        snappy_decompress(bytes([5]) + bytes([(2 - 1) << 2]) + b"ab")
    # xerial framing: magic + versions + one chunked block
    import struct as _s
    inner = _snappy_literal(b"framed payload")
    framed = (b"\x82SNAPPY\x00" + _s.pack(">ii", 1, 1)
              + _s.pack(">i", len(inner)) + inner)
    assert xerial_decompress(framed) == b"framed payload"
    assert xerial_decompress(_snappy_literal(b"bare")) == b"bare"


def test_magic1_compressed_wrapper_messages():
    """gzip and snappy(xerial) wrapper messages unwrap with correct
    absolute offsets (inner offsets are 0..n-1 relative; the wrapper
    carries the last inner message's absolute offset)."""
    from datax_spark.sources.kafka import decode_message_set

    inner = encode_message_set(
        [(10, None, b"v5"), (11, b"k", b"v6")], base_offset=0)
    for codec, payload in (
        (1, (lambda co: co.compress(inner) + co.flush())(
            zlib.compressobj(wbits=31))),
        (2, b"\x82SNAPPY\x00" + struct.pack(">ii", 1, 1)
            + struct.pack(">i", len(_snappy_literal(inner)))
            + _snappy_literal(inner)),
    ):
        body = (
            struct.pack(">bbq", 1, codec, 10)
            + struct.pack(">i", -1)
            + struct.pack(">i", len(payload)) + payload
        )
        msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
        ms = struct.pack(">qi", 6, len(msg)) + msg  # wrapper offset = 6
        got = decode_message_set(ms)
        assert [(o, v) for o, _t, _k, v in got] == [(5, b"v5"), (6, b"v6")]


def test_record_batch_v2_snappy_payload():
    """A v2 batch whose records section is raw-snappy decodes (fixture
    built by hand-compressing the canonical uncompressed section)."""
    from datax_spark.sources.kafka import crc32c as _crc

    plain = encode_record_batch_v2([(7, b"k", b"snappy-val")], base_offset=3)
    payload = bytearray(plain[21:])
    comp = _snappy_literal(bytes(payload[40:]))
    payload[1] = (payload[1] & ~0x07) | 2  # codec = snappy
    new_payload = bytes(payload[:40]) + comp
    # reframe: base_offset + batch_len + (leader_epoch, magic, crc) + payload
    body = struct.pack(">ibI", 0, 2, _crc(new_payload)) + new_payload
    batch = plain[:8] + struct.pack(">i", len(body)) + body
    out = decode_records(batch)
    assert out == [(3, 7, b"k", b"snappy-val")]


# -------------------------------------------------- unit: value projection

def test_project_json_value_object_and_list():
    rows = project_json_value('{"a": 1, "b": "x", "c": true}', ["a", "b", "c", "d"], 0)
    assert rows == [["1", "x", "true", None]]
    rows = project_json_value('[{"a": 1}, {"a": 2.5}]', ["a"], 1)
    assert rows == [["1"], ["2.5"]]
    with pytest.raises(ValueError):
        project_json_value("{}", ["a"], 2)


# ------------------------------------------------------------- wire client

def test_client_metadata_offsets_produce_fetch(broker):
    c = KafkaConnection(*broker.server_address)
    try:
        brokers, parts = c.metadata(["events"])
        assert parts == {"events": {0: 0, 1: 0, 2: 0}}
        assert brokers[0][1] == broker.server_address[1]
        assert c.list_offset("events", 0, EARLIEST) == 0
        base = c.produce("events", 0, [(5, None, b'{"n": 1}'), (6, b"k", b'{"n": 2}')])
        assert base == 0
        assert c.list_offset("events", 0, LATEST) == 2
        msgs, hw = c.fetch("events", 0, 0)
        assert hw == 2
        assert [(o, ts, k, v) for o, ts, k, v in msgs] == [
            (0, 5, None, b'{"n": 1}'),
            (1, 6, b"k", b'{"n": 2}'),
        ]
    finally:
        c.close()


# ------------------------------------------------------------------- e2e

def _zstd_splice(seg: bytes) -> bytes:
    """Rewrite an uncompressed v2 batch as codec-4 (zstd) using the
    host zstd CLI as the reference compressor + a crc32c re-stamp —
    byte-for-byte what a KIP-110 producer would have sent."""
    payload = seg[21:]
    (attrs,) = struct.unpack_from(">h", payload, 0)
    comp = subprocess.run(["zstd", "-c"], input=payload[40:],
                          capture_output=True).stdout
    new_payload = struct.pack(">h", attrs | 4) + payload[2:40] + comp
    return (seg[:8] + struct.pack(">i", 9 + len(new_payload))
            + seg[12:17] + struct.pack(">I", crc32c(new_payload))
            + new_payload)


def _preload(broker, topic, per_partition):
    c = KafkaConnection(*broker.server_address)
    try:
        for pid, values in per_partition.items():
            c.produce(topic, pid, [(0, None, v.encode()) for v in values])
    finally:
        c.close()


def test_kafka_read_all_partitions(broker, spark):
    _preload(broker, "events", {
        0: ['{"id": 1, "name": "a"}', '{"id": 2, "name": "b"}'],
        1: ['{"id": 3, "name": "c"}'],
        2: ['{"id": 4}'],
    })
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id", "name"],
        "isList": 0,
    })
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [("1", "a"), ("2", "b"), ("3", "c"), ("4", None)]
    assert df.rdd.getNumPartitions() == 3  # one task per partition


def test_kafka_read_is_list_and_bounded_drain(broker, spark):
    _preload(broker, "events", {0: ['[{"x": 1}, {"x": 2}]', '[{"x": 3}]']})
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["x"],
        "isList": 1,
    })
    # messages produced AFTER the plan snapshot stay outside the range
    _preload(broker, "events", {0: ['[{"x": 99}]']})
    assert sorted(r["x"] for r in df.collect()) == ["1", "2", "3"]


def test_kafka_read_pages_through_small_max_bytes(broker, spark):
    vals = [json.dumps({"i": i, "pad": "p" * 64}) for i in range(40)]
    _preload(broker, "events", {0: vals, 1: vals[:7]})
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["i"],
        "isList": 0,
        "fetchMaxBytes": 150,  # forces many rounds + torn trailers
    })
    got = sorted(int(r["i"]) for r in df.collect())
    assert got == sorted(list(range(40)) + list(range(7)))


def test_kafka_write_round_robin_and_types(broker, spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", 2.5, False), (3, None, None, None)],
        "id long, name string, score double, ok boolean",
    ).coalesce(1)
    res = kafka_write(df, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": [
            {"columnName": "id", "columnType": "Long"},
            {"columnName": "name", "columnType": "String"},
            {"columnName": "score", "columnType": "Double"},
            {"columnName": "ok", "columnType": "Boolean"},
        ],
    })
    assert res == {"written": 3, "dirty": 0}
    c = KafkaConnection(*broker.server_address)
    try:
        objs, by_part = [], []
        for pid in range(3):
            end = c.list_offset("events", pid, LATEST)
            if end:
                msgs, _ = c.fetch("events", pid, 0)
                by_part.append(len(msgs))
                objs += [json.loads(v.decode()) for _, _, _, v in msgs]
    finally:
        c.close()
    assert sorted(by_part) == [1, 1, 1]  # round-robin across partitions
    assert sorted(objs, key=lambda o: o["id"]) == [
        {"id": 1, "name": "a", "ok": True, "score": 1.5},
        {"id": 2, "name": "b", "ok": False, "score": 2.5},
        {"id": 3, "name": None, "ok": None, "score": None},
    ]


def test_kafka_write_read_round_trip(broker, spark):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(25)], "id long, name string"
    )
    kafka_write(df, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": [
            {"columnName": "id", "columnType": "Long"},
            {"columnName": "name", "columnType": "String"},
        ],
    })
    back = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id", "name"],
        "isList": 0,
    })
    got = sorted((int(r["id"]), r["name"]) for r in back.collect())
    assert got == [(i, f"n{i}") for i in range(25)]


def test_jobspec_dispatch_wire_transport(broker, spark):
    from datax_spark.sources.readers import read_source
    from datax_spark.sinks.writers import write_sink

    _preload(broker, "events", {0: ['{"id": 10}']})
    df = read_source(spark, "kafkareader", {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id"],
        "isList": 0,
        "transport": "wire",
    })
    assert [r["id"] for r in df.collect()] == ["10"]
    res = write_sink(df, "kafkawriter", {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": [{"columnName": "id", "columnType": "String"}],
        "transport": "wire",
    })
    assert res["written"] == 1


# ----------------------------------------------- v2 record batches (KIP-98)


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_record_batch_v2_roundtrip():
    msgs = [
        (1000, b"k0", b"v0"),
        (1005, None, b"v1"),
        (990, b"k2", b""),
    ]
    buf = encode_record_batch_v2(msgs, base_offset=7)
    out = decode_records(buf)
    assert out == [
        (7, 1000, b"k0", b"v0"),
        (8, 1005, None, b"v1"),
        (9, 990, b"k2", b""),
    ]


def test_record_batch_v2_gzip_roundtrip():
    msgs = [(i, None, f"value-{i}".encode() * 20) for i in range(50)]
    buf = encode_record_batch_v2(msgs, base_offset=0, compression="gzip")
    plain = encode_record_batch_v2(msgs, base_offset=0)
    assert len(buf) < len(plain)  # actually compressed
    out = decode_records(buf)
    assert [(o, v) for o, _ts, _k, v in out] == [
        (i, f"value-{i}".encode() * 20) for i in range(50)
    ]


def test_record_batch_v2_bad_crc_rejected():
    buf = bytearray(encode_record_batch_v2([(0, None, b"x")]))
    buf[-1] ^= 0xFF  # flip a payload byte after the crc
    with pytest.raises(KafkaError) as ei:
        decode_records(bytes(buf))
    assert ei.value.code == 2


def test_record_batch_v2_unsupported_codec_refused():
    buf = bytearray(encode_record_batch_v2([(0, None, b"x")]))
    # attributes live at offset 21 (after base_offset, batch_len,
    # leader_epoch, magic, crc); set codec bits to 5 (unknown) and
    # re-stamp the crc so the codec check is what fires. zstd (4) is
    # no longer refused — tests/test_zstd.py decodes it for real.
    payload = bytearray(buf[21:])
    payload[1] = (payload[1] & ~0x07) | 5
    struct.pack_into(">I", buf, 17, crc32c(bytes(payload)))
    buf[21:] = payload
    with pytest.raises(NotImplementedError, match="unknown"):
        decode_records(bytes(buf))


def _lz4_frame(blocks) -> bytes:
    """Hand-built LZ4 frame: [(compressed: bool, data)] blocks."""
    out = bytearray(b"\x04\x22\x4d\x18")
    out += bytes([0x40, 0x40, 0x00])  # FLG v01, BD, header checksum byte
    for compressed, data in blocks:
        word = len(data) | (0 if compressed else 0x80000000)
        out += struct.pack("<I", word) + data
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def test_lz4_block_and_frame_decode():
    from datax_spark.sources.kafka import (
        lz4_block_decompress,
        lz4_frame_decompress,
    )

    # literal-only sequence (last sequence carries no match)
    blk = bytes([5 << 4]) + b"hello"
    assert bytes(lz4_block_decompress(blk)) == b"hello"
    # match copy: 'abcd' then off=4 len=4 -> abcdabcd (end literal req'd)
    blk = bytes([(4 << 4) | 0]) + b"abcd" + struct.pack("<H", 4) + bytes([1 << 4]) + b"!"
    assert bytes(lz4_block_decompress(blk)) == b"abcdabcd!"
    # overlap RLE: 'ab' + off=2 len=8
    blk = bytes([(2 << 4) | (8 - 4)]) + b"ab" + struct.pack("<H", 2) + bytes([0])
    assert bytes(lz4_block_decompress(blk)) == b"ab" + b"ab" * 4
    # LSIC extension: 20-byte literal needs 15 + 5
    blk = bytes([15 << 4, 5]) + b"y" * 20
    assert bytes(lz4_block_decompress(blk)) == b"y" * 20
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([(1 << 4) | 0]) + b"a" + struct.pack("<H", 9))
    # frame: one compressed + one stored block concatenate
    frame = _lz4_frame([
        (True, bytes([5 << 4]) + b"part1"),
        (False, b"|stored"),
    ])
    assert lz4_frame_decompress(frame) == b"part1|stored"
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"nope")


def test_record_batch_v2_lz4_payload():
    from datax_spark.sources.kafka import crc32c as _crc

    plain = encode_record_batch_v2([(9, None, b"lz4-value")], base_offset=5)
    payload = bytearray(plain[21:])
    recs = bytes(payload[40:])
    comp = _lz4_frame([(True, bytes([len(recs) << 4]) + recs)]) \
        if len(recs) < 15 else _lz4_frame([(False, recs)])
    payload[1] = (payload[1] & ~0x07) | 3  # codec = lz4
    new_payload = bytes(payload[:40]) + comp
    body = struct.pack(">ibI", 0, 2, _crc(new_payload)) + new_payload
    batch = plain[:8] + struct.pack(">i", len(body)) + body
    assert decode_records(batch) == [(5, 9, None, b"lz4-value")]


def test_record_batch_v2_control_batch_skipped():
    buf = bytearray(encode_record_batch_v2([(0, None, b"marker")]))
    payload = bytearray(buf[21:])
    # attributes is int16 big-endian at payload[0:2]; bit 5 (0x20)
    payload[1] |= 0x20
    struct.pack_into(">I", buf, 17, crc32c(bytes(payload)))
    buf[21:] = payload
    assert decode_records(bytes(buf)) == []


def test_decode_records_mixed_magic_log():
    """Old magic-1 segment followed by a v2 segment in one fetch
    response — dispatch on the magic byte decodes both."""
    old = encode_message_set([(100, b"k", b"old")], base_offset=0)
    new = encode_record_batch_v2([(200, None, b"new")], base_offset=1)
    out = decode_records(old + new)
    assert out == [(0, 100, b"k", b"old"), (1, 200, None, b"new")]


def test_decode_records_truncated_v2_trailer():
    full = encode_record_batch_v2([(0, None, b"a" * 50)], base_offset=0)
    nxt = encode_record_batch_v2([(1, None, b"b" * 50)], base_offset=1)
    cut = (full + nxt)[: len(full) + 9]
    assert [v for _o, _t, _k, v in decode_records(cut)] == [b"a" * 50]


def test_client_produce_fetch_v2(broker):
    c = KafkaConnection(*broker.server_address)
    try:
        base = c.produce(
            "events", 0,
            [(10, b"k1", b"hello"), (11, None, b"world")], fmt="v2",
        )
        assert base == 0
        c.produce("events", 0, [(12, None, b"gz" * 100)], fmt="v2",
                  compression="gzip")
        msgs, hw = c.fetch("events", 0, 0, fmt="v2")
        assert hw == 3
        assert [(o, k, v) for o, _t, k, v in msgs] == [
            (0, b"k1", b"hello"), (1, None, b"world"), (2, None, b"gz" * 100),
        ]
    finally:
        c.close()


def test_kafka_read_v2_format(broker, spark):
    """End-to-end v2: produce KIP-98 batches (one gzip'd), read with
    messageFormat v2 over Fetch v4 (fake serves multi-record batches)."""
    c = KafkaConnection(*broker.server_address)
    try:
        for pid, vals in {
            0: ['{"id": 1}', '{"id": 2}', '{"id": 3}', '{"id": 4}'],
            1: ['{"id": 5}'],
            2: [],
        }.items():
            if vals:
                c.produce("events", pid,
                          [(0, None, v.encode()) for v in vals], fmt="v2")
    finally:
        c.close()
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id"],
        "isList": 0,
        "messageFormat": "v2",
    })
    assert sorted(int(r["id"]) for r in df.collect()) == [1, 2, 3, 4, 5]


def test_kafka_read_v2_zstd_served(broker, spark):
    """End-to-end: the fake broker serves zstd (codec 4) v2 batches
    — what a KIP-110 producer topic looks like — and the reader's
    from-scratch RFC 8878 decoder unpacks them inside the scan."""
    if shutil.which("zstd") is None:
        pytest.skip("no zstd CLI to build reference batches")
    broker.serve_zstd = True
    _preload(broker, "events", {0: ['{"id": %d}' % i for i in range(10)]})
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id"],
        "isList": 0,
        "messageFormat": "v2",
    })
    assert sorted(int(r["id"]) for r in df.collect()) == list(range(10))


def test_kafka_read_v2_gzip_served(broker, spark):
    broker.serve_gzip = True
    _preload(broker, "events", {0: ['{"id": %d}' % i for i in range(10)]})
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id"],
        "isList": 0,
        "messageFormat": "v2",
    })
    assert sorted(int(r["id"]) for r in df.collect()) == list(range(10))


def test_kafka_write_read_round_trip_v2(broker, spark):
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(25)], "id long, name string"
    )
    kafka_write(df, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": [
            {"columnName": "id", "columnType": "Long"},
            {"columnName": "name", "columnType": "String"},
        ],
        "messageFormat": "v2",
        "compression": "gzip",
    })
    back = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id", "name"],
        "isList": 0,
        "messageFormat": "v2",
    })
    got = sorted((int(r["id"]), r["name"]) for r in back.collect())
    assert got == [(i, f"n{i}") for i in range(25)]


def test_kafka_read_v2_pages_through_small_max_bytes(broker, spark):
    _preload(broker, "events", {0: ['{"id": %d}' % i for i in range(30)]})
    df = kafka_read(spark, {
        "bootstrapServers": broker.bootstrap,
        "topic": "events",
        "column": ["id"],
        "isList": 0,
        "messageFormat": "v2",
        "fetchMaxBytes": 150,  # forces many fetches + truncated trailers
    })
    assert sorted(int(r["id"]) for r in df.collect()) == list(range(30))
