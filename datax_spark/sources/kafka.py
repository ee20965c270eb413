"""Kafka reader/writer over the public Kafka binary wire protocol.

Reference parity (kafkareader/.../KafkaReader.java,
kafkawriter/.../KafkaWriter.java):

* **reader split** (KafkaReader.java:77-85): one task per partition.
  The reference clones the job config ``kafkaPartitions`` times and
  lets the consumer group assign; here the split is exact — Metadata
  names the partitions and their leaders, and each Spark task owns
  one partition (same parallelism contract, no group rebalance).
* **bounded drain** (KafkaReader.java:157-177): the reference polls
  until an empty batch then stops. The deterministic batch analog:
  snapshot [earliest, latest) offsets per partition at plan time
  (ListOffsets) and fetch exactly that range.
* **value decode** (buildOneRecord:185-216): the value is a JSON
  object (``isList`` 0) or JSON array of objects (``isList`` 1); each
  configured ``column`` key projects to a StringColumn, missing keys
  to null. All output columns are strings, as in the reference.
* **writer** (KafkaWriter.java:105-185): each record renders to a
  JSON object via the ``column`` list's (columnName, columnType)
  pairs — String/Integer/Long/Byte/Boolean/Date/Double/Decimal —
  and is produced with acks=all, batched up to ~16 KB (batch.size
  16384) before flushing.

Transport: the reference links the Apache Kafka client; this module
speaks the versioned request/response protocol directly — Metadata
v1, ListOffsets v1, Fetch v2, Produce v2 with magic-1 MessageSets
(CRC32-checked, the format every broker since 0.10 still serves).
Compression attributes are refused loudly (no codec negotiation).
SASL is not implemented and fails loudly. Drivable by an in-process
fake speaking the same frames in tests.

Spark-first shape: the driver plans (partition → leader, offset
range) from Metadata/ListOffsets only; executors fetch their
partition's range inside ``mapInPandas`` (parallelism = partitions)
and the writer produces per Spark partition with round-robin topic
partitioning. Delivery is at-least-once under task retry, matching
the reference (acks=all, retries=0).
"""

from __future__ import annotations

import json
import socket
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3

EARLIEST = -2
LATEST = -1

_ERRORS = {
    1: "OFFSET_OUT_OF_RANGE",
    2: "CORRUPT_MESSAGE",
    3: "UNKNOWN_TOPIC_OR_PARTITION",
    5: "LEADER_NOT_AVAILABLE",
    6: "NOT_LEADER_FOR_PARTITION",
}


class KafkaError(IOError):
    def __init__(self, code: int, where: str):
        name = _ERRORS.get(code, f"error {code}")
        super().__init__(f"kafka {where}: {name} ({code})")
        self.code = code


def _str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _nullable_str(s: str | None) -> bytes:
    return struct.pack(">h", -1) if s is None else _str(s)


def _bytes(b: bytes | None) -> bytes:
    return struct.pack(">i", -1) if b is None else struct.pack(">i", len(b)) + b


class _Reader:
    """Cursor over a response body."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def i8(self):
        (v,) = struct.unpack_from(">b", self.buf, self.i)
        self.i += 1
        return v

    def i16(self):
        (v,) = struct.unpack_from(">h", self.buf, self.i)
        self.i += 2
        return v

    def i32(self):
        (v,) = struct.unpack_from(">i", self.buf, self.i)
        self.i += 4
        return v

    def i64(self):
        (v,) = struct.unpack_from(">q", self.buf, self.i)
        self.i += 8
        return v

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        s = self.buf[self.i : self.i + n].decode("utf-8")
        self.i += n
        return s

    def raw(self, n: int) -> bytes:
        b = self.buf[self.i : self.i + n]
        self.i += n
        return b


# ------------------------------------------------------- magic-1 MessageSet

def encode_message_set(messages, base_offset: int = 0) -> bytes:
    """[(timestamp_ms, key|None, value)] -> wire MessageSet (magic 1).

    The producer-side offset is a placeholder (brokers reassign);
    CRC32 covers everything after the crc field, per the spec.
    """
    out = b""
    for n, (ts, key, value) in enumerate(messages):
        body = (
            struct.pack(">bbq", 1, 0, ts)  # magic=1, attributes=0 (no codec)
            + _bytes(key)
            + _bytes(value)
        )
        msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
        out += struct.pack(">qi", base_offset + n, len(msg)) + msg
    return out


def decode_message_set(buf: bytes):
    """Wire MessageSet -> [(offset, timestamp_ms, key|None, value)].

    Stops cleanly at a truncated trailing message (brokers cut the
    set at max_bytes mid-message); CRC mismatches raise.
    """
    out = []
    i = 0
    while i + 12 <= len(buf):
        offset, size = struct.unpack_from(">qi", buf, i)
        if i + 12 + size > len(buf):
            break  # truncated trailer — refetch from next offset
        msg = buf[i + 12 : i + 12 + size]
        i += 12 + size
        (crc,) = struct.unpack_from(">I", msg, 0)
        if zlib.crc32(msg[4:]) & 0xFFFFFFFF != crc:
            raise KafkaError(2, f"fetch offset {offset}")
        r = _Reader(msg)
        r.i = 4
        magic = r.i8()
        attrs = r.i8()
        if attrs & 0x07:
            raise NotImplementedError(
                f"compressed message set (codec {attrs & 0x07}) not supported"
            )
        ts = r.i64() if magic >= 1 else -1
        klen = r.i32()
        key = r.raw(klen) if klen >= 0 else None
        vlen = r.i32()
        value = r.raw(vlen) if vlen >= 0 else b""
        out.append((offset, ts, key, value))
    return out


# ------------------------------------------------------------ connection

class KafkaConnection:
    """One broker connection: size-framed request/response with
    correlation ids (Metadata v1 / ListOffsets v1 / Fetch v2 /
    Produce v2)."""

    def __init__(self, host: str, port: int, timeout: float = 30.0,
                 client_id: str = "datax-spark"):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.client_id = client_id
        self._corr = 0

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("kafka connection closed")
            buf += chunk
        return buf

    def _request(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        req = (
            struct.pack(">hhi", api_key, api_version, self._corr)
            + _nullable_str(self.client_id)
            + body
        )
        self.sock.sendall(struct.pack(">i", len(req)) + req)
        (size,) = struct.unpack(">i", self._recv_exact(4))
        resp = _Reader(self._recv_exact(size))
        corr = resp.i32()
        if corr != self._corr:
            raise IOError(f"correlation mismatch: sent {self._corr}, got {corr}")
        return resp

    # ---- Metadata v1

    def metadata(self, topics: list[str]):
        """-> (brokers {node_id: (host, port)},
               partitions {topic: {partition: leader_node_id}})"""
        body = struct.pack(">i", len(topics)) + b"".join(_str(t) for t in topics)
        r = self._request(API_METADATA, 1, body)
        brokers = {}
        for _ in range(r.i32()):
            node = r.i32()
            host = r.string()
            port = r.i32()
            r.string()  # rack (nullable)
            brokers[node] = (host, port)
        r.i32()  # controller id
        parts: dict[str, dict[int, int]] = {}
        for _ in range(r.i32()):
            err = r.i16()
            name = r.string()
            r.i8()  # is_internal
            by_part = {}
            for _ in range(r.i32()):
                perr = r.i16()
                pid = r.i32()
                leader = r.i32()
                for _ in range(r.i32()):  # replicas
                    r.i32()
                for _ in range(r.i32()):  # isr
                    r.i32()
                if perr:
                    raise KafkaError(perr, f"metadata {name}/{pid}")
                by_part[pid] = leader
            if err:
                raise KafkaError(err, f"metadata {name}")
            parts[name] = by_part
        return brokers, parts

    # ---- ListOffsets v1 (timestamp -2 earliest / -1 latest)

    def list_offset(self, topic: str, partition: int, timestamp: int) -> int:
        body = (
            struct.pack(">i", -1)  # replica_id
            + struct.pack(">i", 1) + _str(topic)
            + struct.pack(">i", 1) + struct.pack(">iq", partition, timestamp)
        )
        r = self._request(API_LIST_OFFSETS, 1, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                r.i64()  # timestamp
                off = r.i64()
                if err:
                    raise KafkaError(err, f"list_offsets {topic}/{pid}")
                return off
        raise IOError(f"list_offsets returned nothing for {topic}/{partition}")

    # ---- Fetch v2

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 500):
        """-> (messages [(offset, ts, key, value)], high_watermark)"""
        body = (
            struct.pack(">iii", -1, max_wait_ms, 1)  # replica, wait, min_bytes
            + struct.pack(">i", 1) + _str(topic)
            + struct.pack(">i", 1) + struct.pack(">iqi", partition, offset, max_bytes)
        )
        r = self._request(API_FETCH, 2, body)
        r.i32()  # throttle_time_ms
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                hw = r.i64()
                n = r.i32()
                raw = r.raw(n)
                if err:
                    raise KafkaError(err, f"fetch {topic}/{pid}")
                return decode_message_set(raw), hw
        raise IOError(f"fetch returned nothing for {topic}/{partition}")

    # ---- Produce v2 (acks=-1 'all', the reference's setting)

    def produce(self, topic: str, partition: int, messages,
                acks: int = -1, timeout_ms: int = 30000) -> int:
        """messages: [(timestamp_ms, key|None, value)] -> base offset."""
        ms = encode_message_set(messages)
        body = (
            struct.pack(">hi", acks, timeout_ms)
            + struct.pack(">i", 1) + _str(topic)
            + struct.pack(">i", 1) + struct.pack(">i", partition)
            + struct.pack(">i", len(ms)) + ms
        )
        r = self._request(API_PRODUCE, 2, body)
        base = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                pid = r.i32()
                err = r.i16()
                base = r.i64()
                r.i64()  # log_append_time
                if err:
                    raise KafkaError(err, f"produce {topic}/{pid}")
        r.i32()  # throttle_time_ms
        return base


def _parse_bootstrap(servers: str) -> tuple[str, int]:
    first = servers.split(",")[0].strip()
    host, _, port = first.partition(":")
    return host, int(port or 9092)


# ------------------------------------------------------------------ reader

def project_json_value(value: str, columns: list[str], is_list: int):
    """buildOneRecord parity (KafkaReader.java:185-216): JSON object
    (isList 0) or array of objects (isList 1); each column key becomes
    a string (Java Object.toString analog), absent/null keys None."""
    if is_list == 1:
        maps = json.loads(value)
    elif is_list == 0:
        maps = [json.loads(value)]
    else:
        raise ValueError(f"isList must be 0 or 1, got {is_list}")
    rows = []
    for m in maps:
        row = []
        for c in columns:
            v = m.get(c)
            if v is None:
                row.append(None)
            elif isinstance(v, str):
                row.append(v)
            elif isinstance(v, bool):
                row.append("true" if v else "false")
            else:
                row.append(str(v))
        rows.append(row)
    return rows


def kafka_read(spark: SparkSession, p: dict) -> DataFrame:
    servers = p.get("bootstrapServers")
    if not servers:
        raise ValueError("kafkareader requires bootstrapServers")
    topic = p["topic"]
    columns = list(p.get("column") or [])
    if not columns:
        raise ValueError("kafkareader requires a column list")
    is_list = int(p.get("isList", 0))
    # reference default is latest (autoOffsetReset); a bounded batch
    # read from 'latest' is empty by definition, so earliest is the
    # useful batch default, matching the existing spark-kafka path
    reset = str(p.get("autoOffsetReset", p.get("startingOffsets", "earliest")))
    max_bytes = int(p.get("fetchMaxBytes", 1 << 20))

    host, port = _parse_bootstrap(servers)
    conn = KafkaConnection(host, port)
    try:
        brokers, parts = conn.metadata([topic])
        if topic not in parts or not parts[topic]:
            raise ValueError(f"topic {topic!r} has no partitions")
        tasks = []
        for pid, leader in sorted(parts[topic].items()):
            lhost, lport = brokers[leader]
            start = conn.list_offset(
                topic, pid, EARLIEST if reset == "earliest" else LATEST
            )
            end = conn.list_offset(topic, pid, LATEST)
            tasks.append((pid, lhost, lport, start, end))
    finally:
        conn.close()

    tasks_df = spark.createDataFrame(
        tasks, "partition int, host string, port int, start long, end long"
    ).repartition(len(tasks), "partition")
    schema = ", ".join(f"`{c}` string" for c in columns)

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            for t in pdf.itertuples(index=False):
                if t.start >= t.end:
                    continue
                c = KafkaConnection(t.host, int(t.port))
                try:
                    rows = []
                    off = int(t.start)
                    while off < t.end:
                        msgs, _hw = c.fetch(topic, int(t.partition), off,
                                            max_bytes=max_bytes)
                        if not msgs:
                            raise IOError(
                                f"fetch at {off} returned no messages below "
                                f"end offset {t.end} (max_bytes too small "
                                f"for one message?)"
                            )
                        for moff, _ts, _key, value in msgs:
                            if moff >= t.end:
                                break
                            rows.extend(project_json_value(
                                value.decode("utf-8"), columns, is_list))
                        off = msgs[-1][0] + 1
                finally:
                    c.close()
                if rows:
                    yield pd.DataFrame(rows, columns=columns)

    return tasks_df.mapInPandas(scan, schema=schema)


# ------------------------------------------------------------------ writer

def _render_value(v, column_type: str):
    """putValueToMap parity (KafkaWriter.java:150-183)."""
    import datetime as _dt

    if v is None:
        return None
    if column_type in ("Integer", "Long"):
        return int(v)
    if column_type == "Double":
        return float(v)
    if column_type == "Decimal":
        return float(v)
    if column_type == "Boolean":
        return bool(v)
    if column_type in ("String", "Date", "Byte"):
        if isinstance(v, (_dt.datetime, _dt.date)):
            return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else str(v)
        if isinstance(v, (bytes, bytearray)):
            return v.decode("utf-8", "replace")
        return str(v)
    raise ValueError(f"[column.columnType] invalid: {column_type}")


def kafka_write(df: DataFrame, p: dict) -> dict:
    servers = p.get("bootstrapServers")
    if not servers:
        raise ValueError("kafkawriter requires bootstrapServers")
    topic = p["topic"]
    column_map = list(p.get("column") or [])
    if not column_map:
        raise ValueError("kafkawriter requires a column list")
    batch_bytes = int(p.get("batchSize", 16384))  # producer batch.size analog

    host, port = _parse_bootstrap(servers)
    conn = KafkaConnection(host, port)
    try:
        brokers, parts = conn.metadata([topic])
        targets = [
            (pid,) + brokers[leader] for pid, leader in sorted(parts[topic].items())
        ]
    finally:
        conn.close()
    if not targets:
        raise ValueError(f"topic {topic!r} has no partitions")
    names = [m["columnName"] for m in column_map]
    types = [m.get("columnType", "String") for m in column_map]

    def put_partition(batches):
        import pandas as pd

        conns: dict[int, KafkaConnection] = {}
        bufs: dict[int, list] = {pid: [] for pid, _, _ in targets}
        sizes: dict[int, int] = {pid: 0 for pid, _, _ in targets}
        written = 0
        dirty = 0
        rr = 0

        def flush(pid: int):
            nonlocal written
            if not bufs[pid]:
                return
            if pid not in conns:
                _, h, prt = next(t for t in targets if t[0] == pid)
                conns[pid] = KafkaConnection(h, int(prt))
            conns[pid].produce(topic, pid, bufs[pid])
            written += len(bufs[pid])
            bufs[pid].clear()
            sizes[pid] = 0

        try:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    try:
                        obj = {}
                        for i, name in enumerate(names):
                            v = row[i]
                            try:
                                if pd.isna(v):
                                    v = None
                            except (TypeError, ValueError):
                                pass
                            obj[name] = _render_value(v, types[i])
                        value = json.dumps(obj, sort_keys=True).encode("utf-8")
                    except Exception:
                        dirty += 1
                        continue
                    pid = targets[rr % len(targets)][0]
                    rr += 1
                    bufs[pid].append((0, None, value))
                    sizes[pid] += len(value) + 34  # message overhead
                    if sizes[pid] >= batch_bytes:
                        flush(pid)
            for pid in bufs:
                flush(pid)
        finally:
            for c in conns.values():
                c.close()
        yield pd.DataFrame({"written": [written], "dirty": [dirty]})

    totals = (
        df.mapInPandas(put_partition, schema="written long, dirty long")
        .groupBy()
        .sum("written", "dirty")
        .collect()[0]
    )
    return {"written": int(totals[0] or 0), "dirty": int(totals[1] or 0)}
