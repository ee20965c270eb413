"""OCS (memcached-compatible cache) writer over the public memcached
text protocol.

Reference parity (ocswriter/.../OcsWriter.java, Key.java,
ConfigurationChecker.java):

* **key** (buildKey, OcsWriter.java:242-268): the columns at the
  configured ``indexes`` positions (default ``"0"``), string-formed
  and joined by ``fieldDelimiter`` (default ``\\u0001``). An empty key
  is a dirty record; a key component containing the delimiter is a
  dirty record.
* **value** (buildValue, OcsWriter.java:202-236): ALL columns
  string-formed and joined by ``fieldDelimiter``; any value containing
  the delimiter is a dirty record (binary columns are dirty in the
  reference — here ``binary``-typed columns are rejected up front).
* **writeMode** (ConfigurationChecker.WRITE_MODE, commit/
  commitWithRetry OcsWriter.java:127-199): ``set``/``add``/``replace``
  are idempotent and retried (reference: 3 tries); ``append``/
  ``prepend`` are NOT idempotent and never retried (the reference's
  own warning). A definitive ``NOT_STORED``/``EXISTS`` reply is a
  dirty RECORD (the reference funnels commit failures into
  ``collectDirtyRecord``), not a job failure — ``add`` on an existing
  key is data-dependent, not transient.
* **expireTime** seconds passed through as the memcached ``exptime``.

Transport: the reference uses the spymemcached BINARY protocol client;
this implementation speaks the public memcached TEXT protocol
(``set <key> <flags> <exptime> <bytes>\\r\\n<data>\\r\\n`` →
``STORED``/``NOT_STORED``) — same command set, same semantics,
wire-debuggable, and drivable by an in-process fake server in tests.
Text-protocol key rules are enforced as dirty-record routing: keys
must be ≤250 bytes with no whitespace/control characters.

Spark-first shape: key/value serialization happens **JVM-side**
(``concat_ws`` over cast columns — no per-row Python); executors
stream Arrow batches through one socket per partition with PIPELINED
commands (write a whole batch, then read the batch's replies in
order), so round-trips are O(batches), not O(records). Parallelism =
partitions, the scale story the reference's fixed channel count
approximates. Delivery is at-least-once under task retry; set/replace
re-apply idempotently, matching the reference.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WRITE_MODES = ("set", "add", "replace", "append", "prepend")
# modes safe to retry on transport failure (OcsWriter.java:131-137 vs 139-142)
_IDEMPOTENT = ("set", "add", "replace")

_KEY_MAX_BYTES = 250  # memcached text-protocol limit


def kv_frame(df: DataFrame, p: dict) -> DataFrame:
    """JVM-side (key, value, dirty-reason) projection.

    ``__key``: indexes columns joined by the delimiter (NULL components
    render empty, as StringUtils.join does in buildKey).
    ``__value``: all columns joined by the delimiter.
    ``__dirty``: NULL for clean rows, else the reason string — the
    engine's quarantine convention (cast_with_quarantine).
    """
    delimiter = p.get("fieldDelimiter", "\u0001")
    indexes = [int(i) for i in str(p.get("indexes", "0")).split(",")]
    cols = df.columns
    for i in indexes:
        if not (0 <= i < len(cols)):
            raise ValueError(
                f"indexes entry {i} out of range for {len(cols)} columns "
                f"(OcsWriter.java buildKey: missing column is dirty data, "
                f"but a statically absent column is a config error)"
            )
    for f in df.schema.fields:
        if f.dataType.simpleString() == "binary":
            raise ValueError(
                f"column {f.name!r} is binary: the reference treats binary "
                f"columns as dirty data (OcsWriter.java:224-227); cast or "
                f"encode it first"
            )

    def s(name: str):
        return F.coalesce(F.col(name).cast("string"), F.lit(""))

    key = F.concat_ws(delimiter, *[s(cols[i]) for i in indexes])
    value = F.concat_ws(delimiter, *[s(c) for c in cols])
    # delimiter-in-data checks run per COMPONENT (the joined forms
    # contain the delimiter by construction)
    component_dirty = F.lit(False)
    for c in cols:
        component_dirty = component_dirty | F.col(c).cast("string").contains(delimiter)
    dirty = (
        F.when(component_dirty, F.lit("delimiter in data"))
        .when(F.length(key) == 0, F.lit("empty key"))
        .when(F.octet_length(key) > _KEY_MAX_BYTES, F.lit("key over 250 bytes"))
        .when(key.rlike(r"[\s\x00-\x1f\x7f]"), F.lit("whitespace/control in key"))
    )
    return df.select(key.alias("__key"), value.alias("__value"), dirty.alias("__dirty"))


def _send_batch(sock: socket.socket, cmds: list[bytes]) -> list[bytes]:
    """Pipeline one batch: write every command, then read one reply
    line per command (storage replies are single-line)."""
    sock.sendall(b"".join(cmds))
    replies: list[bytes] = []
    buf = b""
    while len(replies) < len(cmds):
        chunk = sock.recv(65536)
        if not chunk:
            raise ConnectionError("memcached connection closed mid-batch")
        buf += chunk
        while b"\r\n" in buf and len(replies) < len(cmds):
            line, buf = buf.split(b"\r\n", 1)
            replies.append(line)
    return replies


def write_ocs(df: DataFrame, p: dict) -> dict:
    """Full writer flow: serialize JVM-side, route dirty records, and
    apply the batch executor-parallel. Returns
    ``{"written": n, "dirty": n, "dirtyReasons": {...}}``."""
    mode = p.get("writeMode", "set")
    if mode not in WRITE_MODES:
        raise ValueError(
            f"writeMode must be one of {WRITE_MODES}, got {mode!r} "
            f"(ConfigurationChecker.WRITE_MODE)"
        )
    host = p.get("proxy")
    if not host:
        raise ValueError("proxy (ocs host) is required (ConfigurationChecker)")
    port = int(p.get("port", 11211))
    exptime = int(p.get("expireTime", 0))
    batch = int(p.get("batchSize", 100))
    tries = int(p.get("maxRetryTime", 3)) if mode in _IDEMPOTENT else 1

    kv = kv_frame(df, p)
    dirty_rows = kv.filter(F.col("__dirty").isNotNull())
    dirty_reasons = {
        r["__dirty"]: r["n"]
        for r in dirty_rows.groupBy("__dirty").agg(F.count("*").alias("n")).collect()
    }
    clean = kv.filter(F.col("__dirty").isNull()).select("__key", "__value")

    def apply_partition(batches):
        import pandas as pd

        sock = None

        def connect():
            s = socket.create_connection((host, port), timeout=30)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            return s

        written = 0
        not_stored = 0
        for pdf in batches:
            keys = pdf["__key"].tolist()
            vals = pdf["__value"].tolist()
            for start in range(0, len(keys), batch):
                cmds = []
                for k, v in zip(keys[start : start + batch], vals[start : start + batch]):
                    data = v.encode("utf-8")
                    head = (
                        f"{mode} {k} 0 {exptime} {len(data)}\r\n"
                        if mode in _IDEMPOTENT
                        else f"{mode} {k} 0 0 {len(data)}\r\n"
                    )
                    cmds.append(head.encode("utf-8") + data + b"\r\n")
                last_err = None
                for attempt in range(tries):
                    try:
                        if sock is None:
                            sock = connect()
                        replies = _send_batch(sock, cmds)
                        break
                    except (OSError, ConnectionError) as e:
                        last_err = e
                        if sock is not None:
                            try:
                                sock.close()
                            except OSError:
                                pass
                            sock = None
                        time.sleep(min(2.0**attempt * 0.1, 2.0))
                else:
                    raise IOError(
                        f"ocs batch failed after {tries} tries "
                        f"({mode}: {'retried' if tries > 1 else 'non-idempotent, no retry'}): {last_err}"
                    )
                for rep in replies:
                    if rep == b"STORED":
                        written += 1
                    elif rep in (b"NOT_STORED", b"EXISTS", b"NOT_FOUND"):
                        # definitive, data-dependent: dirty record
                        # (reference collectDirtyRecord on commit failure)
                        not_stored += 1
                    else:
                        raise IOError(f"ocs protocol error: {rep!r}")
        if sock is not None:
            try:
                sock.sendall(b"quit\r\n")
                sock.close()
            except OSError:
                pass
        yield pd.DataFrame({"written": [written], "not_stored": [not_stored]})

    totals = (
        clean.mapInPandas(apply_partition, schema="written long, not_stored long")
        .groupBy()
        .sum("written", "not_stored")
        .collect()[0]
    )
    written = totals[0] or 0
    not_stored = totals[1] or 0
    if not_stored:
        dirty_reasons["commit not stored"] = not_stored
    return {
        "written": int(written),
        "dirty": int(sum(dirty_reasons.values())),
        "dirtyReasons": {k: int(v) for k, v in dirty_reasons.items()},
    }
