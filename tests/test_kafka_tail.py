"""Kafka changelog tail → replay engine: the binlog-tail loop, crash
recovery at both phase boundaries, and mid-stream schema evolution —
all over the real wire protocol against the in-process fake broker."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datax_spark.engine import ReplayConfig, ReplayEngine
from datax_spark.sources.kafka import KafkaConnection
from datax_spark.streaming.kafka_tail import KafkaTail
from tests.test_kafka import FakeKafkaBroker


@pytest.fixture()
def broker():
    b = FakeKafkaBroker({"changelog": 3})
    yield b
    b.stop()


def _commit(n: int) -> str:
    return f"{n:040x}"


def _ev(repo, path, op, n, lang="py", content=None, **extra):
    e = {
        "repo": repo, "path": path, "op": op,
        "commit": _commit(n), "lsn": n, "lang": lang,
        "content": content if content is not None else f"body-{repo}-{path}-{n}",
    }
    e.update(extra)
    return e


def _produce(broker, events, start_pid=0, fmt="v1"):
    """Spread events round-robin over the topic's partitions."""
    c = KafkaConnection(*broker.server_address)
    try:
        for i, e in enumerate(events):
            pid = (start_pid + i) % 3
            c.produce("changelog", pid,
                      [(0, None, json.dumps(e).encode())], fmt=fmt)
    finally:
        c.close()


def _expected_lww(all_events):
    """Pandas oracle: last (commit, lsn) writer per key, deletes drop."""
    state = {}
    for e in sorted(all_events, key=lambda e: (e["commit"], e["lsn"])):
        k = (e["repo"], e["path"])
        if e["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = e
    rows = [
        (e["repo"], e["path"], e["commit"], e["lsn"], e["content"])
        for e in state.values()
    ]
    return sorted(rows)


def _table_state(engine):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lsn"], r["content"])
        for r in engine.table().read()
        .select("repo", "path", "commit", "lsn", "content").collect()
    )


def _mk(spark, tmp_path, broker, message_format="v1", **cfg):
    roots = {n: str(tmp_path / n) for n in ("events", "table", "metrics")}
    tail = KafkaTail(
        spark, roots["events"],
        bootstrap_servers=broker.bootstrap, topic="changelog",
        message_format=message_format,
    )
    eng = ReplayEngine(
        spark, roots["events"], roots["table"], roots["metrics"],
        ReplayConfig(num_buckets=8, **cfg),
    )
    return tail, eng


def test_tail_apply_multi_round(spark, tmp_path, broker):
    r1 = [_ev("r1", f"f{i}.py", "I", i) for i in range(8)]
    r1 += [_ev("r1", "f0.py", "U", 8), _ev("r1", "f1.py", "D", 9)]
    _produce(broker, r1)

    tail, eng = _mk(spark, tmp_path, broker)
    assert tail.run(eng) == [0]
    assert _table_state(eng) == _expected_lww(r1)

    # next round starts from the checkpoint: only the new events spool
    r2 = [_ev("r2", "a.py", "I", 20), _ev("r1", "f2.py", "U", 21),
          _ev("r1", "f3.py", "D", 22)]
    _produce(broker, r2, start_pid=1)
    assert tail.run(eng) == [1]
    assert _table_state(eng) == _expected_lww(r1 + r2)
    # spool 1 holds exactly the delta
    n1 = spark.read.parquet(os.path.join(tail.events_root, "epoch=1")).count()
    assert n1 == len(r2)


def test_tail_drained_topic_is_noop(spark, tmp_path, broker):
    _produce(broker, [_ev("r", "x.py", "I", 1)])
    tail, eng = _mk(spark, tmp_path, broker)
    assert tail.run(eng) == [0]
    assert tail.spool_epoch() is None
    assert tail.run(eng) == []


def test_tail_schema_evolution_mid_stream(spark, tmp_path, broker):
    _produce(broker, [_ev("r", f"p{i}.py", "I", i) for i in range(4)])
    tail, eng = _mk(spark, tmp_path, broker)
    tail.run(eng)
    assert "lang_variant" not in eng.table().read().columns

    evolved = [
        _ev("r", "p0.py", "U", 10, lang_variant="py3"),
        _ev("r", "new.py", "I", 11, lang_variant="py2"),
    ]
    _produce(broker, evolved, start_pid=2)
    tail.run(eng)
    got = {
        r["path"]: r["lang_variant"]
        for r in eng.table().read().select("path", "lang_variant").collect()
    }
    assert got == {"p0.py": "py3", "new.py": "py2",
                   "p1.py": None, "p2.py": None, "p3.py": None}


def test_crash_between_spool_and_apply_resumes_exactly_once(
    spark, tmp_path, broker
):
    events = [_ev("r", f"k{i}.py", "I", i) for i in range(6)]
    _produce(broker, events)
    tail, eng = _mk(spark, tmp_path, broker)
    assert tail.spool_epoch() == 0  # published, engine never ran: the crash

    # fresh tailer + engine over the same roots (new process analog)
    tail2, eng2 = _mk(spark, tmp_path, broker)
    more = [_ev("r", "k0.py", "U", 10)]
    _produce(broker, more, start_pid=1)
    assert tail2.run(eng2) == [1]  # epoch 0 applied by the watermark gate
    assert _table_state(eng2) == _expected_lww(events + more)
    # nothing spooled twice
    n0 = spark.read.parquet(os.path.join(tail2.events_root, "epoch=0")).count()
    assert n0 == len(events)


def test_torn_spool_is_redone(spark, tmp_path, broker):
    events = [_ev("r", "a.py", "I", 1), _ev("r", "b.py", "I", 2)]
    _produce(broker, events)
    tail, eng = _mk(spark, tmp_path, broker)
    torn = os.path.join(tail.events_root, "epoch=0__tmp")
    os.makedirs(torn)
    with open(os.path.join(torn, "garbage.parquet"), "w") as f:
        f.write("torn")
    assert tail.spool_epoch() == 0
    assert not os.path.exists(torn)
    eng.run()
    assert _table_state(eng) == _expected_lww(events)


def test_spool_matches_engine_oracle_sha256(spark, tmp_path, broker):
    """Full-fidelity check: engine state over the kafka-spooled log
    equals the pandas sequential oracle over that same log, per-row
    content sha256 included (the north rule's invariant)."""
    from datax_spark.oracle import sequential_apply

    events = [_ev(f"r{i % 2}", f"f{i % 5}.py", "IUD"[i % 3], i)
              for i in range(30)]
    _produce(broker, events)
    tail, eng = _mk(spark, tmp_path, broker)
    tail.run(eng)

    cols = ["repo", "path", "commit", "lsn", "content_sha256"]
    got = (
        eng.table().read()
        .withColumn("content_sha256", F.sha2("content", 256))
        .select(*cols).toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = (
        sequential_apply(tail.events_root)[cols]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_dtype=False
    )


def _dbz(e, wrapper=False):
    """Engine event dict -> debezium envelope JSON (what a binlog
    source connector would publish for it)."""
    row = {k: v for k, v in e.items() if k != "op"}
    env = {
        "before": row if e["op"] == "D" else None,
        "after": None if e["op"] == "D" else row,
        "source": {"connector": "test", "db": "lake", "table": "events",
                   "lsn": e["lsn"], "ts_ms": 0},
        "op": {"I": "c", "U": "u", "D": "d"}[e["op"]],
        "ts_ms": 0,
    }
    return {"payload": env} if wrapper else env


def test_tail_debezium_envelopes_end_to_end(spark, tmp_path, broker):
    """A Debezium topic (bare + Connect-wrapped envelopes, a tombstone,
    a snapshot-read op) tails into the engine and converges to the
    same LWW state as the flat wire."""
    r1 = [_ev("r1", f"f{i}.py", "I", i) for i in range(6)]
    r1 += [_ev("r1", "f0.py", "U", 6), _ev("r1", "f1.py", "D", 7)]
    c = KafkaConnection(*broker.server_address)
    try:
        for i, e in enumerate(r1):
            c.produce("changelog", i % 3,
                      [(0, None, json.dumps(_dbz(e, wrapper=i % 2 == 0)).encode())])
        # snapshot-read op r -> I, and a tombstone-ish no-op value
        snap = _dbz(_ev("r2", "seed.py", "I", 8))
        snap["op"] = "r"
        c.produce("changelog", 0, [(0, None, json.dumps(snap).encode())])
        c.produce("changelog", 1, [(0, None, b"{}")])
    finally:
        c.close()

    roots = {n: str(tmp_path / n) for n in ("events", "table", "metrics")}
    tail = KafkaTail(
        spark, roots["events"],
        bootstrap_servers=broker.bootstrap, topic="changelog",
        value_format="debezium",
    )
    eng = ReplayEngine(
        spark, roots["events"], roots["table"], roots["metrics"],
        ReplayConfig(num_buckets=8),
    )
    assert tail.run(eng) == [0]
    want = _expected_lww(r1 + [_ev("r2", "seed.py", "I", 8)])
    assert _table_state(eng) == want

    # checkpoint survives format-specific drops: a second round of
    # debezium deletes/updates applies incrementally
    r2 = [_ev("r1", "f2.py", "D", 20), _ev("r2", "seed.py", "U", 21)]
    c = KafkaConnection(*broker.server_address)
    try:
        for i, e in enumerate(r2):
            c.produce("changelog", (1 + i) % 3,
                      [(0, None, json.dumps(_dbz(e)).encode())])
    finally:
        c.close()
    assert tail.run(eng) == [1]
    assert _table_state(eng) == _expected_lww(
        r1 + [_ev("r2", "seed.py", "I", 8)] + r2
    )


def test_tail_rejects_unknown_value_format(spark, tmp_path, broker):
    with pytest.raises(ValueError, match="value_format"):
        KafkaTail(spark, str(tmp_path / "e"),
                  bootstrap_servers=broker.bootstrap, topic="changelog",
                  value_format="avro")


def test_cli_tail_job_kind(spark, tmp_path, broker, capsys):
    """{"tail": ...} job spec: dry-run reports the checkpoint, a real
    run drains the debezium topic and applies it; a re-run is a noop
    that resumes from the published spool offsets."""
    from datax_spark.cli import main

    events = [_ev("r1", f"f{i}.py", "I", i) for i in range(5)]
    events.append(_ev("r1", "f0.py", "D", 5))
    c = KafkaConnection(*broker.server_address)
    try:
        for i, e in enumerate(events):
            c.produce("changelog", i % 3,
                      [(0, None, json.dumps(_dbz(e)).encode())])
    finally:
        c.close()

    spec = tmp_path / "tail.json"
    spec.write_text(json.dumps({
        "tail": {
            "bootstrap_servers": broker.bootstrap,
            "topic": "changelog",
            "value_format": "debezium",
            "events_root": str(tmp_path / "events"),
            "table_root": str(tmp_path / "table"),
            "metrics_root": str(tmp_path / "metrics"),
            "num_buckets": 8,
        }
    }))
    assert main(["--job", str(spec), "--dry-run"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"mode": "tail", "next_epoch": 0,
                   "checkpoint": {}, "validated": True}

    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_applied"] == [0]
    assert out["rows_after"] == 4  # 5 inserts, one deleted

    # drained topic: no new spool, table unchanged
    assert main(["--job", str(spec)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_applied"] == [] and out["rows_after"] == 4


def test_tail_v2_record_batches(spark, tmp_path, broker):
    """r4: message_format='v2' tails a topic written as KIP-98 record
    batches (Fetch v4 path) into the same exactly-once apply."""
    r1 = [_ev("r1", f"g{i}.py", "I", i) for i in range(6)]
    r1 += [_ev("r1", "g0.py", "D", 6)]
    _produce(broker, r1, fmt="v2")
    tail, eng = _mk(spark, tmp_path, broker, message_format="v2")
    assert tail.run(eng) == [0]
    assert _table_state(eng) == _expected_lww(r1)
