"""Custom stateful streaming operator: running LWW key state via
``applyInPandasWithState``.

Where the foreachBatch sink (replay_stream.py) materializes state into
the lake table, this operator keeps the per-key LWW winner in Spark's
STATE STORE and emits one change row whenever a key's winner advances
— the building block for a downstream-notify / changelog-compaction
topology (emit only net changes per key per batch, not every event).

Reference analog: otsstreamreader's per-shard RecordProcessor holds
in-memory per-key progress while replaying (``RecordProcessor.java:
186-239``); Spark's state store makes that fault-tolerant (checkpointed
with the query, restored on restart).

Arrow batching: the user function receives pandas DataFrames per key
group — vectorized, never per-row Python over the wire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)

# state = the current winner's ordering tuple + liveness
STATE_SCHEMA = T.StructType(
    [
        T.StructField("commit", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ]
)


def _lww_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per key-group: fold this batch's events into the stored winner;
    emit a row iff the winner advanced (LWW on (commit, lsn))."""
    best_commit, best_lsn, best_deleted = None, None, None
    if state.exists:
        best_commit, best_lsn, best_deleted = state.get

    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        # batch-local winner first (vectorized idxmax on the order key)
        pdf = pdf.sort_values(["commit", "lsn"], kind="mergesort")
        top = pdf.iloc[-1]
        if best_commit is None or (str(top["commit"]), int(top["lsn"])) > (
            best_commit,
            best_lsn,
        ):
            best_commit = str(top["commit"])
            best_lsn = int(top["lsn"])
            best_deleted = str(top["op"]) == "D"
            changed = True

    if changed:
        state.update((best_commit, best_lsn, bool(best_deleted)))
        yield pd.DataFrame(
            {
                "repo": [key[0]],
                "path": [key[1]],
                "commit": [best_commit],
                "lsn": [best_lsn],
                "op": ["D" if best_deleted else "U"],
                "deleted": [bool(best_deleted)],
            }
        )


def lww_state_stream(events: DataFrame) -> DataFrame:
    """Apply the stateful LWW operator to a streaming events frame
    keyed by (repo, path); returns the change stream of winners."""
    return (
        events.groupBy("repo", "path")
        .applyInPandasWithState(
            _lww_update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
