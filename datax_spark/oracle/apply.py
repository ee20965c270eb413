"""Sequential-apply oracle: the ground truth for CDC replay.

Reads the generated event-log parquet with pyarrow/pandas, sorts by
``(commit, lsn)`` — NOT file order — and applies insert/update/delete
one event at a time into a dict keyed by ``(repo, path)``. This is the
single-threaded, obviously-correct semantics the distributed engine
must reproduce bit-for-bit (per-row sha256(content) equality,
BASELINE.json input_hint).

Mirrors the reference's replay contract: otsstreamreader replays shard
records in sequenceId order with deletes applied in-stream
(``RecordProcessor.java:186-239``; delete ops DO/DA/DR in
``MultiVerModeRecordSender.java:83-121``), and the RDBMS writer applies
them last-writer-wins (``WriterUtil.java:150-170`` ON DUPLICATE KEY
UPDATE).
"""

from __future__ import annotations

import glob
import hashlib
import os
import re

import pandas as pd


def _read_events(events_root: str, max_epoch: int | None = None) -> pd.DataFrame:
    frames = []
    for epoch_dir in sorted(glob.glob(os.path.join(events_root, "epoch=*"))):
        m = re.search(r"epoch=(\d+)$", epoch_dir)
        epoch = int(m.group(1))
        if max_epoch is not None and epoch > max_epoch:
            continue
        for f in sorted(glob.glob(os.path.join(epoch_dir, "*.parquet"))):
            df = pd.read_parquet(f)
            df["epoch"] = epoch
            frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    if "lang_variant" not in out.columns:
        out["lang_variant"] = None
    return out


def sequential_apply(
    events_root: str,
    max_epoch: int | None = None,
    max_lsn: int | None = None,
    min_lsn: int | None = None,
) -> pd.DataFrame:
    """Replay all events up to ``max_epoch`` inclusive; return final state.

    ``max_lsn`` / ``min_lsn`` cut the log by position instead of epoch
    boundary (both inclusive): ``max_lsn`` yields "source state as
    captured at log position P" (the incremental-bootstrap chunk
    ground truth), ``min_lsn`` yields "state a tail starting mid-log
    would build from nothing" (the retained-suffix ground truth).

    Output columns: repo, path, commit, lsn, lang, content,
    lang_variant, content_sha256 — sorted by (repo, path).
    """
    ev = _read_events(events_root, max_epoch)
    if max_lsn is not None:
        ev = ev[ev["lsn"] <= max_lsn]
    if min_lsn is not None:
        ev = ev[ev["lsn"] >= min_lsn]
    ev = ev.sort_values(["commit", "lsn"], kind="mergesort")
    state: dict[tuple[str, str], dict] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lsn": row.lsn,
                "lang": row.lang,
                "content": row.content,
                "lang_variant": row.lang_variant,
            }
    if not state:
        return pd.DataFrame(
            columns=[
                "repo", "path", "commit", "lsn", "lang", "content",
                "lang_variant", "content_sha256",
            ]
        )
    out = pd.DataFrame(list(state.values()))
    out["content_sha256"] = out["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest() if c is not None else None
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def sequential_scd2(
    events_root: str, max_epoch: int | None = None
) -> pd.DataFrame:
    """Ground truth for the SCD2 history target (lake/scd2.py): replay
    the log one event at a time in (commit, lsn) order, keeping EVERY
    version as a validity interval. An upsert closes the key's open
    interval (valid_to = the upsert's own position) and opens a new
    one; a delete closes without opening; identical (key, commit, lsn)
    re-deliveries collapse to one event.

    Output: repo, path, commit, lsn, lang, content, lang_variant,
    valid_to_commit, valid_to_lsn, is_current — sorted by
    (repo, path, lsn).
    """
    ev = _read_events(events_root, max_epoch)
    ev = ev.sort_values(["commit", "lsn"], kind="mergesort").drop_duplicates(
        subset=["repo", "path", "commit", "lsn"]
    )
    hist: list[dict] = []
    open_idx: dict[tuple, int] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        i = open_idx.pop(key, None)
        if i is not None:
            hist[i]["valid_to_commit"] = row.commit
            hist[i]["valid_to_lsn"] = row.lsn
            hist[i]["is_current"] = False
        if row.op != "D":
            hist.append(
                {
                    "repo": row.repo,
                    "path": row.path,
                    "commit": row.commit,
                    "lsn": row.lsn,
                    "lang": row.lang,
                    "content": row.content,
                    "lang_variant": row.lang_variant,
                    "valid_to_commit": None,
                    "valid_to_lsn": None,
                    "is_current": True,
                }
            )
            open_idx[key] = len(hist) - 1
    cols = [
        "repo", "path", "commit", "lsn", "lang", "content", "lang_variant",
        "valid_to_commit", "valid_to_lsn", "is_current",
    ]
    if not hist:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(hist, columns=cols)
    out["valid_to_lsn"] = out["valid_to_lsn"].astype("Int64")
    return out.sort_values(["repo", "path", "lsn"]).reset_index(drop=True)
