"""Elasticsearch writer: bulk index + atomic alias swap over plain HTTP.

Reference parity (elasticsearchwriter/.../ESWriter.java, ESClient.java):

* **prepare** (Job.prepare, ESWriter.java:43-79): optionally delete the
  index (``cleanup``), then create it with ``settings`` and mappings
  generated from the column specs (``genMappings``,
  ESWriter.java:82-182: ``id``-typed columns join to form the document
  ``_id`` and are excluded from the mapping properties; field
  attributes like ``analyzer``/``format`` pass through).
* **write** (Task.doBatchInsert, ESWriter.java:310-447): records batch
  into ``_bulk`` NDJSON — an ``index`` action line (with ``_id`` when
  id columns exist, concatenated in column order) followed by the
  source document. ``array``-typed columns split their string value on
  ``splitter``. Item-level 400s are dirty data (ignored when
  ``ignoreParseError``, the reference default); any other item status
  fails the batch; failed batches retry ``trySize`` times.
* **post** (Job.post + ESClient.alias:183-213): point ``alias`` at the
  new index and, when ``needCleanAlias``, remove every other index
  from it — in ONE ``_aliases`` call, so readers atomically switch
  from the old index to the new (the zero-downtime reindex pattern).

Spark-first shape: the per-document JSON is serialized **JVM-side**
(``to_json(struct(...))`` with ``split()`` for array columns and
``concat`` for the id — no per-row Python anywhere); executors only
interleave constant action lines and POST, one connection per
partition, batches of ``batchSize``. Parallelism = partitions, which
is the scale story the reference's fixed channel count approximates.
Delivery is at-least-once under task retry; bulk indexing by ``_id``
is idempotent, matching the reference's semantics.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# field attributes forwarded verbatim into the mapping (ESWriter.java's
# genMappings passes these through from the column spec)
_FIELD_ATTRS = (
    "analyzer", "format", "doc_values", "ignore_above", "index", "norms",
    "index_options", "eager_global_ordinals", "tree", "precision",
)


def _http(method: str, url: str, payload=None, headers=None, timeout: float = 60.0):
    """One JSON HTTP call; returns (status, parsed-body-or-None).
    4xx returns instead of raising so callers can branch on status."""
    data = None
    hdrs = {"Content-Type": "application/json"}
    hdrs.update(headers or {})
    if payload is not None:
        data = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data, headers=hdrs, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            return resp.status, (json.loads(body) if body else None)
    except urllib.error.HTTPError as e:
        body = e.read()
        try:
            return e.code, (json.loads(body) if body else None)
        except Exception:
            return e.code, None


def _auth_headers(p: dict) -> dict:
    if p.get("accessId"):
        import base64

        tok = base64.b64encode(
            f"{p['accessId']}:{p.get('accessKey', '')}".encode()
        ).decode()
        return {"Authorization": f"Basic {tok}"}
    return {}


def build_mappings(columns: list[dict], type_name: str) -> tuple[dict, list[str], list[dict]]:
    """genMappings parity: returns (mappings, id_column_names,
    non-id column specs). ``pk``-named columns coerce to id for
    back-compat, as in ESWriter.java:104-108."""
    props: dict = {}
    id_cols: list[str] = []
    data_cols: list[dict] = []
    for col in columns:
        name, ctype = col["name"], str(col.get("type", "")).lower()
        if not ctype:
            raise ValueError(f"column {name!r} must have a type")
        if ctype == "id" or name == "pk":
            id_cols.append(name)
            continue
        field = {"type": ctype}
        for a in _FIELD_ATTRS:
            if a in col:
                field[a] = col[a]
        props[name] = field
        data_cols.append(col)
    return {type_name: {"properties": props}}, id_cols, data_cols


def prepare_index(p: dict) -> None:
    """Job.prepare parity: cleanup → create with settings+mappings
    (an already-existing index is fine when not cleaning up)."""
    endpoint = p["endpoint"].rstrip("/")
    index = p["index"]
    type_name = p.get("type", "_doc")
    headers = _auth_headers(p)
    mappings, _, _ = build_mappings(list(p.get("column") or []), type_name)
    status, _ = _http("GET", f"{endpoint}/{index}", headers=headers)
    exists = status == 200
    if p.get("cleanup") and exists:
        st, body = _http("DELETE", f"{endpoint}/{index}", headers=headers)
        if st >= 300:
            raise IOError(f"delete index {index} failed: HTTP {st} {body}")
        exists = False
    body = {"settings": p.get("settings") or {}, "mappings": mappings}
    st, rbody = _http("PUT", f"{endpoint}/{index}", payload=body, headers=headers)
    if st >= 300 and not (st == 400 and exists):
        # reference createIndex auto-ignores resource_already_exists
        raise IOError(f"create index {index} failed: HTTP {st} {rbody}")


def swap_alias(p: dict) -> None:
    """Job.post + ESClient.alias parity: add alias→index and (when
    needCleanAlias) remove the alias from every other index, in one
    atomic ``_aliases`` call."""
    alias = p.get("alias")
    if not alias:
        return
    endpoint = p["endpoint"].rstrip("/")
    index = p["index"]
    headers = _auth_headers(p)
    actions = [{"add": {"index": index, "alias": alias}}]
    st, current = _http("GET", f"{endpoint}/_alias/{alias}", headers=headers)
    if st == 200 and isinstance(current, dict) and p.get("needCleanAlias"):
        for other in current:
            if other != index:
                actions.append({"remove": {"index": other, "alias": alias}})
    st, body = _http(
        "POST", f"{endpoint}/_aliases", payload={"actions": actions}, headers=headers
    )
    if st >= 300:
        raise IOError(f"alias swap failed: HTTP {st} {body}")


def _doc_frame(df: DataFrame, p: dict) -> DataFrame:
    """JVM-side serialization: one JSON source string per row plus the
    concatenated id (empty string = no id). Array columns split on
    ``splitter`` (default ","), everything else keeps its native type
    through ``to_json``."""
    columns = list(p.get("column") or [{"name": c, "type": "keyword"} for c in df.columns])
    _, id_cols, data_cols = build_mappings(columns, p.get("type", "_doc"))
    splitter = p.get("splitter", ",")
    fields = []
    for col in data_cols:
        name = col["name"]
        c = F.col(name)
        if col.get("array"):
            c = F.split(c.cast("string"), F.lit(splitter), -1)
        fields.append(c.alias(name))
    id_expr = (
        F.concat(*[F.col(c).cast("string") for c in id_cols])
        if id_cols
        else F.lit("")
    )
    return df.select(
        F.to_json(F.struct(*fields)).alias("__src"), id_expr.alias("__id")
    )


def write_elasticsearch(df: DataFrame, p: dict) -> dict:
    """Full writer flow: prepare index → parallel bulk → alias swap."""
    endpoint = p["endpoint"].rstrip("/")
    index = p["index"]
    batch = int(p.get("batchSize", 1000))
    try_size = int(p.get("trySize", 3))
    ignore_parse_error = bool(p.get("ignoreParseError", True))
    ignore_write_error = bool(p.get("ignoreWriteError", False))
    headers = _auth_headers(p)

    prepare_index(p)

    def send_partition(rows) -> None:
        buf: list[str] = []

        def flush() -> None:
            if not buf:
                return
            data = ("\n".join(buf) + "\n").encode("utf-8")
            last_err = None
            for attempt in range(try_size):
                st, body = _http(
                    "POST", f"{endpoint}/_bulk", payload=data,
                    headers={**headers, "Content-Type": "application/x-ndjson"},
                )
                if st == 200 and isinstance(body, dict):
                    if not body.get("errors"):
                        buf.clear()
                        return
                    # item-level failures: 400 = dirty data
                    # (ignorable); anything else fails the batch
                    # (ESWriter.java:408-427)
                    for item in body.get("items", []):
                        act = item.get("index") or item.get("create") or {}
                        status = act.get("status", 200)
                        if status >= 300 and status != 400:
                            raise IOError(f"bulk item failed: {act}")
                        if status == 400 and not ignore_parse_error:
                            raise IOError(f"bulk parse error: {act}")
                    buf.clear()
                    return
                last_err = f"HTTP {st}: {body}"
                time.sleep(min(2.0**attempt * 0.1, 5.0))
            if ignore_write_error:
                buf.clear()
                return
            raise IOError(f"bulk failed after {try_size} tries: {last_err}")

        for row in rows:
            action = {"index": {"_index": index}}
            if row["__id"]:
                action["index"]["_id"] = row["__id"]
            buf.append(json.dumps(action))
            buf.append(row["__src"])
            if len(buf) >= 2 * batch:
                flush()
        flush()

    _doc_frame(df, p).foreachPartition(send_partition)
    swap_alias(p)
    return {"index": index, "alias": p.get("alias")}
