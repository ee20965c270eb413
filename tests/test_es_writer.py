"""elasticsearchwriter against an in-process fake ES (plain HTTP).

The fake implements the five endpoints the writer uses — index
exists/create/delete, ``_bulk`` NDJSON ingest, ``_alias`` lookup and
atomic ``_aliases`` modification — enough to drive the reference flow
(ESWriter.java prepare → bulk → alias swap) end to end: cleanup
semantics, id-column concatenation, array splitting, mapping
generation, item-level 400 handling, and the zero-downtime alias
switch.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sinks.es_writer import build_mappings, write_elasticsearch
from datax_spark.sinks.writers import write_sink


class FakeES:
    def __init__(self):
        self.indices: dict[str, dict] = {}  # name -> {"docs": {id: src}, "auto": [], "body": {...}}
        self.aliases: dict[str, set[str]] = {}  # alias -> set(index)
        self.fail_next_bulk: int = 0  # respond 503 to the next N bulks
        self.reject_doc_field: str | None = None  # item-level 400 trigger

    def bulk(self, lines: list[str]) -> dict:
        items = []
        it = iter(lines)
        for action_line in it:
            action = json.loads(action_line)
            meta = action["index"]
            src = json.loads(next(it))
            idx = self.indices.setdefault(
                meta["_index"], {"docs": {}, "auto": [], "body": {}}
            )
            if self.reject_doc_field and self.reject_doc_field in src:
                items.append({"index": {"status": 400, "error": "mapper_parsing"}})
                continue
            if "_id" in meta:
                idx["docs"][meta["_id"]] = src
            else:
                idx["auto"].append(src)
            items.append({"index": {"status": 201}})
        errors = any(i["index"]["status"] >= 300 for i in items)
        return {"errors": errors, "items": items}


ES = FakeES()


class _Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        return self.rfile.read(int(self.headers.get("Content-Length", 0)))

    def do_GET(self):  # noqa: N802
        parts = self.path.strip("/").split("/")
        if parts[0] == "_alias":
            alias = parts[1]
            hits = {
                i: {"aliases": {alias: {}}} for i in ES.aliases.get(alias, set())
            }
            if hits:
                self._json(200, hits)
            else:
                self._json(404, {"error": "alias missing"})
        elif parts[0] in ES.indices:
            self._json(200, {parts[0]: ES.indices[parts[0]]["body"]})
        else:
            self._json(404, {"error": "no such index"})

    def do_PUT(self):  # noqa: N802
        name = self.path.strip("/")
        body = json.loads(self._body() or b"{}")
        if name in ES.indices:
            self._json(400, {"error": {"type": "resource_already_exists_exception"}})
            return
        ES.indices[name] = {"docs": {}, "auto": [], "body": body}
        self._json(200, {"acknowledged": True})

    def do_DELETE(self):  # noqa: N802
        name = self.path.strip("/")
        if ES.indices.pop(name, None) is None:
            self._json(404, {"error": "no such index"})
            return
        for a in ES.aliases.values():
            a.discard(name)
        self._json(200, {"acknowledged": True})

    def do_POST(self):  # noqa: N802
        if self.path.rstrip("/").endswith("_bulk"):
            if ES.fail_next_bulk > 0:
                ES.fail_next_bulk -= 1
                self._json(503, {"error": "unavailable"})
                return
            lines = [l for l in self._body().decode().split("\n") if l.strip()]
            self._json(200, ES.bulk(lines))
        elif self.path.rstrip("/").endswith("_aliases"):
            body = json.loads(self._body())
            for act in body["actions"]:
                if "add" in act:
                    ES.aliases.setdefault(act["add"]["alias"], set()).add(
                        act["add"]["index"]
                    )
                elif "remove" in act:
                    ES.aliases.get(act["remove"]["alias"], set()).discard(
                        act["remove"]["index"]
                    )
            self._json(200, {"acknowledged": True})
        else:
            self._json(404, {"error": "bad route"})

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def es():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


COLUMNS = [
    {"name": "pk", "type": "id"},
    {"name": "ver", "type": "id"},
    {"name": "title", "type": "text", "analyzer": "ik_max_word"},
    {"name": "tags", "type": "keyword", "array": True},
    {"name": "score", "type": "double"},
]


def _write(spark, es, index, extra=None, df=None):
    if df is None:
        df = spark.createDataFrame(
            [("a", 1, "hello world", "x,y,z", 0.5), ("b", 2, "bye", "k", 1.5)],
            ["pk", "ver", "title", "tags", "score"],
        )
    cfg = {
        "endpoint": es,
        "index": index,
        "type": "doc",
        "column": COLUMNS,
        "batchSize": 1,
        "cleanup": True,
        **(extra or {}),
    }
    return write_sink(df, "elasticsearchwriter", cfg)


def test_mappings_exclude_id_and_forward_attrs():
    mappings, id_cols, data_cols = build_mappings(COLUMNS, "doc")
    assert id_cols == ["pk", "ver"]
    props = mappings["doc"]["properties"]
    assert "pk" not in props and "ver" not in props
    assert props["title"] == {"type": "text", "analyzer": "ik_max_word"}
    assert [c["name"] for c in data_cols] == ["title", "tags", "score"]


def test_bulk_index_ids_arrays_and_mapping(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    _write(spark, es, "docs_v1", extra={"settings": {"number_of_shards": 3}})
    idx = ES.indices["docs_v1"]
    assert idx["body"]["settings"] == {"number_of_shards": 3}
    assert "title" in idx["body"]["mappings"]["doc"]["properties"]
    # ids concatenate in column order (ESWriter.java:335-341)
    assert set(idx["docs"]) == {"a1", "b2"}
    assert idx["docs"]["a1"]["tags"] == ["x", "y", "z"]
    assert idx["docs"]["a1"]["score"] == 0.5
    # id columns feed _id only, never the source doc
    # (ESWriter.java doBatchInsert: the ID case breaks without data.put)
    assert "pk" not in idx["docs"]["a1"] and "ver" not in idx["docs"]["a1"]


def test_cleanup_drops_existing_docs(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    _write(spark, es, "docs_v1")
    assert set(ES.indices["docs_v1"]["docs"]) == {"a1", "b2"}
    df = spark.createDataFrame([("c", 3, "t", "q", 2.0)], ["pk", "ver", "title", "tags", "score"])
    _write(spark, es, "docs_v1", df=df)
    assert set(ES.indices["docs_v1"]["docs"]) == {"c3"}


def test_alias_swap_is_atomic_switch(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    _write(spark, es, "docs_v1", extra={"alias": "docs", "needCleanAlias": True})
    assert ES.aliases["docs"] == {"docs_v1"}
    _write(spark, es, "docs_v2", extra={"alias": "docs", "needCleanAlias": True})
    assert ES.aliases["docs"] == {"docs_v2"}  # old index removed in same call


def test_alias_without_clean_accumulates(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    _write(spark, es, "docs_v1", extra={"alias": "docs"})
    _write(spark, es, "docs_v2", extra={"alias": "docs"})
    assert ES.aliases["docs"] == {"docs_v1", "docs_v2"}


def test_transient_bulk_failure_retries(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    ES.fail_next_bulk = 2
    _write(spark, es, "docs_v1", extra={"trySize": 5})
    assert set(ES.indices["docs_v1"]["docs"]) == {"a1", "b2"}


def test_item_parse_error_respects_ignore_flag(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    ES.reject_doc_field = "score"
    try:
        _write(spark, es, "docs_v1")  # ignoreParseError default True
        assert ES.indices["docs_v1"]["docs"] == {}
        with pytest.raises(Exception):
            _write(spark, es, "docs_v2", extra={"ignoreParseError": False})
    finally:
        ES.reject_doc_field = None


def test_no_id_columns_auto_ids(spark, es):
    ES.indices.clear(); ES.aliases.clear()
    df = spark.createDataFrame([("t1",), ("t2",)], ["title"])
    write_sink(
        df,
        "elasticsearchwriter",
        {
            "endpoint": es,
            "index": "noid",
            "column": [{"name": "title", "type": "text"}],
        },
    )
    assert sorted(d["title"] for d in ES.indices["noid"]["auto"]) == ["t1", "t2"]
