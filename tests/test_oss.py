"""ossreader/writer against an in-process fake OSS speaking the real
REST surface (ListBucketResult XML, object GET/PUT/DELETE, multipart
initiate/part/complete) with header-signature verification on EVERY
request — the signing path is exercised, not mocked out.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sinks.writers import write_sink
from datax_spark.sources.oss import (
    oss_list,
    oss_publish_write,
    oss_put,
    oss_stage_read,
    resolve_objects,
)
from datax_spark.sources.readers import read_source

ACCESS_ID, ACCESS_KEY = "testid", "testkey"


class FakeOSS:
    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.uploads: dict[str, dict[int, bytes]] = {}
        self.lock = threading.Lock()
        self._uid = 0
        self.signature_failures = 0


OSS = FakeOSS()
BUCKET = "lake"


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    # ---- signature check (the documented OSS header scheme)
    def _check_sig(self) -> bool:
        auth = self.headers.get("Authorization", "")
        date = self.headers.get("Date", "")
        ctype = self.headers.get("Content-Type", "") or ""
        path = urllib.parse.urlparse(self.path)
        resource = path.path
        q = path.query
        if q and "=" not in q.split("&", 1)[0]:
            resource += f"?{q}"
        msg = f"{self.command}\n\n{ctype}\n{date}\n{resource}"
        mac = hmac.new(ACCESS_KEY.encode(), msg.encode(), hashlib.sha1)
        want = f"OSS {ACCESS_ID}:{base64.b64encode(mac.digest()).decode()}"
        if auth != want:
            OSS.signature_failures += 1
            return False
        return True

    def _reply(self, code: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def _key(self) -> str:
        path = urllib.parse.urlparse(self.path).path
        return urllib.parse.unquote(path[len(f"/{BUCKET}/") :])

    def do_GET(self):
        if not self._check_sig():
            return self._reply(403)
        parsed = urllib.parse.urlparse(self.path)
        key = self._key()
        if not key:  # list
            qs = urllib.parse.parse_qs(parsed.query)
            prefix = qs.get("prefix", [""])[0]
            marker = qs.get("marker", [""])[0]
            with OSS.lock:
                keys = sorted(
                    k for k in OSS.objects if k.startswith(prefix) and k > marker
                )
            page, rest = keys[:3], keys[3:]  # tiny pages force marker paging
            xml = ["<ListBucketResult>"]
            for k in page:
                xml.append(
                    f"<Contents><Key>{k}</Key>"
                    f"<Size>{len(OSS.objects[k])}</Size></Contents>"
                )
            xml.append(f"<IsTruncated>{'true' if rest else 'false'}</IsTruncated>")
            if rest:
                xml.append(f"<NextMarker>{page[-1]}</NextMarker>")
            xml.append("</ListBucketResult>")
            return self._reply(200, "".join(xml).encode())
        with OSS.lock:
            body = OSS.objects.get(key)
        if body is None:
            return self._reply(404)
        return self._reply(200, body)

    def do_PUT(self):
        if not self._check_sig():
            return self._reply(403)
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        key = self._key()
        qs = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
        if "partNumber" in qs:
            uid = qs["uploadId"][0]
            part = int(qs["partNumber"][0])
            with OSS.lock:
                OSS.uploads.setdefault(uid, {})[part] = data
            etag = hashlib.md5(data).hexdigest()
            return self._reply(200, headers={"ETag": f'"{etag}"'})
        with OSS.lock:
            OSS.objects[key] = data
        return self._reply(200)

    def do_POST(self):
        if not self._check_sig():
            return self._reply(403)
        key = self._key()
        parsed = urllib.parse.urlparse(self.path)
        n = int(self.headers.get("Content-Length", 0))
        self.rfile.read(n)
        if parsed.query == "uploads":
            with OSS.lock:
                OSS._uid += 1
                uid = f"u{OSS._uid}"
                OSS.uploads[uid] = {}
            return self._reply(
                200,
                f"<InitiateMultipartUploadResult><UploadId>{uid}"
                f"</UploadId></InitiateMultipartUploadResult>".encode(),
            )
        qs = urllib.parse.parse_qs(parsed.query)
        if "uploadId" in qs:
            uid = qs["uploadId"][0]
            with OSS.lock:
                parts = OSS.uploads.pop(uid, {})
                OSS.objects[key] = b"".join(
                    parts[i] for i in sorted(parts)
                )
            return self._reply(
                200, b"<CompleteMultipartUploadResult/>"
            )
        return self._reply(400)

    def do_DELETE(self):
        if not self._check_sig():
            return self._reply(403)
        with OSS.lock:
            OSS.objects.pop(self._key(), None)
        return self._reply(204)


@pytest.fixture(scope="module")
def oss_conf():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield {
        "endpoint": f"http://127.0.0.1:{srv.server_port}",
        "bucket": BUCKET,
        "accessId": ACCESS_ID,
        "accessKey": ACCESS_KEY,
    }
    srv.shutdown()


@pytest.fixture(autouse=True)
def clean():
    with OSS.lock:
        OSS.objects.clear()
        OSS.uploads.clear()
    OSS.signature_failures = 0
    yield
    assert OSS.signature_failures == 0  # every request correctly signed


def test_list_marker_paging_and_wildcards(oss_conf):
    with OSS.lock:
        for i in range(8):
            OSS.objects[f"logs/2024/part-{i}.csv"] = b"x"
        OSS.objects["logs/2024/readme.txt"] = b"y"
        OSS.objects["other/part-0.csv"] = b"z"
    # 9 keys under logs/ at page size 3 → marker paging exercised
    assert len(oss_list(oss_conf, "logs/")) == 9
    got = resolve_objects({**oss_conf, "object": "logs/2024/part-*.csv"})
    assert got == [f"logs/2024/part-{i}.csv" for i in range(8)]
    with pytest.raises(FileNotFoundError):
        resolve_objects({**oss_conf, "object": "nope/*.csv"})


def test_stage_read_roundtrip(spark, oss_conf):
    with OSS.lock:
        OSS.objects["in/a.csv"] = b"1,alpha\n2,beta\n"
        OSS.objects["in/b.csv"] = b"3,gamma\n"
    df = read_source(
        spark, "ossreader",
        {**oss_conf, "object": "in/*.csv",
         "column": [{"index": 0, "type": "long"}, {"index": 1, "type": "string"}],
         "fieldDelimiter": ","},
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_write_modes_and_upload(spark, oss_conf):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "n long, s string"
    ).coalesce(2)
    conf = {**oss_conf, "object": "out/data", "fieldDelimiter": ","}
    res = write_sink(df, "osswriter", conf)
    assert res["files"] >= 1
    with OSS.lock:
        keys = sorted(k for k in OSS.objects if k.startswith("out/data__"))
    assert len(keys) == res["files"]
    joined = b"".join(OSS.objects[k] for k in keys).decode()
    assert sorted(joined.strip().splitlines()) == ["1,a", "2,b", "3,c"]

    # nonConflict refuses while the parts exist
    with pytest.raises(FileExistsError):
        write_sink(df, "osswriter", {**conf, "writeMode": "nonConflict"})
    # truncate replaces them
    res2 = write_sink(df, "osswriter", {**conf, "writeMode": "truncate"})
    with OSS.lock:
        keys2 = sorted(k for k in OSS.objects if k.startswith("out/data__"))
    assert len(keys2) == res2["files"]


def test_multipart_upload_path(oss_conf):
    data = bytes(range(256)) * 2048  # 512 KiB
    oss_put({**oss_conf, "multipartThreshold": 100 * 1024}, "big/obj", data)
    with OSS.lock:
        assert OSS.objects["big/obj"] == data  # reassembled from parts
        assert not OSS.uploads  # upload session completed and reaped


def test_bad_credentials_rejected(oss_conf):
    with OSS.lock:
        OSS.objects["x/a"] = b"1"
    with pytest.raises(IOError):
        oss_list({**oss_conf, "accessKey": "wrong"}, "x/")
    OSS.signature_failures = 0  # expected failure, reset for the fixture gate
