"""FTP transport for ftpreader / ftpwriter (stdlib ftplib).

Reference parity (ftpreader/.../FtpHelper.java, StandardFtpHelperImpl
.java; ftpwriter/.../FtpWriter.java):

* **listing** (`FtpHelper.getAllFiles/getListFiles`): each configured
  path may be a file, a directory (recursed up to ``maxTraversalLevel``
  levels), or carry a ``*``/``?`` wildcard in its last segment
  (fnmatch, like the reference's regex conversion). The result is the
  deduplicated set of absolute remote file paths.
* **read**: remote files stage to a local spool directory and Spark
  scans them with the same unstructured-text engine as txtfilereader —
  the reference likewise streams each remote file through the common
  unstructured-storage reader. FTP is a landing-zone protocol: the
  transport is sequential per connection, so at scale you mirror the
  landing zone onto shared storage once and let the distributed scan
  happen there; the staging directory is exactly that mirror.
* **write** (`FtpWriter.prepare`, FtpWriter.java:116-168): writeMode
  ``truncate`` deletes remote files under the path with the configured
  prefix, ``append`` writes alongside, ``nonConflict`` fails when any
  prefixed file exists. Spark writes the CSV part files locally and
  the transport uploads them as ``<fileName>__<part>`` like the
  reference's per-task suffixed names.
"""

from __future__ import annotations

import fnmatch
import ftplib
import os
import posixpath
import tempfile
import uuid


class _TraversalMixin:
    """FtpHelper.getListFiles parity — shared by the FTP and SFTP
    filesystems (file | dir recursion | last-segment wildcard)."""

    def get_list_files(self, path: str, level: int, max_level: int) -> set[str]:
        if level > max_level:
            raise ValueError(
                f"traversal beyond maxTraversalLevel={max_level} at {path!r}"
            )
        out: set[str] = set()
        base, last = posixpath.split(path.rstrip("/"))
        if any(ch in last for ch in "*?["):
            for entry in self.list_dir(base or "/"):
                name = posixpath.basename(entry)
                if fnmatch.fnmatch(name, last):
                    full = posixpath.join(base or "/", name)
                    out |= self.get_list_files(full, level + 1, max_level)
            return out
        if self.is_dir(path):
            for entry in self.list_dir(path):
                name = posixpath.basename(entry)
                full = posixpath.join(path, name)
                out |= self.get_list_files(full, level + 1, max_level)
            return out
        return {path}

    def get_all_files(self, paths: list[str], max_level: int = 5) -> list[str]:
        out: set[str] = set()
        for p in paths:
            out |= self.get_list_files(p, 0, max_level)
        return sorted(out)


class FtpFs(_TraversalMixin):
    """Thin ftplib wrapper with the reference helper's surface."""

    def __init__(
        self,
        host: str,
        port: int = 21,
        username: str = "anonymous",
        password: str = "",
        timeout: float = 60.0,
        connect_mode: str = "PASV",
    ):
        self.ftp = ftplib.FTP()
        self.ftp.connect(host, port, timeout=timeout)
        self.ftp.login(username, password)
        self.ftp.set_pasv(connect_mode.upper() != "PORT")

    # -- structure probes (StandardFtpHelperImpl.isDirExist/isFileExist)
    def is_dir(self, path: str) -> bool:
        cur = self.ftp.pwd()
        try:
            self.ftp.cwd(path)
            return True
        except ftplib.all_errors:
            return False
        finally:
            try:
                self.ftp.cwd(cur)
            except ftplib.all_errors:
                pass

    def list_dir(self, path: str) -> list[str]:
        try:
            return self.ftp.nlst(path)
        except ftplib.all_errors:
            return []

    # -- transfer
    def download(self, remote_files: list[str], local_dir: str | None = None) -> list[str]:
        local_dir = local_dir or tempfile.mkdtemp(prefix="ftp_stage_")
        os.makedirs(local_dir, exist_ok=True)
        locals_: list[str] = []
        for i, rf in enumerate(remote_files):
            lf = os.path.join(local_dir, f"{i:05d}_{posixpath.basename(rf)}")
            with open(lf, "wb") as f:
                self.ftp.retrbinary(f"RETR {rf}", f.write)
            locals_.append(lf)
        return locals_

    def upload(self, local_files: list[str], remote_dir: str, prefix: str) -> list[str]:
        self.mkdirs(remote_dir)
        remotes: list[str] = []
        for i, lf in enumerate(local_files):
            rf = posixpath.join(remote_dir, f"{prefix}__{i:05d}_{uuid.uuid4().hex[:8]}")
            with open(lf, "rb") as f:
                self.ftp.storbinary(f"STOR {rf}", f)
            remotes.append(rf)
        return remotes

    def mkdirs(self, path: str) -> None:
        parts = [p for p in path.split("/") if p]
        cur = "/"
        for p in parts:
            cur = posixpath.join(cur, p)
            if not self.is_dir(cur):
                self.ftp.mkd(cur)

    def delete_prefixed(self, remote_dir: str, prefix: str) -> int:
        n = 0
        for entry in self.list_dir(remote_dir):
            name = posixpath.basename(entry)
            if name.startswith(prefix):
                self.ftp.delete(posixpath.join(remote_dir, name))
                n += 1
        return n

    def prefixed_files(self, remote_dir: str, prefix: str) -> list[str]:
        return [
            e
            for e in self.list_dir(remote_dir)
            if posixpath.basename(e).startswith(prefix)
        ]

    def close(self) -> None:
        try:
            self.ftp.quit()
        except ftplib.all_errors:
            self.ftp.close()


class SftpFs(_TraversalMixin):
    """SFTP filesystem over the from-scratch SSH2 transport
    (sources/ssh.py) — the reference's SftpHelperImpl.java surface.
    Secure by default: configure ``hostKeyFingerprint`` (base64
    SHA-256 of the host key blob) or ``knownHostsFile`` (OpenSSH
    format — what JSch consults for the reference), or explicitly opt
    out with ``insecureAcceptAnyHostKey: true`` (loud RuntimeWarning).
    ``privateKeyPath`` switches to publickey auth (unencrypted
    openssh-key-v1 ed25519)."""

    def __init__(self, host: str, port: int = 22, username: str = "",
                 password: str = "", timeout: float = 60.0,
                 host_key_fingerprint: str | None = None,
                 known_hosts: str | None = None,
                 insecure_accept_any_host_key: bool = False,
                 private_key_path: str | None = None):
        from datax_spark.sources.ssh import SftpClient

        self.c = SftpClient(
            host, port, username, password, timeout,
            host_key_fingerprint=host_key_fingerprint,
            known_hosts=known_hosts,
            insecure_accept_any_host_key=insecure_accept_any_host_key,
            private_key_path=private_key_path)

    def is_dir(self, path: str) -> bool:
        return self.c.is_dir(path)

    def list_dir(self, path: str) -> list[str]:
        try:
            return [posixpath.join(path, n) for n in self.c.listdir(path)]
        except OSError:
            return []

    def download(self, remote_files: list[str],
                 local_dir: str | None = None) -> list[str]:
        local_dir = local_dir or tempfile.mkdtemp(prefix="sftp_stage_")
        os.makedirs(local_dir, exist_ok=True)
        locals_: list[str] = []
        for i, rf in enumerate(remote_files):
            lf = os.path.join(local_dir, f"{i:05d}_{posixpath.basename(rf)}")
            with open(lf, "wb") as f:
                f.write(self.c.read_file(rf))
            locals_.append(lf)
        return locals_

    def upload(self, local_files: list[str], remote_dir: str,
               prefix: str) -> list[str]:
        self.mkdirs(remote_dir)
        remotes: list[str] = []
        for i, lf in enumerate(local_files):
            rf = posixpath.join(
                remote_dir, f"{prefix}__{i:05d}_{uuid.uuid4().hex[:8]}"
            )
            with open(lf, "rb") as f:
                self.c.write_file(rf, f.read())
            remotes.append(rf)
        return remotes

    def mkdirs(self, path: str) -> None:
        parts = [p for p in path.split("/") if p]
        cur = "/"
        for p in parts:
            cur = posixpath.join(cur, p)
            if not self.is_dir(cur):
                self.c.mkdir(cur)

    def delete_prefixed(self, remote_dir: str, prefix: str) -> int:
        n = 0
        for entry in self.list_dir(remote_dir):
            if posixpath.basename(entry).startswith(prefix):
                self.c.remove(entry)
                n += 1
        return n

    def prefixed_files(self, remote_dir: str, prefix: str) -> list[str]:
        return [
            e for e in self.list_dir(remote_dir)
            if posixpath.basename(e).startswith(prefix)
        ]

    def close(self) -> None:
        self.c.close()


def _connect(p: dict) -> FtpFs | SftpFs:
    if str(p.get("protocol", "ftp")).lower() == "sftp":
        return SftpFs(
            host=p["host"],
            port=int(p.get("port", 22)),
            username=p.get("username", ""),
            password=p.get("password", ""),
            timeout=float(p.get("timeout", 60)),
            host_key_fingerprint=p.get("hostKeyFingerprint"),
            known_hosts=p.get("knownHostsFile"),
            insecure_accept_any_host_key=bool(
                p.get("insecureAcceptAnyHostKey", False)),
            private_key_path=p.get("privateKeyPath"),
        )
    return FtpFs(
        host=p["host"],
        port=int(p.get("port", 21)),
        username=p.get("username", "anonymous"),
        password=p.get("password", ""),
        timeout=float(p.get("timeout", 60)),
        connect_mode=p.get("connectPattern", "PASV"),
    )


def ftp_stage_read(p: dict) -> list[str]:
    """ftpreader transport: resolve path specs → download to the local
    staging dir → return staged file paths for the Spark scan."""
    fs = _connect(p)
    try:
        paths = p["path"] if isinstance(p["path"], list) else [p["path"]]
        remote = fs.get_all_files(paths, int(p.get("maxTraversalLevel", 5)))
        if not remote:
            raise FileNotFoundError(f"no remote files match {paths}")
        return fs.download(remote, p.get("stagingDir"))
    finally:
        fs.close()


def ftp_publish_write(local_files: list[str], p: dict) -> list[str]:
    """ftpwriter transport: apply writeMode then upload part files."""
    fs = _connect(p)
    try:
        remote_dir = p["path"]
        prefix = p.get("fileName", "part")
        mode = p.get("writeMode", "append")
        if mode == "truncate":
            fs.delete_prefixed(remote_dir, prefix)
        elif mode == "nonConflict":
            existing = fs.prefixed_files(remote_dir, prefix)
            if existing:
                raise FileExistsError(
                    f"writeMode=nonConflict: {len(existing)} files with "
                    f"prefix {prefix!r} already in {remote_dir}"
                )
        elif mode != "append":
            raise ValueError(
                f"writeMode must be truncate/append/nonConflict, got {mode!r}"
            )
        return fs.upload(local_files, remote_dir, prefix)
    finally:
        fs.close()
