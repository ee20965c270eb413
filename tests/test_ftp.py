"""ftpreader / ftpwriter against a real in-process FTP server.

The fixture implements the protocol subset stdlib ftplib actually
speaks (USER/PASS, TYPE, PASV data connections, PWD/CWD, NLST, RETR,
STOR, DELE, MKD, QUIT) over a directory-jailed local root, so the
transport code runs the genuine wire protocol: recursive listing with
wildcards, staged download feeding the Spark CSV scan, and upload with
the reference's truncate/append/nonConflict writeMode semantics
(FtpWriter.java:116-168, FtpHelper.java getAllFiles)."""

from __future__ import annotations

import os
import posixpath
import socket
import threading

import pytest

from datax_spark.sources.ftp import FtpFs, ftp_stage_read
from datax_spark.sources.readers import read_source
from datax_spark.sinks.writers import write_sink


class MiniFtpServer(threading.Thread):
    """Single-purpose FTP server: passive mode only, rooted at `root`."""

    def __init__(self, root: str):
        super().__init__(daemon=True)
        self.root = root
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self.running = True

    def local(self, vpath: str, cwd: str) -> str:
        v = vpath if vpath.startswith("/") else posixpath.join(cwd, vpath)
        v = posixpath.normpath(v)
        return os.path.join(self.root, v.lstrip("/"))

    def run(self):
        while self.running:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(target=self.session, args=(conn,), daemon=True).start()

    def session(self, conn: socket.socket):
        cwd = "/"
        data_listener = None

        def send(line: str):
            conn.sendall((line + "\r\n").encode())

        def open_data():
            nonlocal data_listener
            if data_listener is None:
                return None
            d, _ = data_listener.accept()
            return d

        send("220 mini ftp ready")
        f = conn.makefile("r", encoding="utf-8", newline="\r\n")
        for raw in f:
            parts = raw.strip().split(" ", 1)
            cmd = parts[0].upper()
            arg = parts[1] if len(parts) > 1 else ""
            if cmd == "USER":
                send("331 need password")
            elif cmd == "PASS":
                send("230 logged in")
            elif cmd == "TYPE":
                send("200 type set")
            elif cmd == "PWD":
                send(f'257 "{cwd}"')
            elif cmd == "CWD":
                tgt = self.local(arg, cwd)
                if os.path.isdir(tgt):
                    cwd = posixpath.normpath(
                        arg if arg.startswith("/") else posixpath.join(cwd, arg)
                    )
                    send("250 ok")
                else:
                    send("550 not a directory")
            elif cmd == "PASV":
                data_listener = socket.socket()
                data_listener.bind(("127.0.0.1", 0))
                data_listener.listen(1)
                p = data_listener.getsockname()[1]
                send(f"227 entering passive (127,0,0,1,{p >> 8},{p & 255})")
            elif cmd == "NLST":
                tgt = self.local(arg or ".", cwd)
                if not os.path.isdir(tgt):
                    send("550 no such dir")
                    continue
                send("150 here it comes")
                d = open_data()
                base = arg or cwd
                for name in sorted(os.listdir(tgt)):
                    d.sendall((posixpath.join(base, name) + "\r\n").encode())
                d.close()
                send("226 done")
            elif cmd == "RETR":
                tgt = self.local(arg, cwd)
                if not os.path.isfile(tgt):
                    send("550 no such file")
                    continue
                send("150 opening data")
                d = open_data()
                with open(tgt, "rb") as fh:
                    d.sendall(fh.read())
                d.close()
                send("226 done")
            elif cmd == "STOR":
                tgt = self.local(arg, cwd)
                send("150 ready")
                d = open_data()
                with open(tgt, "wb") as fh:
                    while True:
                        chunk = d.recv(65536)
                        if not chunk:
                            break
                        fh.write(chunk)
                d.close()
                send("226 stored")
            elif cmd == "DELE":
                tgt = self.local(arg, cwd)
                if os.path.isfile(tgt):
                    os.remove(tgt)
                    send("250 deleted")
                else:
                    send("550 no such file")
            elif cmd == "MKD":
                os.makedirs(self.local(arg, cwd), exist_ok=True)
                send(f'257 "{arg}" created')
            elif cmd == "QUIT":
                send("221 bye")
                break
            else:
                send(f"502 {cmd} not implemented")
        conn.close()

    def stop(self):
        self.running = False
        self.sock.close()


@pytest.fixture()
def ftp_server(tmp_path):
    root = tmp_path / "ftproot"
    (root / "data" / "sub").mkdir(parents=True)
    (root / "data" / "a.csv").write_text("1,x\n2,y\n")
    (root / "data" / "b.csv").write_text("3,z\n")
    (root / "data" / "skip.txt").write_text("9,q\n")
    (root / "data" / "sub" / "c.csv").write_text("4,w\n")
    srv = MiniFtpServer(str(root))
    srv.start()
    yield srv
    srv.stop()


def _cfg(srv, **kw):
    return {
        "host": "127.0.0.1",
        "port": srv.port,
        "username": "u",
        "password": "p",
        **kw,
    }


def test_wildcard_listing_and_recursion(ftp_server):
    fs = FtpFs("127.0.0.1", ftp_server.port, "u", "p")
    try:
        assert fs.get_all_files(["/data/*.csv"]) == ["/data/a.csv", "/data/b.csv"]
        allf = fs.get_all_files(["/data"])
        assert allf == [
            "/data/a.csv", "/data/b.csv", "/data/skip.txt", "/data/sub/c.csv",
        ]
    finally:
        fs.close()


def test_traversal_limit_enforced(ftp_server):
    fs = FtpFs("127.0.0.1", ftp_server.port, "u", "p")
    try:
        with pytest.raises(ValueError, match="maxTraversalLevel"):
            fs.get_list_files("/data", 0, 1)
    finally:
        fs.close()


def test_ftpreader_end_to_end(spark, ftp_server):
    df = read_source(
        spark,
        "ftpreader",
        _cfg(ftp_server, path=["/data/*.csv", "/data/sub"], column=["_c0", "_c1"]),
    )
    rows = sorted((int(r["_c0"]), r["_c1"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y"), (3, "z"), (4, "w")]


def test_stage_read_missing_raises(ftp_server):
    with pytest.raises(FileNotFoundError):
        ftp_stage_read(_cfg(ftp_server, path="/data/*.parquet"))


def test_sftp_routes_to_ssh_transport(ftp_server):
    """protocol=sftp dispatches to the SSH2 transport (r4,
    sources/ssh.py — full e2e in tests/test_sftp.py); pointing it at a
    plain FTP server fails loudly at the version exchange rather than
    talking FTP."""
    from datax_spark.sources.ssh import SshError

    with pytest.raises((SshError, OSError)):
        ftp_stage_read(_cfg(ftp_server, path="/data", protocol="sftp"))


def _remote_rows(srv, spark, prefix="out"):
    fs = FtpFs("127.0.0.1", srv.port, "u", "p")
    try:
        files = fs.prefixed_files("/landing", prefix)
        if not files:
            return []
        staged = fs.download(files)
    finally:
        fs.close()
    return sorted(
        (int(r["_c0"]), r["_c1"])
        for r in spark.read.csv(staged).collect()
    )


def test_ftpwriter_upload_and_truncate(spark, ftp_server):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["a", "b"]).coalesce(1)
    out = write_sink(
        df, "ftpwriter",
        _cfg(ftp_server, path="/landing", fileName="out", writeMode="append"),
    )
    assert out["files"] >= 1
    assert _remote_rows(ftp_server, spark) == [(1, "x"), (2, "y")]

    df2 = spark.createDataFrame([(9, "k")], ["a", "b"]).coalesce(1)
    write_sink(
        df2, "ftpwriter",
        _cfg(ftp_server, path="/landing", fileName="out", writeMode="truncate"),
    )
    assert _remote_rows(ftp_server, spark) == [(9, "k")]


def test_ftpwriter_nonconflict_refuses(spark, ftp_server):
    df = spark.createDataFrame([(1, "x")], ["a", "b"]).coalesce(1)
    write_sink(
        df, "ftpwriter",
        _cfg(ftp_server, path="/landing", fileName="out", writeMode="append"),
    )
    with pytest.raises(FileExistsError, match="nonConflict"):
        write_sink(
            df, "ftpwriter",
            _cfg(ftp_server, path="/landing", fileName="out", writeMode="nonConflict"),
        )
