"""From-scratch SSH2 + SFTP v3 client — the transport behind the
reference's sftp mode (``ftpreader/.../SftpHelperImpl.java``, which
wraps JSch; this container has no SSH library, so the public
protocols are implemented directly).

Scope and guarantees:

* **Transport** (RFC 4253): version exchange, algorithm negotiation
  pinned to one widely-supported suite — kex
  ``diffie-hellman-group14-sha256`` (RFC 3526 2048-bit MODP, plain
  modular exponentiation), cipher ``aes128-ctr`` (sshcrypto.py,
  FIPS-197-validated), MAC ``hmac-sha2-256`` (stdlib hmac). A server
  that cannot speak this suite fails loudly with its offered lists.
* **Host keys are verified, secure by default** (r5): the server's
  signature over the exchange hash is checked (ssh-ed25519 via
  ``ed25519.py``, rsa-sha2-256/512 + ssh-rsa via RSASSA-PKCS1-v1_5 in
  ``hostkeys.py``), and the key must be anchored by a pinned
  ``hostKeyFingerprint``, an OpenSSH ``knownHostsFile`` (plain,
  ``[host]:port`` and hashed entries), or an explicit
  ``insecureAcceptAnyHostKey: true`` opt-out that warns loudly.
  Userauth: password, or ``publickey`` with an unencrypted
  openssh-key-v1 ed25519 key (RFC 4252 §7).
* **SFTP v3** (draft-ietf-secsh-filexfer-02): REALPATH, STAT,
  OPENDIR/READDIR, OPEN/READ/WRITE/CLOSE, MKDIR, REMOVE, RENAME —
  the surface the reference helper uses.
* Pure-python crypto moves control-plane volumes (listings,
  config-sized files) fine; bulk data belongs on FTP/HDFS/lake paths.

Drivable by an in-process fake SSH server in tests
(``tests/test_sftp.py``) speaking the same wire format.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import os
import posixpath
import socket
import struct

from datax_spark.sources.sshcrypto import (
    GROUP14_G,
    GROUP14_P,
    AesCtr,
    derive_key,
    mpint,
    ssh_string,
)

MSG_DISCONNECT = 1
MSG_IGNORE = 2
MSG_UNIMPLEMENTED = 3
MSG_DEBUG = 4
MSG_SERVICE_REQUEST = 5
MSG_SERVICE_ACCEPT = 6
MSG_KEXINIT = 20
MSG_NEWKEYS = 21
MSG_KEXDH_INIT = 30
MSG_KEXDH_REPLY = 31
MSG_USERAUTH_REQUEST = 50
MSG_USERAUTH_FAILURE = 51
MSG_USERAUTH_SUCCESS = 52
MSG_USERAUTH_BANNER = 53
MSG_GLOBAL_REQUEST = 80
MSG_CHANNEL_OPEN = 90
MSG_CHANNEL_OPEN_CONFIRMATION = 91
MSG_CHANNEL_OPEN_FAILURE = 92
MSG_CHANNEL_WINDOW_ADJUST = 93
MSG_CHANNEL_DATA = 94
MSG_CHANNEL_EOF = 96
MSG_CHANNEL_CLOSE = 97
MSG_CHANNEL_REQUEST = 98
MSG_CHANNEL_SUCCESS = 99
MSG_CHANNEL_FAILURE = 100

KEX_ALG = b"diffie-hellman-group14-sha256"
CIPHER = b"aes128-ctr"
MAC_ALG = b"hmac-sha2-256"
HOSTKEY_ALGS = b"ssh-ed25519,rsa-sha2-512,rsa-sha2-256,ssh-rsa"

VERSION = b"SSH-2.0-dataxspark_0.1"


class SshError(IOError):
    pass


class _Reader:
    def __init__(self, buf: bytes, i: int = 0):
        self.buf = buf
        self.i = i

    def byte(self) -> int:
        v = self.buf[self.i]
        self.i += 1
        return v

    def boolean(self) -> bool:
        return self.byte() != 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.i)
        self.i += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.i)
        self.i += 8
        return v

    def string(self) -> bytes:
        n = self.u32()
        s = self.buf[self.i : self.i + n]
        self.i += n
        return s

    def mpint(self) -> int:
        return int.from_bytes(self.string(), "big", signed=False)


def _namelist(*names: bytes) -> bytes:
    return ssh_string(b",".join(names))


class SshTransport:
    """One SSH connection carrying one sftp channel."""

    def __init__(self, host: str, port: int, username: str, password: str,
                 timeout: float = 30.0,
                 host_key_fingerprint: str | None = None,
                 known_hosts: str | None = None,
                 insecure_accept_any_host_key: bool = False,
                 private_key_path: str | None = None):
        """Host-key trust is SECURE BY DEFAULT: the server's key
        signature over the exchange hash is always verified
        (ssh-ed25519 / rsa-sha2-* / ssh-rsa), and the key itself must
        be anchored by exactly one of

        * ``host_key_fingerprint`` — base64 SHA-256 of the host key
          blob (the ``SHA256:...`` value ``ssh-keyscan`` +
          ``ssh-keygen -lf`` print, with or without the prefix);
        * ``known_hosts`` — path to an OpenSSH known_hosts file
          (plain, ``[host]:port`` and hashed ``|1|`` entries); a
          changed key or an unknown host is refused loudly;
        * ``insecure_accept_any_host_key=True`` — explicit opt-out,
          accepted with a loud RuntimeWarning (MITM can read
          credentials and data).

        None of the three → the connection is refused before any
        credential is sent.  ``private_key_path`` switches userauth to
        ``publickey`` with an unencrypted openssh-key-v1 ed25519 key
        (RFC 4252 §7); otherwise password auth is used."""
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._seq_out = 0
        self._seq_in = 0
        self._enc_out = self._enc_in = None
        self._mac_out = self._mac_in = None
        self._inbuf = b""
        self._pin = host_key_fingerprint
        self._known_hosts = known_hosts
        self._insecure = insecure_accept_any_host_key
        self._host, self._port = host, port
        self._version_exchange()
        self._kex()
        self._userauth(username, password, private_key_path)

    # -- low-level framing --------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        while len(self._inbuf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("ssh connection closed")
            self._inbuf += chunk
        out, self._inbuf = self._inbuf[:n], self._inbuf[n:]
        return out

    def _version_exchange(self) -> None:
        self.sock.sendall(VERSION + b"\r\n")
        line = b""
        while not line.endswith(b"\n"):
            c = self.sock.recv(1)
            if not c:
                raise ConnectionError("ssh closed during version exchange")
            line += c
            if len(line) > 4096:
                raise SshError("oversized version line")
        self.server_version = line.strip()
        if not self.server_version.startswith(b"SSH-2.0"):
            raise SshError(f"not an SSH-2.0 peer: {self.server_version!r}")

    def _send_packet(self, payload: bytes) -> None:
        block = 16 if self._enc_out else 8
        pad = block - ((len(payload) + 5) % block)
        if pad < 4:
            pad += block
        pkt = (
            struct.pack(">IB", len(payload) + pad + 1, pad)
            + payload
            + os.urandom(pad)
        )
        if self._enc_out:
            mac = _hmac.new(
                self._mac_out, struct.pack(">I", self._seq_out) + pkt,
                hashlib.sha256,
            ).digest()
            pkt = self._enc_out.process(pkt) + mac
        self.sock.sendall(pkt)
        self._seq_out = (self._seq_out + 1) & 0xFFFFFFFF

    def _read_packet(self) -> bytes:
        if self._enc_in:
            first = self._enc_in.process(self._recv_exact(16))
            (n,) = struct.unpack_from(">I", first, 0)
            rest = self._enc_in.process(self._recv_exact(n - 12))
            pkt = first + rest
            mac = self._recv_exact(32)
            want = _hmac.new(
                self._mac_in, struct.pack(">I", self._seq_in) + pkt,
                hashlib.sha256,
            ).digest()
            if not _hmac.compare_digest(mac, want):
                raise SshError("MAC verification failed")
        else:
            hdr = self._recv_exact(5)
            (n,) = struct.unpack_from(">I", hdr, 0)
            pkt = hdr + self._recv_exact(n - 1)
        self._seq_in = (self._seq_in + 1) & 0xFFFFFFFF
        pad = pkt[4]
        return pkt[5 : len(pkt) - pad]

    def _read_msg(self) -> bytes:
        while True:
            p = self._read_packet()
            t = p[0]
            if t in (MSG_IGNORE, MSG_DEBUG, MSG_USERAUTH_BANNER):
                continue
            if t == MSG_UNIMPLEMENTED:
                raise SshError("peer says: unimplemented")
            if t == MSG_DISCONNECT:
                r = _Reader(p, 1)
                r.u32()
                raise SshError(f"disconnect: {r.string().decode()}")
            if t == MSG_GLOBAL_REQUEST:
                continue  # hostkey rotation etc.: ignore, no reply wanted
            return p

    # -- key exchange -------------------------------------------------

    def _kexinit_payload(self) -> bytes:
        return (
            bytes([MSG_KEXINIT]) + os.urandom(16)
            + _namelist(KEX_ALG)
            + ssh_string(HOSTKEY_ALGS)
            + _namelist(CIPHER) + _namelist(CIPHER)
            + _namelist(MAC_ALG) + _namelist(MAC_ALG)
            + _namelist(b"none") + _namelist(b"none")
            + ssh_string(b"") + ssh_string(b"")
            + b"\x00" + struct.pack(">I", 0)
        )

    def _kex(self) -> None:
        ic = self._kexinit_payload()
        self._send_packet(ic)
        is_ = self._read_msg()
        if is_[0] != MSG_KEXINIT:
            raise SshError(f"expected KEXINIT, got {is_[0]}")
        r = _Reader(is_, 17)
        kexes = r.string()
        _hostkeys = r.string()
        c_c2s = r.string()
        c_s2c = r.string()
        m_c2s = r.string()
        m_s2c = r.string()
        for offered, ours, what in (
            (kexes, KEX_ALG, "kex"),
            (c_c2s, CIPHER, "cipher c2s"), (c_s2c, CIPHER, "cipher s2c"),
            (m_c2s, MAC_ALG, "mac c2s"), (m_s2c, MAC_ALG, "mac s2c"),
        ):
            if ours not in offered.split(b","):
                raise SshError(
                    f"server does not offer {ours.decode()} for {what} "
                    f"(offers: {offered.decode()})"
                )
        x = int.from_bytes(os.urandom(64), "big") % (GROUP14_P - 2) + 1
        e = pow(GROUP14_G, x, GROUP14_P)
        self._send_packet(bytes([MSG_KEXDH_INIT]) + mpint(e))
        rep = self._read_msg()
        if rep[0] != MSG_KEXDH_REPLY:
            raise SshError(f"expected KEXDH_REPLY, got {rep[0]}")
        rr = _Reader(rep, 1)
        k_s = rr.string()  # host key blob
        f = rr.mpint()
        sig = rr.string()
        if not 1 < f < GROUP14_P - 1:
            raise SshError("server DH public value out of range")
        k = pow(f, x, GROUP14_P)
        h = hashlib.sha256(
            ssh_string(VERSION) + ssh_string(self.server_version)
            + ssh_string(ic) + ssh_string(is_) + ssh_string(k_s)
            + mpint(e) + mpint(f) + mpint(k)
        ).digest()
        self._check_host_key(k_s, sig, h)
        self.session_id = h
        self._send_packet(bytes([MSG_NEWKEYS]))
        nk = self._read_msg()
        if nk[0] != MSG_NEWKEYS:
            raise SshError(f"expected NEWKEYS, got {nk[0]}")
        iv_c2s = derive_key(k, h, b"A", h, 16)
        iv_s2c = derive_key(k, h, b"B", h, 16)
        key_c2s = derive_key(k, h, b"C", h, 16)
        key_s2c = derive_key(k, h, b"D", h, 16)
        self._mac_out = derive_key(k, h, b"E", h, 32)
        self._mac_in = derive_key(k, h, b"F", h, 32)
        self._enc_out = AesCtr(key_c2s, iv_c2s)
        self._enc_in = AesCtr(key_s2c, iv_s2c)

    # -- host key trust ----------------------------------------------

    def _check_host_key(self, k_s: bytes, sig_blob: bytes,
                        h: bytes) -> None:
        from datax_spark.sources import ed25519, hostkeys

        # 1) the signature over the exchange hash must verify — a key
        # the peer cannot sign with is a replayed/forged blob, pinned
        # or not
        alg = hostkeys.blob_key_type(k_s)
        sr = _Reader(sig_blob)
        sig_alg = sr.string().decode()
        raw_sig = sr.string()
        if alg == "ssh-ed25519":
            if sig_alg != "ssh-ed25519":
                raise SshError(f"signature algorithm {sig_alg!r} does not "
                               f"match host key type ssh-ed25519")
            ok = ed25519.verify(hostkeys.parse_ed25519_blob(k_s), h, raw_sig)
        elif alg == "ssh-rsa":
            halg = hostkeys.RSA_SIG_HASH.get(sig_alg)
            if halg is None:
                raise SshError(f"unsupported rsa signature alg {sig_alg!r}")
            e_pub, n_pub = hostkeys.parse_rsa_blob(k_s)
            ok = hostkeys.rsa_verify(e_pub, n_pub, raw_sig, h, halg)
        else:
            raise SshError(f"unsupported host key type {alg!r}")
        if not ok:
            raise SshError(
                f"host key signature verification FAILED ({alg}) — the "
                f"peer does not hold the key it presented; possible MITM")
        # 2) the (now proven) key must be anchored to something
        if self._pin:
            import base64

            got = base64.b64encode(
                hashlib.sha256(k_s).digest()
            ).decode().rstrip("=")
            want = self._pin.removeprefix("SHA256:").rstrip("=")
            if got != want:
                raise SshError(
                    f"host key fingerprint mismatch: server presented "
                    f"SHA256:{got}, pinned SHA256:{want} — possible MITM"
                )
            return
        if self._known_hosts:
            entries = hostkeys.load_known_hosts(self._known_hosts)
            verdict = hostkeys.evaluate_known_hosts(
                entries, self._host, self._port, alg, k_s)
            if verdict == "match":
                return
            if verdict == "mismatch":
                raise SshError(
                    f"REMOTE HOST IDENTIFICATION HAS CHANGED for "
                    f"{self._host}:{self._port} — known_hosts has a "
                    f"different {alg} key (possible MITM); refusing")
            raise SshError(
                f"{self._host}:{self._port} is not in known_hosts "
                f"({self._known_hosts}) — add its {alg} key (ssh-keyscan) "
                f"or pin hostKeyFingerprint")
        if self._insecure:
            import warnings

            warnings.warn(
                f"SSH host key for {self._host}:{self._port} accepted "
                f"WITHOUT verification (insecureAcceptAnyHostKey) — an "
                f"active MITM can read credentials and data",
                RuntimeWarning, stacklevel=4)
            return
        raise SshError(
            "no host-key trust anchor configured — set hostKeyFingerprint "
            "or knownHostsFile, or explicitly opt out with "
            "insecureAcceptAnyHostKey: true")

    # -- auth + channel ----------------------------------------------

    def _userauth(self, username: str, password: str,
                  private_key_path: str | None = None) -> None:
        self._send_packet(
            bytes([MSG_SERVICE_REQUEST]) + ssh_string(b"ssh-userauth")
        )
        acc = self._read_msg()
        if acc[0] != MSG_SERVICE_ACCEPT:
            raise SshError(f"service request refused ({acc[0]})")
        if private_key_path:
            from datax_spark.sources import ed25519, hostkeys

            seed = hostkeys.load_openssh_ed25519_seed(private_key_path)
            pub_blob = hostkeys.ed25519_blob(ed25519.publickey(seed))
            req = (
                ssh_string(username.encode())
                + ssh_string(b"ssh-connection")
                + ssh_string(b"publickey") + b"\x01"
                + ssh_string(b"ssh-ed25519")
                + ssh_string(pub_blob)
            )
            # RFC 4252 §7: sign over session id + the request itself
            signed = ssh_string(self.session_id) \
                + bytes([MSG_USERAUTH_REQUEST]) + req
            sig = ssh_string(b"ssh-ed25519") \
                + ssh_string(ed25519.sign(seed, signed))
            self._send_packet(
                bytes([MSG_USERAUTH_REQUEST]) + req + ssh_string(sig)
            )
            failure_hint = "publickey rejected"
        else:
            self._send_packet(
                bytes([MSG_USERAUTH_REQUEST])
                + ssh_string(username.encode())
                + ssh_string(b"ssh-connection")
                + ssh_string(b"password") + b"\x00"
                + ssh_string(password.encode())
            )
            failure_hint = "password rejected"
        rep = self._read_msg()
        if rep[0] == MSG_USERAUTH_FAILURE:
            raise SshError(f"authentication failed ({failure_hint})")
        if rep[0] != MSG_USERAUTH_SUCCESS:
            raise SshError(f"unexpected userauth reply {rep[0]}")

    def open_sftp_channel(self) -> None:
        self.local_channel = 0
        self._send_packet(
            bytes([MSG_CHANNEL_OPEN]) + ssh_string(b"session")
            + struct.pack(">III", self.local_channel, 1 << 30, 1 << 20)
        )
        rep = self._read_msg()
        if rep[0] == MSG_CHANNEL_OPEN_FAILURE:
            r = _Reader(rep, 1)
            r.u32()
            code = r.u32()
            raise SshError(f"channel open failed (code {code}): "
                           f"{r.string().decode()}")
        if rep[0] != MSG_CHANNEL_OPEN_CONFIRMATION:
            raise SshError(f"unexpected channel reply {rep[0]}")
        self.remote_channel = _Reader(rep, 5).u32()
        self._send_packet(
            bytes([MSG_CHANNEL_REQUEST])
            + struct.pack(">I", self.remote_channel)
            + ssh_string(b"subsystem") + b"\x01" + ssh_string(b"sftp")
        )
        while True:
            rep = self._read_msg()
            if rep[0] == MSG_CHANNEL_SUCCESS:
                return
            if rep[0] == MSG_CHANNEL_FAILURE:
                raise SshError("server refused the sftp subsystem")
            if rep[0] == MSG_CHANNEL_WINDOW_ADJUST:
                continue
            raise SshError(f"unexpected reply {rep[0]} to subsystem request")

    def send_channel_data(self, data: bytes) -> None:
        self._send_packet(
            bytes([MSG_CHANNEL_DATA])
            + struct.pack(">I", self.remote_channel)
            + ssh_string(data)
        )

    def recv_channel_data(self) -> bytes:
        while True:
            p = self._read_msg()
            t = p[0]
            if t == MSG_CHANNEL_DATA:
                r = _Reader(p, 1)
                r.u32()
                return r.string()
            if t == MSG_CHANNEL_WINDOW_ADJUST:
                continue
            if t in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
                raise ConnectionError("sftp channel closed by server")
            raise SshError(f"unexpected channel message {t}")

    def close(self) -> None:
        try:
            self._send_packet(
                bytes([MSG_CHANNEL_CLOSE])
                + struct.pack(">I", getattr(self, "remote_channel", 0))
            )
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


# ------------------------------------------------------------- SFTP v3

FXP_INIT, FXP_VERSION = 1, 2
FXP_OPEN, FXP_CLOSE, FXP_READ, FXP_WRITE = 3, 4, 5, 6
FXP_OPENDIR, FXP_READDIR, FXP_REMOVE, FXP_MKDIR = 11, 12, 13, 14
FXP_REALPATH, FXP_STAT, FXP_RENAME = 16, 17, 18
FXP_STATUS, FXP_HANDLE, FXP_DATA, FXP_NAME, FXP_ATTRS = 101, 102, 103, 104, 105

FX_OK, FX_EOF, FX_NO_SUCH_FILE = 0, 1, 2

PF_READ, PF_WRITE, PF_APPEND, PF_CREAT, PF_TRUNC = 1, 2, 4, 8, 16

ATTR_SIZE = 0x01
ATTR_PERMISSIONS = 0x04

S_IFDIR = 0o040000


class SftpStatusError(IOError):
    def __init__(self, code: int, msg: str):
        super().__init__(f"sftp status {code}: {msg}")
        self.code = code


def _attrs_parse(r: _Reader) -> dict:
    flags = r.u32()
    out: dict = {}
    if flags & ATTR_SIZE:
        out["size"] = r.u64()
    if flags & 0x02:  # uidgid
        r.u32(), r.u32()
    if flags & ATTR_PERMISSIONS:
        out["permissions"] = r.u32()
    if flags & 0x08:  # acmodtime
        r.u32(), r.u32()
    return out


class SftpClient:
    """SFTP v3 over one SshTransport channel. One outstanding request
    at a time (simple and sufficient for staging transfers)."""

    def __init__(self, host: str, port: int = 22, username: str = "",
                 password: str = "", timeout: float = 30.0,
                 host_key_fingerprint: str | None = None,
                 known_hosts: str | None = None,
                 insecure_accept_any_host_key: bool = False,
                 private_key_path: str | None = None):
        self.t = SshTransport(
            host, port, username, password, timeout,
            host_key_fingerprint=host_key_fingerprint,
            known_hosts=known_hosts,
            insecure_accept_any_host_key=insecure_accept_any_host_key,
            private_key_path=private_key_path)
        self.t.open_sftp_channel()
        self._id = 0
        self._buf = b""
        # FXP_INIT carries the protocol version where the id normally sits
        self._send_raw(bytes([FXP_INIT]) + struct.pack(">I", 3))
        rtype, body = self._recv_packet()
        if rtype != FXP_VERSION:
            raise SshError(f"expected FXP_VERSION, got {rtype}")
        self.server_sftp_version = struct.unpack_from(">I", body, 0)[0]

    def _send_raw(self, payload: bytes) -> None:
        self.t.send_channel_data(struct.pack(">I", len(payload)) + payload)

    def _recv_packet(self) -> tuple[int, bytes]:
        while len(self._buf) < 4:
            self._buf += self.t.recv_channel_data()
        (n,) = struct.unpack_from(">I", self._buf, 0)
        while len(self._buf) < 4 + n:
            self._buf += self.t.recv_channel_data()
        pkt, self._buf = self._buf[4 : 4 + n], self._buf[4 + n :]
        return pkt[0], pkt[1:]

    def _request(self, ptype: int, body: bytes) -> tuple[int, _Reader]:
        self._id += 1
        self._send_raw(bytes([ptype]) + struct.pack(">I", self._id) + body)
        rtype, rbody = self._recv_packet()
        r = _Reader(rbody)
        rid = r.u32()
        if rid != self._id:
            raise SshError(f"sftp id mismatch: {rid} != {self._id}")
        return rtype, r

    def _expect_status_ok(self, rtype: int, r: _Reader) -> None:
        if rtype != FXP_STATUS:
            raise SshError(f"expected STATUS, got {rtype}")
        code = r.u32()
        msg = r.string().decode("utf-8", "replace")
        if code != FX_OK:
            raise SftpStatusError(code, msg)

    # -- operations ---------------------------------------------------

    def realpath(self, path: str) -> str:
        rtype, r = self._request(FXP_REALPATH, ssh_string(path.encode()))
        if rtype != FXP_NAME:
            raise SshError(f"expected NAME, got {rtype}")
        r.u32()  # count (1)
        return r.string().decode()

    def stat(self, path: str) -> dict | None:
        rtype, r = self._request(FXP_STAT, ssh_string(path.encode()))
        if rtype == FXP_ATTRS:
            return _attrs_parse(r)
        code = r.u32()
        if code in (FX_NO_SUCH_FILE,):
            return None
        raise SftpStatusError(code, r.string().decode("utf-8", "replace"))

    def is_dir(self, path: str) -> bool:
        st = self.stat(path)
        return bool(st and (st.get("permissions", 0) & 0o170000) == S_IFDIR)

    def listdir(self, path: str) -> list[str]:
        rtype, r = self._request(FXP_OPENDIR, ssh_string(path.encode()))
        if rtype == FXP_STATUS:
            return []
        handle = r.string()
        names: list[str] = []
        try:
            while True:
                rtype, r = self._request(FXP_READDIR, ssh_string(handle))
                if rtype == FXP_STATUS:
                    code = r.u32()
                    if code == FX_EOF:
                        break
                    raise SftpStatusError(
                        code, r.string().decode("utf-8", "replace"))
                n = r.u32()
                for _ in range(n):
                    name = r.string().decode()
                    r.string()  # longname
                    _attrs_parse(r)
                    if name not in (".", ".."):
                        names.append(name)
        finally:
            self._close_handle(handle)
        return sorted(names)

    def _close_handle(self, handle: bytes) -> None:
        rtype, r = self._request(FXP_CLOSE, ssh_string(handle))
        self._expect_status_ok(rtype, r)

    def read_file(self, path: str) -> bytes:
        rtype, r = self._request(
            FXP_OPEN,
            ssh_string(path.encode()) + struct.pack(">I", PF_READ)
            + struct.pack(">I", 0),
        )
        if rtype == FXP_STATUS:
            code = r.u32()
            raise SftpStatusError(code, r.string().decode("utf-8", "replace"))
        handle = r.string()
        out = bytearray()
        try:
            off = 0
            while True:
                rtype, r = self._request(
                    FXP_READ,
                    ssh_string(handle) + struct.pack(">QI", off, 32768),
                )
                if rtype == FXP_STATUS:
                    code = r.u32()
                    if code == FX_EOF:
                        break
                    raise SftpStatusError(
                        code, r.string().decode("utf-8", "replace"))
                chunk = r.string()
                out += chunk
                off += len(chunk)
        finally:
            self._close_handle(handle)
        return bytes(out)

    def write_file(self, path: str, data: bytes, append: bool = False) -> None:
        flags = PF_WRITE | PF_CREAT | (PF_APPEND if append else PF_TRUNC)
        rtype, r = self._request(
            FXP_OPEN,
            ssh_string(path.encode()) + struct.pack(">I", flags)
            + struct.pack(">I", 0),
        )
        if rtype == FXP_STATUS:
            code = r.u32()
            raise SftpStatusError(code, r.string().decode("utf-8", "replace"))
        handle = r.string()
        try:
            base = (self.stat(path) or {}).get("size", 0) if append else 0
            off = base
            i = 0
            while i < len(data) or (i == 0 and not data):
                chunk = data[i : i + 32768]
                rtype, r = self._request(
                    FXP_WRITE,
                    ssh_string(handle) + struct.pack(">Q", off)
                    + ssh_string(chunk),
                )
                self._expect_status_ok(rtype, r)
                off += len(chunk)
                i += 32768
                if not data:
                    break
        finally:
            self._close_handle(handle)

    def mkdir(self, path: str) -> None:
        rtype, r = self._request(
            FXP_MKDIR, ssh_string(path.encode()) + struct.pack(">I", 0)
        )
        self._expect_status_ok(rtype, r)

    def remove(self, path: str) -> None:
        rtype, r = self._request(FXP_REMOVE, ssh_string(path.encode()))
        self._expect_status_ok(rtype, r)

    def rename(self, old: str, new: str) -> None:
        rtype, r = self._request(
            FXP_RENAME, ssh_string(old.encode()) + ssh_string(new.encode())
        )
        self._expect_status_ok(rtype, r)

    def close(self) -> None:
        self.t.close()
