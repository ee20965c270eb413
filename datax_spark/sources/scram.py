"""SCRAM-SHA-256 client (RFC 5802 / RFC 7677), shared by the MongoDB
and PostgreSQL transports.

hashlib/hmac only.  The server signature is ALWAYS verified, so a
spoofed endpoint that merely answers "ok" cannot pass.  Passwords are
used as-is (SASLprep is the identity for ASCII); non-ASCII passwords
are refused rather than silently mis-normalized.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os


class ScramError(IOError):
    pass


class ScramSha256Client:
    """One authentication exchange:

    >>> c = ScramSha256Client(user, password)
    >>> send(c.client_first())            # "n,,n=...,r=..."
    >>> send(c.client_final(server_first))
    >>> c.verify_server_final(server_final)
    """

    def __init__(self, username: str, password: str,
                 cnonce: str | None = None):
        try:
            self._pwd = password.encode("ascii")
        except UnicodeEncodeError:
            raise NotImplementedError(
                "non-ASCII SCRAM passwords need SASLprep normalization, "
                "which this transport does not implement"
            )
        user = username.replace("=", "=3D").replace(",", "=2C")
        self._cnonce = cnonce or base64.b64encode(os.urandom(18)).decode()
        self._first_bare = f"n={user},r={self._cnonce}"
        self._auth_msg: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> str:
        # gs2 header "n,," = no channel binding (plaintext / outside TLS)
        return "n,," + self._first_bare

    def client_final(self, server_first: str) -> str:
        attrs = dict(kv.split("=", 1) for kv in server_first.split(","))
        nonce = attrs["r"]
        if not nonce.startswith(self._cnonce):
            raise ScramError(
                "SCRAM: server nonce does not extend client nonce")
        salt = base64.b64decode(attrs["s"])
        iterations = int(attrs["i"])
        if iterations < 4096:
            raise ScramError(
                f"SCRAM: iteration count {iterations} below RFC minimum")
        self._salted = hashlib.pbkdf2_hmac(
            "sha256", self._pwd, salt, iterations)
        client_key = hmac.new(
            self._salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = f"c=biws,r={nonce}"
        self._auth_msg = (
            f"{self._first_bare},{server_first},{without_proof}".encode())
        client_sig = hmac.new(
            stored_key, self._auth_msg, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        return f"{without_proof},p={base64.b64encode(proof).decode()}"

    def verify_server_final(self, server_final: str) -> None:
        if self._auth_msg is None or self._salted is None:
            raise ScramError("SCRAM: client_final was never computed")
        attrs = dict(
            kv.split("=", 1) for kv in server_final.split(",") if kv)
        server_key = hmac.new(
            self._salted, b"Server Key", hashlib.sha256).digest()
        server_sig = hmac.new(
            server_key, self._auth_msg, hashlib.sha256).digest()
        if base64.b64decode(attrs.get("v", "")) != server_sig:
            raise ScramError(
                "SCRAM: server signature verification failed — the peer "
                "does not know this user's credentials"
            )
