"""Minimal crypto primitives for the from-scratch SSH2 transport
(sources/ssh.py): AES-CTR and the RFC 4253 key derivation. Pure
python + hashlib — nothing here is novel cryptography, just the
public algorithms the container lacks libraries for.

AES is implemented encrypt-only (CTR mode needs only the forward
cipher) with the S-box GENERATED from its published algebraic
structure (multiplicative inverse in GF(2^8)/x^8+x^4+x^3+x+1 followed
by the affine transform, FIPS-197 §5.1.1) — no transcribed tables —
and validated against the FIPS-197 appendix C known-answer vectors in
tests. Performance note: a pure-python cipher moves control-plane
volumes (directory listings, config-sized files) fine; bulk data
belongs on the FTP/HDFS/lake paths.
"""

from __future__ import annotations

import hashlib
import struct


# ------------------------------------------------------------------ AES

def _build_sbox() -> bytes:
    p = 0x11B

    def gf_mul(a: int, b: int) -> int:
        r = 0
        while b:
            if b & 1:
                r ^= a
            b >>= 1
            a <<= 1
            if a & 0x100:
                a ^= p
        return r

    inv = [0] * 256
    for a in range(1, 256):
        if inv[a]:
            continue
        for x in range(1, 256):
            if gf_mul(a, x) == 1:
                inv[a], inv[x] = x, a
                break

    out = bytearray()
    for x in range(256):
        b = inv[x]
        y = 0x63
        for i in range(8):
            bit = (
                (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
            ) & 1
            y ^= bit << i
        out.append(y)
    return bytes(out)


_SBOX = _build_sbox()
assert _SBOX[0] == 0x63 and _SBOX[1] == 0x7C, "AES S-box construction broken"

_RCON = [0x01]
for _ in range(13):
    _r = _RCON[-1] << 1
    _RCON.append(_r ^ 0x11B if _r & 0x100 else _r)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


class AES:
    """Forward cipher only (enough for CTR)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.nr = nk + 6
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[x] for x in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[x] for x in t]
            w.append([a ^ b for a, b in zip(w[i - nk], t)])
        self.round_keys = [
            bytes(b for c in range(4) for b in w[4 * r + c])
            for r in range(self.nr + 1)
        ]

    def encrypt_block(self, block: bytes) -> bytes:
        s = bytearray(a ^ b for a, b in zip(block, self.round_keys[0]))
        for rnd in range(1, self.nr):
            # SubBytes + ShiftRows
            t = bytearray(16)
            for c in range(4):
                for r in range(4):
                    t[4 * c + r] = _SBOX[s[4 * ((c + r) % 4) + r]]
            # MixColumns + AddRoundKey
            rk = self.round_keys[rnd]
            for c in range(4):
                a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
                s[4 * c + 0] = _xtime(a0) ^ (_xtime(a1) ^ a1) ^ a2 ^ a3
                s[4 * c + 1] = a0 ^ _xtime(a1) ^ (_xtime(a2) ^ a2) ^ a3
                s[4 * c + 2] = a0 ^ a1 ^ _xtime(a2) ^ (_xtime(a3) ^ a3)
                s[4 * c + 3] = (_xtime(a0) ^ a0) ^ a1 ^ a2 ^ _xtime(a3)
            for i in range(16):
                s[i] ^= rk[i]
        # final round: no MixColumns
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _SBOX[s[4 * ((c + r) % 4) + r]]
        rk = self.round_keys[self.nr]
        return bytes(t[i] ^ rk[i] for i in range(16))


class AesCtr:
    """AES in counter mode (RFC 4344 style: 16-byte big-endian counter
    starting at the IV, incremented per block). Symmetric: the same
    transform encrypts and decrypts."""

    def __init__(self, key: bytes, iv: bytes):
        self.aes = AES(key)
        self.counter = int.from_bytes(iv, "big")

    def process(self, data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            ks = self.aes.encrypt_block(
                self.counter.to_bytes(16, "big")
            )
            self.counter = (self.counter + 1) % (1 << 128)
            chunk = data[i : i + 16]
            out += bytes(a ^ b for a, b in zip(chunk, ks))
            i += 16
        return bytes(out)


# ----------------------------------------------------- RFC 4253 KDF etc.

# 2048-bit MODP group (RFC 3526 group 14) — the DH group every SSH
# server supports
GROUP14_P = int(
    "FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74"
    "020BBEA63B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F1437"
    "4FE1356D6D51C245E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7ED"
    "EE386BFB5A899FA5AE9F24117C4B1FE649286651ECE45B3DC2007CB8A163BF05"
    "98DA48361C55D39A69163FA8FD24CF5F83655D23DCA3AD961C62F356208552BB"
    "9ED529077096966D670C354E4ABC9804F1746C08CA18217C32905E462E36CE3B"
    "E39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9DE2BCBF695581718"
    "3995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFFFFFFFFFF",
    16,
)
GROUP14_G = 2


def mpint(n: int) -> bytes:
    """SSH mpint encoding."""
    if n == 0:
        return struct.pack(">I", 0)
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return struct.pack(">I", len(b)) + b


def ssh_string(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def derive_key(k: int, h: bytes, letter: bytes, session_id: bytes,
               length: int) -> bytes:
    """RFC 4253 §7.2: K1 = HASH(K || H || letter || session_id),
    Kn = HASH(K || H || K1..Kn-1), truncated to ``length``."""
    km = mpint(k)
    out = hashlib.sha256(km + h + letter + session_id).digest()
    while len(out) < length:
        out += hashlib.sha256(km + h + out).digest()
    return out[:length]
