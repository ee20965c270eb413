"""Ed25519 signatures (RFC 8032 §5.1), pure Python.

Implements exactly the three operations the SSH transport needs —
derive a public key from a 32-byte seed, sign, verify — using the
twisted-Edwards group formulas published in RFC 8032 (extended
homogeneous coordinates, §5.1.4).  Verification gates the fake-sshd
host key and client ``publickey`` userauth; signing lets tests and the
in-process server produce real signatures.  RFC 8032 §7.1 test vectors
are pinned in ``tests/test_sftp.py``.

This is control-plane crypto (a handful of signatures per connection);
speed is irrelevant, clarity and spec fidelity are the point.
"""

from __future__ import annotations

import hashlib

_P = 2**255 - 19                       # base field GF(p)
_L = 2**252 + 27742317777372353535851937790883648493  # group order
_D = (-121665 * pow(121666, _P - 2, _P)) % _P         # curve constant

# base point B (RFC 8032 §5.1: y = 4/5, x recovered with sign 0)
_BY = (4 * pow(5, _P - 2, _P)) % _P
_SQRT_M1 = pow(2, (_P - 1) // 4, _P)   # sqrt(-1) mod p


def _recover_x(y: int, sign: int) -> int:
    # x^2 = (y^2 - 1) / (d y^2 + 1)  (§5.1.3)
    if y >= _P:
        raise ValueError("y out of range")
    x2 = (y * y - 1) * pow(_D * y * y + 1, _P - 2, _P) % _P
    x = pow(x2, (_P + 3) // 8, _P)
    if (x * x - x2) % _P != 0:
        x = x * _SQRT_M1 % _P
    if (x * x - x2) % _P != 0:
        raise ValueError("not a point on the curve")
    if x == 0 and sign:
        raise ValueError("invalid sign bit")
    if x & 1 != sign:
        x = _P - x
    return x


_BX = _recover_x(_BY, 0)
_B = (_BX, _BY, 1, _BX * _BY % _P)     # extended coords (X, Y, Z, T)
_IDENT = (0, 1, 1, 0)


def _add(p, q):
    # §5.1.4 point addition, extended homogeneous coordinates
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % _P
    b = (y1 + x1) * (y2 + x2) % _P
    c = 2 * t1 * _D * t2 % _P
    d = 2 * z1 * z2 % _P
    e, f, g, h = b - a, d - c, d + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _scalarmult(s: int, p):
    q = _IDENT
    while s > 0:
        if s & 1:
            q = _add(q, p)
        p = _add(p, p)
        s >>= 1
    return q


def _compress(p) -> bytes:
    x, y, z, _ = p
    zi = pow(z, _P - 2, _P)
    x, y = x * zi % _P, y * zi % _P
    return int.to_bytes(y | ((x & 1) << 255), 32, "little")


def _decompress(b: bytes):
    if len(b) != 32:
        raise ValueError("point must be 32 bytes")
    n = int.from_bytes(b, "little")
    sign = n >> 255
    y = n & ((1 << 255) - 1)
    x = _recover_x(y, sign)
    return (x, y, 1, x * y % _P)


def _equal(p, q) -> bool:
    # cross-multiply to compare projective points without inversion
    x1, y1, z1, _ = p
    x2, y2, z2, _ = q
    return (x1 * z2 - x2 * z1) % _P == 0 and (y1 * z2 - y2 * z1) % _P == 0


def _clamp(h: bytes) -> int:
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    return a


def publickey(seed: bytes) -> bytes:
    """32-byte public key from a 32-byte private seed (§5.1.5)."""
    if len(seed) != 32:
        raise ValueError("seed must be 32 bytes")
    a = _clamp(hashlib.sha512(seed).digest())
    return _compress(_scalarmult(a, _B))


def sign(seed: bytes, msg: bytes) -> bytes:
    """64-byte signature R||S (§5.1.6)."""
    h = hashlib.sha512(seed).digest()
    a = _clamp(h)
    pub = _compress(_scalarmult(a, _B))
    r = int.from_bytes(hashlib.sha512(h[32:] + msg).digest(), "little") % _L
    rp = _compress(_scalarmult(r, _B))
    k = int.from_bytes(
        hashlib.sha512(rp + pub + msg).digest(), "little") % _L
    s = (r + k * a) % _L
    return rp + int.to_bytes(s, 32, "little")


def verify(pub: bytes, msg: bytes, sig: bytes) -> bool:
    """True iff ``sig`` is a valid signature of ``msg`` by ``pub``
    (§5.1.7: check [S]B == R + [k]A)."""
    if len(sig) != 64 or len(pub) != 32:
        return False
    try:
        a = _decompress(pub)
        rp = _decompress(sig[:32])
    except ValueError:
        return False
    s = int.from_bytes(sig[32:], "little")
    if s >= _L:
        return False
    k = int.from_bytes(hashlib.sha512(sig[:32] + pub + msg).digest(),
                       "little") % _L
    return _equal(_scalarmult(s, _B), _add(rp, _scalarmult(k, a)))
