"""SM4 block cipher (GB/T 32907-2016, the public Chinese national
standard) — byte-parity with the reference's config/value encryption
(``chongqingreader/.../Sm4Util.java``: SM4/ECB/PKCS5Padding via
BouncyCastle, hex key in, hex ciphertext out).

Pure python from the published standard: 32-round unbalanced Feistel
over four 32-bit words, S-box + linear transforms L/L', FK/CK key
schedule. Validated against the standard's known-answer vector
(Appendix A example 1), so a transcription error in any table fails
the test suite loudly.

Scope: the reference uses SM4 for SMALL strings (config secrets,
per-value field encryption) — driver-side, not the data hot path.
The column surface (``dx_encryption(..., cipher='SM4')``) is an
Arrow-batched pandas UDF for parity workloads; the PERFORMANCE path
for bulk column crypto remains AES via Spark's builtin
``aes_encrypt`` (JVM, hardware-accelerated), as documented in
``transforms.dx_encryption``.
"""

from __future__ import annotations

# The standard's S-box, generated from its published algebraic
# structure rather than transcribed: S(x) = A(inv(A(x))) with the
# affine map A(v) = circulant(0xCB)·v ⊕ 0xD3 and inversion in
# GF(2^8)/(x^8+x^7+x^6+x^5+x^4+x^2+1) (poly 0x1F5), inv(0)=0.
# Validated against the standard's cipher known-answer vectors in
# tests — a construction error fails loudly there.


def _build_sbox() -> bytes:
    p = 0x1F5

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

    def aff(x: int) -> int:
        y = 0xD3
        r = 0xCB
        for i in range(8):
            if (r >> i) & 1:
                y ^= ((x << i) | (x >> (8 - i))) & 0xFF
        return y

    return bytes(aff(inv[aff(x)]) for x in range(256))


_SBOX = _build_sbox()
assert _SBOX[0] == 0xD6 and _SBOX[255] == 0x48, "SM4 S-box construction broken"

_FK = (0xA3B1BAC6, 0x56AA3350, 0x677D9197, 0xB27022DC)
_CK = tuple(
    ((4 * i * 7 % 256) << 24)
    | (((4 * i + 1) * 7 % 256) << 16)
    | (((4 * i + 2) * 7 % 256) << 8)
    | ((4 * i + 3) * 7 % 256)
    for i in range(32)
)

_M = 0xFFFFFFFF


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M


def _tau(a: int) -> int:
    return (
        (_SBOX[(a >> 24) & 0xFF] << 24)
        | (_SBOX[(a >> 16) & 0xFF] << 16)
        | (_SBOX[(a >> 8) & 0xFF] << 8)
        | _SBOX[a & 0xFF]
    )


def _t_enc(a: int) -> int:  # T: tau then L
    b = _tau(a)
    return b ^ _rotl(b, 2) ^ _rotl(b, 10) ^ _rotl(b, 18) ^ _rotl(b, 24)


def _t_key(a: int) -> int:  # T': tau then L'
    b = _tau(a)
    return b ^ _rotl(b, 13) ^ _rotl(b, 23)


def sm4_key_schedule(key: bytes) -> list[int]:
    if len(key) != 16:
        raise ValueError(f"SM4 key must be 16 bytes, got {len(key)}")
    k = [int.from_bytes(key[i : i + 4], "big") ^ _FK[i // 4] for i in range(0, 16, 4)]
    rk = []
    for i in range(32):
        k.append(k[i] ^ _t_key(k[i + 1] ^ k[i + 2] ^ k[i + 3] ^ _CK[i]))
        rk.append(k[i + 4])
    return rk


def _crypt_block(block: bytes, rk) -> bytes:
    x = [int.from_bytes(block[i : i + 4], "big") for i in range(0, 16, 4)]
    for i in range(32):
        x.append(x[i] ^ _t_enc(x[i + 1] ^ x[i + 2] ^ x[i + 3] ^ rk[i]))
    return b"".join(w.to_bytes(4, "big") for w in x[35:31:-1])


def sm4_encrypt_block(block: bytes, key: bytes) -> bytes:
    return _crypt_block(block, sm4_key_schedule(key))


def sm4_decrypt_block(block: bytes, key: bytes) -> bytes:
    # decryption = same structure with reversed round keys
    return _crypt_block(block, sm4_key_schedule(key)[::-1])


# ------------------------------------------------------------ ECB + PKCS#7


def sm4_encrypt_ecb(key: bytes, data: bytes) -> bytes:
    """SM4/ECB/PKCS5Padding (Sm4Util.encrypt_Ecb_Padding parity).
    ECB is what the reference uses for deterministic config secrets;
    it leaks equal-block patterns and is NOT for bulk data."""
    rk = sm4_key_schedule(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    return b"".join(
        _crypt_block(data[i : i + 16], rk) for i in range(0, len(data), 16)
    )


def sm4_decrypt_ecb(key: bytes, data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("SM4-ECB ciphertext length must be a multiple of 16")
    rk = sm4_key_schedule(key)[::-1]
    out = b"".join(
        _crypt_block(data[i : i + 16], rk) for i in range(0, len(data), 16)
    )
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad PKCS#7 padding (wrong key or corrupt data)")
    return out[:-pad]


def encrypt_ecb_hex(hex_key: str, text: str) -> str:
    """Sm4Util.encryptEcb parity: hex key, UTF-8 plaintext, hex out.
    (Unlike the reference, errors RAISE rather than silently returning
    the plaintext — a swallowed encryption failure that passes the
    secret through in the clear is not a behavior worth cloning.)"""
    return sm4_encrypt_ecb(bytes.fromhex(hex_key), text.encode("utf-8")).hex()


def decrypt_ecb_hex(hex_key: str, hex_text: str) -> str:
    """Sm4Util.decryptEcb parity: hex key, hex ciphertext, UTF-8 out."""
    return sm4_decrypt_ecb(
        bytes.fromhex(hex_key), bytes.fromhex(hex_text)
    ).decode("utf-8")
