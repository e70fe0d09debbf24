"""PASETO v2.local — spec-compliant mint/verify (the reference's token
format: libpaseto `paseto_v2_local_encrypt`, initialized at reference
src/utils/paseto_utils.cpp:6-22 and used by src/service/auth_service.cpp).

v2.local per the PASETO spec:

    token   = "v2.local." || b64url(n || c) [ || "." || b64url(footer) ]
    n       = BLAKE2b(message, key = 24 random bytes, outlen = 24)
    c       = XChaCha20-Poly1305(message, aad = PAE([h, n, footer]),
                                 nonce = n, key = k)       (combined ct||tag)
    PAE     = LE64(#pieces) || (LE64(len(p)) || p for each piece)

This environment's `cryptography` build exposes ChaCha20-Poly1305 (RFC
8439, 12-byte nonce) but not the XChaCha20 extended-nonce variant, so the
one missing piece — HChaCha20 — is implemented here from the ChaCha20
quarter-round core.  tests/test_auth.py validates the core against
cryptography's own ChaCha20 keystream, and HChaCha20 + the composed
XChaCha20-Poly1305 AEAD bit-exactly against the system libsodium
(crypto_core_hchacha20 / crypto_aead_xchacha20poly1305_ietf_*) — the
exact library the reference's libpaseto wraps.
"""

from __future__ import annotations

import base64
import hashlib
import os
import struct

from cryptography.exceptions import InvalidTag
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305

HEADER = "v2.local."

_MASK32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _quarter(st: list[int], a: int, b: int, c: int, d: int) -> None:
    st[a] = (st[a] + st[b]) & _MASK32
    st[d] = _rotl32(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & _MASK32
    st[b] = _rotl32(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & _MASK32
    st[d] = _rotl32(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & _MASK32
    st[b] = _rotl32(st[b] ^ st[c], 7)


def _chacha_rounds(state: list[int]) -> list[int]:
    """The 20-round ChaCha permutation (10 double rounds), NO final add."""
    st = list(state)
    for _ in range(10):
        _quarter(st, 0, 4, 8, 12)
        _quarter(st, 1, 5, 9, 13)
        _quarter(st, 2, 6, 10, 14)
        _quarter(st, 3, 7, 11, 15)
        _quarter(st, 0, 5, 10, 15)
        _quarter(st, 1, 6, 11, 12)
        _quarter(st, 2, 7, 8, 13)
        _quarter(st, 3, 4, 9, 14)
    return st


_SIGMA = struct.unpack("<IIII", b"expand 32-byte k")


def chacha20_block(key: bytes, counter: int, nonce12: bytes) -> bytes:
    """RFC 8439 ChaCha20 block function (used only by the self-test that
    cross-checks this file's core against cryptography's ChaCha20)."""
    state = list(_SIGMA) + list(struct.unpack("<8I", key)) + [counter] \
        + list(struct.unpack("<3I", nonce12))
    working = _chacha_rounds(state)
    out = [(w + s) & _MASK32 for w, s in zip(working, state)]
    return struct.pack("<16I", *out)


def hchacha20(key: bytes, nonce16: bytes) -> bytes:
    """HChaCha20 subkey derivation (draft-irtf-cfrg-xchacha §2.2): the
    ChaCha permutation WITHOUT the final state addition; the subkey is
    words 0-3 and 12-15."""
    assert len(key) == 32 and len(nonce16) == 16
    state = list(_SIGMA) + list(struct.unpack("<8I", key)) \
        + list(struct.unpack("<4I", nonce16))
    st = _chacha_rounds(state)
    return struct.pack("<8I", *(st[0:4] + st[12:16]))


def _xchacha_aead(key: bytes, nonce24: bytes) -> tuple[ChaCha20Poly1305, bytes]:
    """XChaCha20-Poly1305 = ChaCha20-Poly1305 under the HChaCha20 subkey
    with nonce12 = 4 zero bytes || nonce24[16:24]."""
    sub = hchacha20(key, nonce24[:16])
    return ChaCha20Poly1305(sub), b"\x00" * 4 + nonce24[16:]


def pae(pieces: list[bytes]) -> bytes:
    """Pre-Authentication Encoding (PASETO spec §2.2.1)."""
    out = struct.pack("<Q", len(pieces))
    for p in pieces:
        out += struct.pack("<Q", len(p)) + p
    return out


def _b64e(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def encrypt(message: bytes, key: bytes, footer: bytes = b"",
            nonce_key: bytes | None = None) -> str:
    """Mint a v2.local token.  `nonce_key` (the 24 random bytes keying the
    BLAKE2b nonce derivation) is overridable only for test vectors."""
    if len(key) != 32:
        raise ValueError("v2.local requires a 32-byte key")
    b = os.urandom(24) if nonce_key is None else nonce_key
    n = hashlib.blake2b(message, key=b, digest_size=24).digest()
    aead, nonce12 = _xchacha_aead(key, n)
    pre = pae([HEADER.encode(), n, footer])
    c = aead.encrypt(nonce12, message, pre)
    body = _b64e(n + c)
    return HEADER + body + ("." + _b64e(footer) if footer else "")


class PasetoError(ValueError):
    pass


def decrypt(token: str, key: bytes, footer: bytes = b"") -> bytes:
    """Verify + decrypt a v2.local token; raises PasetoError on any
    malformation, footer mismatch, or authentication failure."""
    if len(key) != 32:
        raise ValueError("v2.local requires a 32-byte key")
    if not token.startswith(HEADER):
        raise PasetoError("bad token header")
    parts = token[len(HEADER):].split(".")
    if len(parts) not in (1, 2):
        raise PasetoError("bad token shape")
    try:
        body = _b64d(parts[0])
        token_footer = _b64d(parts[1]) if len(parts) == 2 else b""
    except Exception as e:
        raise PasetoError("bad token encoding") from e
    if token_footer != footer:
        raise PasetoError("bad token footer")
    if len(body) < 24 + 16:
        raise PasetoError("bad token length")
    n, c = body[:24], body[24:]
    aead, nonce12 = _xchacha_aead(key, n)
    pre = pae([HEADER.encode(), n, footer])
    try:
        return aead.decrypt(nonce12, c, pre)
    except InvalidTag as e:
        raise PasetoError("token forged or corrupted") from e
