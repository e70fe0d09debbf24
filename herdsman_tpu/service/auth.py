"""AuthService — token mint/verify, parity with the reference's PASETO
v2-local scheme (reference src/service/auth_service.cpp):

- 16-byte payload: user_id (u64 LE) || unix_seconds (i64 LE)  (:11-38)
- footer "herdsman"  (:9)
- single hardcoded credential: authentication_token == "admin==true"
  -> user_id 0  (:50-51)
- lifetime check: session_start + lifetime > now  (:94-100)

Deviation: libpaseto/libsodium are not available here, so tokens are
HMAC-SHA256-authenticated rather than XChaCha20-encrypted; the wire shape
mirrors PASETO ("v2h.local.<b64(payload||mac)>.<b64(footer)>"). The payload
was never secret (it is the server's own session bookkeeping), so the
security property that matters — unforgeability — is preserved.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import hmac
import struct
import time

from herdsman_tpu.service.errors import InvalidTokenException

_FOOTER = b"herdsman"
_HEADER = "v2h.local."
_PAYLOAD = struct.Struct("<Qq")  # user_id u64, unix seconds i64


@dataclasses.dataclass(frozen=True)
class AuthToken:
    user_id: int
    session_start: int


def _b64e(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _b64d(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


class AuthService:
    def __init__(self, secret_key: str, token_lifetime: int = 43200):
        self._key = hashlib.sha256(secret_key.encode()).digest()
        self._lifetime = int(token_lifetime)

    # ---- credential check (reference :44-56) ----

    def authenticate(self, authentication_token: str) -> str:
        if authentication_token != "admin==true":
            raise InvalidTokenException("invalid credentials")
        return self.create_token(user_id=0)

    # ---- token mint/verify ----

    def create_token(self, user_id: int, now: int | None = None) -> str:
        now = int(time.time()) if now is None else int(now)
        payload = _PAYLOAD.pack(user_id, now)
        mac = hmac.new(self._key, payload + _FOOTER, hashlib.sha256).digest()
        return f"{_HEADER}{_b64e(payload + mac)}.{_b64e(_FOOTER)}"

    def decode_token(self, token: str) -> AuthToken:
        if not token.startswith(_HEADER):
            raise InvalidTokenException("bad token header")
        parts = token[len(_HEADER):].split(".")
        if len(parts) != 2:
            raise InvalidTokenException("bad token shape")
        try:
            body = _b64d(parts[0])
            footer = _b64d(parts[1])
        except Exception as e:
            raise InvalidTokenException("bad token encoding") from e
        if footer != _FOOTER:
            raise InvalidTokenException("bad token footer")
        if len(body) != _PAYLOAD.size + 32:
            raise InvalidTokenException("bad token length")
        payload, mac = body[:_PAYLOAD.size], body[_PAYLOAD.size:]
        expect = hmac.new(self._key, payload + _FOOTER, hashlib.sha256).digest()
        if not hmac.compare_digest(mac, expect):
            raise InvalidTokenException("token forged or corrupted")
        user_id, start = _PAYLOAD.unpack(payload)
        return AuthToken(user_id, start)

    def validate_token(self, token: str, now: int | None = None) -> AuthToken:
        """decode + lifetime check (reference :94-100)."""
        t = self.decode_token(token)
        now = int(time.time()) if now is None else int(now)
        if not t.session_start + self._lifetime > now:
            raise InvalidTokenException("token expired")
        return t
