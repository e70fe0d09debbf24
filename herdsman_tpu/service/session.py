"""SessionService — in-memory session registry, parity with the reference
(reference include/service/session_service.hpp:11-32,
src/service/session_service.cpp): multimap user_id -> {uuid, name}; create is
name-unique per user; destroy by uuid; list per user."""

from __future__ import annotations

import dataclasses
import threading
import uuid as uuid_mod

from herdsman_tpu.service.errors import (
    ObjectAlreadyExistsException,
    ObjectNotFoundException,
)


@dataclasses.dataclass(frozen=True)
class Session:
    uuid: str
    name: str


class SessionService:
    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._sessions: dict[int, list[Session]] = {}

    def create_session(self, user_id: int, name: str) -> Session:
        with self._lock:
            for s in self._sessions.get(user_id, []):
                if s.name == name:
                    raise ObjectAlreadyExistsException(
                        f"session {name!r} already exists"
                    )
            session = Session(str(uuid_mod.uuid4()), name)
            self._sessions.setdefault(user_id, []).append(session)
            return session

    def destroy_session_by_uuid(self, user_id: int, session_uuid: str) -> None:
        with self._lock:
            sessions = self._sessions.get(user_id, [])
            for i, s in enumerate(sessions):
                if s.uuid == session_uuid:
                    del sessions[i]
                    return
            raise ObjectNotFoundException(f"no session {session_uuid}")

    def destroy_session_by_name(self, user_id: int, name: str) -> None:
        with self._lock:
            sessions = self._sessions.get(user_id, [])
            for i, s in enumerate(sessions):
                if s.name == name:
                    del sessions[i]
                    return
            raise ObjectNotFoundException(f"no session {name!r}")

    def session_exists_by_uuid(self, user_id: int, session_uuid: str) -> bool:
        with self._lock:
            return any(
                s.uuid == session_uuid
                for s in self._sessions.get(user_id, [])
            )

    def list_sessions(self, user_id: int) -> list[Session]:
        with self._lock:
            return list(self._sessions.get(user_id, []))
