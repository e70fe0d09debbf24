"""Coordinator — the full control-plane facade (the main.cpp + controllers
analog, reference src/main.cpp:102-159 and src/controller/*).

Exposes the complete client-facing API surface of the reference's four gRPC
services (Auth, Session, Storage, Execution — SURVEY.md §2.4) as direct
method calls; `herdsman_tpu.service.api_server` wraps this in a network
server. Every method that the reference guards with the token plugin takes a
`token` argument validated the same way (bypass list = authorize_connection,
reference src/main.cpp:34).

Implemented beyond the reference: download_data_frame (UNIMPLEMENTED at
reference src/controller/storage_controller.cpp:264-273) and describe_job
(unimplemented passthrough at src/controller/execution_controller.cpp:19-22).
"""

from __future__ import annotations

import io
import logging
import struct
from typing import Iterable, Optional, Sequence

import numpy as np

from herdsman_tpu.circuit.model import ColumnMeta, MappingError, SchemaType
from herdsman_tpu.circuit.plan import ExecutionPlan
from herdsman_tpu.core import PARAM_SETS
from herdsman_tpu.core.reference import ServerKey
from herdsman_tpu.service.auth import AuthService, AuthToken
from herdsman_tpu.service.config import Config
from herdsman_tpu.service.errors import ObjectNotFoundException
from herdsman_tpu.service.execution import ExecutionService, JobDescriptor
from herdsman_tpu.service.keystore import KeyService
from herdsman_tpu.service.runner import StorageJobRunner
from herdsman_tpu.service.session import SessionService
from herdsman_tpu.service.storage import DataFrameEntry, StorageService

log = logging.getLogger("herdsman")


def serialize_server_key(sk: ServerKey) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, bsk=sk.bsk, ksk=sk.ksk,
                        params=np.array([sk.params.name], dtype=object))
    return buf.getvalue()


def serialize_server_key_compressed(csk) -> bytes:
    """Seeded-key wire format (core.reference.CompressedServerKey):
    ~(k+1)x less BSK + (n+1)x less KSK upload than the full key."""
    buf = io.BytesIO()
    np.savez_compressed(
        buf, seed=np.array([csk.seed], dtype=np.uint64),
        bsk_bodies=csk.bsk_bodies, ksk_bodies=csk.ksk_bodies,
        params=np.array([csk.params.name], dtype=object))
    return buf.getvalue()


def deserialize_server_key(data: bytes) -> ServerKey:
    z = np.load(io.BytesIO(data), allow_pickle=True)
    params = PARAM_SETS[str(z["params"][0])]
    if "seed" in z.files:  # compressed (seeded) key: expand at ingest
        from herdsman_tpu.core.reference import (CompressedServerKey,
                                                 expand_server_key)
        return expand_server_key(CompressedServerKey(
            params, int(z["seed"][0]), z["bsk_bodies"], z["ksk_bodies"]))
    return ServerKey(params, z["bsk"], z["ksk"])


def serialize_packing_key(pk) -> bytes:
    """Wire/disk form of the LWE->GLWE packing keyswitch key (uploaded
    under SchemaType.TFHE_PACKING)."""
    buf = io.BytesIO()
    np.savez_compressed(buf, pksk=pk.pksk,
                        params=np.array([pk.params.name], dtype=object))
    return buf.getvalue()


def deserialize_packing_key(data: bytes):
    from herdsman_tpu.core.reference import PackingKey

    z = np.load(io.BytesIO(data), allow_pickle=True)
    return PackingKey(PARAM_SETS[str(z["params"][0])], z["pksk"])


def key_params_from_bytes(data: bytes):
    """Parameter set of a serialized server key WITHOUT loading the
    multi-MB key arrays (npz members decompress lazily on access)."""
    z = np.load(io.BytesIO(data), allow_pickle=True)
    return PARAM_SETS[str(z["params"][0])]


class Coordinator:
    def __init__(self, config: Config, engine: Optional[str] = None):
        self.config = config
        level = getattr(logging, config.logging.level.upper(), logging.INFO)
        logging.basicConfig(level=level)
        # Initialize the jax backend on the MAIN thread: some PJRT plugins
        # (the axon TPU tunnel) fail to register when first touched from a
        # worker thread, and jobs run on the executor thread.
        import jax

        jax.devices()
        self.auth = AuthService(config.security.secret_key,
                                config.security.token_lifetime)
        self.sessions = SessionService(
            persist_path=__import__("pathlib").Path(
                config.server.storage_directory
            ) / "sessions.json"
        )
        self.keys = KeyService(config.server.key_directory)
        self.storage = StorageService(
            config.server.storage_directory,
            catalog_backend=config.server.catalog_backend)
        # in-flight seeded (compressed) uploads: frame_uuid -> expansion
        # state (seed, params, per-row bit count, mask-stream position,
        # partial-row buffer)
        self._seeded_uploads: dict[str, dict] = {}
        self.execution = ExecutionService(
            self.keys, self.storage,
            journal_path=str(
                __import__("pathlib").Path(config.server.storage_directory)
                / "jobs.jsonl"
            ),
            concurrent_workers=(
                config.mesh_workers.concurrent_jobs
                if config.mesh_workers else 1
            ),
        )
        self._engine = engine or (
            config.mesh_workers.engine if config.mesh_workers else "conv_i8"
        )
        # session -> (resolved engine name, DeviceServerKey)
        self._session_dsk: dict[str, tuple[str, object]] = {}
        # session -> StorageJobRunner: reused ACROSS jobs so the
        # PlanCompiler's compiled-circuit cache survives job boundaries
        # (a fresh runner per job re-jitted every plan — tens of seconds
        # per job at production params, docs/BENCH_LOG.md round 5)
        self._session_runner: dict[str, object] = {}
        # session -> device packing-key conv layout (glwe_inputs ingest)
        self._session_pkc: dict[str, tuple[object, object]] = {}
        # lazy worker group: GrpcWorkerGroup (workers.grpc) or
        # OffloadWorkerGroup (workers.lambda); creation is locked — with
        # concurrent_jobs > 1 two executor threads could otherwise both
        # build a group and leak the loser's channels
        self._offload_group = None
        import threading as _threading
        self._offload_group_lock = _threading.Lock()
        self.execution.set_runner(self._run_job)

    # ---- auth (reference src/controller/auth_controller.cpp) ----

    def authorize_connection(self, authentication_token: str) -> str:
        return self.auth.authenticate(authentication_token)

    def _validate(self, token: str) -> AuthToken:
        return self.auth.validate_token(token)

    # ---- sessions (reference src/controller/session_controller.cpp) ----

    def create_session(self, token: str, name: str):
        user = self._validate(token)
        return self.sessions.create_session(user.user_id, name)

    def destroy_session(self, token: str, session_uuid: str) -> None:
        user = self._validate(token)
        self.sessions.destroy_session_by_uuid(user.user_id, session_uuid)

    def list_sessions(self, token: str):
        user = self._validate(token)
        return self.sessions.list_sessions(user.user_id)

    def _check_session(self, token: str, session_uuid: str) -> AuthToken:
        user = self._validate(token)
        if not self.sessions.session_exists_by_uuid(user.user_id, session_uuid):
            raise ObjectNotFoundException(f"no session {session_uuid}")
        return user

    # ---- keys (client-streamed in the reference,
    #            src/controller/session_controller.cpp:120-207) ----

    def add_key(self, token: str, session_uuid: str, schema_type: SchemaType,
                size: int, chunks: Iterable[bytes]) -> None:
        self._check_session(token, session_uuid)
        buf = bytearray()
        for chunk in chunks:
            buf.extend(chunk)
            if len(buf) > size:
                raise ValueError(
                    f"key upload overrun: {len(buf)} > declared {size}"
                )
        if len(buf) != size:
            raise ValueError(f"short key upload: {len(buf)} of {size} bytes")
        self.keys.add_key(session_uuid, schema_type, bytes(buf))
        self._session_dsk.pop(session_uuid, None)
        self._session_runner.pop(session_uuid, None)
        self._session_pkc.pop(session_uuid, None)

    def remove_key(self, token: str, session_uuid: str,
                   schema_type: SchemaType) -> None:
        self._check_session(token, session_uuid)
        self.keys.remove_key(session_uuid, schema_type)
        self._session_dsk.pop(session_uuid, None)
        self._session_runner.pop(session_uuid, None)
        self._session_pkc.pop(session_uuid, None)

    def list_keys(self, token: str, session_uuid: str) -> list[SchemaType]:
        self._check_session(token, session_uuid)
        return self.keys.list_keys(session_uuid)

    # ---- data frames (reference src/controller/storage_controller.cpp) ----

    def begin_data_frame_upload(
        self, token: str, session_uuid: str, name: str,
        schema_type: SchemaType, columns: Sequence[ColumnMeta],
        row_count: int, partitions: int,
        seeded_seed: Optional[int] = None,
    ) -> DataFrameEntry:
        """First message of the bidi stream: validates and replies with the
        new frame's metadata (reference :55-113).

        `seeded_seed` enables the compressed upload path (beyond the
        reference): row payloads carry only the LWE bodies (one u32 per
        bit) and the coordinator re-derives the masks from the seed at
        ingest, storing the standard expanded layout — the on-disk format,
        partition math and job pipeline are untouched."""
        self._check_session(token, session_uuid)
        if not self.keys.key_exists(session_uuid, schema_type):
            raise ObjectNotFoundException(
                f"upload the {schema_type.name} key before frames "
                "(reference storage_controller.cpp:90-98)"
            )
        frame_uuid = self.storage.create_data_frame(
            session_uuid, name, schema_type, columns, row_count, partitions
        )
        if seeded_seed is not None:
            params = key_params_from_bytes(
                self.keys.read_key(session_uuid, schema_type))
            self._seeded_uploads[frame_uuid] = {
                "seed": int(seeded_seed),
                "params": params,
                "row_bits": sum(c.dtype.bit_width for c in columns),
                "cts_done": 0,
                "buf": b"",
            }
        return self.storage.get_data_frame(session_uuid, frame_uuid)

    def _expand_seeded_chunk(self, frame_uuid: str, data: bytes) -> bytes:
        """Expand a chunk of seeded rows ([u32 size][bodies]) into the
        standard full-ciphertext framing; buffers partial rows across
        chunk boundaries (clients may split anywhere, reference
        storage_service.cpp:119-150 semantics)."""
        from herdsman_tpu.core import reference as ref
        from herdsman_tpu.utils import rowcodec

        st = self._seeded_uploads[frame_uuid]
        buf = st["buf"] + data
        p = st["params"]
        row_bodies: list[np.ndarray] = []
        off = 0
        row_bytes = st["row_bits"] * 4
        while off + 4 <= len(buf):
            (size,) = struct.unpack_from("<I", buf, off)
            if size != row_bytes:
                raise ValueError(
                    f"seeded row payload must be {row_bytes} bytes "
                    f"(one u32 body per bit), got {size}")
            if off + 4 + size > len(buf):
                break
            row_bodies.append(np.frombuffer(
                buf, dtype=np.uint32, count=st["row_bits"], offset=off + 4))
            off += 4 + size
        st["buf"] = buf[off:]
        if not row_bodies:
            return b""
        # one mask-stream expansion for ALL complete rows of the chunk
        # (seeded_mask offsets are O(1) via Philox counter advance)
        cts = ref.expand_seeded(p, st["seed"], np.concatenate(row_bodies),
                                offset=st["cts_done"])
        st["cts_done"] += cts.shape[0]
        rb = st["row_bits"]
        cts = cts.reshape(len(row_bodies), rb * (p.n + 1))
        return rowcodec.frame_rows(
            [cts[r].tobytes() for r in range(cts.shape[0])])

    def append_data_frame(self, token: str, session_uuid: str,
                          frame_uuid: str, data: bytes) -> int:
        self._check_session(token, session_uuid)
        try:
            if frame_uuid in self._seeded_uploads:
                data = self._expand_seeded_chunk(frame_uuid, data)
                if not data:
                    return 0
            return self.storage.append_to_data_frame(
                session_uuid, frame_uuid, data
            )
        except ValueError:
            # over/under-run aborts delete the frame (reference :128-150)
            self._seeded_uploads.pop(frame_uuid, None)
            self.storage.remove_data_frame(session_uuid, frame_uuid)
            raise

    def finish_data_frame_upload(self, token: str, session_uuid: str,
                                 frame_uuid: str) -> None:
        self._check_session(token, session_uuid)
        try:
            st = self._seeded_uploads.pop(frame_uuid, None)
            if st is not None and st["buf"]:
                raise ValueError(
                    f"seeded upload ended mid-row ({len(st['buf'])} "
                    "trailing bytes)")
            self.storage.mark_data_frame_as_uploaded(session_uuid, frame_uuid)
        except ValueError:
            self.storage.remove_data_frame(session_uuid, frame_uuid)
            raise
        mw = self.config.mesh_workers
        if mw is not None and mw.glwe_inputs:
            self._pack_input_frame(session_uuid, frame_uuid)

    def _pack_input_frame(self, session_uuid: str, frame_uuid: str) -> None:
        """glwe_inputs: re-encode the freshly uploaded row frame as packed
        GLWEs (192x smaller at STD128_K2; the job runner expands on load
        with one device matmul).  Best-effort: without a TFHE_PACKING key,
        or below the 8-sigma frame margin at secure params, the frame
        stays in the row format."""
        from herdsman_tpu.core import noise as noise_mod
        from herdsman_tpu.ops import pack as pack_mod
        from herdsman_tpu.service.runner import pack_frame_partitions_inplace

        cached = self._session_pkc.get(session_uuid)
        if cached is None:
            try:
                pk = deserialize_packing_key(self.keys.read_key(
                    session_uuid, SchemaType.TFHE_PACKING))
            except ObjectNotFoundException:
                log.warning("glwe_inputs: session %s has no TFHE_PACKING "
                            "key at ingest; frame %s stays in row format",
                            session_uuid, frame_uuid)
                return
            margin = noise_mod.glwe_frame_margin_sigma(pk.params)
            if margin < 8.0 and pk.params.security_bits > 0:
                log.warning("glwe_inputs: frame margin %.1f sigma at %s "
                            "below the 8-sigma bar; frame %s stays in row "
                            "format", margin, pk.params.name, frame_uuid)
                return
            cached = (pack_mod.packing_key_conv(pk), pk.params)
            self._session_pkc[session_uuid] = cached
        pkc, pk_params = cached
        try:
            pack_frame_partitions_inplace(
                self.storage, session_uuid, frame_uuid, pkc, pk_params)
        except Exception as e:  # noqa: BLE001 — packing is an optimization
            log.warning("glwe_inputs: packing frame %s failed (%s: %s); "
                        "frame stays in row format", frame_uuid,
                        type(e).__name__, e)

    def abandon_data_frame_upload(self, token: str, session_uuid: str,
                                  frame_uuid: str) -> None:
        """Clean up an upload whose stream terminated without finishing
        (client disconnect / abort): drop any in-flight seeded-expansion
        state and delete the never-finalized frame — the reference deletes
        frames on aborted streams too (storage_controller.cpp:128-150)."""
        self._check_session(token, session_uuid)
        self._seeded_uploads.pop(frame_uuid, None)
        try:
            entry = self.storage.get_data_frame(session_uuid, frame_uuid)
        except ObjectNotFoundException:
            return
        if not entry.uploaded:
            self.storage.remove_data_frame(session_uuid, frame_uuid)

    def list_data_frames(
        self, token: str, session_uuid: str,
        schema_type: Optional[SchemaType] = None,
    ) -> list[DataFrameEntry]:
        self._check_session(token, session_uuid)
        return self.storage.list_session_data_frames(session_uuid, schema_type)

    def remove_data_frame(self, token: str, session_uuid: str,
                          frame_uuid: str) -> None:
        self._check_session(token, session_uuid)
        self._seeded_uploads.pop(frame_uuid, None)  # drop in-flight state
        self.storage.remove_data_frame(session_uuid, frame_uuid)

    def download_data_frame(self, token: str, session_uuid: str,
                            frame_uuid: str) -> Iterable[bytes]:
        """Stream partition contents (implemented; the reference returns
        UNIMPLEMENTED, src/controller/storage_controller.cpp:264-273)."""
        self._check_session(token, session_uuid)
        entry = self.storage.get_data_frame(session_uuid, frame_uuid)
        if entry.glwe_packed:
            raise MappingError(
                f"frame {frame_uuid} is stored in the GLWE-packed domain "
                "(glwe_frames); download it with download_data_frame_packed "
                "and decrypt with the GLWE secret key")
        for part in range(entry.partitions):
            path = self.storage.partition_path(session_uuid, frame_uuid, part)
            yield path.read_bytes() if path.exists() else b""

    def download_data_frame_packed(self, token: str, session_uuid: str,
                                   frame_uuid: str) -> Iterable[bytes]:
        """Compressed download (beyond the reference): the frame's LWE
        rows are packed into GLWE ciphertexts with the session's
        TFHE_PACKING key (up to N per GLWE — (n+1)*N -> (k+1)*N u32,
        ~192x at STD128_K2).  Each partition streams as
        [u32 n_cts][u32 n_groups] then n_groups * (k+1)*N u32 GLWEs;
        clients holding the GLWE secret key decrypt directly
        (core.client.decrypt_rows_packed)."""
        from herdsman_tpu.ops import pack as pack_mod
        from herdsman_tpu.utils import rowcodec

        self._check_session(token, session_uuid)
        pk = deserialize_packing_key(
            self.keys.read_key(session_uuid, SchemaType.TFHE_PACKING))
        p = pk.params
        entry = self.storage.get_data_frame(session_uuid, frame_uuid)
        frame_params = key_params_from_bytes(
            self.keys.read_key(session_uuid, entry.schema_type))
        if frame_params.name != p.name:
            raise MappingError(
                f"packing key params ({p.name}) do not match the frame's "
                f"{entry.schema_type.name} key params ({frame_params.name}); "
                "re-upload a TFHE_PACKING key generated for the same "
                "parameter set")
        if entry.glwe_packed:
            # the frame already lives in the GLWE domain (glwe_frames):
            # stream the stored GLWEs as-is — zero device work
            from herdsman_tpu.compiler.stages import partition_sizes
            total_bits = sum(c.dtype.bit_width for c in entry.columns)
            sizes = partition_sizes(entry.row_count, entry.partitions)
            for part in range(entry.partitions):
                path = self.storage.partition_path(session_uuid, frame_uuid,
                                                   part)
                blobs = rowcodec.parse_rows(
                    path.read_bytes() if path.exists() else b"")
                head = struct.pack("<II", sizes[part] * total_bits,
                                   len(blobs))
                yield head + b"".join(blobs)
            return
        pkc = pack_mod.packing_key_conv(pk)  # device conv layout
        for part in range(entry.partitions):
            path = self.storage.partition_path(session_uuid, frame_uuid,
                                               part)
            data = path.read_bytes() if path.exists() else b""
            cts = [
                np.frombuffer(pl, dtype=np.uint32).reshape(-1, p.n + 1)
                for pl in rowcodec.parse_rows(data)
            ]
            flat = (np.concatenate(cts, axis=0) if cts
                    else np.zeros((0, p.n + 1), dtype=np.uint32))
            groups = []
            full = flat.shape[0] // p.N * p.N
            if full:  # full groups in one batched device call
                g = np.asarray(pack_mod.pack_lwes_batch(
                    p, pkc, flat[:full].reshape(-1, p.N, p.n + 1)))
                groups.extend(g)
            if full < flat.shape[0]:  # the partial tail group
                g = np.asarray(pack_mod.pack_lwes_batch(
                    p, pkc, flat[None, full:]))
                groups.append(g[0])
            head = struct.pack("<II", flat.shape[0], len(groups))
            yield head + b"".join(np.asarray(g).tobytes() for g in groups)

    # ---- execution (reference src/controller/execution_controller.cpp) ----

    def _device_key(self, session_uuid: str):
        """(engine, dsk) for the session — the engine is resolved
        PER SESSION (fit_engine depends on the session key's params), so
        one session's HBM-driven fallback never downgrades another
        session whose params would fit (round-2 advisor finding)."""
        if session_uuid not in self._session_dsk:
            from herdsman_tpu.ops.server_key import (device_server_key,
                                                     fit_engine,
                                                     layouts_for_engine)

            data = self.keys.read_key(session_uuid, SchemaType.TFHE_BOOL)
            sk = deserialize_server_key(data)
            engine = fit_engine(self._engine, sk.params)
            if engine != self._engine:
                log.warning("engine %s key layout won't fit HBM at %s; "
                            "session %s uses %s", self._engine,
                            sk.params.name, session_uuid, engine)
            self._session_dsk[session_uuid] = (engine, device_server_key(
                sk, layouts=layouts_for_engine(engine)
            ))
        return self._session_dsk[session_uuid]

    def _mesh(self):
        """Device mesh from workers.mesh config (batch_axis > 1 shards
        plan rows over the herd; None = single device)."""
        mw = self.config.mesh_workers
        if mw is None or mw.batch_axis * mw.limb_axis <= 1:
            return None
        from herdsman_tpu.mesh import make_mesh
        return make_mesh(batch=mw.batch_axis, limb=mw.limb_axis)

    def _run_job(self, job: JobDescriptor):
        if self.config.logging.profile_dir:
            from herdsman_tpu.utils import tracing
            import os.path
            with tracing.trace(os.path.join(self.config.logging.profile_dir,
                                            job.job_uuid)):
                return self._run_job_inner(job)
        return self._run_job_inner(job)

    def _run_job_inner(self, job: JobDescriptor):
        if self.config.grpc_workers is not None:
            # static gRPC worker fleet (the reference's PRIMARY flavor,
            # build_worker_group grpc branch src/main.cpp:67-84 ->
            # grpc_worker_group.cpp:13-110): round-robin async dispatch
            # of proto tasks over herdsman.Worker/{map,reduce}
            from herdsman_tpu.service.grpc_worker import GrpcWorkerGroup
            from herdsman_tpu.service.offload import OffloadJobRunner
            with self._offload_group_lock:
                if self._offload_group is None:
                    self._offload_group = GrpcWorkerGroup(
                        self.config.grpc_workers.addresses)
            return OffloadJobRunner(self.storage, self._offload_group)(job)
        if self.config.lambda_workers is not None:
            # elastic CPU-offload dispatch (the reference's
            # build_worker_group lambda branch, src/main.cpp:67-84)
            from herdsman_tpu.service.offload import (OffloadJobRunner,
                                                      OffloadWorkerGroup)
            with self._offload_group_lock:
                if self._offload_group is None:
                    lw = self.config.lambda_workers
                    self._offload_group = OffloadWorkerGroup(
                        lw.address, lw.concurrency_limit, self.storage)
            return OffloadJobRunner(self.storage, self._offload_group)(job)
        cached = self._session_runner.get(job.session_uuid)
        if cached is not None:
            return cached(job)
        engine, dsk = self._device_key(job.session_uuid)
        pk = None
        mw = self.config.mesh_workers
        if mw is not None and (mw.glwe_frames or mw.glwe_outputs):
            # GLWE-domain intermediate frames need the session's packing
            # key; silently stay in the row format without one
            try:
                pk = deserialize_packing_key(self.keys.read_key(
                    job.session_uuid, SchemaType.TFHE_PACKING))
                if pk.params.name != dsk.params.name:
                    log.warning("glwe_frames: packing key params mismatch "
                                "(%s vs %s); using row frames",
                                pk.params.name, dsk.params.name)
                    pk = None
            except ObjectNotFoundException:
                pk = None
            if pk is not None:
                # refuse glwe frames when the closed-form margin for the
                # extra pack/unpack keyswitch noise falls below the
                # production bar (round-2 advisor medium finding: the path
                # was only ever validated at TOY params)
                from herdsman_tpu.core import noise as noise_mod
                margin = noise_mod.glwe_frame_margin_sigma(dsk.params)
                if margin < 8.0 and dsk.params.security_bits > 0:
                    log.warning(
                        "glwe_frames: closed-form gate margin %.1f sigma "
                        "at %s is below the 8-sigma production bar; using "
                        "row frames", margin, dsk.params.name)
                    pk = None
        runner = StorageJobRunner(
            self.storage, dsk, engine=engine, mesh=self._mesh(),
            packing_key=pk,
            glwe_frames=bool(mw is not None and mw.glwe_frames),
            glwe_outputs=bool(mw is not None and mw.glwe_outputs))
        # concurrent executor slots may race here; last writer wins and the
        # loser's runner is still correct (same dsk/engine/pk inputs), so no
        # lock is needed — the cache only exists to keep the PlanCompiler's
        # compiled circuits warm across jobs
        self._session_runner[job.session_uuid] = runner
        return runner(job)

    def schedule_job(self, token: str, session_uuid: str,
                     plan: ExecutionPlan | str,
                     concurrency_limit: int = 1) -> JobDescriptor:
        self._check_session(token, session_uuid)
        if isinstance(plan, str):
            plan = ExecutionPlan.from_json(plan)  # raises MappingError
        if not isinstance(plan, ExecutionPlan):
            raise MappingError("not an execution plan")
        return self.execution.schedule_job(session_uuid, plan,
                                           concurrency_limit)

    def get_job_state(self, token: str, session_uuid: str, job_uuid: str):
        self._check_session(token, session_uuid)
        return self.execution.get_job_state(session_uuid, job_uuid)

    def list_jobs(self, token: str, session_uuid: str):
        self._check_session(token, session_uuid)
        return self.execution.list_jobs(session_uuid)

    def describe_job(self, token: str, session_uuid: str, job_uuid: str):
        self._check_session(token, session_uuid)
        return self.execution.describe_job(session_uuid, job_uuid)

    def wait_for_job(self, token: str, session_uuid: str, job_uuid: str,
                     timeout: float = 300.0):
        self._check_session(token, session_uuid)
        return self.execution.wait_for_job(session_uuid, job_uuid, timeout)

    def shutdown(self) -> None:
        self.execution.shutdown()
        if self._offload_group is not None:
            self._offload_group.shutdown()
