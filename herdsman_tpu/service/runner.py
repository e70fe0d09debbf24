"""Job runner — bridges disk frames to device execution.

The device-side replacement for the reference's worker dispatch: where the
reference's executor round-robins MapTask/ReduceTask rpcs over a gRPC fleet
(reference src/execution/worker/grpc/grpc_worker_group.cpp), this runner
loads the input frames, executes the plan as XLA dataflow
(compiler.stages.PlanCompiler) and writes intermediate/output frames back to
storage under the reference's naming scheme ("intermediate-<job>-<node>",
"reduce-<job>-<node>", reference src/service/execution_service.cpp:527,569).
"""

from __future__ import annotations

import logging

import numpy as np

from herdsman_tpu.circuit.plan import (
    InputStage,
    MapperStage,
    OutputStage,
    ReduceStage,
)
from herdsman_tpu.compiler.stages import FrameData, PlanCompiler
from herdsman_tpu.service import frames as frame_codec
from herdsman_tpu.service.execution import JobDescriptor
from herdsman_tpu.service.storage import StorageService
from herdsman_tpu.ops.server_key import DeviceServerKey

log = logging.getLogger("herdsman.runner")


class StorageJobRunner:
    def __init__(self, storage: StorageService, dsk: DeviceServerKey,
                 engine: str = "conv_i8", mesh=None, packing_key=None):
        """``packing_key`` (a core.reference.PackingKey for the session)
        enables GLWE-DOMAIN INTERMEDIATE FRAMES: mapper/reduce outputs are
        stored as packed GLWEs ((k+1)*N u32 per N LWE bits — ~192x smaller
        at STD128_K2 than (n+1)-u32-per-bit rows) and expanded back to
        n-LWEs on load via device extract-all + keyswitch
        (ops.pack.unpack_lwes_batch).  Output-stage frames always stay in
        the row format so client downloads are unaffected."""
        self._storage = storage
        self._dsk = dsk
        self._compiler = PlanCompiler(dsk, engine=engine, mesh=mesh)
        self._pkc = None
        if packing_key is not None:
            from herdsman_tpu.ops import pack as pack_mod
            assert packing_key.params.name == dsk.params.name, \
                "packing key params must match the server key"
            self._pkc = pack_mod.packing_key_conv(packing_key)

    def _load_frame(self, session_uuid: str, frame_uuid: str) -> FrameData:
        entry = self._storage.get_data_frame(session_uuid, frame_uuid)
        total_bits = sum(c.dtype.bit_width for c in entry.columns)
        if entry.glwe_packed:
            return self._load_frame_packed(session_uuid, entry, total_bits)
        payloads: list[bytes] = []
        for part in range(entry.partitions):
            payloads.extend(
                self._storage.read_partition_rows(
                    session_uuid, frame_uuid, part
                )
            )
        data = frame_codec.payloads_to_rows(
            payloads, total_bits, self._dsk.params
        )
        return FrameData(entry.columns, data, entry.partitions)

    def _load_frame_packed(self, session_uuid: str, entry,
                           total_bits: int) -> FrameData:
        """Expand a GLWE-packed frame back to [rows, bits, n+1] LWEs."""
        import jax.numpy as jnp

        from herdsman_tpu.ops import pack as pack_mod

        p = self._dsk.params
        lwes: list[np.ndarray] = []
        for part in range(entry.partitions):
            blobs = self._storage.read_partition_rows(
                session_uuid, entry.uuid, part)
            glwes = np.stack([
                np.frombuffer(b, dtype="<u4").reshape(p.k + 1, p.N)
                for b in blobs
            ]) if blobs else np.zeros((0, p.k + 1, p.N), np.uint32)
            n_lwes = self._part_bit_count(entry, part, total_bits)
            if not n_lwes:
                continue
            out = np.asarray(pack_mod.unpack_lwes_batch(
                self._dsk, jnp.asarray(glwes), p.N))
            lwes.append(out.reshape(-1)[: n_lwes * (p.n + 1)]
                        .reshape(n_lwes, p.n + 1))
        flat = np.concatenate(lwes, axis=0)
        data = flat.reshape(entry.row_count, total_bits, p.n + 1)
        return FrameData(entry.columns, data, entry.partitions)

    @staticmethod
    def _part_bit_count(entry, part: int, total_bits: int) -> int:
        from herdsman_tpu.compiler.stages import partition_sizes
        return partition_sizes(entry.row_count,
                               entry.partitions)[part] * total_bits

    def _store_frame(self, session_uuid: str, name: str,
                     schema_type, frame: FrameData,
                     pack: bool = False) -> str:
        frame_uuid = self._storage.create_data_frame(
            session_uuid, name, schema_type, frame.columns,
            frame.row_count, frame.partitions,
        )
        data = np.asarray(frame.data)
        from herdsman_tpu.compiler.stages import partition_sizes

        sizes = partition_sizes(frame.row_count, frame.partitions)
        if pack and self._pkc is not None:
            self._store_frame_packed(session_uuid, frame_uuid, data, sizes)
            return frame_uuid
        off = 0
        for part, size in enumerate(sizes):
            self._storage.write_partition_rows(
                session_uuid, frame_uuid, part,
                frame_codec.rows_to_payloads(data[off:off + size]),
            )
            off += size
        self._storage.mark_data_frame_as_uploaded(session_uuid, frame_uuid)
        return frame_uuid

    def _store_frame_packed(self, session_uuid: str, frame_uuid: str,
                            data: np.ndarray, sizes: list[int]) -> None:
        import jax.numpy as jnp

        from herdsman_tpu.ops import pack as pack_mod
        from herdsman_tpu.utils import rowcodec

        p = self._dsk.params
        off = 0
        for part, size in enumerate(sizes):
            flat = data[off:off + size].reshape(-1, p.n + 1)
            off += size
            groups: list[np.ndarray] = []
            full = flat.shape[0] // p.N * p.N
            if full:
                g = np.asarray(pack_mod.pack_lwes_batch(
                    p, self._pkc, jnp.asarray(
                        flat[:full].reshape(-1, p.N, p.n + 1))))
                groups.extend(g)
            if full < flat.shape[0]:
                g = np.asarray(pack_mod.pack_lwes_batch(
                    p, self._pkc, jnp.asarray(flat[None, full:])))
                groups.append(g[0])
            blobs = [np.ascontiguousarray(g, dtype="<u4").tobytes()
                     for g in groups]
            path = self._storage.partition_path(session_uuid, frame_uuid,
                                                part)
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_bytes(rowcodec.frame_rows(blobs))
        self._storage.set_glwe_packed(session_uuid, frame_uuid)

    def __call__(self, job: JobDescriptor) -> tuple[int, int, dict[int, str]]:
        session = job.session_uuid
        plan = job.plan
        input_frames: dict[str, FrameData] = {}
        for node in plan.execution_graph:
            if isinstance(node.value, InputStage):
                fu = node.value.data_frame_uuid
                input_frames[fu] = self._load_frame(session, fu)

        # per-job concurrency_limit caps in-flight stages (the reference
        # caps a job's in-flight tasks, execution_service.cpp:138-165)
        result = self._compiler.execute(
            plan, input_frames,
            max_parallel=max(1, job.concurrency_limit))

        outputs: dict[int, str] = {}
        for node in plan.execution_graph:
            st = node.value
            nid = node.node_id()
            if isinstance(st, MapperStage):
                name = f"intermediate-{job.job_uuid}-{nid}"
                self._store_frame(session, name, plan.schema_type,
                                  result.intermediates[nid], pack=True)
            elif isinstance(st, ReduceStage):
                name = f"reduce-{job.job_uuid}-{nid}"
                self._store_frame(session, name, plan.schema_type,
                                  result.intermediates[nid], pack=True)
            elif isinstance(st, OutputStage):
                name = st.name or f"output-{job.job_uuid}-{nid}"
                outputs[nid] = self._store_frame(
                    session, name, plan.schema_type, result.outputs[nid]
                )
        return result.total_tasks, result.total_bootstraps, outputs
