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


def pack_frame_partitions_inplace(storage: StorageService,
                                  session_uuid: str, frame_uuid: str,
                                  pkc, params) -> None:
    """Re-encode an uploaded ROW-format frame as packed GLWEs in place
    (per partition, preserving the partition row split).  Used by the
    coordinator's ``glwe_inputs`` ingest path; the job runner then loads
    it through the packed branch (`_load_frame_packed`)."""
    import jax.numpy as jnp

    from herdsman_tpu.ops import pack as pack_mod
    from herdsman_tpu.utils import rowcodec

    entry = storage.get_data_frame(session_uuid, frame_uuid)
    if entry.glwe_packed:
        return
    p = params
    for part in range(entry.partitions):
        payloads = storage.read_partition_rows(session_uuid, frame_uuid,
                                               part)
        flat = (np.concatenate([
            np.frombuffer(pl, dtype="<u4").reshape(-1, p.n + 1)
            for pl in payloads
        ], axis=0) if payloads
            else np.zeros((0, p.n + 1), np.uint32))
        groups: list[np.ndarray] = []
        full = flat.shape[0] // p.N * p.N
        if full:
            g = np.asarray(pack_mod.pack_lwes_batch(
                p, pkc, jnp.asarray(flat[:full].reshape(-1, p.N,
                                                        p.n + 1))))
            groups.extend(g)
        if full < flat.shape[0]:
            g = np.asarray(pack_mod.pack_lwes_batch(
                p, pkc, jnp.asarray(flat[None, full:])))
            groups.append(g[0])
        blobs = [np.ascontiguousarray(g, dtype="<u4").tobytes()
                 for g in groups]
        path = storage.partition_path(session_uuid, frame_uuid, part)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(rowcodec.frame_rows(blobs))
    storage.set_glwe_packed(session_uuid, frame_uuid)


class StorageJobRunner:
    def __init__(self, storage: StorageService, dsk: DeviceServerKey,
                 engine: str = "conv_i8", mesh=None, packing_key=None,
                 glwe_frames: bool = True, glwe_outputs: bool = False):
        """``packing_key`` (a core.reference.PackingKey for the session)
        enables GLWE-DOMAIN INTERMEDIATE FRAMES: mapper/reduce outputs are
        stored as packed GLWEs ((k+1)*N u32 per N LWE bits — ~192x smaller
        at STD128_K2 than (n+1)-u32-per-bit rows) and expanded back to
        n-LWEs on load via device extract-all + keyswitch
        (ops.pack.unpack_lwes_batch).  Output-stage frames stay in the row
        format unless ``glwe_outputs`` is set, which stores them packed
        too (then clients download via download_data_frame_packed; the
        noise added is the same packing keyswitch a packed download
        applies, so margins are unchanged)."""
        self._storage = storage
        self._dsk = dsk
        self._compiler = PlanCompiler(dsk, engine=engine, mesh=mesh)
        self._glwe_frames = glwe_frames    # pack intermediate frames
        self._glwe_outputs = glwe_outputs  # pack OUTPUT frames too
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
        import time

        frame_uuid = self._storage.create_data_frame(
            session_uuid, name, schema_type, frame.columns,
            frame.row_count, frame.partitions,
        )
        from herdsman_tpu.compiler.stages import partition_sizes

        sizes = partition_sizes(frame.row_count, frame.partitions)
        if pack and self._pkc is not None:
            # pack ON DEVICE from the device-resident frame: the only
            # device->host hop is the packed GLWEs ((k+1)N u32 per N bits,
            # ~192x smaller than rows at STD128_K2) — pulling the rows to
            # host first put the full frame on the tunnel/PCIe twice
            import jax

            data = frame.data
            if not (isinstance(data, jax.Array)
                    and data.is_fully_addressable):
                data = np.asarray(data)
            self._store_frame_packed(session_uuid, frame_uuid, data, sizes)
            return frame_uuid
        t0 = time.perf_counter()
        data = np.asarray(frame.data)
        t_sync = time.perf_counter()
        off = 0
        for part, size in enumerate(sizes):
            self._storage.write_partition_rows(
                session_uuid, frame_uuid, part,
                frame_codec.rows_to_payloads(data[off:off + size]),
            )
            off += size
        self._storage.mark_data_frame_as_uploaded(session_uuid, frame_uuid)
        log.debug("store %s: device sync+d2h %.2fs, codec+write %.2fs",
                  name, t_sync - t0, time.perf_counter() - t_sync)
        return frame_uuid

    def _store_frame_packed(self, session_uuid: str, frame_uuid: str,
                            data, sizes: list[int]) -> None:
        """``data`` may be host numpy OR a device array ([R, bits, n+1]);
        slicing/reshaping below stays wherever the array lives, so a
        device-resident frame packs with zero full-size host round trips."""
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

    def _copy_packed_frame(self, session_uuid: str, name: str, schema_type,
                           frame: FrameData, src_uuid: str) -> str:
        """Materialize a second catalog entry for an already-packed frame
        by copying its partition files (same GLWEs, no device work)."""
        frame_uuid = self._storage.create_data_frame(
            session_uuid, name, schema_type, frame.columns,
            frame.row_count, frame.partitions,
        )
        for part in range(frame.partitions):
            src = self._storage.partition_path(session_uuid, src_uuid, part)
            dst = self._storage.partition_path(session_uuid, frame_uuid,
                                               part)
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(src.read_bytes() if src.exists() else b"")
        self._storage.set_glwe_packed(session_uuid, frame_uuid)
        return frame_uuid

    def __call__(self, job: JobDescriptor) -> tuple[int, int, dict[int, str]]:
        import time

        session = job.session_uuid
        plan = job.plan
        t0 = time.perf_counter()
        input_frames: dict[str, FrameData] = {}
        for node in plan.execution_graph:
            if isinstance(node.value, InputStage):
                fu = node.value.data_frame_uuid
                input_frames[fu] = self._load_frame(session, fu)
        t_load = time.perf_counter()

        # per-job concurrency_limit caps in-flight stages (the reference
        # caps a job's in-flight tasks, execution_service.cpp:138-165)
        result = self._compiler.execute(
            plan, input_frames,
            max_parallel=max(1, job.concurrency_limit))
        t_exec = time.perf_counter()

        outputs: dict[int, str] = {}
        # an OutputStage's FrameData IS its parent compute stage's frame
        # (stages.py execute), so when both land packed the output store
        # can copy the already-packed partition files instead of running
        # the packing keyswitch twice on identical data
        packed_stored: dict[int, str] = {}  # id(FrameData) -> frame_uuid
        for node in plan.execution_graph:
            st = node.value
            nid = node.node_id()
            if isinstance(st, MapperStage):
                name = f"intermediate-{job.job_uuid}-{nid}"
                fu = self._store_frame(session, name, plan.schema_type,
                                       result.intermediates[nid],
                                       pack=self._glwe_frames)
            elif isinstance(st, ReduceStage):
                name = f"reduce-{job.job_uuid}-{nid}"
                fu = self._store_frame(session, name, plan.schema_type,
                                       result.intermediates[nid],
                                       pack=self._glwe_frames)
            else:
                continue
            if self._glwe_frames and self._pkc is not None:
                packed_stored[id(result.intermediates[nid])] = fu
        for node in plan.execution_graph:
            st = node.value
            nid = node.node_id()
            if isinstance(st, OutputStage):
                name = st.name or f"output-{job.job_uuid}-{nid}"
                frame = result.outputs[nid]
                src = packed_stored.get(id(frame))
                if self._glwe_outputs and self._pkc is not None \
                        and src is not None:
                    outputs[nid] = self._copy_packed_frame(
                        session, name, plan.schema_type, frame, src)
                else:
                    outputs[nid] = self._store_frame(
                        session, name, plan.schema_type, frame,
                        pack=self._glwe_outputs,
                    )
        t_store = time.perf_counter()
        log.debug("job %s phases: load %.2fs, compile+exec %.2fs, "
                  "store %.2fs", job.job_uuid, t_load - t0, t_exec - t_load,
                  t_store - t_exec)
        return result.total_tasks, result.total_bootstraps, outputs
