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
                 engine: str = "conv_i8", mesh=None):
        self._storage = storage
        self._dsk = dsk
        self._compiler = PlanCompiler(dsk, engine=engine, mesh=mesh)

    def _load_frame(self, session_uuid: str, frame_uuid: str) -> FrameData:
        entry = self._storage.get_data_frame(session_uuid, frame_uuid)
        total_bits = sum(c.dtype.bit_width for c in entry.columns)
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

    def _store_frame(self, session_uuid: str, name: str,
                     schema_type, frame: FrameData) -> str:
        frame_uuid = self._storage.create_data_frame(
            session_uuid, name, schema_type, frame.columns,
            frame.row_count, frame.partitions,
        )
        data = np.asarray(frame.data)
        from herdsman_tpu.compiler.stages import partition_sizes

        sizes = partition_sizes(frame.row_count, frame.partitions)
        off = 0
        for part, size in enumerate(sizes):
            self._storage.write_partition_rows(
                session_uuid, frame_uuid, part,
                frame_codec.rows_to_payloads(data[off:off + size]),
            )
            off += size
        self._storage.mark_data_frame_as_uploaded(session_uuid, frame_uuid)
        return frame_uuid

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
                                  result.intermediates[nid])
            elif isinstance(st, ReduceStage):
                name = f"reduce-{job.job_uuid}-{nid}"
                self._store_frame(session, name, plan.schema_type,
                                  result.intermediates[nid])
            elif isinstance(st, OutputStage):
                name = st.name or f"output-{job.job_uuid}-{nid}"
                outputs[nid] = self._store_frame(
                    session, name, plan.schema_type, result.outputs[nid]
                )
        return result.total_tasks, result.total_bootstraps, outputs
