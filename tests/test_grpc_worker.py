"""Static gRPC worker fleet — the GrpcWorkerGroup + hived analog
(reference src/execution/worker/grpc/grpc_worker_group.cpp:13-110 and the
reconstructed herd::proto::Worker contract, SURVEY.md §2.4).  Covers:

- e2e: a map+reduce plan dispatched as proto tasks over
  herdsman.Worker/{map,reduce} to a 2-worker fleet sharing the storage
  namespace, output decrypt-exact vs the oracle;
- round-robin placement across the fleet (reference :102) with
  concurrent_workers() = fleet size (:107-110);
- TIME_OUT retry: a worker answering UNAVAILABLE burns attempts, the
  executor retries up to RETRY_LIMIT = 3 (reference executor.cpp:136-167);
- terminal worker ERROR (INTERNAL) fails the job immediately
  (reference executor.cpp:168-178);
- task proto round-trip through the dto_mappers analog.
"""

import numpy as np
import pytest

from herdsman_tpu.circuit import (
    CircuitBuilder,
    ColumnMeta,
    DataType,
    ExecutionPlan,
    InputStage,
    MapperStage,
    OutputStage,
    Policy,
    ReduceStage,
    SchemaType,
)
from herdsman_tpu.circuit.dag import DAG
from herdsman_tpu.core import TOY
from herdsman_tpu.core import client as client_lib
from herdsman_tpu.core import reference as ref
from herdsman_tpu.service import frames as frame_codec
from herdsman_tpu.service import mappers
from herdsman_tpu.service.config import (
    Config,
    GrpcWorkersConfig,
    SecurityConfig,
    ServerConfig,
)
from herdsman_tpu.service.coordinator import Coordinator, serialize_server_key
from herdsman_tpu.service.execution import JobStatus
from herdsman_tpu.service.grpc_worker import make_worker_server
from herdsman_tpu.service.offload import (
    CryptoKeyPtr,
    DataFramePtr,
    InputDataFramePtr,
    MapTask,
    ReduceTask,
)
from herdsman_tpu.utils import rowcodec

IN_COLS = (ColumnMeta("a", DataType.UINT8), ColumnMeta("b", DataType.UINT8))
MAP_OUT_COLS = (ColumnMeta("x", DataType.UINT8),)


def map_circuit():
    cb = CircuitBuilder(IN_COLS)
    cb.output("x", cb.input_column("a") ^ cb.input_column("b"))
    return cb.build()


def reduce_circuit():
    cb = CircuitBuilder(MAP_OUT_COLS + MAP_OUT_COLS)
    cb.output("x", cb.input_column_at(0) ^ cb.input_column_at(1))
    return cb.build()


def start_fleet(tmp, n=2, **kw):
    servers = []
    for _ in range(n):
        srv, port = make_worker_server(str(tmp / "storage"),
                                       str(tmp / "keys"), port=0,
                                       engine="conv_i8", **kw)
        srv.start()
        servers.append((srv, port))
    return servers


def make_coordinator(tmp, ports):
    cfg = Config(
        server=ServerConfig(key_directory=str(tmp / "keys"),
                            storage_directory=str(tmp / "storage")),
        security=SecurityConfig(secret_key="test-secret"),
        grpc_workers=GrpcWorkersConfig(
            addresses=[f"127.0.0.1:{p}" for p in ports]),
    )
    return Coordinator(cfg, engine="conv_i8")


def open_session(coord):
    rng = np.random.default_rng(1234)
    ck, sk = ref.keygen(TOY, rng)
    token = coord.authorize_connection("admin==true")
    session = coord.create_session(token, "grpc-fleet")
    key_bytes = serialize_server_key(sk)
    coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL, len(key_bytes),
                  [key_bytes])
    return token, session, ck, rng


def upload(coord, token, session_uuid, name, table, ck, rng, partitions):
    rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    meta = coord.begin_data_frame_upload(
        token, session_uuid, name, SchemaType.TFHE_BOOL, IN_COLS,
        rows_ct.shape[0], partitions)
    payloads = frame_codec.rows_to_payloads(np.asarray(rows_ct))
    coord.append_data_frame(token, session_uuid, meta.uuid,
                            rowcodec.frame_rows(payloads))
    coord.finish_data_frame_upload(token, session_uuid, meta.uuid)
    return meta.uuid


def map_reduce_plan(frame_uuid, policy=Policy.PARALLEL_FULL):
    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    rd = g.emplace(ReduceStage(reduce_circuit(), policy, per_node_count=2))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, rd)
    g.add_edge(rd, out)
    return ExecutionPlan(SchemaType.TFHE_BOOL, g)


def map_only_plan(frame_uuid):
    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    return ExecutionPlan(SchemaType.TFHE_BOOL, g)


def decrypt_output(coord, token, session_uuid, job, ck, n_rows):
    [(_, out_frame)] = job.output_frames.items()
    payloads = []
    for chunk in coord.download_data_frame(token, session_uuid, out_frame):
        payloads.extend(rowcodec.parse_rows(chunk))
    assert len(payloads) == n_rows
    rows = frame_codec.payloads_to_rows(payloads, 8, TOY)
    return [r["x"] for r in client_lib.decrypt_rows(ck, MAP_OUT_COLS, rows)]


def stop_all(coord, servers):
    coord.shutdown()
    for srv, _ in servers:
        srv.stop(grace=None)


# ---------------------------------------------------------------------------


def test_grpc_fleet_e2e_map_reduce_round_robin(tmp_path):
    """Map+reduce over a 2-worker fleet; tasks land round-robin on BOTH
    workers (reference grpc_worker_group.cpp:102) and the result is
    decrypt-exact."""
    servers = start_fleet(tmp_path, n=2)
    coord = make_coordinator(tmp_path, [p for _, p in servers])
    try:
        token, session, ck, rng = open_session(coord)
        table = [(3, 5), (200, 100), (255, 255), (17, 4), (128, 1)]
        frame = upload(coord, token, session.uuid, "in", table, ck, rng,
                       partitions=4)
        job = coord.schedule_job(token, session.uuid,
                                 map_reduce_plan(frame),
                                 concurrency_limit=4)
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=600)
        assert done.status == JobStatus.COMPLETED, done.message
        assert done.tasks_executed > 0 and done.bootstraps_executed > 0
        expect = 0
        for a, b in table:
            expect ^= a ^ b
        assert decrypt_output(coord, token, session.uuid, done, ck, 1) \
            == [expect]
        counts = [srv.task_counts.get("tasks", 0) for srv, _ in servers]
        assert sum(counts) == done.tasks_executed
        assert all(c > 0 for c in counts), counts  # round-robin hit both
    finally:
        stop_all(coord, servers)


def test_grpc_fleet_retry_on_unavailable(tmp_path):
    """Two injected UNAVAILABLEs burn two of the task's three attempts;
    the third succeeds (reference executor.cpp:136-167)."""
    servers = start_fleet(tmp_path, n=1, fail_first=2)
    coord = make_coordinator(tmp_path, [p for _, p in servers])
    try:
        token, session, ck, rng = open_session(coord)
        table = [(7, 9), (1, 1)]
        frame = upload(coord, token, session.uuid, "in", table, ck, rng,
                       partitions=1)
        job = coord.schedule_job(token, session.uuid, map_only_plan(frame))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=600)
        assert done.status == JobStatus.COMPLETED, done.message
        assert decrypt_output(coord, token, session.uuid, done, ck, 2) \
            == [7 ^ 9, 0]
    finally:
        stop_all(coord, servers)


def test_grpc_fleet_worker_error_is_terminal(tmp_path):
    """A worker that RAISES (INTERNAL) fails the job immediately — no
    retry stacked on a terminal ERROR (reference executor.cpp:168-178).
    Injected by pointing the worker at an empty key directory so key
    load raises inside the task."""
    servers = []
    srv, port = make_worker_server(str(tmp_path / "storage"),
                                   str(tmp_path / "nokeys"), port=0,
                                   engine="conv_i8")
    srv.start()
    servers.append((srv, port))
    coord = make_coordinator(tmp_path, [port])
    try:
        token, session, ck, rng = open_session(coord)
        frame = upload(coord, token, session.uuid, "in", [(1, 2)], ck, rng,
                       partitions=1)
        job = coord.schedule_job(token, session.uuid, map_only_plan(frame))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=600)
        assert done.status == JobStatus.FAILED
        assert "worker ERROR" in done.message
        assert done.retries == 1  # one job execution, no stacked retries
    finally:
        stop_all(coord, servers)


def test_hung_worker_times_out_as_retryable(tmp_path, monkeypatch):
    """A worker that never answers must surface as DEADLINE_EXCEEDED ->
    TIME_OUT (retryable) instead of leaking the RPC forever (round-4
    review finding: the dispatch now carries an RPC deadline)."""
    import threading
    import time as _time

    import grpc as _grpc

    from herdsman_tpu.service.grpc_worker import GrpcWorkerGroup, pb
    from herdsman_tpu.service.offload import TaskKey, TaskStatus

    # a Worker server whose map handler just sleeps
    from concurrent.futures import ThreadPoolExecutor

    release = threading.Event()

    def hang(request, context):
        release.wait(10)
        return pb.Empty()

    server = _grpc.server(ThreadPoolExecutor(max_workers=1))
    server.add_generic_rpc_handlers((
        _grpc.method_handlers_generic_handler("herdsman.Worker", {
            "map": _grpc.unary_unary_rpc_method_handler(
                hang,
                request_deserializer=pb.MapTaskProto.FromString,
                response_serializer=pb.Empty.SerializeToString),
        }),
    ))
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    monkeypatch.setattr(GrpcWorkerGroup, "RPC_TIMEOUT_S", 0.5)
    group = GrpcWorkerGroup([f"127.0.0.1:{port}"])
    try:
        key = TaskKey("s", "j", 0, 0)
        task = MapTask("s", InputDataFramePtr("f", 0, 1),
                       DataFramePtr("o", 0), CryptoKeyPtr(SchemaType.TFHE_BOOL),
                       map_circuit())
        t0 = _time.monotonic()
        handle = group.schedule_task(key, task)
        status = handle.wait(5)
        assert status is TaskStatus.TIME_OUT
        assert _time.monotonic() - t0 < 3  # the deadline fired, not the hang
    finally:
        release.set()
        group.shutdown()
        server.stop(grace=None)


@pytest.mark.parametrize("kind", ["map", "reduce"])
def test_task_proto_round_trip(kind):
    """MapTask/ReduceTask -> proto -> model is identity (the dto_mappers
    worker.hpp overloads, reference grpc_worker_group.cpp:84,93)."""
    key = CryptoKeyPtr(SchemaType.TFHE_BOOL)
    out = DataFramePtr("frame-out", 3)
    circ = map_circuit()
    if kind == "map":
        task = MapTask("sess", InputDataFramePtr("frame-in", 1, 42), out,
                       key, circ)
        back = mappers.map_task_to_model(mappers.task_to_proto(task))
    else:
        task = ReduceTask(
            "sess",
            (InputDataFramePtr("f1", 0, 7), InputDataFramePtr("f2", 2, 1)),
            out, key, circ)
        back = mappers.reduce_task_to_model(mappers.task_to_proto(task))
    assert back == task
