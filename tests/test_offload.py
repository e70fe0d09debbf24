"""Elastic CPU-offload worker group — the LambdaWorkerGroup + FilesystemWatch
analog (reference src/execution/worker/lambda/lambda_http_worker_group.cpp,
filesystem_watch.cpp).  Covers:

- e2e: a map+reduce plan dispatched task-by-task over HTTP to an offload
  worker sharing the storage namespace, output decrypt-exact vs the oracle;
- TIME_OUT retry: a worker that 500s the first attempts is retried up to
  RETRY_LIMIT = 3 (reference executor.cpp:136-167);
- terminal failure: retry exhaustion fails the JOB once, with no job-level
  re-run stacked on the per-task retries (executor.cpp:158-178);
- fire-and-forget completion: a worker that does the work but never
  returns 200 completes via output-file appearance
  (lambda_http_worker_group.cpp:244-259);
- FilesystemWatch semantics (filesystem_watch.cpp:33-71).
"""

import threading
import time

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
from herdsman_tpu.service.config import (
    Config,
    LambdaWorkersConfig,
    SecurityConfig,
    ServerConfig,
)
from herdsman_tpu.service.coordinator import Coordinator, serialize_server_key
from herdsman_tpu.service.execution import JobStatus
from herdsman_tpu.service.offload import FilesystemWatch
from herdsman_tpu.service.offload_worker import make_server
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


def start_worker(tmp, **kw):
    srv = make_server(str(tmp / "storage"), str(tmp / "keys"), port=0,
                      engine="conv_i8", **kw)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def make_coordinator(tmp, port, concurrency_limit=4):
    cfg = Config(
        server=ServerConfig(key_directory=str(tmp / "keys"),
                            storage_directory=str(tmp / "storage")),
        security=SecurityConfig(secret_key="test-secret"),
        lambda_workers=LambdaWorkersConfig(
            address=f"127.0.0.1:{port}", concurrency_limit=concurrency_limit),
    )
    return Coordinator(cfg, engine="conv_i8")


def open_session(coord):
    rng = np.random.default_rng(1234)
    ck, sk = ref.keygen(TOY, rng)
    token = coord.authorize_connection("admin==true")
    session = coord.create_session(token, "offload")
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


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("policy", [Policy.SEQUENCED, Policy.PARALLEL_FULL])
def test_offload_e2e_map_reduce(tmp_path, policy):
    srv = start_worker(tmp_path)
    coord = make_coordinator(tmp_path, srv.server_address[1])
    try:
        token, session, ck, rng = open_session(coord)
        table = [(3, 5), (200, 100), (255, 255), (17, 4), (128, 1)]
        frame = upload(coord, token, session.uuid, f"in-{policy.name}",
                       table, ck, rng, partitions=2)
        job = coord.schedule_job(token, session.uuid,
                                 map_reduce_plan(frame, policy),
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
    finally:
        coord.shutdown()
        srv.shutdown()


def test_offload_retry_on_timeout(tmp_path):
    """Two injected 500s burn two of the task's three attempts; the third
    succeeds (reference executor.cpp:136-167)."""
    srv = start_worker(tmp_path, fail_first=2)
    coord = make_coordinator(tmp_path, srv.server_address[1])
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
        coord.shutdown()
        srv.shutdown()


def test_offload_retry_exhaustion_fails_job_terminally(tmp_path):
    """A task that exhausts RETRY_LIMIT fails the JOB once — terminal, no
    job-level retry stacked on top (reference executor.cpp:158-178)."""
    srv = start_worker(tmp_path, fail_first=10_000)
    coord = make_coordinator(tmp_path, srv.server_address[1])
    try:
        token, session, ck, rng = open_session(coord)
        frame = upload(coord, token, session.uuid, "in", [(1, 2)], ck, rng,
                       partitions=1)
        job = coord.schedule_job(token, session.uuid, map_only_plan(frame))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=600)
        assert done.status == JobStatus.FAILED
        assert "failed after 3 attempts" in done.message
        assert done.retries == 1  # one job execution, not RETRY_LIMIT re-runs
    finally:
        coord.shutdown()
        srv.shutdown()


def test_offload_file_only_completion(tmp_path):
    """Fire-and-forget workers: the task completes because the expected
    output file APPEARS, even though the HTTP channel never says 200
    (reference lambda_http_worker_group.cpp:244-259)."""
    srv = start_worker(tmp_path, file_only=True)
    coord = make_coordinator(tmp_path, srv.server_address[1])
    try:
        token, session, ck, rng = open_session(coord)
        table = [(10, 20), (30, 40)]
        frame = upload(coord, token, session.uuid, "in", table, ck, rng,
                       partitions=1)
        job = coord.schedule_job(token, session.uuid, map_only_plan(frame))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=600)
        assert done.status == JobStatus.COMPLETED, done.message
        assert decrypt_output(coord, token, session.uuid, done, ck, 2) \
            == [10 ^ 20, 30 ^ 40]
    finally:
        coord.shutdown()
        srv.shutdown()


def test_filesystem_watch(tmp_path):
    """watch_for fires once when the file appears; unwatch cancels
    (reference filesystem_watch.cpp:4-71)."""
    watch = FilesystemWatch(poll_interval=0.05)
    try:
        hits = []
        watch.watch_for(tmp_path / "a.out", lambda: hits.append("a"))
        watch.watch_for(tmp_path / "b.out", lambda: hits.append("b"))
        watch.unwatch(tmp_path / "b.out")
        time.sleep(0.2)
        assert hits == []
        (tmp_path / "a.out").write_bytes(b"x")
        (tmp_path / "b.out").write_bytes(b"x")
        deadline = time.monotonic() + 5
        while not hits and time.monotonic() < deadline:
            time.sleep(0.02)
        assert hits == ["a"]  # b was unwatched
        time.sleep(0.2)
        assert hits == ["a"]  # fires once
    finally:
        watch.stop()
