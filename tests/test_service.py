"""Control-plane tests: sessions, auth, key store, storage (streamed upload,
partition split, validation aborts), execution service (locking, retry,
status) — encoding the reference's behavioral contracts (SURVEY.md §4)."""

import threading

import numpy as np
import pytest

from herdsman_tpu.circuit.model import ColumnMeta, DataType, SchemaType
from herdsman_tpu.service.auth import AuthService
from herdsman_tpu.service.errors import (
    InvalidTokenException,
    ObjectAlreadyExistsException,
    ObjectNotFoundException,
    ResourceLockedException,
)
from herdsman_tpu.service.execution import (
    ExecutionService, JobStatus, RETRY_LIMIT,
)
from herdsman_tpu.service.keystore import KeyService
from herdsman_tpu.service.session import SessionService
from herdsman_tpu.service.storage import StorageService
from herdsman_tpu.utils import rowcodec


# ---------------------------------------------------------------------------
# auth
# ---------------------------------------------------------------------------

def test_auth_roundtrip():
    auth = AuthService("secret", token_lifetime=100)
    token = auth.authenticate("admin==true")
    t = auth.validate_token(token)
    assert t.user_id == 0


def test_auth_rejects_bad_credential():
    auth = AuthService("secret")
    with pytest.raises(InvalidTokenException):
        auth.authenticate("admin==false")


def test_auth_rejects_forged_token():
    a1 = AuthService("secret-a")
    a2 = AuthService("secret-b")
    token = a1.create_token(0)
    with pytest.raises(InvalidTokenException):
        a2.validate_token(token)
    with pytest.raises(InvalidTokenException):
        a1.validate_token(token[:-4] + "AAAA")


def test_auth_lifetime():
    auth = AuthService("secret", token_lifetime=100)
    token = auth.create_token(7, now=1000)
    assert auth.validate_token(token, now=1099).user_id == 7
    with pytest.raises(InvalidTokenException):
        auth.validate_token(token, now=1100)  # start + lifetime > now fails


# ---------------------------------------------------------------------------
# sessions
# ---------------------------------------------------------------------------

def test_sessions():
    svc = SessionService()
    s = svc.create_session(0, "alpha")
    assert svc.session_exists_by_uuid(0, s.uuid)
    with pytest.raises(ObjectAlreadyExistsException):
        svc.create_session(0, "alpha")  # name-unique per user
    svc.create_session(1, "alpha")  # other user OK
    assert len(svc.list_sessions(0)) == 1
    svc.destroy_session_by_uuid(0, s.uuid)
    assert not svc.session_exists_by_uuid(0, s.uuid)
    with pytest.raises(ObjectNotFoundException):
        svc.destroy_session_by_name(0, "alpha")


def test_sessions_persist_across_restart(tmp_path):
    """Beyond the reference (whose sessions are lost with the process): a
    persist_path journals the registry and rehydrates it on construction."""
    path = tmp_path / "sessions.json"
    svc = SessionService(persist_path=path)
    s = svc.create_session(0, "alpha")
    svc.create_session(3, "beta")
    svc2 = SessionService(persist_path=path)  # "restart"
    assert svc2.session_exists_by_uuid(0, s.uuid)
    assert [x.name for x in svc2.list_sessions(3)] == ["beta"]
    svc2.destroy_session_by_name(0, "alpha")
    svc3 = SessionService(persist_path=path)
    assert not svc3.session_exists_by_uuid(0, s.uuid)
    assert [x.name for x in svc3.list_sessions(3)] == ["beta"]


# ---------------------------------------------------------------------------
# keystore
# ---------------------------------------------------------------------------

def test_keystore(tmp_path):
    ks = KeyService(tmp_path)
    ks.add_key("sess", SchemaType.TFHE_BOOL, b"keybytes")
    assert ks.key_exists("sess", SchemaType.TFHE_BOOL)
    assert ks.read_key("sess", SchemaType.TFHE_BOOL) == b"keybytes"
    # on-disk layout parity: key_dir/<session>/<schema_int>.key
    assert (tmp_path / "sess" / "0.key").exists()
    with pytest.raises(ObjectAlreadyExistsException):
        ks.add_key("sess", SchemaType.TFHE_BOOL, b"x")
    ks.lock_key("sess", SchemaType.TFHE_BOOL)
    with pytest.raises(ResourceLockedException):
        ks.remove_key("sess", SchemaType.TFHE_BOOL)
    ks.unlock_key("sess", SchemaType.TFHE_BOOL)
    ks.remove_key("sess", SchemaType.TFHE_BOOL)
    assert not ks.key_exists("sess", SchemaType.TFHE_BOOL)


# ---------------------------------------------------------------------------
# row codec
# ---------------------------------------------------------------------------

def test_rowcodec_roundtrip():
    rows = [b"abc", b"", b"x" * 1000]
    framed = rowcodec.frame_rows(rows)
    assert rowcodec.parse_rows(framed) == rows
    with pytest.raises(ValueError):
        rowcodec.parse_rows(framed[:-1])


def test_rowcodec_native_loaded():
    assert rowcodec._load_native() is not None, (
        "native rowcodec not built — run: cmake -S native -B native/build "
        "-G Ninja && cmake --build native/build"
    )


@pytest.mark.parametrize("use_native", [False, True])
def test_split_rows(tmp_path, use_native):
    import herdsman_tpu.utils.rowcodec as rc

    saved = rc._native, rc._native_checked
    if not use_native:
        rc._native, rc._native_checked = None, True
    try:
        rows = [bytes([i]) * (i + 1) for i in range(10)]
        framed = rc.frame_rows(rows)

        class St:
            current_partition = 0
            rows_stored_in_partition = 0

        st = St()
        d = tmp_path / f"frame-{use_native}"
        d.mkdir()
        sizes = [4, 3, 3]  # 10 rows over 3 partitions (reference formula)
        # feed in two chunks split at a row boundary mid-partition
        # (rows 0..2 are 5+6+7=18 framed bytes)
        n1 = rc.split_rows(framed[:18], d, st, lambda i: sizes[i], 3)
        n2 = rc.split_rows(framed[18:], d, st, lambda i: sizes[i], 3)
        assert n1 + n2 == 10
        got = []
        for p in range(3):
            part_rows = rc.parse_rows((d / str(p)).read_bytes())
            assert len(part_rows) == sizes[p]
            got.extend(part_rows)
        assert got == rows
    finally:
        rc._native, rc._native_checked = saved


def test_split_rows_chunk_must_end_on_row_boundary(tmp_path):
    # the reference's next_row_size walk assumes whole rows per chunk;
    # a truncated row raises
    rows = [b"hello", b"world"]
    framed = rowcodec.frame_rows(rows)

    class St:
        current_partition = 0
        rows_stored_in_partition = 0

    d = tmp_path / "f"
    d.mkdir()
    with pytest.raises(ValueError):
        rowcodec.split_rows(framed[:7], d, St(), lambda i: 2, 1)


# ---------------------------------------------------------------------------
# storage service
# ---------------------------------------------------------------------------

COLS = (ColumnMeta("v", DataType.UINT8),)


def test_storage_upload_and_partitions(tmp_path):
    st = StorageService(tmp_path)
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 10, 3)
    rows = [bytes([i]) * 8 for i in range(10)]
    data = rowcodec.frame_rows(rows)
    # stream in two chunks
    assert st.append_to_data_frame("s", fu, data[: len(data) // 2]) + \
        st.append_to_data_frame("s", fu, data[len(data) // 2:]) == 10
    st.mark_data_frame_as_uploaded("s", fu)
    assert st.get_data_frame("s", fu).uploaded
    # partition sizes 4,3,3 and disk layout <storage>/<session>/<frame>/<i>
    assert st.get_partition_size("s", fu, 0) == 4
    assert st.get_partition_size("s", fu, 1) == 3
    assert (tmp_path / "s" / fu / "0").exists()
    got = []
    for p in range(3):
        got.extend(st.read_partition_rows("s", fu, p))
    assert got == rows


def test_storage_rejects_bad_partitions(tmp_path):
    st = StorageService(tmp_path)
    with pytest.raises(ValueError):
        st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 5, 6)
    with pytest.raises(ValueError):
        st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 5, 0)


def test_storage_short_upload_detected(tmp_path):
    st = StorageService(tmp_path)
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 4, 2)
    st.append_to_data_frame("s", fu, rowcodec.frame_rows([b"a", b"b"]))
    with pytest.raises(ValueError):
        st.mark_data_frame_as_uploaded("s", fu)


def test_storage_overrun_detected(tmp_path):
    st = StorageService(tmp_path)
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 2, 1)
    with pytest.raises(ValueError):
        st.append_to_data_frame(
            "s", fu, rowcodec.frame_rows([b"a", b"b", b"c"])
        )


def test_storage_busy_lock(tmp_path):
    st = StorageService(tmp_path)
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 2, 1)
    st.lock_data_frame("s", fu)
    with pytest.raises(ResourceLockedException):
        st.remove_data_frame("s", fu)
    st.unlock_data_frame("s", fu)
    st.remove_data_frame("s", fu)
    assert not st.data_frame_exists("s", fu)


def test_storage_remove_keeps_sibling_frames(tmp_path):
    """The reference's remove_data_frame deletes the whole session dir
    (src/service/storage_service.cpp:296-305) — a bug we deliberately fix."""
    st = StorageService(tmp_path)
    f1 = st.create_data_frame("s", "a", SchemaType.TFHE_BOOL, COLS, 1, 1)
    f2 = st.create_data_frame("s", "b", SchemaType.TFHE_BOOL, COLS, 1, 1)
    st.append_to_data_frame("s", f2, rowcodec.frame_rows([b"z"]))
    st.remove_data_frame("s", f1)
    assert st.data_frame_exists("s", f2)
    assert st.read_partition_rows("s", f2, 0) == [b"z"]


# ---------------------------------------------------------------------------
# execution service (with a fake runner; device-path covered elsewhere)
# ---------------------------------------------------------------------------

def _setup_exec(tmp_path, runner):
    ks = KeyService(tmp_path / "keys")
    st = StorageService(tmp_path / "storage")
    ex = ExecutionService(ks, st, runner)
    ks.add_key("s", SchemaType.TFHE_BOOL, b"k")
    fu = st.create_data_frame("s", "in", SchemaType.TFHE_BOOL, COLS, 2, 1)
    st.append_to_data_frame("s", fu, rowcodec.frame_rows([b"a" * 8, b"b" * 8]))
    st.mark_data_frame_as_uploaded("s", fu)
    return ks, st, ex, fu


def _simple_plan(frame_uuid):
    from herdsman_tpu.circuit import (
        CircuitBuilder, ExecutionPlan, InputStage, MapperStage, OutputStage,
    )
    from herdsman_tpu.circuit.dag import DAG

    b = CircuitBuilder([ColumnMeta("v", DataType.BIT)])
    v = b.input_bit("v")
    b.output("v", v ^ v)  # one bootstrap gate -> nonzero complexity
    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(b.build()))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    return ExecutionPlan(SchemaType.TFHE_BOOL, g)


def test_execution_happy_path(tmp_path):
    def runner(job):
        return 3, 42, {2: "out-frame"}

    ks, st, ex, fu = _setup_exec(tmp_path, runner)
    job = ex.schedule_job("s", _simple_plan(fu))
    assert job.estimated_complexity > 0
    done = ex.wait_for_job("s", job.job_uuid, timeout=10)
    assert done.status == JobStatus.COMPLETED
    assert done.tasks_executed == 3
    assert done.output_frames == {2: "out-frame"}
    # locks released on completion (our fix of the reference leak)
    ks.remove_key("s", SchemaType.TFHE_BOOL)
    st.remove_data_frame("s", fu)
    ex.shutdown()


def test_execution_retry_then_fail(tmp_path):
    calls = []

    def runner(job):
        calls.append(1)
        raise RuntimeError("worker down")

    ks, st, ex, fu = _setup_exec(tmp_path, runner)
    job = ex.schedule_job("s", _simple_plan(fu))
    done = ex.wait_for_job("s", job.job_uuid, timeout=10)
    assert done.status == JobStatus.FAILED
    assert "worker down" in done.message
    assert len(calls) == RETRY_LIMIT  # retry semantics (executor.cpp:136-167)
    # locks released on failure too
    ks.remove_key("s", SchemaType.TFHE_BOOL)
    ex.shutdown()


def test_execution_retry_then_succeed(tmp_path):
    calls = []

    def runner(job):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return 1, 1, {}

    ks, st, ex, fu = _setup_exec(tmp_path, runner)
    job = ex.schedule_job("s", _simple_plan(fu))
    done = ex.wait_for_job("s", job.job_uuid, timeout=10)
    assert done.status == JobStatus.COMPLETED
    assert len(calls) == 3
    ex.shutdown()


def test_execution_validates_resources(tmp_path):
    ks, st, ex, fu = _setup_exec(tmp_path, lambda j: (0, 0, {}))
    with pytest.raises(ObjectNotFoundException):
        ex.schedule_job("s", _simple_plan("00000000-0000-0000-0000-000000000000"))
    # un-uploaded frame refused
    fu2 = st.create_data_frame("s", "partial", SchemaType.TFHE_BOOL, COLS, 2, 1)
    from herdsman_tpu.circuit.model import MappingError

    with pytest.raises(MappingError):
        ex.schedule_job("s", _simple_plan(fu2))
    ex.shutdown()


def test_job_listing(tmp_path):
    ks, st, ex, fu = _setup_exec(tmp_path, lambda j: (1, 1, {}))
    j1 = ex.schedule_job("s", _simple_plan(fu))
    j2 = ex.schedule_job("s", _simple_plan(fu))
    ex.wait_for_job("s", j2.job_uuid, timeout=10)
    jobs = ex.list_jobs("s")
    assert {j.job_uuid for j in jobs} == {j1.job_uuid, j2.job_uuid}
    assert ex.describe_job("s", j1.job_uuid).status == JobStatus.COMPLETED
    ex.shutdown()


# ---------------------------------------------------------------------------
# restart durability (checkpoint/resume — absent in the reference, SURVEY §5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_storage_catalog_survives_restart(tmp_path, backend):
    st = StorageService(tmp_path, catalog_backend=backend)
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 2, 1)
    st.append_to_data_frame("s", fu, rowcodec.frame_rows([b"a" * 4, b"b" * 4]))
    st.mark_data_frame_as_uploaded("s", fu)
    # simulate coordinator restart
    st2 = StorageService(tmp_path, catalog_backend=backend)
    entry = st2.get_data_frame("s", fu)
    assert entry.uploaded and entry.row_count == 2
    assert entry.columns == COLS
    assert st2.read_partition_rows("s", fu, 0) == [b"a" * 4, b"b" * 4]


def test_storage_catalog_json_to_sqlite_migration(tmp_path):
    """Switching server.catalog_backend from json to sqlite imports the
    existing catalog.json once (the sqlite db takes over from there)."""
    st = StorageService(tmp_path, catalog_backend="json")
    fu = st.create_data_frame("s", "t", SchemaType.TFHE_BOOL, COLS, 2, 2)
    st2 = StorageService(tmp_path, catalog_backend="sqlite")
    entry = st2.get_data_frame("s", fu)
    assert entry.partitions == 2 and entry.columns == COLS
    # subsequent saves land in the db, not the sidecar
    fu2 = st2.create_data_frame("s", "t2", SchemaType.TFHE_BOOL, COLS, 1, 1)
    st3 = StorageService(tmp_path, catalog_backend="sqlite")
    assert st3.get_data_frame("s", fu2).name == "t2"


def test_keystore_survives_restart(tmp_path):
    ks = KeyService(tmp_path)
    ks.add_key("sess", SchemaType.TFHE_BOOL, b"keybytes")
    ks2 = KeyService(tmp_path)
    assert ks2.key_exists("sess", SchemaType.TFHE_BOOL)
    assert ks2.read_key("sess", SchemaType.TFHE_BOOL) == b"keybytes"


# ---------------------------------------------------------------------------
# config loading
# ---------------------------------------------------------------------------

def test_load_template_yaml():
    from herdsman_tpu.service.config import load_config

    cfg = load_config("template.yaml")
    assert cfg.server.port == 5000                 # reference default
    assert cfg.security.token_lifetime == 43200    # reference default
    assert cfg.mesh_workers.engine == "pallas_fused"
    assert cfg.logging.level == "info"


def test_config_missing_required(tmp_path):
    from herdsman_tpu.service.config import ConfigError, load_config

    p = tmp_path / "bad.yaml"
    p.write_text("server:\n  hostname: x\n")
    with pytest.raises(ConfigError):
        load_config(str(p))


def test_config_legacy_worker_shapes(tmp_path):
    from herdsman_tpu.service.config import load_config

    p = tmp_path / "legacy.yaml"
    p.write_text(
        "server:\n  hostname: x\n  key_directory: k\n"
        "  storage_directory: s\n"
        "security:\n  secret_key: z\n"
        "workers:\n  grpc:\n    addresses: [a:1, b:2]\n"
    )
    cfg = load_config(str(p))
    assert cfg.grpc_workers.addresses == ["a:1", "b:2"]


def test_job_journal_survives_restart(tmp_path):
    journal = str(tmp_path / "jobs.jsonl")

    def runner(job):
        return 1, 5, {2: "out"}

    ks = KeyService(tmp_path / "keys")
    st = StorageService(tmp_path / "storage")
    ex = ExecutionService(ks, st, runner, journal_path=journal)
    ks.add_key("s", SchemaType.TFHE_BOOL, b"k")
    fu = st.create_data_frame("s", "in", SchemaType.TFHE_BOOL, COLS, 2, 1)
    st.append_to_data_frame("s", fu, rowcodec.frame_rows([b"a" * 8, b"b" * 8]))
    st.mark_data_frame_as_uploaded("s", fu)
    job = ex.schedule_job("s", _simple_plan(fu))
    ex.wait_for_job("s", job.job_uuid, timeout=10)
    ex.shutdown()

    # restart: terminal job state is rehydrated
    ex2 = ExecutionService(ks, st, runner, journal_path=journal)
    j = ex2.get_job_state("s", job.job_uuid)
    assert j.status == JobStatus.COMPLETED
    assert j.bootstraps_executed == 5
    assert j.output_frames == {2: "out"}
    assert ex2.describe_job("s", job.job_uuid).plan is not None
    ex2.shutdown()


def test_compressed_server_key_roundtrip(tmp_path):
    """Seeded (compressed) server-key upload: the coordinator expands the
    (seed, bodies) form to the full key transparently — the session's jobs
    run identically (tfhe-rs CompressedServerKey analog)."""
    import numpy as np

    from herdsman_tpu.core import TOY
    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.service.coordinator import (
        deserialize_server_key, serialize_server_key,
        serialize_server_key_compressed)

    rng = np.random.default_rng(31)
    ck, csk = ref.keygen_seeded(TOY, rng, seed=42)
    blob_c = serialize_server_key_compressed(csk)
    blob_f = serialize_server_key(ref.expand_server_key(csk))
    assert len(blob_c) < len(blob_f) / 2  # wire-size win even at TOY
    sk = deserialize_server_key(blob_c)
    bits = np.array([True, False, True])
    ct = ref.encrypt_bool(ck, bits, rng)
    for i in range(3):
        assert ref.lwe_decrypt_bool(ck, ref.bootstrap_bool(sk, ct[i])) \
            == bits[i]


def test_terminal_error_fails_fast(tmp_path):
    """Deterministic validation errors (the reference's ERROR class,
    executor.cpp:168-178) fail the job on the FIRST attempt — no retries
    burned on a MappingError raised inside the runner."""
    from herdsman_tpu.circuit.model import MappingError

    calls = []

    def runner(job):
        calls.append(1)
        raise MappingError("schema mismatch")

    ks, st, ex, fu = _setup_exec(tmp_path, runner)
    job = ex.schedule_job("s", _simple_plan(fu))
    done = ex.wait_for_job("s", job.job_uuid, timeout=10)
    assert done.status == JobStatus.FAILED
    assert "schema mismatch" in done.message
    assert len(calls) == 1  # fail-fast, not RETRY_LIMIT attempts
    ks.remove_key("s", SchemaType.TFHE_BOOL)  # locks released
    ex.shutdown()


def test_concurrent_job_admission(tmp_path):
    """With concurrent_workers=2, two queued jobs run simultaneously (the
    reference's greedy slot-filling, executor.cpp:96-113): both runners
    must be in-flight at the same moment to pass the barrier."""
    import threading

    barrier = threading.Barrier(2, timeout=10)

    def runner(job):
        barrier.wait()  # deadlocks (-> Barrier timeout) if jobs serialize
        return 1, 0, {}

    ks = KeyService(tmp_path / "keys")
    st = StorageService(tmp_path / "storage")
    ex = ExecutionService(ks, st, runner, concurrent_workers=2)
    ks.add_key("s", SchemaType.TFHE_BOOL, b"k")
    fu = st.create_data_frame("s", "in", SchemaType.TFHE_BOOL, COLS, 2, 1)
    st.append_to_data_frame("s", fu, rowcodec.frame_rows([b"a" * 8, b"b" * 8]))
    st.mark_data_frame_as_uploaded("s", fu)
    j1 = ex.schedule_job("s", _simple_plan(fu))
    j2 = ex.schedule_job("s", _simple_plan(fu))
    assert ex.wait_for_job("s", j1.job_uuid, 15).status == JobStatus.COMPLETED
    assert ex.wait_for_job("s", j2.job_uuid, 15).status == JobStatus.COMPLETED
    ex.shutdown()


def test_branch_parallel_stage_execution(tmp_path):
    """A two-branch plan with concurrency_limit=2 overlaps its independent
    mapper stages (reference execution_service.cpp:312-362 + per-job
    concurrency_limit :138-165): both stages must be in-flight at once."""
    import threading

    import numpy as np

    from herdsman_tpu.circuit import (
        CircuitBuilder, ExecutionPlan, InputStage, MapperStage, OutputStage,
    )
    from herdsman_tpu.circuit.dag import DAG
    from herdsman_tpu.compiler.stages import (FrameData, PlanCompiler,
                                              StageResult)

    b = CircuitBuilder([ColumnMeta("v", DataType.BIT)])
    b.output("v", b.input_bit("v"))
    circ1, circ2 = b.build(), b.build()

    g = DAG()
    inp = g.emplace(InputStage("f"))
    m1 = g.emplace(MapperStage(circ1))
    m2 = g.emplace(MapperStage(circ2))
    o1 = g.emplace(OutputStage("a"))
    o2 = g.emplace(OutputStage("b"))
    g.add_edge(inp, m1)
    g.add_edge(inp, m2)
    g.add_edge(m1, o1)
    g.add_edge(m2, o2)
    plan = ExecutionPlan(SchemaType.TFHE_BOOL, g)

    barrier = threading.Barrier(2, timeout=10)

    class StubCompiler(PlanCompiler):
        def __init__(self):  # no device key needed
            super().__init__(dsk=None, engine="conv_i8")

        def run_mapper(self, stage, parent):
            barrier.wait()  # Barrier timeout if branches serialize
            return StageResult(parent, tasks=1, bootstraps=0)

    frame = FrameData((ColumnMeta("v", DataType.BIT),),
                      np.zeros((2, 1, 3), dtype=np.uint32), 1)
    res = StubCompiler().execute(plan, {"f": frame}, max_parallel=2)
    assert res.total_tasks == 2
    assert set(res.outputs) == {o1.node_id(), o2.node_id()}
