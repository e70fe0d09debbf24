"""End-to-end coordinator flow (BASELINE config 1): authorize -> session ->
key upload -> encrypted frame upload (streamed, partitioned) -> map+reduce
plan (JSON round-tripped, like the proto round-trip) -> job execution on
device -> download -> decrypt -> compare against the plaintext oracle."""

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
from herdsman_tpu.service.config import Config, ServerConfig, SecurityConfig
from herdsman_tpu.service.coordinator import Coordinator, serialize_server_key
from herdsman_tpu.service.execution import JobStatus
from herdsman_tpu.service import frames as frame_codec
from herdsman_tpu.utils import rowcodec

IN_COLS = (ColumnMeta("a", DataType.UINT8), ColumnMeta("b", DataType.UINT8))


def map_circuit():
    """x = a XOR b, odd = parity(x)."""
    cb = CircuitBuilder(IN_COLS)
    x = cb.input_column("a") ^ cb.input_column("b")
    parity = x.bits[0]
    for bit in x.bits[1:]:
        parity = parity ^ bit
    cb.output("x", x)
    cb.output("odd", parity)
    return cb.build()


MAP_OUT_COLS = (ColumnMeta("x", DataType.UINT8), ColumnMeta("odd", DataType.BIT))


def reduce_circuit():
    """Bitwise-XOR row combiner over the map output schema (doubled)."""
    cb = CircuitBuilder(MAP_OUT_COLS + MAP_OUT_COLS)
    x = cb.input_column_at(0) ^ cb.input_column_at(2)
    odd = cb.input_column_at(1).bits[0] ^ cb.input_column_at(3).bits[0]
    cb.output("x", x)
    cb.output("odd", odd)
    return cb.build()


@pytest.fixture(scope="module")
def coordinator(tmp_path_factory):
    d = tmp_path_factory.mktemp("herd")
    cfg = Config(
        server=ServerConfig(key_directory=str(d / "keys"),
                            storage_directory=str(d / "storage")),
        security=SecurityConfig(secret_key="test-secret"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    yield coord
    coord.shutdown()


@pytest.fixture(scope="module")
def client_session(coordinator):
    rng = np.random.default_rng(99)
    ck, sk = ref.keygen(TOY, rng)
    token = coordinator.authorize_connection("admin==true")
    session = coordinator.create_session(token, "e2e")
    key_bytes = serialize_server_key(sk)
    # chunked client-streamed key upload (reference session_controller:120-207)
    chunks = [key_bytes[i:i + 1 << 16] for i in range(0, len(key_bytes), 1 << 16)]
    coordinator.add_key(token, session.uuid, SchemaType.TFHE_BOOL,
                        len(key_bytes), chunks)
    return token, session, ck, rng


def upload_rows(coordinator, token, session_uuid, name, columns, rows_ct,
                partitions):
    meta = coordinator.begin_data_frame_upload(
        token, session_uuid, name, SchemaType.TFHE_BOOL, columns,
        rows_ct.shape[0], partitions,
    )
    payloads = frame_codec.rows_to_payloads(np.asarray(rows_ct))
    framed = rowcodec.frame_rows(payloads)
    # stream in ~3 chunks on row boundaries
    per = max(1, len(payloads) // 3)
    off = 0
    for i in range(0, len(payloads), per):
        chunk = rowcodec.frame_rows(payloads[i:i + per])
        coordinator.append_data_frame(token, session_uuid, meta.uuid, chunk)
        off += len(chunk)
    assert off == len(framed)
    coordinator.finish_data_frame_upload(token, session_uuid, meta.uuid)
    return meta.uuid


def build_plan(frame_uuid, policy):
    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    rd = g.emplace(ReduceStage(reduce_circuit(), policy, per_node_count=2))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, rd)
    g.add_edge(rd, out)
    return ExecutionPlan(SchemaType.TFHE_BOOL, g)


@pytest.mark.parametrize(
    "policy", [Policy.SEQUENCED, Policy.PARALLEL, Policy.PARALLEL_FULL]
)
def test_e2e_map_reduce(coordinator, client_session, policy):
    token, session, ck, rng = client_session
    table = [(3, 5), (200, 100), (255, 255), (17, 4), (128, 1)]
    rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    frame_uuid = upload_rows(
        coordinator, token, session.uuid, f"in-{policy.name}", IN_COLS,
        rows_ct, partitions=2,
    )

    # JSON round-trip the plan (the proto round-trip analog)
    plan_json = build_plan(frame_uuid, policy).to_json()
    job = coordinator.schedule_job(token, session.uuid, plan_json)
    assert job.estimated_complexity > 0
    done = coordinator.wait_for_job(token, session.uuid, job.job_uuid,
                                    timeout=900)
    assert done.status == JobStatus.COMPLETED, done.message
    assert done.tasks_executed > 0

    # plaintext oracle
    xs = [a ^ b for a, b in table]
    expect_x = 0
    expect_odd = 0
    for x in xs:
        expect_x ^= x
        expect_odd ^= bin(x).count("1") & 1

    [(out_node, out_frame)] = done.output_frames.items()
    payloads = []
    for chunk in coordinator.download_data_frame(token, session.uuid,
                                                 out_frame):
        payloads.extend(rowcodec.parse_rows(chunk))
    assert len(payloads) == 1
    row = frame_codec.payloads_to_rows(payloads, 9, TOY)
    dec = client_lib.decrypt_rows(ck, MAP_OUT_COLS, row)[0]
    assert dec["x"] == expect_x
    assert dec["odd"] == expect_odd

    # intermediate frames are catalogued (reference behavior)
    frames = coordinator.list_data_frames(token, session.uuid)
    names = [f.name for f in frames]
    assert any(n.startswith("intermediate-") for n in names)
    assert any(n.startswith("reduce-") for n in names)


def test_job_listing_and_describe(coordinator, client_session):
    token, session, ck, rng = client_session
    jobs = coordinator.list_jobs(token, session.uuid)
    assert jobs and all(j.status == JobStatus.COMPLETED for j in jobs)
    d = coordinator.describe_job(token, session.uuid, jobs[0].job_uuid)
    assert d.bootstraps_executed > 0


def test_branching_plan(coordinator, client_session):
    """Stage/pipeline parallelism: one input feeding two independent mapper
    branches, each with its own output (reference DAG readiness semantics,
    src/service/execution_service.cpp:312-362)."""
    token, session, ck, rng = client_session
    table = [(1, 2), (3, 4)]
    rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    frame_uuid = upload_rows(coordinator, token, session.uuid, "branch-in",
                             IN_COLS, rows_ct, partitions=1)

    from herdsman_tpu.circuit import CircuitBuilder

    b1 = CircuitBuilder(IN_COLS)
    b1.output("x", b1.input_column("a") ^ b1.input_column("b"))
    b2 = CircuitBuilder(IN_COLS)
    b2.output("y", b2.input_column("a") + b2.input_column("b"))

    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    m1 = g.emplace(MapperStage(b1.build()))
    m2 = g.emplace(MapperStage(b2.build()))
    o1 = g.emplace(OutputStage("xor"))
    o2 = g.emplace(OutputStage("sum"))
    g.add_edge(inp, m1)
    g.add_edge(inp, m2)
    g.add_edge(m1, o1)
    g.add_edge(m2, o2)
    plan = ExecutionPlan(SchemaType.TFHE_BOOL, g)

    job = coordinator.schedule_job(token, session.uuid, plan)
    done = coordinator.wait_for_job(token, session.uuid, job.job_uuid,
                                    timeout=900)
    assert done.status == JobStatus.COMPLETED, done.message
    assert len(done.output_frames) == 2

    for node_id, frame in done.output_frames.items():
        payloads = []
        for chunk in coordinator.download_data_frame(token, session.uuid,
                                                     frame):
            payloads.extend(rowcodec.parse_rows(chunk))
        rows = frame_codec.payloads_to_rows(payloads, 8, TOY)
        name = coordinator.storage.get_data_frame(session.uuid, frame).name
        col = ColumnMeta("v", DataType.UINT8)
        dec = [r["v"] for r in client_lib.decrypt_rows(ck, (col,), rows)]
        if name == "xor":
            assert dec == [a ^ b for a, b in table]
        else:
            assert dec == [(a + b) % 256 for a, b in table]


def test_seeded_upload_e2e(coordinator, client_session):
    """Seeded (compressed) frame upload — beyond the reference: the wire
    carries only (seed, one u32 body per bit); the coordinator re-derives
    the masks at ingest and stores the standard expanded layout, so the
    whole job pipeline downstream is untouched.  Chunks deliberately split
    MID-ROW to exercise the partial-row buffering."""
    token, session, ck, rng = client_session
    table = [(3, 5), (200, 100), (255, 255), (17, 4), (128, 1), (9, 64)]
    bodies, seed = client_lib.encrypt_rows_seeded(ck, IN_COLS, table, rng)
    assert bodies.shape == (len(table), 16)
    # wire bytes vs the expanded upload: ~(n+1)x smaller
    expanded_bytes = len(table) * 16 * (TOY.n + 1) * 4
    seeded_bytes = bodies.nbytes
    assert expanded_bytes / seeded_bytes == TOY.n + 1

    meta = coordinator.begin_data_frame_upload(
        token, session.uuid, "seeded-in", SchemaType.TFHE_BOOL, IN_COLS,
        len(table), 2, seeded_seed=seed,
    )
    payloads = [bodies[r].tobytes() for r in range(bodies.shape[0])]
    framed = rowcodec.frame_rows(payloads)
    # split at awkward offsets (mid-header, mid-row)
    cuts = [0, 3, 70, 71, 200, len(framed)]
    for i in range(len(cuts) - 1):
        coordinator.append_data_frame(token, session.uuid, meta.uuid,
                                      framed[cuts[i]:cuts[i + 1]])
    coordinator.finish_data_frame_upload(token, session.uuid, meta.uuid)

    # run a map-only job over the seeded-uploaded frame
    g = DAG()
    inp = g.emplace(InputStage(meta.uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    out = g.emplace(OutputStage("seeded-result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    plan = ExecutionPlan(SchemaType.TFHE_BOOL, g)
    job = coordinator.schedule_job(token, session.uuid, plan.to_json())
    done = coordinator.wait_for_job(token, session.uuid, job.job_uuid,
                                    timeout=900)
    assert done.status == JobStatus.COMPLETED, done.message

    [(_, out_frame)] = done.output_frames.items()
    payloads = []
    for chunk in coordinator.download_data_frame(token, session.uuid,
                                                 out_frame):
        payloads.extend(rowcodec.parse_rows(chunk))
    rows = frame_codec.payloads_to_rows(payloads, 9, TOY)
    dec = client_lib.decrypt_rows(ck, MAP_OUT_COLS, rows)
    for (a, b), row in zip(table, dec):
        assert row["x"] == a ^ b
        assert row["odd"] == bin(a ^ b).count("1") & 1


def test_seeded_upload_rejects_trailing_bytes(coordinator, client_session):
    token, session, ck, rng = client_session
    bodies, _ = client_lib.encrypt_rows_seeded(ck, IN_COLS, [(1, 2)], rng,
                                             seed=5)
    meta = coordinator.begin_data_frame_upload(
        token, session.uuid, "seeded-bad", SchemaType.TFHE_BOOL, IN_COLS,
        1, 1, seeded_seed=5,
    )
    framed = rowcodec.frame_rows([bodies[0].tobytes()])
    coordinator.append_data_frame(token, session.uuid, meta.uuid,
                                  framed[:-2])  # withhold the tail
    with pytest.raises(ValueError):
        coordinator.finish_data_frame_upload(token, session.uuid, meta.uuid)
    # abort semantics: the frame is gone (reference :128-150)
    names = [f.name
             for f in coordinator.list_data_frames(token, session.uuid)]
    assert "seeded-bad" not in names


def test_packed_download_e2e(coordinator, client_session):
    """Compressed (GLWE-packed) result download — the dual of the seeded
    upload: up to N output LWEs pack into ONE GLWE via the session's
    TFHE_PACKING key; the client decrypts with the GLWE secret key."""
    token, session, ck, rng = client_session
    from herdsman_tpu.service.coordinator import serialize_packing_key

    pk = ref.make_packing_key(ck, rng)
    blob = serialize_packing_key(pk)
    coordinator.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                        len(blob), [blob])

    table = [(3, 5), (200, 100), (17, 4)]
    rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    frame_uuid = upload_rows(coordinator, token, session.uuid, "packed-in",
                             IN_COLS, rows_ct, partitions=2)
    g = DAG()
    inp = g.emplace(InputStage(frame_uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    out = g.emplace(OutputStage("packed-out"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    job = coordinator.schedule_job(
        token, session.uuid,
        ExecutionPlan(SchemaType.TFHE_BOOL, g).to_json())
    done = coordinator.wait_for_job(token, session.uuid, job.job_uuid,
                                    timeout=900)
    assert done.status == JobStatus.COMPLETED, done.message
    [(_, out_frame)] = done.output_frames.items()

    blobs = list(coordinator.download_data_frame_packed(
        token, session.uuid, out_frame))
    dec = client_lib.decrypt_rows_packed(ck, MAP_OUT_COLS, blobs)
    for (a, b), row in zip(table, dec):
        assert row["x"] == a ^ b
        assert row["odd"] == bin(a ^ b).count("1") & 1
    # the packed stream is smaller than the expanded one
    expanded = sum(
        len(c) for c in coordinator.download_data_frame(
            token, session.uuid, out_frame))
    packed = sum(len(b) for b in blobs)
    assert packed < expanded


def test_abandoned_upload_cleanup(coordinator, client_session):
    """A stream that dies mid-upload leaves no frame and no in-flight
    seeded-expansion state (ADVICE r1: _seeded_uploads leak)."""
    token, session, ck, rng = client_session
    bodies, seed = client_lib.encrypt_rows_seeded(ck, IN_COLS, [(1, 2)], rng)
    meta = coordinator.begin_data_frame_upload(
        token, session.uuid, "seeded-abandoned", SchemaType.TFHE_BOOL,
        IN_COLS, 1, 1, seeded_seed=seed,
    )
    assert meta.uuid in coordinator._seeded_uploads
    # client disconnects without finishing -> server-side cleanup hook
    coordinator.abandon_data_frame_upload(token, session.uuid, meta.uuid)
    assert meta.uuid not in coordinator._seeded_uploads
    names = [f.name
             for f in coordinator.list_data_frames(token, session.uuid)]
    assert "seeded-abandoned" not in names
    # idempotent on a frame that no longer exists
    coordinator.abandon_data_frame_upload(token, session.uuid, meta.uuid)


def test_fit_engine_hbm_guard():
    """fit_engine falls back to mega12 (single-width key, limb-major
    recombine — the round-3 hardware A/B winner at the N=2048 tier)
    whenever the doubled bsk_btj2 layout exceeds the HBM budget
    (ADVICE r1: guard lived only in bench.py)."""
    from herdsman_tpu.core import PARAM_SETS
    from herdsman_tpu.ops.server_key import fit_engine

    shortint = PARAM_SETS["std128_shortint"]  # N=2048: btj2 ~19 GiB
    assert fit_engine("pallas_mega8", shortint) == "pallas_mega12"
    assert fit_engine("pallas_mega9", shortint) == "pallas_mega12"
    k2 = PARAM_SETS["std128_k2"]  # flagship: fits
    assert fit_engine("pallas_mega8", k2) == "pallas_mega8"
    # non-windowed engines pass through untouched
    assert fit_engine("conv_i8", shortint) == "conv_i8"
    # round-4 transposed family: the flagship serves K2 directly; at the
    # byte-aligned N=2048 tier its extended key (~18.5 GiB) cannot, but
    # mega16's single-width key (6.44 GiB) can (measured +5.9% over
    # mega12 there, BENCH_LOG r4); the l=3 tier stays on mega12
    fast = PARAM_SETS["std128_shortint_fast"]
    assert fit_engine("pallas_mega13", k2) == "pallas_mega13"
    assert fit_engine("pallas_mega13", fast) == "pallas_mega16"
    assert fit_engine("pallas_mega13", shortint) == "pallas_mega12"
    assert fit_engine("pallas_mega16", fast) == "pallas_mega16"
    assert fit_engine("pallas_mega16", shortint) == "pallas_mega12"
    # mega15 (l=4 probe) only serves its own geometry
    l4 = PARAM_SETS["std128_shortint_l4"]
    assert fit_engine("pallas_mega15", l4, hbm_budget_bytes=13 << 30) \
        == "pallas_mega15"
    assert fit_engine("pallas_mega15", shortint) == "pallas_mega12"


def test_glwe_intermediate_frames(tmp_path):
    """GLWE-domain intermediate frames (workers.mesh.glwe_frames): mapper/
    reduce outputs are stored as packed GLWEs (catalog-flagged, smaller on
    disk), output frames stay in the row format, and a SECOND job that
    consumes a packed intermediate frame as its input expands it through
    the device unpack path and still decrypts exactly."""
    from herdsman_tpu.core import reference as ref_mod
    from herdsman_tpu.service.config import MeshWorkersConfig
    from herdsman_tpu.service.coordinator import serialize_packing_key

    cfg = Config(
        server=ServerConfig(key_directory=str(tmp_path / "keys"),
                            storage_directory=str(tmp_path / "storage")),
        security=SecurityConfig(secret_key="glwe-secret"),
        mesh_workers=MeshWorkersConfig(glwe_frames=True, engine="conv_i8"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    try:
        rng = np.random.default_rng(2024)
        ck, sk = ref_mod.keygen(TOY, rng)
        pk = ref_mod.make_packing_key(ck, rng)
        token = coord.authorize_connection("admin==true")
        session = coord.create_session(token, "glwe")
        kb = serialize_server_key(sk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL, len(kb),
                      [kb])
        pkb = serialize_packing_key(pk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                      len(pkb), [pkb])

        table = [(3, 5), (200, 100), (17, 4)]
        rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
        frame_uuid = upload_rows(coord, token, session.uuid, "in", IN_COLS,
                                 rows_ct, partitions=2)
        job = coord.schedule_job(
            token, session.uuid, build_plan(frame_uuid, Policy.PARALLEL))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=900)
        assert done.status == JobStatus.COMPLETED, done.message

        frames = {f.name: f for f in coord.list_data_frames(token,
                                                            session.uuid)}
        inter = [f for n, f in frames.items()
                 if n.startswith(("intermediate-", "reduce-"))]
        assert inter and all(f.glwe_packed for f in inter)
        out_frames = [f for n, f in frames.items() if n == "result"]
        assert out_frames and not out_frames[0].glwe_packed

        # packed intermediate really is smaller than its row form:
        # (k+1)*N u32 per <=N bits vs bits*(n+1) u32
        mid = next(f for n, f in frames.items()
                   if n.startswith("intermediate-"))
        size = sum(
            coord.storage.partition_path(session.uuid, mid.uuid, p)
            .stat().st_size for p in range(mid.partitions))
        total_bits = sum(c.dtype.bit_width for c in mid.columns)
        row_form = mid.row_count * total_bits * (TOY.n + 1) * 4
        assert size < row_form, (size, row_form)

        # a glwe-packed frame refuses the row download with a clear error
        import pytest as _pytest
        from herdsman_tpu.circuit.model import MappingError
        with _pytest.raises(MappingError):
            list(coord.download_data_frame(token, session.uuid, mid.uuid))
        # ...but the packed download streams the stored GLWEs as-is and
        # the client decrypts them with the GLWE secret key
        parts = list(coord.download_data_frame_packed(
            token, session.uuid, mid.uuid))
        dec = client_lib.decrypt_rows_packed(ck, MAP_OUT_COLS, parts)
        assert [d["x"] for d in dec] == [a ^ b for a, b in table]

        # second job consumes the PACKED intermediate frame as its input
        g = DAG()
        inp = g.emplace(InputStage(mid.uuid))
        mp = g.emplace(MapperStage(map_circuit2_for_mid()))
        out = g.emplace(OutputStage("second"))
        g.add_edge(inp, mp)
        g.add_edge(mp, out)
        plan2 = ExecutionPlan(SchemaType.TFHE_BOOL, g)
        job2 = coord.schedule_job(token, session.uuid, plan2)
        done2 = coord.wait_for_job(token, session.uuid, job2.job_uuid,
                                   timeout=900)
        assert done2.status == JobStatus.COMPLETED, done2.message
        [(_, of)] = done2.output_frames.items()
        payloads = []
        for chunk in coord.download_data_frame(token, session.uuid, of):
            payloads.extend(rowcodec.parse_rows(chunk))
        rows = frame_codec.payloads_to_rows(payloads, 8, TOY)
        got = [r["y"] for r in client_lib.decrypt_rows(
            ck, (ColumnMeta("y", DataType.UINT8),), rows)]
        expect = [((a ^ b) ^ 0xFF) & 0xFF for a, b in table]
        assert got == expect, (got, expect)
    finally:
        coord.shutdown()


def map_circuit2_for_mid():
    """NOT over the mid frame's x column (schema: x uint8, odd bit)."""
    from herdsman_tpu.circuit import CircuitBuilder
    cb = CircuitBuilder(MAP_OUT_COLS)
    cb.output("y", ~cb.input_column("x"))
    return cb.build()


def test_glwe_output_frames(tmp_path):
    """workers.mesh.glwe_outputs: OUTPUT-stage frames are stored packed
    too (round-5 service-path optimization — the device->host hop ships
    (k+1)N-u32 GLWEs instead of (n+1)-expanded rows).  The row download
    refuses them with a pointer to the packed download; the packed
    download streams the stored GLWEs verbatim and decrypts exactly; a
    follow-up job can consume the packed OUTPUT frame as its input."""
    from herdsman_tpu.core import reference as ref_mod
    from herdsman_tpu.service.config import MeshWorkersConfig
    from herdsman_tpu.service.coordinator import serialize_packing_key

    cfg = Config(
        server=ServerConfig(key_directory=str(tmp_path / "keys"),
                            storage_directory=str(tmp_path / "storage")),
        security=SecurityConfig(secret_key="glwe-out-secret"),
        mesh_workers=MeshWorkersConfig(glwe_frames=True, glwe_outputs=True,
                                       engine="conv_i8"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    try:
        rng = np.random.default_rng(77)
        ck, sk = ref_mod.keygen(TOY, rng)
        pk = ref_mod.make_packing_key(ck, rng)
        token = coord.authorize_connection("admin==true")
        session = coord.create_session(token, "glwe-out")
        kb = serialize_server_key(sk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL, len(kb),
                      [kb])
        pkb = serialize_packing_key(pk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                      len(pkb), [pkb])

        table = [(9, 12), (255, 1), (0, 0), (77, 170)]
        rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
        frame_uuid = upload_rows(coord, token, session.uuid, "in", IN_COLS,
                                 rows_ct, partitions=2)
        job = coord.schedule_job(
            token, session.uuid, build_plan(frame_uuid, Policy.PARALLEL))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=900)
        assert done.status == JobStatus.COMPLETED, done.message

        frames = {f.name: f for f in coord.list_data_frames(token,
                                                            session.uuid)}
        out_entry = frames["result"]
        assert out_entry.glwe_packed  # outputs packed now too

        import pytest as _pytest
        from herdsman_tpu.circuit.model import MappingError
        with _pytest.raises(MappingError):
            list(coord.download_data_frame(token, session.uuid,
                                           out_entry.uuid))

        # the reduce folded all rows into one: decrypt the packed result
        parts = list(coord.download_data_frame_packed(
            token, session.uuid, out_entry.uuid))
        dec = client_lib.decrypt_rows_packed(ck, MAP_OUT_COLS, parts)
        expect_x = 0
        for a, b in table:
            expect_x ^= a ^ b
        assert dec[0]["x"] == expect_x

        # a second job can consume the packed OUTPUT frame as its input
        g = DAG()
        inp = g.emplace(InputStage(out_entry.uuid))
        mp = g.emplace(MapperStage(map_circuit2_for_mid()))
        out = g.emplace(OutputStage("second"))
        g.add_edge(inp, mp)
        g.add_edge(mp, out)
        plan2 = ExecutionPlan(SchemaType.TFHE_BOOL, g)
        job2 = coord.schedule_job(token, session.uuid, plan2)
        done2 = coord.wait_for_job(token, session.uuid, job2.job_uuid,
                                   timeout=900)
        assert done2.status == JobStatus.COMPLETED, done2.message
        [(_, of)] = done2.output_frames.items()
        blobs2 = list(coord.download_data_frame_packed(
            token, session.uuid, of))
        got2 = client_lib.decrypt_rows_packed(
            ck, (ColumnMeta("y", DataType.UINT8),), blobs2)
        assert got2[0]["y"] == (~expect_x) & 0xFF
    finally:
        coord.shutdown()


def test_service_bench_script_smoke():
    """scripts/bench_service.py (the hardware service-path bench) must
    keep working end-to-end: run it CPU-forced at TOY geometry with the
    pipelined mode and check the emitted JSON contract (decrypt-gated
    rate + kernel anchor + pipelined fields)."""
    import json as json_mod
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "bench_service.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, script, "--force-cpu", "--params", "toy",
         "--engine", "conv_i8", "--batch", "32", "--rounds", "1",
         "--pipeline", "2"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert out.returncode == 0, out.stderr[-4000:]
    payload = json_mod.loads(out.stdout.strip().splitlines()[-1])
    assert payload["decrypt_ok"] is True
    assert payload["value"] > 0
    assert payload["kernel_anchor_per_sec"] > 0
    assert payload["pipelined_per_sec"] > 0


def test_glwe_input_frames(tmp_path):
    """workers.mesh.glwe_inputs: an uploaded row frame is re-encoded as
    packed GLWEs at finish (catalog-flagged), the job runner expands it
    through the device unpack path, and with glwe_frames+glwe_outputs the
    ENTIRE pipeline — input, intermediate, output — lives in the GLWE
    domain.  Without a packing key the upload falls back to rows."""
    from herdsman_tpu.core import reference as ref_mod
    from herdsman_tpu.service.config import MeshWorkersConfig
    from herdsman_tpu.service.coordinator import serialize_packing_key

    cfg = Config(
        server=ServerConfig(key_directory=str(tmp_path / "keys"),
                            storage_directory=str(tmp_path / "storage")),
        security=SecurityConfig(secret_key="glwe-in-secret"),
        mesh_workers=MeshWorkersConfig(glwe_frames=True, glwe_outputs=True,
                                       glwe_inputs=True, engine="conv_i8"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    try:
        rng = np.random.default_rng(31)
        ck, sk = ref_mod.keygen(TOY, rng)
        pk = ref_mod.make_packing_key(ck, rng)
        token = coord.authorize_connection("admin==true")
        session = coord.create_session(token, "glwe-in")
        kb = serialize_server_key(sk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL, len(kb),
                      [kb])

        # no packing key yet: the upload must FALL BACK to the row format
        table0 = [(1, 2)]
        rows0 = client_lib.encrypt_rows(ck, IN_COLS, table0, rng)
        f0 = upload_rows(coord, token, session.uuid, "pre-key", IN_COLS,
                         rows0, partitions=1)
        assert not coord.storage.get_data_frame(session.uuid,
                                                f0).glwe_packed

        pkb = serialize_packing_key(pk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                      len(pkb), [pkb])

        # with the key: ingest re-encodes the frame as packed GLWEs
        table = [(9, 12), (255, 1), (0, 0), (77, 170), (5, 250)]
        rows_ct = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
        frame_uuid = upload_rows(coord, token, session.uuid, "in", IN_COLS,
                                 rows_ct, partitions=2)
        entry = coord.storage.get_data_frame(session.uuid, frame_uuid)
        assert entry.glwe_packed  # packed at ingest

        job = coord.schedule_job(
            token, session.uuid, build_plan(frame_uuid, Policy.PARALLEL))
        done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                  timeout=900)
        assert done.status == JobStatus.COMPLETED, done.message

        # every catalogued frame of the job lives in the GLWE domain
        frames = {f.name: f for f in coord.list_data_frames(token,
                                                            session.uuid)
                  if f.name != "pre-key"}
        assert frames and all(f.glwe_packed for f in frames.values()), \
            {n: f.glwe_packed for n, f in frames.items()}

        parts = list(coord.download_data_frame_packed(
            token, session.uuid, frames["result"].uuid))
        dec = client_lib.decrypt_rows_packed(ck, MAP_OUT_COLS, parts)
        expect_x = 0
        expect_odd = 0
        for a, b in table:
            expect_x ^= a ^ b
            expect_odd ^= bin(a ^ b).count("1") & 1
        assert dec[0]["x"] == expect_x and dec[0]["odd"] == expect_odd
    finally:
        coord.shutdown()
