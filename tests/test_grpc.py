"""Network-level tests: the gRPC coordinator on localhost driven by
HerdClient — proto round-trip, token interceptor, streaming uploads, job
execution, result download (the reference's full client⇄coordinator
surface, SURVEY.md §2.4)."""

import numpy as np
import grpc
import pytest

from herdsman_tpu.circuit import (
    CircuitBuilder,
    ColumnMeta,
    DataType,
    ExecutionPlan,
    InputStage,
    MapperStage,
    OutputStage,
    SchemaType,
)
from herdsman_tpu.circuit.dag import DAG
from herdsman_tpu.core import TOY
from herdsman_tpu.core import client as client_lib
from herdsman_tpu.core import reference as ref
from herdsman_tpu.service.config import Config, ServerConfig, SecurityConfig
from herdsman_tpu.service.coordinator import Coordinator, serialize_server_key
from herdsman_tpu.service.api_server import build_server
from herdsman_tpu.service.execution import JobStatus
from herdsman_tpu.service import mappers
from herdsman_tpu.client import HerdClient

IN_COLS = (ColumnMeta("a", DataType.UINT8),)


@pytest.fixture(scope="module")
def grpc_stack(tmp_path_factory):
    d = tmp_path_factory.mktemp("grpc")
    cfg = Config(
        server=ServerConfig(key_directory=str(d / "keys"),
                            storage_directory=str(d / "st")),
        security=SecurityConfig(secret_key="grpc-secret"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    server, port = build_server(coord)
    server.start()
    client = HerdClient(f"127.0.0.1:{port}")
    yield coord, client
    client.close()
    server.stop(0)
    coord.shutdown()


@pytest.fixture(scope="module")
def authed(grpc_stack):
    coord, client = grpc_stack
    client.authorize("admin==true")
    rng = np.random.default_rng(11)
    ck, sk = ref.keygen(TOY, rng)
    session = client.create_session("net")
    client.add_key(session.uuid, SchemaType.TFHE_BOOL,
                   serialize_server_key(sk), chunk_size=1 << 15)
    return client, session, ck, rng


def test_auth_required(grpc_stack):
    _, client = grpc_stack
    fresh = HerdClient(client._channel._channel.target().decode()
                       if hasattr(client._channel, "_channel")
                       else "127.0.0.1:1")
    # call without token on the SAME channel: temporarily clear
    saved = client._token
    client._token = None
    try:
        with pytest.raises(grpc.RpcError) as e:
            client.list_sessions()
        assert e.value.code() == grpc.StatusCode.UNAUTHENTICATED
    finally:
        client._token = saved
        fresh.close()


def test_bad_credential(grpc_stack):
    _, client = grpc_stack
    with pytest.raises(grpc.RpcError) as e:
        client._call(
            "Auth", "authorize_connection",
            mappers.pb.AuthenticationToken(authentication_token="nope"),
            mappers.pb.ConnectionToken,
        )
    assert e.value.code() == grpc.StatusCode.UNAUTHENTICATED


def test_session_and_keys(authed):
    client, session, ck, rng = authed
    assert any(s.uuid == session.uuid for s in client.list_sessions())
    assert client.list_keys(session.uuid) == [SchemaType.TFHE_BOOL]


def test_full_job_over_grpc(authed):
    client, session, ck, rng = authed
    table = [(7,), (200,), (42,), (255,)]
    cts = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    meta = client.upload_data_frame(
        session.uuid, "tbl", SchemaType.TFHE_BOOL, IN_COLS, cts,
        partitions=2, chunk_rows=2,
    )
    assert meta.rows_count == 4 and meta.partitions == 2

    # map: r = NOT a (bitwise)
    cb = CircuitBuilder(IN_COLS)
    cb.output("r", ~cb.input_column("a"))
    g = DAG()
    i_ = g.emplace(InputStage(meta.uuid))
    m = g.emplace(MapperStage(cb.build()))
    o = g.emplace(OutputStage("res"))
    g.add_edge(i_, m)
    g.add_edge(m, o)
    plan = ExecutionPlan(SchemaType.TFHE_BOOL, g)

    job = client.schedule_job(session.uuid, plan)
    assert job.estimated_complexity == 0  # NOT gates are linear
    st = client.wait_for_job(session.uuid, job.uuid, timeout=120)
    assert st.status == int(JobStatus.COMPLETED), st.message
    assert len(st.output_frames) == 1

    rows = client.download_data_frame(session.uuid, st.output_frames[0],
                                      8, TOY)
    dec = client_lib.decrypt_rows(
        ck, (ColumnMeta("r", DataType.UINT8),), rows
    )
    got = [r["r"] for r in dec]
    assert got == [(~a) & 0xFF for (a,) in table]

    # describe_job round-trips the plan (implemented; reference leaves it
    # unimplemented)
    desc = client.describe_job(session.uuid, job.uuid)
    assert len(desc.plan.stages) == 3


def test_invalid_plan_rejected(authed):
    client, session, ck, rng = authed
    bad = mappers.pb.ExecutionPlanProto(schema_type=0)
    with pytest.raises(grpc.RpcError) as e:
        client._call(
            "Execution", "schedule_job",
            mappers.pb.ScheduleJobRequest(session_uuid=session.uuid,
                                          plan=bad),
            mappers.pb.JobDescription,
        )
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_upload_overrun_aborts(authed):
    client, session, ck, rng = authed
    cts = client_lib.encrypt_rows(ck, IN_COLS, [(1,), (2,), (3,)], rng)
    with pytest.raises(grpc.RpcError):
        # declare 2 rows, send 3
        from herdsman_tpu.service import frames as fc
        from herdsman_tpu.utils import rowcodec
        payloads = fc.rows_to_payloads(np.asarray(cts))

        def messages():
            yield mappers.pb.DataFrameAddRequest(info=mappers.pb.DataFrameInfo(
                type=0, session_uuid=session.uuid, name="bad",
                row_count=2, partitions=1,
                columns=mappers.columns_to_proto(IN_COLS),
            ))
            yield mappers.pb.DataFrameAddRequest(
                data=rowcodec.frame_rows(payloads)
            )

        fn = client._channel.stream_stream(
            "/herdsman.Storage/add_data_frame",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=mappers.pb.DataFrameAddResponse.FromString,
        )
        list(fn(messages(), metadata=client._meta()))
    # the aborted frame is gone (reference deletes it on over/under-run)
    assert all(f.name != "bad" for f in client.list_data_frames(session.uuid))


def test_seeded_upload_over_grpc(authed):
    """Compressed upload end-to-end over the wire: the stream carries one
    u32 per bit + a seed; the stored frame decrypts/evaluates identically."""
    client, session, ck, rng = authed
    table = [(7,), (200,), (42,)]
    bodies, seed = client_lib.encrypt_rows_seeded(ck, IN_COLS, table, rng)
    meta = client.upload_data_frame_seeded(
        session.uuid, "tbl-seeded", SchemaType.TFHE_BOOL, IN_COLS,
        bodies, seed, partitions=1, chunk_rows=2,
    )
    assert meta.rows_count == 3

    cb = CircuitBuilder(IN_COLS)
    cb.output("r", ~cb.input_column("a"))
    g = DAG()
    i_ = g.emplace(InputStage(meta.uuid))
    m = g.emplace(MapperStage(cb.build()))
    o = g.emplace(OutputStage("res-seeded"))
    g.add_edge(i_, m)
    g.add_edge(m, o)
    job = client.schedule_job(session.uuid,
                              ExecutionPlan(SchemaType.TFHE_BOOL, g))
    st = client.wait_for_job(session.uuid, job.uuid, timeout=120)
    assert st.status == int(JobStatus.COMPLETED), st.message
    rows = client.download_data_frame(session.uuid, st.output_frames[0],
                                      8, TOY)
    dec = client_lib.decrypt_rows(
        ck, (ColumnMeta("r", DataType.UINT8),), rows
    )
    assert [r["r"] for r in dec] == [(~a) & 0xFF for (a,) in table]


def test_packed_download_over_grpc(authed):
    client, session, ck, rng = authed
    from herdsman_tpu.core import reference as ref_mod
    from herdsman_tpu.service.coordinator import serialize_packing_key

    pk = ref_mod.make_packing_key(ck, rng)
    client.add_key(session.uuid, SchemaType.TFHE_PACKING,
                   serialize_packing_key(pk))
    table = [(9,), (250,)]
    cts = client_lib.encrypt_rows(ck, IN_COLS, table, rng)
    meta = client.upload_data_frame(
        session.uuid, "tbl-packed", SchemaType.TFHE_BOOL, IN_COLS, cts,
        partitions=1,
    )
    blobs = client.download_data_frame_packed(session.uuid, meta.uuid)
    dec = client_lib.decrypt_rows_packed(ck, IN_COLS, blobs)
    assert [r["a"] for r in dec] == [9, 250]
