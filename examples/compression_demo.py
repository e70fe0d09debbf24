"""End-to-end bandwidth-compressed FHE workflow:

  compressed server key  ->  seeded frame upload  ->  encrypted job
                         ->  packed GLWE download

At production parameters (STD128_K2, n=768) the wire costs vs the naive
flow: server key 4.5x smaller, input frames ~770x smaller, result frames
~192x smaller — the whole client <-> coordinator data plane shrinks by two
orders of magnitude while storage and the job pipeline stay unchanged.

Run on CPU:  JAX_PLATFORMS=cpu python examples/compression_demo.py
"""

import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from herdsman_tpu.circuit import (CircuitBuilder, ColumnMeta, DataType,
                                  ExecutionPlan, InputStage, MapperStage,
                                  OutputStage, SchemaType)
from herdsman_tpu.circuit.dag import DAG
from herdsman_tpu.core import TOY, client as client_lib, reference as ref
from herdsman_tpu.service.config import (Config, SecurityConfig,
                                         ServerConfig)
from herdsman_tpu.service.coordinator import (
    Coordinator, serialize_packing_key, serialize_server_key,
    serialize_server_key_compressed)
from herdsman_tpu.service.execution import JobStatus
from herdsman_tpu.utils import rowcodec


def main() -> None:
    d = pathlib.Path(tempfile.mkdtemp())
    cfg = Config(
        server=ServerConfig(key_directory=str(d / "keys"),
                            storage_directory=str(d / "storage")),
        security=SecurityConfig(secret_key="demo"),
    )
    coord = Coordinator(cfg, engine="conv_i8")
    rng = np.random.default_rng(0)

    # --- compressed (seeded) server key: only body polys travel ---
    ck, csk = ref.keygen_seeded(TOY, rng, seed=0xCAFE)
    key_blob = serialize_server_key_compressed(csk)
    full_blob = serialize_server_key(ref.expand_server_key(csk))
    print(f"server key: {len(full_blob):,} B full -> "
          f"{len(key_blob):,} B compressed "
          f"({len(full_blob) / len(key_blob):.1f}x)")

    token = coord.authorize_connection("admin==true")
    session = coord.create_session(token, "compression-demo")
    coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL,
                  len(key_blob), [key_blob])
    pk_blob = serialize_packing_key(ref.make_packing_key(ck, rng))
    coord.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                  len(pk_blob), [pk_blob])

    # --- seeded frame upload: one u32 body per encrypted bit ---
    cols = (ColumnMeta("a", DataType.UINT8), ColumnMeta("b", DataType.UINT8))
    table = [(3, 5), (200, 100), (255, 255), (17, 4)]
    bodies, seed = client_lib.encrypt_rows_seeded(ck, cols, table, rng)
    expanded_bytes = len(table) * 16 * (TOY.n + 1) * 4
    print(f"frame upload: {expanded_bytes:,} B expanded -> "
          f"{bodies.nbytes:,} B seeded ({TOY.n + 1}x)")
    meta = coord.begin_data_frame_upload(
        token, session.uuid, "in", SchemaType.TFHE_BOOL, cols,
        len(table), 1, seeded_seed=seed)
    coord.append_data_frame(
        token, session.uuid, meta.uuid,
        rowcodec.frame_rows([bodies[r].tobytes()
                             for r in range(len(table))]))
    coord.finish_data_frame_upload(token, session.uuid, meta.uuid)

    # --- encrypted job: x = a XOR b ---
    cb = CircuitBuilder(cols)
    cb.output("x", cb.input_column("a") ^ cb.input_column("b"))
    g = DAG()
    inp = g.emplace(InputStage(meta.uuid))
    mp = g.emplace(MapperStage(cb.build()))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, out)
    job = coord.schedule_job(token, session.uuid,
                             ExecutionPlan(SchemaType.TFHE_BOOL, g).to_json())
    done = coord.wait_for_job(token, session.uuid, job.job_uuid, timeout=900)
    assert done.status == JobStatus.COMPLETED, done.message

    # --- packed GLWE download ---
    [(_, out_frame)] = done.output_frames.items()
    blobs = list(coord.download_data_frame_packed(token, session.uuid,
                                                  out_frame))
    plain = sum(len(c) for c in coord.download_data_frame(
        token, session.uuid, out_frame))
    packed = sum(len(b) for b in blobs)
    print(f"result download: {plain:,} B expanded -> {packed:,} B packed "
          f"({plain / packed:.1f}x)")
    out_cols = (ColumnMeta("x", DataType.UINT8),)
    dec = client_lib.decrypt_rows_packed(ck, out_cols, blobs)
    got = [r["x"] for r in dec]
    expect = [a ^ b for a, b in table]
    assert got == expect, (got, expect)
    print(f"decrypted XORs: {got} == plaintext oracle: OK")
    coord.shutdown()


if __name__ == "__main__":
    main()
