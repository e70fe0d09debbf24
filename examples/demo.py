"""End-to-end demo: encrypted Map/Reduce over the gRPC coordinator.

Starts a local herdsman_tpu server, uploads an encrypted table of (value,
threshold) pairs, runs a plan that computes per-row `hit = value < threshold`
and `masked = hit ? value : 0`, then XOR-reduces the masked column — all on
ciphertexts — and decrypts the result client-side.

Run:  PYTHONPATH=. python examples/demo.py          (CPU, TOY params)
      PYTHONPATH=. HERDSMAN_DEMO_TPU=1 python examples/demo.py
"""

import os
import tempfile

import numpy as np

if not os.environ.get("HERDSMAN_DEMO_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from herdsman_tpu.circuit import (  # noqa: E402
    CircuitBuilder, ColumnMeta, DataType, ExecutionPlan, InputStage,
    MapperStage, OutputStage, Policy, ReduceStage, SchemaType,
)
from herdsman_tpu.circuit.dag import DAG  # noqa: E402
from herdsman_tpu.core import TOY, client as client_lib, reference as ref  # noqa: E402
from herdsman_tpu.service.api_server import build_server  # noqa: E402
from herdsman_tpu.service.config import (  # noqa: E402
    Config, ServerConfig, SecurityConfig,
)
from herdsman_tpu.service.coordinator import (  # noqa: E402
    Coordinator, serialize_server_key,
)
from herdsman_tpu.client import HerdClient  # noqa: E402

IN_COLS = (ColumnMeta("value", DataType.UINT8),
           ColumnMeta("threshold", DataType.UINT8))
OUT_COLS = (ColumnMeta("hit", DataType.BIT),
            ColumnMeta("masked", DataType.UINT8))


def map_circuit():
    cb = CircuitBuilder(IN_COLS)
    v = cb.input_column("value")
    t = cb.input_column("threshold")
    hit = v.lt(t)
    cb.output("hit", hit)
    cb.output("masked", v.mux(hit, cb.const_word(0, 8)))
    return cb.build()


def reduce_circuit():
    cb = CircuitBuilder(OUT_COLS + OUT_COLS)
    cb.output("hit", cb.input_column_at(0).bits[0]
              | cb.input_column_at(2).bits[0])
    cb.output("masked", cb.input_column_at(1) ^ cb.input_column_at(3))
    return cb.build()


def main():
    d = tempfile.mkdtemp()
    coord = Coordinator(Config(
        server=ServerConfig(key_directory=f"{d}/keys",
                            storage_directory=f"{d}/storage"),
        security=SecurityConfig(secret_key="demo"),
    ), engine="conv_i8")
    server, port = build_server(coord)
    server.start()
    print(f"coordinator listening on 127.0.0.1:{port}")

    rng = np.random.default_rng(0)
    ck, sk = ref.keygen(TOY, rng)

    c = HerdClient(f"127.0.0.1:{port}")
    c.authorize("admin==true")
    session = c.create_session("demo")
    c.add_key(session.uuid, SchemaType.TFHE_BOOL, serialize_server_key(sk))

    table = [(12, 50), (200, 100), (33, 40), (7, 5)]
    print("cleartext table:", table)
    meta = c.upload_data_frame(
        session.uuid, "readings", SchemaType.TFHE_BOOL, IN_COLS,
        client_lib.encrypt_rows(ck, IN_COLS, table, rng), partitions=2,
    )

    g = DAG()
    inp = g.emplace(InputStage(meta.uuid))
    mp = g.emplace(MapperStage(map_circuit()))
    rd = g.emplace(ReduceStage(reduce_circuit(), Policy.PARALLEL_FULL,
                               per_node_count=2))
    out = g.emplace(OutputStage("result"))
    g.add_edge(inp, mp)
    g.add_edge(mp, rd)
    g.add_edge(rd, out)

    job = c.schedule_job(session.uuid, ExecutionPlan(SchemaType.TFHE_BOOL, g))
    print(f"job {job.uuid} scheduled (estimated_complexity="
          f"{job.estimated_complexity} bootstraps/row)")
    st = c.wait_for_job(session.uuid, job.uuid, timeout=1800)
    assert st.status == 2, st.message
    print(f"job done: {st.tasks_executed} tasks, "
          f"{st.bootstraps_executed} bootstraps")

    rows = c.download_data_frame(session.uuid, st.output_frames[0], 9, TOY)
    dec = client_lib.decrypt_rows(ck, OUT_COLS, rows)[0]
    hits = [v < t for v, t in table]
    masked = 0
    for v, t in table:
        if v < t:
            masked ^= v
    print(f"decrypted: hit_any={bool(dec['hit'])} masked_xor={dec['masked']}")
    assert dec["hit"] == int(any(hits)) and dec["masked"] == masked
    print("OK — matches the plaintext oracle")

    c.close()
    server.stop(0)
    coord.shutdown()


if __name__ == "__main__":
    main()
