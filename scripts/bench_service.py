"""Service-path benchmark: the coordinator driven at TPU speed (VERDICT r4 #2).

The kernel headline (`bench.py`) times the bare bootstrap chain; the
reference, though, IS a control plane (reference src/main.cpp:102-159 wires
config -> services -> gRPC), so "matching or beating" must hold through the
public service surface.  This bench drives the FULL rebuilt path, in
process (the gRPC layer's streaming shapes are covered by test_grpc.py;
what's unmeasured at speed is the coordinator machinery itself):

    seeded frame upload (compressed wire, mask re-derivation at ingest)
      -> schedule a mapper-stage plan (PlanCompiler, journal, locks)
      -> levelized batched device execution (B rows x 8 XOR gates = one
         8B-wide gate batch on the flagship engine)
      -> GLWE-packed result download -> client decrypt (gated)

and reports end-to-end bootstraps/s plus the fraction of the SAME-SESSION
raw kernel rate at the same batch geometry (cross-session TPU variance is
+-20%, so only a same-session anchor is honest — docs/BENCH_LOG.md r3).

Usage: python scripts/bench_service.py [--batch 2048] [--rounds 3]
       [--params std128_k2] [--engine pallas_mega13]
Prints one JSON line like bench.py; also invoked by
`python bench.py --metric service`.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys, log  # noqa: E402


def build_inputs(ck, cols, B, rng):
    table = [(int(a), int(b))
             for a, b in rng.integers(0, 256, (B, 2), dtype=np.int64)]
    from herdsman_tpu.core import client as client_lib

    bodies, seed = client_lib.encrypt_rows_seeded(ck, cols, table, rng)
    return table, bodies, seed


def upload_seeded(coord, token, session_uuid, name, cols, bodies, seed):
    from herdsman_tpu.circuit import SchemaType
    from herdsman_tpu.utils import rowcodec

    meta = coord.begin_data_frame_upload(
        token, session_uuid, name, SchemaType.TFHE_BOOL, cols,
        bodies.shape[0], partitions=1, seeded_seed=seed)
    payloads = [np.ascontiguousarray(bodies[r]).tobytes()
                for r in range(bodies.shape[0])]
    # stream in ~1 MiB chunks like HerdClient
    per = max(1, (1 << 20) // max(1, len(payloads[0])))
    for i in range(0, len(payloads), per):
        coord.append_data_frame(token, session_uuid, meta.uuid,
                                rowcodec.frame_rows(payloads[i:i + per]))
    coord.finish_data_frame_upload(token, session_uuid, meta.uuid)
    return meta.uuid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--params", default="std128_k2")
    ap.add_argument("--engine", default="pallas_mega13")
    ap.add_argument("--circuit", choices=["xor", "add"], default="xor")
    ap.add_argument("--pipeline", type=int, default=0, metavar="J",
                    help="ALSO measure pipelined throughput: schedule J "
                    "jobs back-to-back (uploads/downloads of one job "
                    "overlap device exec of another via 2 executor "
                    "slots) and report aggregate bootstraps/s — the "
                    "sustained production-serving number")
    ap.add_argument("--row-frames", action="store_true",
                    help="store frames as LWE rows (the pre-round-5 "
                    "layout) instead of packed GLWEs")
    ap.add_argument("--force-cpu", action="store_true",
                    help="pin the CPU backend (for plumbing smoke tests; "
                    "the axon TPU plugin IGNORES JAX_PLATFORMS env, so a "
                    "'CPU' run would otherwise grab the TPU)")
    args = ap.parse_args()
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from herdsman_tpu.circuit import (CircuitBuilder, ColumnMeta, DataType,
                                      ExecutionPlan, InputStage, MapperStage,
                                      OutputStage, SchemaType)
    from herdsman_tpu.circuit.dag import DAG
    from herdsman_tpu.core import client as client_lib
    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.service.config import (Config, MeshWorkersConfig,
                                             SecurityConfig, ServerConfig)
    from herdsman_tpu.service.coordinator import (Coordinator,
                                                  serialize_packing_key,
                                                  serialize_server_key)
    from herdsman_tpu.service.execution import JobStatus

    cols = (ColumnMeta("a", DataType.UINT8), ColumnMeta("b", DataType.UINT8))
    cb = CircuitBuilder(cols)
    if args.circuit == "xor":
        # depth-1: isolates the per-job fixed cost (one gate level per
        # upload/exec/download cycle — the HARDEST case for the service)
        cb.output("x", cb.input_column("a") ^ cb.input_column("b"))
        oracle = lambda a, b: a ^ b
    else:
        # adder: a production-depth circuit (ripple carry, ~2 levels/bit)
        # that amortizes the per-job fixed cost the way real plans do
        cb.output("x", cb.input_column("a") + cb.input_column("b"))
        oracle = lambda a, b: (a + b) & 0xFF
    circuit = cb.build()
    out_cols = (ColumnMeta("x", DataType.UINT8),)

    ck, sk = get_keys(args.params)
    rng = np.random.default_rng(2024)

    d = tempfile.mkdtemp(prefix="herdsman_svc_bench_")
    cfg = Config(
        server=ServerConfig(key_directory=f"{d}/keys",
                            storage_directory=f"{d}/storage"),
        security=SecurityConfig(secret_key="bench-secret"),
        # production storage config: frames live in the GLWE-packed domain
        # (192x smaller at STD128_K2) so the device->host hop ships packed
        # GLWEs, not (n+1)-expanded rows; margin-gated in the runner
        # (14.1 sigma at STD128_K2, core/noise.glwe_frame_margin_sigma)
        # glwe_inputs measured NEGATIVE on the job path (device unpack of
        # a 16k-LWE input costs 5-7.7 s vs 0.2-1.4 s row load; pipelined
        # sustained 6805 -> 2781 bs/s) — inputs stay rows; the flag
        # remains available for wire/disk-bound deployments
        mesh_workers=None if args.row_frames else MeshWorkersConfig(
            engine=args.engine, glwe_frames=True, glwe_outputs=True,
            concurrent_jobs=2 if args.pipeline else 1),
    )
    coord = Coordinator(cfg, engine=args.engine)
    import logging

    logging.getLogger("herdsman.runner").setLevel(logging.DEBUG)
    try:
        token = coord.authorize_connection("admin==true")
        session = coord.create_session(token, "svc-bench")
        kb = serialize_server_key(sk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_BOOL, len(kb),
                      [kb[i:i + (1 << 20)] for i in range(0, len(kb),
                                                          1 << 20)])
        pk = ref.make_packing_key(ck, rng)
        pb = serialize_packing_key(pk)
        coord.add_key(token, session.uuid, SchemaType.TFHE_PACKING,
                      len(pb), [pb])

        def flow(tag: str) -> dict:
            """One full public-surface cycle; returns timings + check."""
            table, bodies, seed = build_inputs(ck, cols, args.batch, rng)
            t0 = time.time()
            frame = upload_seeded(coord, token, session.uuid, f"in-{tag}",
                                  cols, bodies, seed)
            t_up = time.time()
            g = DAG()
            inp = g.emplace(InputStage(frame))
            mp = g.emplace(MapperStage(circuit))
            out = g.emplace(OutputStage(f"out-{tag}"))
            g.add_edge(inp, mp)
            g.add_edge(mp, out)
            job = coord.schedule_job(
                token, session.uuid,
                ExecutionPlan(SchemaType.TFHE_BOOL, g).to_json())
            done = coord.wait_for_job(token, session.uuid, job.job_uuid,
                                      timeout=1800)
            t_exec = time.time()
            assert done.status == JobStatus.COMPLETED, done.message
            [(_, out_frame)] = done.output_frames.items()
            blobs = list(coord.download_data_frame_packed(
                token, session.uuid, out_frame))
            t_dl0 = time.time()
            dec = client_lib.decrypt_rows_packed(ck, out_cols, blobs)
            t_dl = time.time()
            n_bad = sum(int(row["x"] != oracle(a, b))
                        for (a, b), row in zip(table, dec))
            desc = coord.describe_job(token, session.uuid, job.job_uuid)
            # keep the storage dir lean across rounds
            for fr in coord.list_data_frames(token, session.uuid):
                coord.remove_data_frame(token, session.uuid, fr.uuid)
            return dict(upload=t_up - t0, execute=t_exec - t_up,
                        download=t_dl0 - t_exec, decrypt=t_dl - t_dl0,
                        total=t_dl - t0,
                        bad=n_bad, bootstraps=desc.bootstraps_executed)

        w = flow("warmup")  # compiles: key layout + gate batch
        log(f"warmup flow: total {w['total']:.1f}s "
            f"(up {w['upload']:.1f} exec {w['execute']:.1f} "
            f"dl {w['download']:.1f}) bootstraps={w['bootstraps']} "
            f"bad={w['bad']}")

        best = None
        for rnd in range(args.rounds):
            f = flow(f"r{rnd}")
            rate = f["bootstraps"] / f["total"]
            log(f"round {rnd}: {rate:.1f} bootstraps/s end-to-end "
                f"(up {f['upload'] * 1e3:.0f} ms, exec "
                f"{f['execute'] * 1e3:.0f} ms, dl "
                f"{f['download'] * 1e3:.0f} ms, client decrypt "
                f"{f['decrypt'] * 1e3:.0f} ms, bad={f['bad']})")
            if f["bad"] == 0 and (best is None or rate > best["rate"]):
                best = dict(f, rate=rate)
        assert best is not None, "no clean service round"

        if args.pipeline:
            # PIPELINED throughput: J independent jobs on pre-uploaded
            # frames, scheduled back-to-back; with 2 executor slots one
            # job's host phases (frame load, pack stream, stores) overlap
            # another's device exec, so per-job fixed cost amortizes the
            # way a loaded production coordinator amortizes it
            J = args.pipeline
            tables, frames = [], []
            for j in range(J):
                tab, bodies, seed = build_inputs(ck, cols, args.batch, rng)
                tables.append(tab)
                frames.append(upload_seeded(coord, token, session.uuid,
                                            f"pipe-{j}", cols, bodies,
                                            seed))
            t0 = time.time()
            jobs = []
            for j, fr in enumerate(frames):
                g = DAG()
                inp = g.emplace(InputStage(fr))
                mp = g.emplace(MapperStage(circuit))
                out = g.emplace(OutputStage(f"pipe-out-{j}"))
                g.add_edge(inp, mp)
                g.add_edge(mp, out)
                jobs.append(coord.schedule_job(
                    token, session.uuid,
                    ExecutionPlan(SchemaType.TFHE_BOOL, g).to_json()))
            total_bs = 0
            blobs_all = []
            for j, job in enumerate(jobs):
                done = coord.wait_for_job(token, session.uuid,
                                          job.job_uuid, timeout=1800)
                assert done.status == JobStatus.COMPLETED, done.message
                [(_, of)] = done.output_frames.items()
                blobs_all.append(list(coord.download_data_frame_packed(
                    token, session.uuid, of)))
                total_bs += coord.describe_job(
                    token, session.uuid, job.job_uuid).bootstraps_executed
            t_pipe = time.time() - t0
            pipe_bad = 0
            for j, blobs_j in enumerate(blobs_all):
                dec_j = client_lib.decrypt_rows_packed(ck, out_cols,
                                                       blobs_j)
                pipe_bad += sum(int(row["x"] != oracle(a, b))
                                for (a, b), row in zip(tables[j], dec_j))
            pipe_rate = total_bs / t_pipe
            log(f"pipelined x{J}: {pipe_rate:.1f} bootstraps/s sustained "
                f"({total_bs} bootstraps in {t_pipe:.1f}s, bad={pipe_bad})")
            assert pipe_bad == 0, "pipelined decrypt failed"

        # same-session kernel anchor at the same batch geometry: the raw
        # chained gate-batch rate the service path is measured against
        # (reuses the coordinator's device key — a second 9 GiB layout
        # would not fit HBM)
        import jax
        import jax.numpy as jnp

        from herdsman_tpu.ops import bootstrap as bs

        engine, dsk = coord._device_key(session.uuid)
        # anchor at a FIXED reference batch (rates are per-bootstrap and
        # comparable): the adder circuit would otherwise imply an anchor
        # batch of ~40x rows
        GB = args.batch * 8
        bits = rng.integers(0, 2, GB).astype(bool)
        ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
        jax.block_until_ready(ct)
        fn = lambda c: bs.bootstrap_bool_batch(dsk, c, engine=engine)
        out = np.asarray(fn(ct))
        k_bad = int((ref.lwe_decrypt_bool(ck, out) != bits).sum())
        # K=32: the end-of-chain host fetch is not kernel work; shallow
        # chains under-measured the anchor 15-35% at this batch size
        # (deep-chain frame, BENCH_LOG round 5) — which flattered the
        # service fraction.  At B=16384 the 67 MB final fetch still
        # contributes ~5% at K=32; the anchor is a slight UNDER-estimate,
        # so reported fractions lean conservative-favorable by that much.
        # The service rate itself keeps its per-job IO by definition.
        K = 32
        t0 = time.time()
        c = ct
        for _ in range(K):
            c = fn(c)
        np.asarray(c)
        k_rate = GB / ((time.time() - t0) / K)
        frac = best["rate"] / k_rate
        log(f"same-session kernel anchor: {k_rate:.1f} bootstraps/s at "
            f"batch {GB} (bad={k_bad}); service fraction {frac:.3f}")

        out_json = {
            "metric": f"service_e2e_bootstraps_per_sec_{args.params}"
                      + ("" if args.circuit == "xor" else f"_{args.circuit}"),
            "value": round(best["rate"], 2),
            "unit": "bootstraps/s/chip through the coordinator",
            "vs_baseline": round(frac, 4),
            "decrypt_ok": True,
            "kernel_anchor_per_sec": round(k_rate, 2),
        }
        if args.pipeline:
            out_json["pipelined_per_sec"] = round(pipe_rate, 2)
            out_json["pipelined_vs_kernel"] = round(pipe_rate / k_rate, 4)
        print(json.dumps(out_json))
    finally:
        coord.shutdown()
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
