"""Same-process A/B of blind-rotation engines (decrypt-verified, chained
timing). Cross-process runs vary ~15% through the TPU tunnel
(docs/BENCH_LOG.md), so engine comparisons must share one process/key.

Usage: python scripts/compare_engines.py [--engines pallas_mega2,pallas_mega3]
                                         [--batch 1024] [--params std128_fast]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="pallas_mega2,pallas_mega3")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--params", default="std128_fast")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import device_server_key

    # entry syntax: engine[:KEY=VAL[;KEY=VAL...]] — env knobs applied per
    # entry (HERDSMAN_MEGA_STEPS / HERDSMAN_MEGA_BT / HERDSMAN_MEGA_G)
    import os
    entries = []
    for spec in args.engines.split(","):
        engine, _, kv = spec.partition(":")
        env = dict(item.split("=") for item in kv.split(";") if item)
        entries.append((spec, engine, env))
    from herdsman_tpu.ops.server_key import layouts_for_engine
    layouts = tuple(sorted({
        lay for _, e, _env in entries for lay in layouts_for_engine(e)
    }))
    ck, sk = get_keys(args.params)
    t0 = time.time()
    dsk = device_server_key(sk, layouts=layouts)
    jax.block_until_ready([x for x in (dsk.bsk_bt, dsk.bsk_btj)
                           if x is not None])
    print(f"key prep ({layouts}): {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, args.batch).astype(bool)
    bits1 = rng.integers(0, 2, args.batch).astype(bool)
    ct0 = jnp.asarray(ref.encrypt_bool(ck, bits0, rng))
    ct1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
    jax.block_until_ready((ct0, ct1))

    for spec, engine, env in entries:
        for knob in ("STEPS", "BT", "G", "ABLATE", "DEFER", "EXTRACT"):
            os.environ.pop("HERDSMAN_MEGA_" + knob, None)
        for k, v in env.items():
            os.environ["HERDSMAN_MEGA_" + k] = v
        # env knobs are read at trace time; identical (engine, shape)
        # entries would otherwise reuse a previous entry's compiled program
        jax.clear_caches()
        fn = lambda c, e=engine: bs.bootstrap_bool_batch(dsk, c, engine=e)
        t0 = time.time()
        try:
            out = np.asarray(fn(ct0))
        except Exception as e:  # a failed entry must not kill the session
            print(f"{spec:22s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        compile_s = time.time() - t0
        got = ref.lwe_decrypt_bool(ck, out)
        n_bad = int((got != bits0).sum())
        K = max(4, args.iters)
        t0 = time.time()
        chained = ct1
        for _ in range(K):
            chained = fn(chained)
        np.asarray(chained)
        dt = (time.time() - t0) / K
        print(f"{spec:22s} {args.batch / dt:7.1f} bootstraps/s/chip  "
              f"({dt * 1e3:.1f} ms/batch, bad={n_bad}, "
              f"compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
