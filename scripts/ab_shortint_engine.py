"""Same-process A/B of N = 2048 (shortint/radix-tier) rotation engines.

Unlike compare_engines.py this builds each engine's key layout, times it,
then FREES it before building the next — at STD128_SHORTINT the btj and
btjj layouts are ~9.7 GiB each and cannot coexist in v5e HBM.  Same
process + same client key keeps the numbers comparable (cross-process
tunnel variance is ~15%, docs/BENCH_LOG.md).

Usage: python scripts/ab_shortint_engine.py [--engines pallas_mega7,pallas_mega12]
                                            [--batch 1024] [--params std128_shortint]
"""

from __future__ import annotations

import argparse
import gc
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="pallas_mega7,pallas_mega12")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--params", default="std128_shortint")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    ck, sk = get_keys(args.params)
    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, args.batch).astype(bool)
    bits1 = rng.integers(0, 2, args.batch).astype(bool)
    ct0 = jnp.asarray(ref.encrypt_bool(ck, bits0, rng))
    ct1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
    jax.block_until_ready((ct0, ct1))

    for spec in args.engines.split(","):
        engine, _, kv = spec.partition(":")
        env = dict(item.split("=") for item in kv.split(";") if item)
        for knob in ("STEPS", "BT", "G", "ABLATE", "DEFER", "EXTRACT",
                     "ORDER"):
            os.environ.pop("HERDSMAN_MEGA_" + knob, None)
        for k, v in env.items():
            os.environ["HERDSMAN_MEGA_" + k] = v
        # the previous leg's fn closure (default arg d=dsk) would otherwise
        # keep its multi-GiB key layout alive while the next one builds —
        # that, not contention, is what OOMed back-to-back 9.7 GiB legs
        fn = None  # noqa: F841
        gc.collect()
        jax.clear_caches()
        t0 = time.time()
        dsk = device_server_key(sk, layouts=layouts_for_engine(engine))
        for lay in layouts_for_engine(engine):
            jax.block_until_ready(getattr(dsk, lay))
        prep_s = time.time() - t0
        fn = lambda c, e=engine, d=dsk: bs.bootstrap_bool_batch(d, c, engine=e)
        t0 = time.time()
        try:
            out = np.asarray(fn(ct0))
        except Exception as e:  # a failed entry must not kill the session
            print(f"{spec:24s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            del dsk
            gc.collect()
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
        print(f"{spec:24s} {args.batch / dt:7.1f} bootstraps/s/chip  "
              f"({dt * 1e3:.1f} ms/batch, bad={n_bad}, key prep {prep_s:.0f}s, "
              f"compile {compile_s:.1f}s)", flush=True)
        del dsk, chained, out
        gc.collect()


if __name__ == "__main__":
    main()
