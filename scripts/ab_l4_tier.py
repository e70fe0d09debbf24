#!/usr/bin/env python
"""The N=2048 (shortint/radix) tier gadget A/B — VERDICT r3 #8 measured.

Same-process legs, each with its OWN param set + keys (the l=3/l=4 keys
are 9.7/12.9 GiB — built then freed sequentially):

  - pallas_mega12 @ std128_shortint      (l=3, bg=2^7 — the tier record)
  - pallas_mega15 @ std128_shortint_l4   (l=4, bg=2^8 EXACT — the bitcast
    digit-window kernel; 4/3 more MACs, built to measure the trade)
  - pallas_mega12 @ std128_shortint_fast (l=2, bg=2^8 — 2/3 the MACs,
    noise-vetted throughput variant; the cheap extra leg)

Bool-bootstrap rate (the tier's kernel metric, as round-3's
ab_shortint_engine.py), chained x4, decrypt-gated.

Run alone: timeout 5400 python scripts/ab_l4_tier.py
"""

import argparse
import gc
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--legs", default=(
        "std128_shortint:pallas_mega12,"
        "std128_shortint_l4:pallas_mega15,"
        "std128_shortint_fast:pallas_mega12"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, args.batch).astype(bool)
    bits1 = rng.integers(0, 2, args.batch).astype(bool)

    for spec in args.legs.split(","):
        pname, _, engine = spec.partition(":")
        fn = None  # noqa: F841 — free the previous leg's key first
        gc.collect()
        jax.clear_caches()
        t0 = time.time()
        ck, sk = get_keys(pname)
        keys_s = time.time() - t0
        ct0 = jnp.asarray(ref.encrypt_bool(ck, bits0, rng))
        ct1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
        t0 = time.time()
        try:
            dsk = device_server_key(sk, layouts=layouts_for_engine(engine))
            for lay in layouts_for_engine(engine):
                jax.block_until_ready(getattr(dsk, lay))
        except Exception as e:  # noqa: BLE001 — a failed leg must not kill
            print(f"{spec:42s} KEY FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        prep_s = time.time() - t0
        fn = lambda c, e=engine, d=dsk: bs.bootstrap_bool_batch(
            d, c, engine=e)
        t0 = time.time()
        try:
            out = np.asarray(fn(ct0))
        except Exception as e:  # noqa: BLE001
            print(f"{spec:42s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            del dsk
            gc.collect()
            continue
        compile_s = time.time() - t0
        n_bad = int((ref.lwe_decrypt_bool(ck, out) != bits0).sum())
        K = max(4, args.iters)
        best = None
        for _ in range(2):  # 2 chains, best-of
            t0 = time.time()
            chained = ct1
            for _ in range(K):
                chained = fn(chained)
            np.asarray(chained)
            dt = (time.time() - t0) / K
            best = dt if best is None else min(best, dt)
        print(f"{spec:42s} {args.batch / best:7.1f} bootstraps/s/chip "
              f"({best * 1e3:.1f} ms/batch, bad={n_bad}, keys {keys_s:.0f}s, "
              f"prep {prep_s:.0f}s, compile {compile_s:.1f}s)", flush=True)
        del dsk, chained, out, fn
        gc.collect()


if __name__ == "__main__":
    main()
