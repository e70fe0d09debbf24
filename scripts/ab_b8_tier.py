"""Hardware A/B for the byte-aligned l=3 integer tier (VERDICT r4 #1).

Compares the N = 2048 shortint/radix-tier record holder
(mega12 @ STD128_SHORTINT: bg=2^7, l=3) against the flagship-class
mega17 @ STD128_SHORTINT_B8 (bg=2^8, l=3) — SAME R = 6 external-product
MAC count, different kernel class (bitcast stream + single-width key vs
shift-extract decompose).  Unlike ab_shortint_engine.py each leg has its
own params set and therefore its own server key; the ~9.7 GiB layouts
cannot coexist in v5e HBM, so every leg rebuilds its key and frees it.
Legs run in an A/B/A/B pattern so the session ramp (15-30% slow first
minutes, docs/BENCH_LOG.md round 4) hits both sides; decide on per-side
BEST legs.

Usage: python scripts/ab_b8_tier.py [--batch 2048] [--rounds 3]
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
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--legs", default=(
        "std128_shortint:pallas_mega12,std128_shortint_b8:pallas_mega17"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    sides = []
    for spec in args.legs.split(","):
        pname, _, engine = spec.partition(":")
        ck, sk = get_keys(pname)
        rng = np.random.default_rng(7)
        bits0 = rng.integers(0, 2, args.batch).astype(bool)
        bits1 = rng.integers(0, 2, args.batch).astype(bool)
        ct0 = jnp.asarray(ref.encrypt_bool(ck, bits0, rng))
        ct1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
        jax.block_until_ready((ct0, ct1))
        sides.append(dict(name=spec, pname=pname, engine=engine, ck=ck,
                          sk=sk, bits0=bits0, bits1=bits1, ct0=ct0, ct1=ct1,
                          best=None, times=[]))

    K = max(4, args.iters)
    for rnd in range(args.rounds):
        for s in sides:
            gc.collect()
            jax.clear_caches()
            t0 = time.time()
            dsk = device_server_key(s["sk"],
                                    layouts=layouts_for_engine(s["engine"]))
            for lay in layouts_for_engine(s["engine"]):
                jax.block_until_ready(getattr(dsk, lay))
            prep_s = time.time() - t0
            fn = lambda c, e=s["engine"], d=dsk: \
                bs.bootstrap_bool_batch(d, c, engine=e)
            t0 = time.time()
            try:
                out = np.asarray(fn(s["ct0"]))
            except Exception as e:  # noqa: BLE001 — a leg must not kill all
                print(f"{s['name']:44s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                del dsk
                continue
            compile_s = time.time() - t0
            n_bad = int((ref.lwe_decrypt_bool(s["ck"], out)
                         != s["bits0"]).sum())
            t0 = time.time()
            chained = s["ct1"]
            for _ in range(K):
                chained = fn(chained)
            chained = np.asarray(chained)
            dt = (time.time() - t0) / K
            bad_c = int((ref.lwe_decrypt_bool(s["ck"], chained)
                         != s["bits1"]).sum())
            s["times"].append(dt)
            if bad_c == 0 and (s["best"] is None or dt < s["best"]):
                s["best"] = dt
            print(f"r{rnd} {s['name']:42s} {args.batch / dt:7.1f} bs/s "
                  f"({dt * 1e3:.1f} ms/batch, bad={n_bad}/{bad_c}, "
                  f"prep {prep_s:.0f}s, compile {compile_s:.1f}s)",
                  flush=True)
            del dsk, fn, chained, out
            gc.collect()

    print("---")
    for s in sides:
        if s["best"]:
            print(f"BEST {s['name']:42s} {args.batch / s['best']:7.1f} "
                  f"bootstraps/s/chip", flush=True)


if __name__ == "__main__":
    main()
