"""Same-process probes for mega3: wrapper overhead + S/Bt knobs.

Times (a) the raw blind rotation alone, (b) the full gate bootstrap
(mod switch + rotation + extract + key switch), for several mega3
configurations. Chained timing, decrypt-verified on the full path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--params", default="std128_fast")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--configs", default="1:128,2:128,4:128,1:256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import device_server_key

    ck, sk = get_keys(args.params)
    dsk = device_server_key(sk, layouts=("bsk_btj",))
    jax.block_until_ready(dsk.bsk_btj)

    rng = np.random.default_rng(7)
    bits0 = rng.integers(0, 2, args.batch).astype(bool)
    bits1 = rng.integers(0, 2, args.batch).astype(bool)
    ct0 = jnp.asarray(ref.encrypt_bool(ck, bits0, rng))
    ct1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
    p = dsk.params
    tv = bs.make_test_poly(p)
    jax.block_until_ready((ct0, ct1, tv))
    K = max(4, args.iters)

    for cfg in args.configs.split(","):
        s, bt = cfg.split(":")
        os.environ["HERDSMAN_MEGA_STEPS"] = s
        os.environ["HERDSMAN_MEGA_BT"] = bt

        # (a) rotation only (bootstrap_raw_batch: mod switch + rotation, no
        # extract/KS) — chained: the [B,k+1,N] output feeds the next
        # call's LWE input via a cheap slice. dsk passes as a pytree ARG
        # (a closure would capture the 3.2GB key as a lowered constant and
        # re-ship it through the tunnel).
        raw = lambda c: bs.bootstrap_raw_batch(dsk, c, tv,
                                               engine="pallas_mega3")
        slicer = jax.jit(lambda acc: acc.reshape(args.batch, -1)[:, :p.n + 1])
        out = np.asarray(raw(ct0))
        t0 = time.time()
        cur = ct1
        for _ in range(K):
            cur = slicer(raw(cur))
        np.asarray(cur)
        dt_rot = (time.time() - t0) / K

        # (b) full gate bootstrap
        fn = lambda c: bs.bootstrap_bool_batch(dsk, c, engine="pallas_mega3")
        out = np.asarray(fn(ct0))
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits0).sum())
        t0 = time.time()
        cur = ct1
        for _ in range(K):
            cur = fn(cur)
        np.asarray(cur)
        dt_full = (time.time() - t0) / K

        print(f"S={s:>2} Bt={bt:>3}: rotation {dt_rot * 1e3:7.1f} ms  "
              f"full {dt_full * 1e3:7.1f} ms  "
              f"({args.batch / dt_full:6.1f} bs/s, bad={bad})", flush=True)


if __name__ == "__main__":
    main()
