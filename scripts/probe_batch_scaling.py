#!/usr/bin/env python
"""Extract mega13's per-batch FIXED cost from batch scaling (round-4).

At B=1024 (G=8) and B=2048 (G=16) the BO=1 geometry streams the 8.44 GiB
key exactly ONCE per batch, so  t(B) = a*B + c  where c bundles the
non-overlapped share of the key stream + per-pass fixed work:

    c = 2*t(1024) - t(2048)

If c is ~the 80 ms cross-section residual (docs/BENCH_LOG.md round 3),
the residual IS unoverlapped key streaming, and the window-on-digits
variant (2.5x smaller key) is worth building; if c ~= 0 the key copy
overlaps fine and the residual lives in per-step VPU/MXU interleaving.

Run alone: timeout 2400 python scripts/probe_batch_scaling.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import get_keys
    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import device_server_key

    K, LEGS = 4, 4
    engine = "pallas_mega13"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    ck, sk = get_keys("std128_k2")
    t0 = time.time()
    dsk = device_server_key(sk, layouts=("bsk_btT",))
    jax.block_until_ready(dsk.bsk_btT)
    print(f"key prep: {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(11)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_k(d, c, k):
        return jax.lax.fori_loop(
            0, k,
            lambda _, x: bs.bootstrap_bool_batch.__wrapped__(
                d, x, engine=engine), c)

    best = {}
    for B in (1024, 2048, 1024, 2048):  # ABAB to bound drift
        bits = [rng.integers(0, 2, B).astype(bool) for _ in range(LEGS + 1)]
        cts = [jnp.asarray(ref.encrypt_bool(ck, b, rng)) for b in bits]
        t0 = time.time()
        out = np.asarray(chain_k(dsk, cts[0], K))
        comp = time.time() - t0
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits[0]).sum())
        times = []
        for leg in range(LEGS):
            t0 = time.time()
            np.asarray(chain_k(dsk, cts[1 + leg], K))
            times.append((time.time() - t0) / K)
        b = min(times)
        best[B] = min(best.get(B, 10.0), b)
        print(f"B={B}: " + "/".join(f"{t * 1e3:.1f}" for t in times)
              + f" ms best={b * 1e3:.1f} ({B / b:.1f}/s) bad={bad} "
              f"compile={comp:.0f}s", file=sys.stderr, flush=True)
    c = 2 * best[1024] - best[2048]
    print(f"fixed cost c = 2*t(1024) - t(2048) = {c * 1e3:.1f} ms "
          f"(key stream at full BW would be ~11 ms; residual target ~80 ms)",
          file=sys.stderr)
    print({k: round(v * 1e3, 1) for k, v in best.items()}, "c_ms=",
          round(c * 1e3, 1))


if __name__ == "__main__":
    main()
