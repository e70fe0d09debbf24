#!/usr/bin/env python
"""Same-session A/B sweep of mega13's (Bt, G) geometry — the round-4
structural attempt at the ~80 ms cross-section residual (VERDICT r3 #3).

Hypothesis: at the default Bt=128/G=16 a bootstrap batch issues
n * G * HALF * (k+1) = 147k separate MXU dots; if a fixed per-dot issue
overhead of O(0.5 us) exists, that alone is ~70-80 ms/batch — the size of
the unexplained residual (docs/BENCH_LOG.md round-3 ablations).  Raising
Bt folds groups into dot LANES: Bt=2048/G=1 runs 16x fewer, 16x wider
dots with identical MACs and identical key traffic.  (BT=256 in round 3
was neutral, but that only halved the dot count; this sweeps to the end
of the axis.)

All settings run in ONE process on ONE key build; each setting times
LEGS fused chains of K dependent bootstraps (best-of, like bench.py),
decrypt-gated, with an A-B-A baseline repeat to bound session drift.

Run (quiet host, one TPU process):
    timeout 3600 python scripts/ab_btg_sweep.py
"""

import functools
import os
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

    B = int(os.environ.get("SWEEP_B", "2048"))
    K, LEGS = 4, 3
    engine = "pallas_mega13"
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; B={B}", file=sys.stderr)

    ck, sk = get_keys("std128_k2")
    t0 = time.time()
    dsk = device_server_key(sk, layouts=("bsk_btT",))
    jax.block_until_ready(dsk.bsk_btT)
    print(f"key prep: {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(7)
    bits = [rng.integers(0, 2, B).astype(bool) for _ in range(LEGS + 2)]
    cts = [jnp.asarray(ref.encrypt_bool(ck, b, rng)) for b in bits]

    def run_setting(bt: str, g: str) -> float:
        os.environ["HERDSMAN_MEGA_BT"] = bt
        if g:
            os.environ["HERDSMAN_MEGA_G"] = g
        else:
            os.environ.pop("HERDSMAN_MEGA_G", None)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain_k(d, c, k):
            return jax.lax.fori_loop(
                0, k,
                lambda _, x: bs.bootstrap_bool_batch.__wrapped__(
                    d, x, engine=engine), c)

        t0 = time.time()
        out = np.asarray(chain_k(dsk, cts[0], K))
        compile_s = time.time() - t0
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits[0]).sum())
        times = []
        for leg in range(LEGS):
            t0 = time.time()
            np.asarray(chain_k(dsk, cts[1 + leg], K))
            times.append((time.time() - t0) / K)
        best = min(times)
        print(f"BT={bt:>5} G={g or 'auto':>4}: "
              + "/".join(f"{t * 1e3:.1f}" for t in times)
              + f" ms/batch best={best * 1e3:.1f} "
              f"({B / best:.1f}/s) bad={bad} compile={compile_s:.0f}s",
              file=sys.stderr, flush=True)
        return best

    results = {}
    plan = [("128", ""), ("512", ""), ("2048", ""), ("1024", ""),
            ("128", "")]  # A .. variants .. A (drift bound)
    for bt, g in plan:
        key = f"BT{bt}" + (f"G{g}" if g else "")
        try:
            t = run_setting(bt, g)
        except Exception as e:  # noqa: BLE001 — record compile failures
            print(f"BT={bt} G={g or 'auto'}: FAILED "
                  f"({type(e).__name__}: {e})", file=sys.stderr, flush=True)
            t = float("nan")
        results.setdefault(key, []).append(t)
    print(results)


if __name__ == "__main__":
    main()
