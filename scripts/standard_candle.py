"""Standard-candle device-throughput probe.

The TPU tunnel's device-side throughput swings up to +-20% across
sessions at identical code (docs/BENCH_LOG.md round-3 forensics), which
drowns sub-5% kernel effects.  This probe times a fixed DEPENDENT bf16
matmul chain — no herdsman code, no key material — in ~10 s, so any
session can be calibrated: compare against the recorded anchor and
report session-normalized rates alongside raw ones.

Probe-form notes (measured):
- independent dots get CSE'd/memoized (4 distinct pairs cycled 1024x
  ran "at 300 TMAC/s" in 29 ms — only 4 dots actually executed);
- an int8 dependent chain pays a full i32->i8 RELAYOUT (tile shape
  (8,128) -> (32,128)) per link, ~480 us/link of VPU shuffles;
- the bf16 chain is relayout-free and repeats within 1% in-session
  (~51 ms per 256-link chain on the round-3 anchor session).

Anchors (sessions of 2026-08-21): MXU chain 43.3 TMAC/s measured in the
session with a 7.3k/s headline AND 43.45 in a later session measuring
8457/s — the MXU candle did NOT move with the bootstrap-rate swing, so
the cross-session variance is NOT MXU clock; the HBM candle (329 GB/s
anchor) is the suspect gauge to compare in future slow sessions.  Treat
both as forensic gauges (+-5% self-noise), not precision instruments.

Usage: python scripts/standard_candle.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

ANCHOR_TMACS = 43.3    # 2026-08-21 session (headline measured 7.3k/s there)
ANCHOR_HBM_GBPS = 329.0  # same-day session (headline 8457/s there)


def run_candle():
    import jax
    import jax.numpy as jnp
    import numpy as np

    M = K = N = 2048
    reps = 256
    rng = np.random.default_rng(0xCA17D1E)
    a = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)
    # small weights keep the chain numerically tame (values decay, never
    # overflow; the timing doesn't care about the values)
    b = jnp.asarray(rng.standard_normal((K, N)) * 0.01, dtype=jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(reps):
            r = jnp.dot(x, b, preferred_element_type=jnp.float32)
            x = r.astype(jnp.bfloat16)
        return x[0, 0].astype(jnp.float32)

    float(chain(a, b))  # compile + warm
    t0 = time.time()
    float(chain(a, b))  # scalar host fetch = true completion barrier
    dt = time.time() - t0
    tops = M * K * N * reps / dt / 1e12

    # HBM-bandwidth probe: a dependent elementwise chain over a 256 MB
    # array (each link reads + writes the whole array from/to HBM) — the
    # bootstrap kernels are HBM/VMEM-heavy, so session swings the MXU
    # candle misses may show here
    big = jnp.zeros((64 * 1024 * 1024,), dtype=jnp.uint32)
    hreps = 16

    @jax.jit
    def hchain(x):
        for _ in range(hreps):
            x = x + jnp.uint32(1)
        return x[0]

    int(hchain(big))
    t0 = time.time()
    int(hchain(big))
    hdt = time.time() - t0
    gbps = big.size * 4 * 2 * hreps / hdt / 1e9  # read+write per link
    return {"metric": "standard_candle_bf16_chain", "value": round(tops, 2),
            "unit": "TMAC/s", "elapsed_s": round(dt, 3),
            "vs_anchor": round(tops / ANCHOR_TMACS, 3),
            "hbm_gbps": round(gbps, 1),
            "hbm_vs_anchor": round(gbps / ANCHOR_HBM_GBPS, 3)}


if __name__ == "__main__":
    print(json.dumps(run_candle()))
