"""Concurrent-stream probe: aggregate throughput of TWO independent
K-deep fused bootstrap chains dispatched back-to-back vs one (round 5).

Findings (BENCH_LOG round 5): at K=8 dual adds +7-10% — program-boundary
gaps are real; at K=16 the deep chain has already amortized most of it
and dual adds only +2-4% (residual = fetch/launch overlap).  This is the
kernel-level confirmation of why the pipelined coordinator (bench_service
--pipeline) sustains 0.94 of the kernel anchor while sequential jobs see
0.70.

Usage: python scripts/probe_dual_chain.py [K] [engine] (TPU; one process)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import get_keys  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    engine = sys.argv[2] if len(sys.argv) > 2 else "pallas_mega13"
    B = 2048
    ck, sk = get_keys("std128_k2")
    dsk = device_server_key(sk, layouts=layouts_for_engine(engine))
    for lay in layouts_for_engine(engine):
        jax.block_until_ready(getattr(dsk, lay))

    @jax.jit
    def chain(d, c):
        return jax.lax.fori_loop(
            0, K, lambda _, x: bs.bootstrap_bool_batch.__wrapped__(
                d, x, engine=engine), c)

    rng = np.random.default_rng(12)
    cts, bits = [], []
    for _ in range(3):
        b = rng.integers(0, 2, B).astype(bool)
        bits.append(b)
        cts.append(jnp.asarray(ref.encrypt_bool(ck, b, rng)))
    for c in cts:
        jax.block_until_ready(c)
    out = np.asarray(chain(dsk, cts[0]))
    print("compile leg bad:",
          int((ref.lwe_decrypt_bool(ck, out) != bits[0]).sum()), flush=True)
    r1 = r2 = None
    for trial in range(3):
        t0 = time.time()
        np.asarray(chain(dsk, cts[1]))
        t1 = time.time() - t0
        t0 = time.time()
        r1, r2 = chain(dsk, cts[1]), chain(dsk, cts[2])
        np.asarray(r1)
        np.asarray(r2)
        t2 = time.time() - t0
        print(f"trial {trial}: single {B * K / t1:8.1f} bs/s | dual agg "
              f"{2 * B * K / t2:8.1f} bs/s", flush=True)
    print("dual decrypt bad:",
          int((ref.lwe_decrypt_bool(ck, np.asarray(r1)) != bits[1]).sum()),
          int((ref.lwe_decrypt_bool(ck, np.asarray(r2)) != bits[2]).sum()),
          flush=True)


if __name__ == "__main__":
    main()
