"""Microbenchmark: per-step cost breakdown of the fused blind-rotation path.

NOTE: per-step timings from this script are UNRELIABLE through the axon
tunnel (repeat executions do not block; see docs/ROADMAP.md "Known quirks").
End-to-end numbers come from bench.py (chained-fetch timing).

Times, over n-step scans on the real TPU:
  (a) rotate+decompose kernel alone
  (b) external-product kernel alone
  (c) both (the production step)
  (d) empty scan (scan machinery + bsk slicing baseline)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from herdsman_tpu.core import PARAM_SETS  # noqa: E402
from herdsman_tpu.ops.pallas.blind_rotate import (  # noqa: E402
    external_product_bt_pretiled,
)
from herdsman_tpu.ops.pallas.rotate_decompose import rotate_decompose  # noqa: E402
from herdsman_tpu.ops.server_key import bt_tile  # noqa: E402

P_NAME = sys.argv[1] if len(sys.argv) > 1 else "std128"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
p = PARAM_SETS[P_NAME]
P, HALF = bt_tile(p)
R = (p.k + 1) * p.levels
RT = R * HALF

rng = np.random.default_rng(0)
bsk_bt = jnp.asarray(
    rng.integers(-128, 128, (p.n, R, HALF, P, (p.k + 1) * 4 * P)).astype(
        np.int8)
)
acc0 = jnp.asarray(
    rng.integers(0, 1 << 32, (B, p.k + 1, p.N), dtype=np.uint64).astype(
        np.uint32))
a_t = jnp.asarray(rng.integers(0, 2 * p.N, (p.n, B)).astype(np.int32))
d8_fixed = jnp.asarray(
    rng.integers(-64, 64, (RT, B, P)).astype(np.int8))


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(jfn(*args))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{name:28s} {dt * 1e3:8.1f} ms total  {dt / p.n * 1e6:8.1f} us/step")
    return out


def scan_empty(acc, bsk_bt, a_t, d8):
    def step(acc, xs):
        bsk_i, a_i = xs
        return acc + jnp.uint32(bsk_i[0, 0, 0, 0].astype(jnp.uint32)), None
    out, _ = jax.lax.scan(step, acc, (bsk_bt, a_t))
    return out


def scan_rot(acc, bsk_bt, a_t, d8):
    def step(acc, xs):
        _, a_i = xs
        d = rotate_decompose(p, acc, a_i)
        return acc + d[0, :, 0].astype(jnp.uint32)[:, None, None], None
    out, _ = jax.lax.scan(step, acc, (bsk_bt, a_t))
    return out


def scan_ep(acc, bsk_bt, a_t, d8):
    def step(acc, xs):
        bsk_i, _ = xs
        return external_product_bt_pretiled(p, d8, bsk_i, glwe=acc), None
    out, _ = jax.lax.scan(step, acc, (bsk_bt, a_t))
    return out


def scan_full(acc, bsk_bt, a_t, d8):
    def step(acc, xs):
        bsk_i, a_i = xs
        d = rotate_decompose(p, acc, a_i)
        return external_product_bt_pretiled(p, d, bsk_i, glwe=acc), None
    out, _ = jax.lax.scan(step, acc, (bsk_bt, a_t))
    return out


print(f"params={P_NAME} B={B} n={p.n}")
timed("empty scan (bsk stream)", scan_empty, acc0, bsk_bt, a_t, d8_fixed)
timed("rotate_decompose only", scan_rot, acc0, bsk_bt, a_t, d8_fixed)
timed("external product only", scan_ep, acc0, bsk_bt, a_t, d8_fixed)
timed("full step", scan_full, acc0, bsk_bt, a_t, d8_fixed)
