"""Microbench: where does mega2's non-MXU time go?

Times kernel VARIANTS of the mega2 blind rotation on random device data
(no real keys — correctness is NOT checked here; bit-exact correctness of
the real kernel is covered by tests/). Chained timing: each iteration's
output feeds the next, ending in a host fetch.

Variants:
  full        — the production kernel (ops/pallas/mega.py mega2)
  norot       — barrel rotation removed (fixed shift): isolates the
                data-dependent rotate cost
  nodecomp    — decompose replaced by a cast: isolates gadget-decompose cost
  mxu_only    — constant digits, no VPU prep at all: the MXU+recombine floor
  sel2        — rotation select as compare+vsel (2 ops) instead of
                and/andn/or masking (3 ops)
  xorsel      — rotation select as xor-and-xor (3 ops, no andn)

Usage: python scripts/mega_variants.py [--iters 3] [--batch 1024]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from herdsman_tpu.core import PARAM_SETS  # noqa: E402
from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total  # noqa: E402
from herdsman_tpu.ops.pallas.mega import _neg_shift  # noqa: E402
from herdsman_tpu.ops.server_key import bt_tile  # noqa: E402

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def _variant_kernel(a_ref, acc0_ref, bt_ref, out_ref, acc_sc, *, p, P, HALF,
                    R, variant: str):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for c in range(p.k + 1):
            acc_sc[c] = acc0_ref[:, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = bt_ref.shape[-1]

    r_amt = a_ref[0, 0, :].astype(U32)
    digs = {}
    for c in range(p.k + 1):
        v = acc_sc[c]
        if variant == "norot":
            rolled = _neg_shift(v, 64, p.N)  # fixed shift, no barrel
        elif variant == "mxu_only":
            rolled = v
        else:
            rolled = v
            for bit in range(p.log2_2N):
                s = 1 << bit
                shifted = (
                    _neg_shift(rolled, s, p.N) if s < p.N
                    else jnp.zeros_like(rolled) - rolled
                )
                take_bit = (r_amt >> U32(bit)) & U32(1)
                if variant == "sel2":
                    mask = (U32(0) - take_bit)[:, None]
                    rolled = jnp.where(
                        jnp.broadcast_to(mask, rolled.shape) != U32(0),
                        shifted, rolled)
                elif variant == "xorsel":
                    mask = (U32(0) - take_bit)[:, None]
                    rolled = rolled ^ ((rolled ^ shifted) & mask)
                else:
                    mask = (U32(0) - take_bit)[:, None]
                    rolled = (shifted & mask) | (rolled & ~mask)
        if variant == "mxu_only":
            for lev in range(p.levels):
                row = c * p.levels + lev
                for sub in range(HALF):
                    digs[(row, sub)] = jnp.full((v.shape[0], P), 3, dtype=I8)
            continue
        diff = rolled - v
        if variant == "nodecomp":
            d8c = diff.astype(I8)
            for lev in range(p.levels):
                row = c * p.levels + lev
                for sub in range(HALF):
                    digs[(row, sub)] = d8c[:, sub * P:(sub + 1) * P]
        else:
            val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
                + U32(offset)
            for lev in range(p.levels):
                shift = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]

    for ct in range(HALF):
        total = None
        for r in range(R):
            bt_flat = bt_ref[0, 0, r].reshape(HALF * P, C4P)
            t = _ep_column_total(
                lambda sub, r=r: digs[(r, sub)], bt_flat, ct, P, HALF
            )
            total = t if total is None else total + t
        a = total.reshape(total.shape[0], p.k + 1, 4, P).astype(U32)
        for c in range(p.k + 1):
            combined = (
                a[:, c, 0, :]
                + (a[:, c, 1, :] << U32(8))
                + (a[:, c, 2, :] << U32(16))
                + (a[:, c, 3, :] << U32(24))
            )
            acc_sc[c, :, ct * P:(ct + 1) * P] = (
                acc_sc[c, :, ct * P:(ct + 1) * P] + combined
            )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for c in range(p.k + 1):
            out_ref[:, c, :] = acc_sc[c]


def build(variant: str, p, B: int):
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    Bt = min(B, 128)
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P

    def run(a_t, acc0, bsk_bt):
        return pl.pallas_call(
            functools.partial(_variant_kernel, p=p, P=P, HALF=HALF, R=R,
                              variant=variant),
            grid=(BC, p.n),
            in_specs=[
                pl.BlockSpec((1, 1, Bt), lambda bc, i: (i, 0, bc),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i: (bc, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, R, HALF, P, C4P),
                             lambda bc, i: (i, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Bt, p.k + 1, p.N),
                                   lambda bc, i: (bc, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
            scratch_shapes=[pltpu.VMEM((p.k + 1, Bt, p.N), U32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a_t.reshape(p.n, 1, B), acc0, bsk_bt.reshape(
            (p.n, 1) + bsk_bt.shape[1:]))

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--params", default="std128_fast")
    ap.add_argument("--variants", default="full,norot,nodecomp,mxu_only,"
                    "sel2,xorsel")
    args = ap.parse_args()

    p = PARAM_SETS[args.params]
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = args.batch
    C4P = (p.k + 1) * 4 * P

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    bsk_bt = jax.random.randint(k1, (p.n, R, HALF, P, C4P), -8, 8,
                                dtype=jnp.int32).astype(I8)
    acc0 = jax.random.randint(k2, (B, p.k + 1, p.N), 0, 1 << 30,
                              dtype=jnp.int32).astype(U32)
    a_t = jax.random.randint(k3, (p.n, B), 0, 2 * p.N, dtype=jnp.int32)
    jax.block_until_ready((bsk_bt, acc0, a_t))
    print(f"key {bsk_bt.nbytes / 1e9:.2f} GB on device", file=sys.stderr)

    import numpy as np

    def timed_chain(fn, start, k):
        """Chain k data-dependent rotations, END IN A HOST FETCH (the
        tunnel runtime does not reliably block on block_until_ready for
        repeated programs — docs/BENCH_LOG.md measurement notes)."""
        t0 = time.time()
        cur = start
        for _ in range(k):
            cur = fn(a_t, cur, bsk_bt)
        np.asarray(cur[:2, 0, :128])  # force device->host
        return time.time() - t0

    for variant in args.variants.split(","):
        fn = build(variant, p, B)
        t0 = time.time()
        out = jax.block_until_ready(fn(a_t, acc0, bsk_bt))
        compile_s = time.time() - t0
        k = args.iters
        t_short = timed_chain(fn, out, 1)
        t_long = timed_chain(fn, out, 1 + k)
        dt = (t_long - t_short) / k
        per_step_us = dt / (B / 128) / p.n * 1e6
        print(f"{variant:10s}  {dt * 1e3:8.1f} ms/rotation-batch({B})  "
              f"{per_step_us:6.2f} us/step/chunk  "
              f"{B / dt:7.1f} rot/s  (compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
