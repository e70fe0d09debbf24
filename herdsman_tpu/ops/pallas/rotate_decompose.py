"""Pallas kernel: fused negacyclic rotate + CMux-diff + gadget decomposition.

One blind-rotation step needs, per batch element b with rotation amount
a~_b:   digits( X^{a~_b} * acc_b - acc_b )   reordered to the row-tile-major
layout the external-product matmul kernel consumes ([RT, B, P] int8).

Doing this in XLA costs ~10 full HBM passes over the accumulator (log-roll
selects + decompose + transpose materialize intermediates); here it is one
read of acc + one write of digits, with the 11 log-shift select passes and
the carry-free decomposition running on VMEM values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops.server_key import bt_tile

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def _neg_shift(v: jax.Array, s: int) -> jax.Array:
    """X^s * v for static s in (0, N): [Bt, N] u32."""
    N = v.shape[-1]
    return jnp.concatenate(
        [jnp.zeros_like(v[:, N - s:]) - v[:, N - s:], v[:, : N - s]], axis=-1
    )


def _kernel(acc_ref, a_ref, dig_ref, *, p: TFHEParams, P: int, HALF: int):
    r = a_ref[:, 0].astype(U32)                   # [Bt]
    take_bits = [
        ((r >> U32(bit)) & U32(1)) != U32(0) for bit in range(p.log2_2N)
    ]
    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * i) for i in range(p.levels))

    for c in range(p.k + 1):
        v = acc_ref[:, c, :]                      # [Bt, N] u32
        rolled = v
        for bit in range(p.log2_2N):
            s = 1 << bit
            if s < p.N:
                shifted = _neg_shift(rolled, s)
            else:  # s == N: X^N = -1
                shifted = jnp.zeros_like(rolled) - rolled
            rolled = jnp.where(take_bits[bit][:, None], shifted, rolled)
        diff = rolled - v
        # carry-free balanced decomposition (== ops.decomp.signed_decompose)
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
        for lev in range(p.levels):
            shift = p.bg_bits * (p.levels - 1 - lev)
            d = ((val >> U32(shift)) & U32(Bg - 1)).astype(I32) - I32(half)
            row = c * p.levels + lev
            d8 = d.astype(I8)                     # [Bt, N]
            for sub in range(HALF):
                dig_ref[row * HALF + sub] = d8[:, sub * P:(sub + 1) * P]


def rotate_decompose(params: TFHEParams, acc: jax.Array,
                     a_i: jax.Array, bt_chunk: int = 128) -> jax.Array:
    """acc [B, k+1, N] u32, a_i [B] i32 in [0, 2N) ->
    digits [RT, B, P] int8 (row-tile major for external_product_bt)."""
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    RT = R * HALF
    from herdsman_tpu.ops.pallas.blind_rotate import _pick_chunk

    B = acc.shape[0]
    Bt = _pick_chunk(B, bt_chunk)
    BC = B // Bt

    kwargs = {}
    if jax.default_backend() == "tpu" and Bt > 128:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_kernel, p=p, P=P, HALF=HALF),
        grid=(BC,),
        in_specs=[
            pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc: (bc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), lambda bc: (bc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RT, Bt, P), lambda bc: (0, bc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RT, B, P), I8),
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(acc, a_i.reshape(B, 1).astype(I32))
