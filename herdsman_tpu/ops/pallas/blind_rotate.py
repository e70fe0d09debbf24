"""Pallas TPU kernel for the external-product contraction — the blind-rotation
hot loop (the compute that replaces the reference worker herd's OpenFHE gate
evaluation, reference src/execution/worker/grpc/grpc_worker_group.cpp:85-94).

Engine ``pallas_bt``: the negacyclic Toeplitz matrix of each bootstrapping-key
polynomial is pre-expanded at key-prep into P x P diagonal blocks
(server_key.bsk_bt; only the first N/P diagonals are stored — the rest are
negations).  The per-step external product

    prod[b, c, :] = sum_r digits[b, r, :] (*) bsk_i[r, c, :]   (negacyclic)

then becomes a pure gathered-block int8 matmul: grid (b-chunk, col-tile,
row-tile), each cell one [Bt, P] x [P, (k+1)*4*P] MXU dot accumulated into a
VMEM scratch; the diagonal-block gather is BlockSpec index_map arithmetic
(m = (ct - rt mod HALF) mod 2*HALF), so there is ZERO expansion work at run
time — the kernel is DMA + MXU only.  Limb recombination to uint32 happens
in-kernel on the last row-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops.server_key import bt_tile

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def _kernel(d_ref, bt_ref, out_ref, acc_ref, *, P: int, HALF: int,
            RT: int, kp1: int):
    ct = pl.program_id(1)
    rt = pl.program_id(2)
    m = (ct - rt % HALF) % (2 * HALF)
    neg = m >= HALF  # stored blocks cover m < HALF; the rest are negations

    tile = bt_ref[0, 0]                                  # [P, (k+1)*4*P] i8
    prod = jnp.dot(d_ref[0], tile, preferred_element_type=I32)

    first = rt == 0

    @pl.when(jnp.logical_and(first, jnp.logical_not(neg)))
    def _():
        acc_ref[:] = prod

    @pl.when(jnp.logical_and(first, neg))
    def _():
        acc_ref[:] = -prod

    @pl.when(jnp.logical_and(jnp.logical_not(first), jnp.logical_not(neg)))
    def _():
        acc_ref[:] = acc_ref[:] + prod

    @pl.when(jnp.logical_and(jnp.logical_not(first), neg))
    def _():
        acc_ref[:] = acc_ref[:] - prod

    @pl.when(rt == RT - 1)
    def _():
        acc = acc_ref[:].reshape(acc_ref.shape[0], kp1, 4, P)
        u = acc.astype(U32)
        combined = (
            u[:, :, 0, :]
            + (u[:, :, 1, :] << U32(8))
            + (u[:, :, 2, :] << U32(16))
            + (u[:, :, 3, :] << U32(24))
        )
        out_ref[:] = combined                            # [Bt, k+1, P] u32


def _use_interpret() -> bool:
    """Interpret mode off-TPU so the kernel is testable on CPU CI."""
    return jax.default_backend() != "tpu"


def external_product_bt(params: TFHEParams, digits: jax.Array,
                        bsk_bt_i: jax.Array) -> jax.Array:
    """digits [B, R, N] i32 (values in [-Bg/2, Bg/2)), bsk_bt_i
    [R, HALF, P, (k+1)*4*P] i8  ->  [B, k+1, N] u32."""
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    RT = R * HALF
    B = digits.shape[0]

    Bt = B if B <= 256 else 256
    pad = (-B) % Bt
    d8 = digits.astype(I8).reshape(B, RT, P)  # row-tile major: rt = r*HALF+sub
    if pad:
        d8 = jnp.concatenate(
            [d8, jnp.zeros((pad, RT, P), dtype=I8)], axis=0
        )
    BC = d8.shape[0] // Bt
    # [RT, B, P]: blocks (1, Bt, P) satisfy Mosaic's trailing-dims rule
    d8 = jnp.swapaxes(d8, 0, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, P=P, HALF=HALF, RT=RT, kp1=p.k + 1),
        grid=(BC, HALF, RT),
        in_specs=[
            pl.BlockSpec(
                (1, Bt, P), lambda bc, ct, rt: (rt, bc, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, P, (p.k + 1) * 4 * P),
                lambda bc, ct, rt, _HALF=HALF: (
                    rt // _HALF,
                    ((ct - rt % _HALF) % (2 * _HALF)) % _HALF,
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (Bt, p.k + 1, P), lambda bc, ct, rt: (bc, 0, ct),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((BC * Bt, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((Bt, (p.k + 1) * 4 * P), I32),
        ],
        interpret=_use_interpret(),
    )(d8, bsk_bt_i)
    return out[:B]


def _ep_pallas_bt(p: TFHEParams, digits: jax.Array,
                  bsk_bt_i: jax.Array) -> jax.Array:
    return external_product_bt(p, digits, bsk_bt_i)


# self-registration (imported lazily from ops.bootstrap)
bs.ENGINES.setdefault("pallas_bt", (_ep_pallas_bt, "bsk_bt"))
