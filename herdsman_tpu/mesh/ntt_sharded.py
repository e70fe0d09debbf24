"""Coefficient-sharded negacyclic NTT over a device mesh — the "NTT stage
exchange via all-to-all over ICI" axis of the design (SURVEY.md §5
long-context analog, BASELINE configs 4/5).

The four-step NTT's middle transpose IS the collective: with the polynomial
matrix [N1, N2] sharded on N1 across the `coef` axis, stage 1 (DFT over N1)
becomes a DISTRIBUTED matmul — each device holds N1/D rows of the twiddle
matrix's output, so the contraction over the full N1 input needs the rows
of every device: an all-gather (or equivalently the matmul is computed from
all-gathered input). The twiddle + stage 2 (DFT over N2) are then fully
local. The inverse runs the mirror schedule. On a real slice every exchange
rides ICI; on the test mesh it runs over the virtual CPU devices.

All arithmetic is the exact integer NTT of ops/ntt.py; sharding changes
nothing bit-wise (tests assert equality with the single-device spectrum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from herdsman_tpu.ops import modmath as mm
from herdsman_tpu.ops import ntt as nttm

U32 = jnp.uint32


def _fwd_local(plan: nttm.NTTPlan, x_rows: jax.Array, axis: str) -> jax.Array:
    """shard_map body: x_rows [..., N1/D, N2] (pre-twisted rows of the
    [N1, N2] matrix). Returns the spectrum shard [..., N1/D, N2] (k1-sharded).
    """
    p_, mu = plan.p, plan.ctx.mu
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    N1 = plan.N1
    rows = N1 // D

    # stage 1: Y[k1, n2] = sum_n1 x[n1, n2] w1^(n1 k1)
    # contraction needs ALL n1 rows -> all-gather the input shard (the ICI
    # exchange), then multiply with our k1-rows of the twiddle matrix.
    full = jax.lax.all_gather(x_rows, axis, axis=-2, tiled=True)
    # [..., N1, N2]
    w1_rows = jax.lax.dynamic_slice_in_dim(
        plan.w1_dig, idx * rows, rows, 1
    )  # [N1, rows, 3] — w1_dig[k?]: w1_dig is [N1(n1), N1(k1), 3]
    y = nttm._mod_matmul_digits(
        jnp.swapaxes(full, -1, -2), w1_rows, p_, mu
    )  # [..., N2, rows]
    y = jnp.swapaxes(y, -1, -2)  # [..., rows(k1), N2]

    # local twiddle rows for our k1 shard
    tw = jax.lax.dynamic_slice_in_dim(plan.tw_mont, idx * rows, rows, 0)
    z = mm.modmul_by_mont(y, tw, plan.ctx)

    # stage 2 is fully local over n2
    return nttm._mod_matmul_digits(z, plan.w2_dig, p_, mu)


def _inv_local(plan: nttm.NTTPlan, s_rows: jax.Array, axis: str) -> jax.Array:
    p_, mu = plan.p, plan.ctx.mu
    D = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    rows = plan.N1 // D

    z = nttm._mod_matmul_digits(s_rows, plan.w2i_dig, p_, mu)
    twi = jax.lax.dynamic_slice_in_dim(plan.twi_mont, idx * rows, rows, 0)
    y = mm.modmul_by_mont(z, twi, plan.ctx)  # [..., rows(k1), N2]

    # inverse stage 1: x[n1, n2] = sum_k1 y[k1, n2] w1^(-n1 k1): contraction
    # over k1 -> all-gather the k1 shards, local matmul for our n1 rows.
    full = jax.lax.all_gather(y, axis, axis=-2, tiled=True)
    w1i_rows = jax.lax.dynamic_slice_in_dim(
        plan.w1i_dig, idx * rows, rows, 1
    )
    m = nttm._mod_matmul_digits(
        jnp.swapaxes(full, -1, -2), w1i_rows, p_, mu
    )
    return jnp.swapaxes(m, -1, -2)  # [..., rows(n1), N2]


def ntt_fwd_sharded(plan: nttm.NTTPlan, mesh: Mesh, x: jax.Array,
                    axis: str = "limb") -> jax.Array:
    """Negacyclic forward NTT with the polynomial coefficient axis sharded
    over `axis`. x [..., N] u32 -> spectrum [..., N] u32 (same layout as
    ops.ntt.ntt_fwd, bit-identical)."""
    xt = mm.modmul_by_mont(x, plan.psi_mont, plan.ctx)  # pre-twist (local)
    mrows = xt.reshape(*x.shape[:-1], plan.N1, plan.N2)

    fn = jax.shard_map(
        functools.partial(_fwd_local, plan, axis=axis),
        mesh=mesh,
        in_specs=P(*([None] * (mrows.ndim - 2)), axis, None),
        out_specs=P(*([None] * (mrows.ndim - 2)), axis, None),
        check_vma=False,
    )
    out = fn(mrows)
    return out.reshape(*x.shape[:-1], plan.N)


def ntt_inv_sharded(plan: nttm.NTTPlan, mesh: Mesh, spec: jax.Array,
                    axis: str = "limb") -> jax.Array:
    srows = spec.reshape(*spec.shape[:-1], plan.N1, plan.N2)
    fn = jax.shard_map(
        functools.partial(_inv_local, plan, axis=axis),
        mesh=mesh,
        in_specs=P(*([None] * (srows.ndim - 2)), axis, None),
        out_specs=P(*([None] * (srows.ndim - 2)), axis, None),
        check_vma=False,
    )
    m = fn(srows)
    xt = m.reshape(*spec.shape[:-1], plan.N)
    return mm.modmul_by_mont(xt, plan.psi_inv_mont, plan.ctx)


def polymul_sharded(plan: nttm.NTTPlan, mesh: Mesh, a: jax.Array,
                    b: jax.Array, axis: str = "limb") -> jax.Array:
    """Negacyclic product with coefficient sharding + ICI stage exchange."""
    sa = ntt_fwd_sharded(plan, mesh, a, axis)
    sb = ntt_fwd_sharded(plan, mesh, b, axis)
    prod = nttm.pointwise_mul(plan, sa, sb)
    return ntt_inv_sharded(plan, mesh, prod, axis)
