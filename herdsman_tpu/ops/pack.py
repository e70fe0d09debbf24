"""Device LWE -> GLWE packing keyswitch (`core.reference.pack_lwes` on the
MXU): the (j, t)-summed negacyclic products are one int8-limb correlation —
the same formulation as the bootstrap's `_ep_conv_i8` engine with R = n*t
rows — so bulk packed downloads run at device rate instead of numpy loops.

Bit-exact with the reference (tests/test_ops_bitexact.py); digits are the
UNSIGNED ks gadget (values < 2^ks_base_bits), which must fit int8 — all
shipped parameter sets use ks_base_bits <= 3.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.core.reference import PackingKey
from herdsman_tpu.ops import poly
from herdsman_tpu.ops.decomp import unsigned_decompose

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def packing_key_conv(pk: PackingKey) -> jax.Array:
    """Re-layout the PKSK for the conv engine: [n*t, (k+1)*4, 2N-1] i8
    (same construction as server_key's ``bsk_conv``)."""
    p = pk.params
    assert p.ks_base_bits <= 7, "unsigned ks digits must fit int8"
    rows = pk.pksk.reshape(p.n * p.ks_levels, p.k + 1, p.N)
    ext = np.concatenate([rows, (np.uint32(0) - rows)], axis=-1)
    dx = np.arange(2 * p.N - 1)
    w_idx = (p.N - 1 - dx) % (2 * p.N)
    src = ext[..., w_idx]  # [n*t, k+1, 2N-1] u32
    u = src.astype(np.uint32) + np.uint32(0x80808080)
    shifts = np.array([0, 8, 16, 24], dtype=np.uint32)
    limbs = ((u[..., None] >> shifts) & np.uint32(0xFF)).astype(
        np.int32) - 128
    return jnp.asarray(
        np.moveaxis(limbs.astype(np.int8), -1, 2)
        .reshape(p.n * p.ks_levels, (p.k + 1) * 4, 2 * p.N - 1)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def pack_lwes_batch(params: TFHEParams, pkc: jax.Array,
                    cts: jax.Array) -> jax.Array:
    """Pack groups of LWE cts: [Gr, M <= N, n+1] u32 -> [Gr, k+1, N] u32.

    out_g = (0, sum_i b_i X^i) - sum_{j,t} D_{j,t}(X) (*) PKSK[j,t]
    (reference `pack_lwes`); the double sum is ONE grouped int8
    correlation feeding the MXU.
    """
    p = params
    cts = jnp.asarray(cts, dtype=U32)
    Gr, M = cts.shape[0], cts.shape[1]
    assert M <= p.N
    a = jnp.zeros((Gr, p.n, p.N), dtype=U32)
    a = a.at[:, :, :M].set(jnp.swapaxes(cts[:, :, : p.n], 1, 2))
    digits = unsigned_decompose(a, p.ks_base_bits, p.ks_levels)
    # [Gr, n, N, t] -> rows ordered (j, t) to match pkc
    d8 = jnp.moveaxis(digits, -1, 2).reshape(
        Gr, p.n * p.ks_levels, p.N).astype(I8)
    contrib = jax.lax.conv_general_dilated(
        d8, pkc,
        window_strides=(1,),
        padding=[(p.N - 1, p.N - 1)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        preferred_element_type=I32,
    )  # [Gr, (k+1)*4, N] i32
    contrib = contrib.reshape(Gr, p.k + 1, 4, p.N)
    contrib = poly.from_i32_limb_partials(jnp.moveaxis(contrib, 2, -1))
    base = jnp.zeros((Gr, p.k + 1, p.N), dtype=U32)
    base = base.at[:, p.k, :M].set(cts[:, :, p.n])
    return base - contrib


@functools.partial(jax.jit, static_argnums=(0,))
def extract_all_batch(params: TFHEParams, glwes: jax.Array) -> jax.Array:
    """Sample-extract EVERY coefficient of packed GLWEs on device:
    [Gr, k+1, N] u32 -> [Gr, N, kN+1] u32 (row i = the kN-LWE of
    coefficient i, reference `core.reference.sample_extract`).

    Row i's mask is a_out[j*N + m] = ext_j[(i - m) mod 2N] with
    ext_j = concat(a_j, -a_j) (the negacyclic sign folded into the
    doubled poly) — built as N static slices of the doubled-doubled
    polynomial, the same zero-gather trick as the block-Toeplitz key
    layout (`server_key._block_toeplitz_layout_device`)."""
    p = params
    glwes = jnp.asarray(glwes, dtype=U32)
    Gr = glwes.shape[0]
    a_polys = glwes[:, : p.k, :]                       # [Gr, k, N]
    ed = jnp.concatenate([a_polys, jnp.zeros_like(a_polys) - a_polys],
                         axis=-1)                      # ext_j [Gr, k, 2N]
    ed2 = jnp.concatenate([ed, ed], axis=-1)           # [Gr, k, 4N]
    # rows[m][..., i] = ext[(i - m) mod 2N], i in [0, N)
    rows = jnp.stack(
        [jax.lax.slice_in_dim(ed2, 2 * p.N - m, 3 * p.N - m, axis=-1)
         for m in range(p.N)],
        axis=2,
    )                                                  # [Gr, k, N(m), N(i)]
    a_out = jnp.swapaxes(rows, 2, 3)                   # [Gr, k, N(i), N(m)]
    a_out = jnp.moveaxis(a_out, 1, 2).reshape(Gr, p.N, p.kN)
    b_out = glwes[:, p.k, :, None]                     # [Gr, N, 1]
    return jnp.concatenate([a_out, b_out], axis=-1)


@functools.partial(jax.jit, static_argnums=(2,))
def unpack_lwes_batch(dsk, glwes: jax.Array, count: int) -> jax.Array:
    """Invert `pack_lwes_batch` on the SERVER side: extract the first
    `count` coefficients of each packed GLWE and key-switch them back to
    the n-LWE key with the bootstrap KSK ([Gr, k+1, N] -> [Gr*count, n+1],
    group-major).  This is what makes GLWE-domain intermediate frames
    computable again: stored frames stay packed ((k+1)N vs (n+1)*bits u32)
    and are expanded on load at one MXU matmul per batch.  Noise: original
    + packing keyswitch + this keyswitch — refreshed by the next gate
    bootstrap."""
    from herdsman_tpu.ops import bootstrap as bs

    p = dsk.params
    ext = extract_all_batch(p, glwes)                  # [Gr, N, kN+1]
    ext = ext[:, :count, :].reshape(-1, p.kN + 1)
    return bs.key_switch_batch(dsk, ext)
