"""Negacyclic polynomial primitives over Z_{2^32}[X]/(X^N+1), batched, exact.

The negacyclic product (u * p) is a Toeplitz matrix product:
    (u * p)[c] = sum_r u[r] * T(p)[r, c],   T(p)[r, c] = ext(p)[(c - r) mod 2N]
with ext(p) = concat(p, -p).  Everything here is exact uint32 wraparound; the
MXU engines split operands into balanced signed int8 limbs (base 256) whose
products accumulate exactly in int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def negacyclic_extend(p: jax.Array) -> jax.Array:
    """ext(p) = concat(p, -p) along the last axis: [..., N] u32 -> [..., 2N]."""
    p = p.astype(U32)
    return jnp.concatenate([p, jnp.zeros_like(p) - p], axis=-1)


def to_i8_limbs(x: jax.Array) -> jax.Array:
    """Balanced signed base-256 limbs of u32: [...] -> [..., 4] int8.

    x == sum_j limbs[..., j] * 256^j  (mod 2^32), limbs in [-128, 127].
    """
    x = x.astype(U32)
    u = x + U32(0x80808080)
    shifts = jnp.array([0, 8, 16, 24], dtype=U32)
    limbs = (u[..., None] >> shifts) & U32(0xFF)
    return (limbs.astype(I32) - 128).astype(I8)


def from_i32_limb_partials(partials: jax.Array) -> jax.Array:
    """Combine limb partial sums: [..., 4] int32 -> [...] uint32 (mod 2^32)."""
    p = partials.astype(U32)
    return (
        p[..., 0]
        + (p[..., 1] << U32(8))
        + (p[..., 2] << U32(16))
        + (p[..., 3] << U32(24))
    )


def negacyclic_shift(p: jax.Array, s: int) -> jax.Array:
    """X^s * p for a static s in [0, 2N): [..., N] -> [..., N], exact u32."""
    N = p.shape[-1]
    s = s % (2 * N)
    neg = False
    if s >= N:
        s -= N
        neg = True
    if s == 0:
        out = p
    else:
        out = jnp.concatenate(
            [jnp.zeros_like(p[..., N - s :]) - p[..., N - s :], p[..., : N - s]],
            axis=-1,
        )
    if neg:
        out = jnp.zeros_like(out) - out
    return out


def negacyclic_monomial_mul(p: jax.Array, r: jax.Array) -> jax.Array:
    """X^r * p with a *traced* per-batch exponent r in [0, 2N).

    p: [..., N] u32;  r: [...] integer (broadcast against p's batch dims).
    Log-shift composition: log2(2N) select+static-shift passes, fully
    vectorized (no gathers) — the TPU-friendly way to do data-dependent
    negacyclic rotation.
    """
    N = p.shape[-1]
    log2_2N = int(np.log2(2 * N))
    r = r.astype(U32)
    out = p.astype(U32)
    for bit in range(log2_2N):
        s = 1 << bit
        shifted = negacyclic_shift(out, s)
        take = ((r >> U32(bit)) & U32(1)).astype(jnp.bool_)
        out = jnp.where(take[..., None], shifted, out)
    return out


@functools.lru_cache(maxsize=None)
def _toeplitz_indices(N: int) -> np.ndarray:
    """idx[r, c] = (c - r) mod 2N, used to gather T(p) from ext(p)."""
    r = np.arange(N)[:, None]
    c = np.arange(N)[None, :]
    return ((c - r) % (2 * N)).astype(np.int32)


def negacyclic_toeplitz(p: jax.Array) -> jax.Array:
    """T(p): [..., N] -> [..., N, N] with (u*p) == u @ T(p). Gather-based.

    Fallback/CPU path: correct everywhere, not the TPU fast path.
    """
    N = p.shape[-1]
    ext = negacyclic_extend(p)
    idx = jnp.asarray(_toeplitz_indices(N))
    return jnp.take(ext, idx, axis=-1)


def negacyclic_polymul(u: jax.Array, p: jax.Array) -> jax.Array:
    """Exact negacyclic product via gather-Toeplitz + u32 matmul (fallback)."""
    T = negacyclic_toeplitz(p)
    u = u.astype(U32)
    return jnp.einsum("...r,...rc->...c", u, T)
