"""Gadget decompositions, batched, closed-form (carry-free) — exact jnp port
of core.reference.signed_decompose / unsigned_decompose."""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32


def signed_decompose(x: jax.Array, bg_bits: int, levels: int) -> jax.Array:
    """Balanced signed digits: [...] u32 -> [..., levels] int32 in [-Bg/2, Bg/2).

    Level 0 is most significant (scale q/Bg). Carry-free closed form: round to
    the top W bits, add the balanced offset, read digits, subtract Bg/2.
    """
    x = x.astype(U32)
    W = bg_bits * levels
    Bg = 1 << bg_bits
    half = Bg >> 1
    if W < 32:
        v = (x + U32(1 << (32 - W - 1))) >> U32(32 - W)
    else:
        v = x
    offset = sum(half << (bg_bits * i) for i in range(levels))
    w = v + U32(offset)
    shifts = jnp.array(
        [bg_bits * (levels - 1 - j) for j in range(levels)], dtype=U32
    )
    digits = (w[..., None] >> shifts) & U32(Bg - 1)
    return digits.astype(I32) - I32(half)


def unsigned_decompose(x: jax.Array, base_bits: int, levels: int) -> jax.Array:
    """Unsigned digits with rounding: [...] u32 -> [..., levels] int32 in [0, base)."""
    x = x.astype(U32)
    W = base_bits * levels
    if W < 32:
        v = (x + U32(1 << (32 - W - 1))) >> U32(32 - W)
    else:
        v = x
    shifts = jnp.array(
        [base_bits * (levels - 1 - j) for j in range(levels)], dtype=U32
    )
    digits = (v[..., None] >> shifts) & U32((1 << base_bits) - 1)
    return digits.astype(I32)
