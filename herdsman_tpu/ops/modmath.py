"""Exact 32-bit modular arithmetic on TPU (VPU) — uint32-only emulation of
64-bit intermediates (TPU has no fast 64-bit integer path). Primitives:

- mulhi32: high word of a u32 x u32 product via 16-bit limb schoolbook.
- barrett_u32: x mod p for x < 2^32 (p < 2^31).
- Montgomery multiplication (R = 2^32): mont_mul(a, b) = a*b*R^-1 mod p for
  odd p < 2^31. Storing one operand pre-scaled by R (twiddles, NTT-domain
  key polynomials) makes mont_mul(data, w_mont) return the PLAIN product —
  one mont_mul per pointwise modmul, ~2 mulhi + 2 mullo VPU ops.

All functions are elementwise jnp ops that fuse into surrounding programs.
Used by the NTT/RNS path (BASELINE config 3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = U32(0xFFFF)


def mulhi32(a: jax.Array, b: jax.Array) -> jax.Array:
    """High 32 bits of the 64-bit product of two uint32 arrays (exact)."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> U32(16)
    b0 = b & MASK16
    b1 = b >> U32(16)
    p00 = a0 * b0
    mid = a0 * b1 + (p00 >> U32(16))   # <= (2^16-1)^2 + (2^16-1) < 2^32: ok
    mid2 = a1 * b0 + (mid & MASK16)    # same bound: ok
    return a1 * b1 + (mid >> U32(16)) + (mid2 >> U32(16))


def barrett_u32(x: jax.Array, p: int, mu: int) -> jax.Array:
    """x mod p for x < 2^32, p < 2^31, mu = floor(2^32 / p).

    q = mulhi(x, mu) underestimates floor(x/p) by at most 2."""
    q = mulhi32(x.astype(U32), jnp.asarray(mu, dtype=U32))
    r = x.astype(U32) - q * U32(p)
    r = jnp.where(r >= U32(2 * p), r - U32(2 * p), r)
    return jnp.where(r >= U32(p), r - U32(p), r)


@dataclasses.dataclass(frozen=True)
class MontgomeryCtx:
    """Per-prime constants for R = 2^32 Montgomery arithmetic."""

    p: int
    p_inv_neg: int   # -p^-1 mod 2^32
    r_mod_p: int     # 2^32 mod p
    r2_mod_p: int    # 2^64 mod p  (to_mont factor)
    mu: int          # floor(2^32 / p)  (Barrett companion)

    @staticmethod
    def make(p: int) -> "MontgomeryCtx":
        assert p % 2 == 1 and 2 < p < (1 << 31)
        p_inv = pow(p, -1, 1 << 32)
        return MontgomeryCtx(
            p=p,
            p_inv_neg=((1 << 32) - p_inv) % (1 << 32),
            r_mod_p=(1 << 32) % p,
            r2_mod_p=(1 << 64) % p,
            mu=(1 << 32) // p,
        )


def mont_mul(a: jax.Array, b: jax.Array, ctx: MontgomeryCtx) -> jax.Array:
    """a * b * 2^-32 mod p (REDC), exact for a, b < p."""
    a = a.astype(U32)
    b = b.astype(U32)
    lo = a * b
    hi = mulhi32(a, b)
    m = lo * U32(ctx.p_inv_neg)
    # (lo + (m*p) mod 2^32) is 0 or 2^32; carry out iff lo != 0
    carry = (lo != U32(0)).astype(U32)
    t = hi + mulhi32(m, jnp.asarray(ctx.p, dtype=U32)) + carry
    return jnp.where(t >= U32(ctx.p), t - U32(ctx.p), t)


def to_mont(x: jax.Array, ctx: MontgomeryCtx) -> jax.Array:
    return mont_mul(x, jnp.asarray(ctx.r2_mod_p, dtype=U32), ctx)


def from_mont(x: jax.Array, ctx: MontgomeryCtx) -> jax.Array:
    return mont_mul(x, jnp.asarray(1, dtype=U32), ctx)


def modmul_by_mont(x_plain: jax.Array, w_mont: jax.Array,
                   ctx: MontgomeryCtx) -> jax.Array:
    """(x * w) mod p with w stored in Montgomery form: one REDC."""
    return mont_mul(x_plain, w_mont, ctx)


def modadd(a: jax.Array, b: jax.Array, p: int) -> jax.Array:
    s = a.astype(U32) + b.astype(U32)
    return jnp.where(s >= U32(p), s - U32(p), s)


def modsub(a: jax.Array, b: jax.Array, p: int) -> jax.Array:
    d = a.astype(U32) - b.astype(U32)
    return jnp.where(d >= U32(p), d + U32(p), d)  # u32 wrap detection
