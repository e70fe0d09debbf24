"""Negacyclic NTT over NTT-friendly primes — MXU four-step formulation.

This is the BASELINE config-3 path (RNS/CRT multi-limb polynomial
arithmetic, N up to 4096): polynomial products over prime moduli p < 2^23
with p ≡ 1 (mod 2N), computed as

    pre-twist by psi^i  ->  four-step cyclic NTT  ->  pointwise  ->
    inverse NTT  ->  post-twist by psi^-i / N

The two DFT steps of the four-step NTT are MODULAR MATMULS executed on the
MXU: operands are balanced-signed-digit decomposed (3 x int8 digits, exact
for values < 2^23), multiplied as int8 matmuls accumulating in int32, and
the shift-class partial sums are recombined mod p with Barrett Horner steps
(all uint32, exact — see ops/modmath). Pointwise products use Montgomery
REDC with the constant operand (twiddles / NTT-domain keys) stored in
Montgomery form, so each pointwise modmul is a single REDC.

NTT-domain layout: the spectrum is stored as [k1, k2] row-major (k = k2*N1
+ k1) — a fixed permutation, irrelevant for pointwise use.

The reference has no NTT (its workers delegate to OpenFHE, SURVEY.md §1
L0); this module exists because intra-ciphertext RNS parallelism is where
TPU-native FHE scales (SURVEY.md §2.2 "intra-ciphertext parallelism").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from herdsman_tpu.core import numtheory as nt
from herdsman_tpu.ops import modmath as mm

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8


def _np_digits3(x: np.ndarray) -> np.ndarray:
    """Balanced signed 3x8-bit digits: [...] -> [..., 3] i8.
    Exact for x <= numtheory.MAX_DIGIT3 (~2^22.99)."""
    assert (x <= nt.MAX_DIGIT3).all()
    u = x.astype(np.uint32) + np.uint32(0x808080)
    shifts = np.array([0, 8, 16], dtype=np.uint32)
    d = (u[..., None] >> shifts) & np.uint32(0xFF)
    return (d.astype(np.int32) - 128).astype(np.int8)


def _jnp_digits3(x: jax.Array) -> jax.Array:
    u = x.astype(U32) + U32(0x808080)
    shifts = jnp.array([0, 8, 16], dtype=U32)
    d = (u[..., None] >> shifts) & U32(0xFF)
    return (d.astype(I32) - 128).astype(I8)


def _split_n(N: int) -> tuple[int, int]:
    n1 = 1 << (int(np.log2(N)) // 2)
    return n1, N // n1


@dataclasses.dataclass(frozen=True)
class NTTPlan:
    """Per-prime tables for the negacyclic four-step NTT."""

    p: int
    N: int
    N1: int
    N2: int
    ctx: mm.MontgomeryCtx = dataclasses.field(repr=False)
    # device tables
    psi_mont: Any        # [N]   u32  psi^i in Montgomery form (pre-twist)
    psi_inv_mont: Any    # [N]   u32  psi^-i / N in Montgomery form
    w1_dig: Any          # [N1, N1, 3] i8   digits of w1^(n1*k1)
    w1i_dig: Any         # [N1, N1, 3] i8   inverse
    tw_mont: Any         # [N1, N2] u32     omega^(k1*n2) in Montgomery form
    twi_mont: Any        # [N1, N2] u32     inverse twiddles
    w2_dig: Any          # [N2, N2, 3] i8
    w2i_dig: Any         # [N2, N2, 3] i8


def ntt_primes_for(N: int, count: int) -> tuple[int, ...]:
    """NTT primes compatible with the 3-digit MXU matmul path."""
    return nt.ntt_primes(2 * N, count, cap=nt.MAX_DIGIT3)


@functools.lru_cache(maxsize=None)
def make_plan(p: int, N: int) -> NTTPlan:
    assert (p - 1) % (2 * N) == 0 and p <= nt.MAX_DIGIT3
    ctx = mm.MontgomeryCtx.make(p)
    psi = nt.root_of_unity(p, 2 * N)
    omega = psi * psi % p
    N1, N2 = _split_n(N)
    w1 = pow(omega, N2, p)
    w2 = pow(omega, N1, p)
    n_inv = pow(N, -1, p)
    psi_inv = pow(psi, -1, p)
    R = (1 << 32) % p

    def mont(x: np.ndarray) -> np.ndarray:
        return (x.astype(np.uint64) * R % p).astype(np.uint32)

    i1 = np.arange(N1)
    i2 = np.arange(N2)
    w1_mat = np.array([[pow(w1, int(a * b), p) for b in i1] for a in i1],
                      dtype=np.uint32)
    w1i_mat = np.array(
        [[pow(w1, int(-a * b) % (p - 1), p) for b in i1] for a in i1],
        dtype=np.uint32)
    w2_mat = np.array([[pow(w2, int(a * b), p) for b in i2] for a in i2],
                      dtype=np.uint32)
    w2i_mat = np.array(
        [[pow(w2, int(-a * b) % (p - 1), p) for b in i2] for a in i2],
        dtype=np.uint32)
    tw = np.array([[pow(omega, int(k1 * n2), p) for n2 in i2] for k1 in i1],
                  dtype=np.uint32)
    twi = np.array(
        [[pow(omega, int(-k1 * n2) % (p - 1), p) for n2 in i2] for k1 in i1],
        dtype=np.uint32)

    psi_pows = nt.powers_mod(psi, N, p).astype(np.uint32)
    psi_inv_pows = (
        nt.powers_mod(psi_inv, N, p).astype(np.uint64) * n_inv % p
    ).astype(np.uint32)

    return NTTPlan(
        p=p, N=N, N1=N1, N2=N2, ctx=ctx,
        psi_mont=jnp.asarray(mont(psi_pows)),
        psi_inv_mont=jnp.asarray(mont(psi_inv_pows)),
        w1_dig=jnp.asarray(_np_digits3(w1_mat)),
        w1i_dig=jnp.asarray(_np_digits3(w1i_mat)),
        tw_mont=jnp.asarray(mont(tw)),
        twi_mont=jnp.asarray(mont(twi)),
        w2_dig=jnp.asarray(_np_digits3(w2_mat)),
        w2i_dig=jnp.asarray(_np_digits3(w2i_mat)),
    )


def _mod_matmul_digits(x: jax.Array, w_dig: jax.Array, p: int,
                       mu: int) -> jax.Array:
    """(x @ W) mod p with x [..., M, K] u32 (< p < 2^23) and W given as
    balanced digits [K, L, 3]. int8 MXU matmuls + Barrett Horner combine."""
    K = x.shape[-1]
    xd = _jnp_digits3(x)  # [..., M, K, 3]
    # shift-class partial sums s = i + j in [0, 4]
    classes: list[jax.Array | None] = [None] * 5
    for i in range(3):
        for j in range(3):
            prod = jnp.einsum(
                "...mk,kl->...ml", xd[..., i], w_dig[..., j],
                preferred_element_type=I32,
            )
            s = i + j
            classes[s] = prod if classes[s] is None else classes[s] + prod
    # make non-negative: |class| <= K * 128 * 128 * (#pairs<=3)
    off = K * 128 * 128 * 3
    assert off < (1 << 30)
    # Horner from the top class down: r < p, r*256 + c < 2^31 + 2^31 safe
    # because p < 2^23 -> r*256 < 2^31 and c + off < 2^31.
    r = None
    off_total = 0
    for s in range(4, -1, -1):
        c = (classes[s] + I32(off)).astype(U32)
        off_total = off_total * 256 + off
        if r is None:
            r = mm.barrett_u32(c, p, mu)
        else:
            r = mm.barrett_u32((r << U32(8)) + c, p, mu)
    # subtract the accumulated offset (a constant mod p)
    return mm.modsub(r, jnp.asarray(off_total % p, dtype=U32), p)


def ntt_fwd(plan: NTTPlan, x: jax.Array) -> jax.Array:
    """Negacyclic forward NTT: [..., N] u32 (< p) -> [..., N] u32 spectrum."""
    p, mu = plan.p, plan.ctx.mu
    xt = mm.modmul_by_mont(x, plan.psi_mont, plan.ctx)   # pre-twist
    m = xt.reshape(*x.shape[:-1], plan.N1, plan.N2)
    # DFT over n1: y[k1, n2] = sum_n1 m[n1, n2] w1^(n1 k1)
    y = _mod_matmul_digits(
        jnp.swapaxes(m, -1, -2), plan.w1_dig, p, mu
    )  # [..., N2, N1]
    y = jnp.swapaxes(y, -1, -2)  # [..., N1(k1), N2(n2)]
    z = mm.modmul_by_mont(y, plan.tw_mont, plan.ctx)     # twiddle
    out = _mod_matmul_digits(z, plan.w2_dig, p, mu)      # [..., N1, N2(k2)]
    return out.reshape(*x.shape[:-1], plan.N)


def ntt_inv(plan: NTTPlan, spec: jax.Array) -> jax.Array:
    p, mu = plan.p, plan.ctx.mu
    s = spec.reshape(*spec.shape[:-1], plan.N1, plan.N2)
    z = _mod_matmul_digits(s, plan.w2i_dig, p, mu)       # undo k2 DFT
    y = mm.modmul_by_mont(z, plan.twi_mont, plan.ctx)    # undo twiddle
    m = _mod_matmul_digits(
        jnp.swapaxes(y, -1, -2), plan.w1i_dig, p, mu
    )
    m = jnp.swapaxes(m, -1, -2)
    xt = m.reshape(*spec.shape[:-1], plan.N)
    return mm.modmul_by_mont(xt, plan.psi_inv_mont, plan.ctx)  # untwist + /N


def pointwise_mul(plan: NTTPlan, a_spec: jax.Array,
                  b_spec: jax.Array) -> jax.Array:
    """Pointwise product of two spectra (both plain-domain): 2 REDCs."""
    b_mont = mm.to_mont(b_spec, plan.ctx)
    return mm.mont_mul(a_spec, b_mont, plan.ctx)


def negacyclic_polymul_ntt(plan: NTTPlan, a: jax.Array,
                           b: jax.Array) -> jax.Array:
    """Exact negacyclic product mod p via NTT: [..., N] u32 each, values < p."""
    return ntt_inv(plan, pointwise_mul(plan, ntt_fwd(plan, a),
                                       ntt_fwd(plan, b)))
