"""RNS/CRT multi-limb polynomial arithmetic (BASELINE config 3).

A polynomial over Z_Q with Q = p_0 * p_1 * ... * p_{L-1} is held as its
residues [L, ..., N] (uint32, limb-major). Limb operations are independent —
the TP-style `limb` mesh axis shards this first dimension with NO
communication for add/mul (CRT is the natural tensor parallelism of RNS
arithmetic; SURVEY.md §2.2 "intra-ciphertext parallelism").

Includes an RLWE key switch in the CRT-gadget style of RNS-BFV/CKKS:
    a = sum_j d_j * Qhat_j (mod Q),   Qhat_j = Q/p_j,
    d_j = [a * Qhat_j^-1]_{p_j}  (centered),
so the gadget digits are limb-LOCAL (no positional reconstruction), and the
key-switching key encrypts s2 * Qhat_j.

The reference has no RNS math (its workers delegate to OpenFHE, SURVEY.md §1
L0); this module is the TPU-native RNS foundation named in BASELINE config 3.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from herdsman_tpu.core import numtheory as nt  # noqa: F401  (re-export path)
from herdsman_tpu.ops import modmath as mm
from herdsman_tpu.ops import ntt as nttm

U32 = jnp.uint32


@dataclasses.dataclass(frozen=True)
class RNSContext:
    N: int
    primes: tuple[int, ...]
    plans: tuple[nttm.NTTPlan, ...] = dataclasses.field(repr=False)

    @property
    def L(self) -> int:
        return len(self.primes)

    @property
    def Q(self) -> int:
        q = 1
        for p in self.primes:
            q *= p
        return q


def make_rns(N: int, n_primes: int = 3) -> RNSContext:
    primes = nttm.ntt_primes_for(N, n_primes)
    plans = tuple(nttm.make_plan(p, N) for p in primes)
    return RNSContext(N=N, primes=primes, plans=plans)


# ---------------------------------------------------------------------------
# residue conversion (host, exact big-int)
# ---------------------------------------------------------------------------

def to_rns(ctx: RNSContext, coeffs: Sequence[int] | np.ndarray) -> np.ndarray:
    """Python-int/object coefficients mod Q -> residues [L, ...] uint32."""
    arr = np.asarray(coeffs, dtype=object) % ctx.Q
    out = np.empty((ctx.L,) + arr.shape, dtype=np.uint32)
    for j, p in enumerate(ctx.primes):
        out[j] = (arr % p).astype(np.uint32)
    return out


def from_rns(ctx: RNSContext, residues: np.ndarray) -> np.ndarray:
    """Residues [L, ...] -> object-int array of values in [0, Q) (CRT)."""
    Q = ctx.Q
    acc = np.zeros(residues.shape[1:], dtype=object)
    for j, p in enumerate(ctx.primes):
        Qj = Q // p
        inv = pow(Qj % p, -1, p)
        acc = (acc + residues[j].astype(object) * inv % p * Qj) % Q
    return acc


def centered(ctx: RNSContext, values: np.ndarray) -> np.ndarray:
    Q = ctx.Q
    return np.where(values > Q // 2, values - Q, values)


def host_negacyclic_polymul(ctx: RNSContext, a, b) -> np.ndarray:
    """Exact big-int negacyclic product mod Q (keygen / test oracle)."""
    full = np.convolve(np.asarray(a, dtype=object), np.asarray(b, dtype=object))
    out = full[: ctx.N].copy()
    out[: ctx.N - 1] -= full[ctx.N:]
    return out % ctx.Q


# ---------------------------------------------------------------------------
# device limb ops (residues [L, ..., N])
# ---------------------------------------------------------------------------

def _per_limb(ctx: RNSContext, fn) -> jax.Array:
    return jnp.stack([fn(j) for j in range(ctx.L)], axis=0)


def add(ctx: RNSContext, a: jax.Array, b: jax.Array) -> jax.Array:
    return _per_limb(ctx, lambda j: mm.modadd(a[j], b[j], ctx.primes[j]))


def sub(ctx: RNSContext, a: jax.Array, b: jax.Array) -> jax.Array:
    return _per_limb(ctx, lambda j: mm.modsub(a[j], b[j], ctx.primes[j]))


def neg(ctx: RNSContext, a: jax.Array) -> jax.Array:
    return _per_limb(
        ctx, lambda j: mm.modsub(jnp.zeros_like(a[j]), a[j], ctx.primes[j])
    )


def ntt_fwd(ctx: RNSContext, a: jax.Array) -> jax.Array:
    return _per_limb(ctx, lambda j: nttm.ntt_fwd(ctx.plans[j], a[j]))


def ntt_inv(ctx: RNSContext, a: jax.Array) -> jax.Array:
    return _per_limb(ctx, lambda j: nttm.ntt_inv(ctx.plans[j], a[j]))


def spec_mul(ctx: RNSContext, a_spec: jax.Array,
             b_spec: jax.Array) -> jax.Array:
    return _per_limb(
        ctx, lambda j: nttm.pointwise_mul(ctx.plans[j], a_spec[j], b_spec[j])
    )


def spec_mul_mont(ctx: RNSContext, a_spec: jax.Array,
                  b_mont_spec: jax.Array) -> jax.Array:
    """Pointwise with the second operand pre-scaled to Montgomery form."""
    return _per_limb(
        ctx, lambda j: mm.mont_mul(a_spec[j], b_mont_spec[j], ctx.plans[j].ctx)
    )


def to_mont(ctx: RNSContext, a: jax.Array) -> jax.Array:
    return _per_limb(ctx, lambda j: mm.to_mont(a[j], ctx.plans[j].ctx))


def polymul(ctx: RNSContext, a: jax.Array, b: jax.Array) -> jax.Array:
    """Negacyclic product mod Q: residues [L, ..., N] x same -> same."""
    return ntt_inv(ctx, spec_mul(ctx, ntt_fwd(ctx, a), ntt_fwd(ctx, b)))


# ---------------------------------------------------------------------------
# RLWE key switch with the CRT gadget
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RnsKeySwitchKey:
    """ksk_a/ksk_b: [L_digit, L_limb, N] uint32 NTT-domain spectra in
    MONTGOMERY form; row j encrypts s2 * Qhat_j under s1:
        beta_j = alpha_j * s1 + e_j + Qhat_j * s2  (mod Q).
    """

    ctx: RNSContext
    ksk_a: np.ndarray
    ksk_b: np.ndarray


def keyswitch_keygen(
    ctx: RNSContext,
    s1: np.ndarray,   # [N] small (binary) destination key
    s2: np.ndarray,   # [N] small source key
    rng: np.random.Generator,
    err_std: float = 3.2,
) -> RnsKeySwitchKey:
    Q = ctx.Q
    ksk_a = np.empty((ctx.L, ctx.L, ctx.N), dtype=np.uint32)
    ksk_b = np.empty((ctx.L, ctx.L, ctx.N), dtype=np.uint32)
    for j, p in enumerate(ctx.primes):
        Qhat = Q // p
        # independent uniform residues per limb == uniform mod Q (CRT)
        a_res = np.stack(
            [rng.integers(0, pi, ctx.N).astype(np.uint32)
             for pi in ctx.primes], axis=0,
        )
        alpha = from_rns(ctx, a_res)
        e = np.rint(rng.normal(0, err_std, ctx.N)).astype(int)
        beta = (
            host_negacyclic_polymul(ctx, alpha, s1)
            + np.asarray(e, dtype=object)
            + Qhat * np.asarray(s2, dtype=object)
        ) % Q
        b_res = to_rns(ctx, beta)
        for i in range(ctx.L):
            plan = ctx.plans[i]
            sa = np.asarray(nttm.ntt_fwd(plan, jnp.asarray(a_res[i])))
            sb = np.asarray(nttm.ntt_fwd(plan, jnp.asarray(b_res[i])))
            R = (1 << 32) % ctx.primes[i]
            ksk_a[j, i] = (sa.astype(np.uint64) * R % ctx.primes[i]).astype(
                np.uint32)
            ksk_b[j, i] = (sb.astype(np.uint64) * R % ctx.primes[i]).astype(
                np.uint32)
    return RnsKeySwitchKey(ctx, ksk_a, ksk_b)


def gadget_digits(ctx: RNSContext, a: jax.Array) -> jax.Array:
    """CRT gadget digits of a [L, N]: returns [L_digit, L_limb, N] where
    digit j is d_j = centered([a_j * Qhat_j^-1]_{p_j}) re-reduced mod every
    limb. All device ops, limb-local except the broadcast."""
    Q = ctx.Q
    out = []
    for j, p in enumerate(ctx.primes):
        inv = pow((Q // p) % p, -1, p)
        ctxj = ctx.plans[j].ctx
        # (a_j * inv) mod p via Montgomery with the constant pre-scaled by R
        inv_mont = (inv * ctxj.r_mod_p) % p
        dj = mm.mont_mul(a[j], jnp.asarray(inv_mont, dtype=U32), ctxj)
        half = p // 2
        limbs = []
        for i, pi in enumerate(ctx.primes):
            if i == j:
                limbs.append(dj)
                continue
            ctxi = ctx.plans[i].ctx
            pos = mm.barrett_u32(dj, pi, ctxi.mu)
            neg_ = mm.modsub(pos, jnp.asarray(p % pi, dtype=U32), pi)
            limbs.append(jnp.where(dj > U32(half), neg_, pos))
        out.append(jnp.stack(limbs, axis=0))
    return jnp.stack(out, axis=0)  # [L_digit, L_limb, N]


def key_switch(ctx: RNSContext, ksk: RnsKeySwitchKey,
               ct: jax.Array) -> jax.Array:
    """Switch RLWE ct [2, L, N] (a, b) from key s2 to key s1.

    out = ( -sum_j d_j (x) alpha_j,  b - sum_j d_j (x) beta_j ):
    phase' = b' - a'*s1 = b - sum_j d_j (e_j + Qhat_j s2)
           = phase(ct) - sum_j d_j e_j.
    """
    a, b = ct[0], ct[1]
    digits = gadget_digits(ctx, a)  # [L_digit, L, N]
    acc_a = None
    acc_b = None
    for j in range(ctx.L):
        d_spec = ntt_fwd(ctx, digits[j])
        pa = spec_mul_mont(ctx, d_spec, jnp.asarray(ksk.ksk_a[j]))
        pb = spec_mul_mont(ctx, d_spec, jnp.asarray(ksk.ksk_b[j]))
        acc_a = pa if acc_a is None else add(ctx, acc_a, pa)
        acc_b = pb if acc_b is None else add(ctx, acc_b, pb)
    sum_a = ntt_inv(ctx, acc_a)
    sum_b = ntt_inv(ctx, acc_b)
    return jnp.stack([neg(ctx, sum_a), sub(ctx, b, sum_b)], axis=0)
