"""Batched TFHE gate bootstrapping on device: blind rotation (GINX/CMux),
sample extraction and key switching — exact uint32 math, bit-identical to
`core.reference`.

The blind rotation is a `lax.scan` over the n bootstrapping-key bits; each
step applies, to the whole ciphertext batch at once:

    acc <- acc + BSK_i  (x)  (X^{a~_i} * acc - acc)

The external product's negacyclic polynomial products are evaluated by a
pluggable engine:

- ``gather_u32``: gather-built Toeplitz + u32 einsum. Correct everywhere
  (CPU tests), not MXU-friendly.
- ``conv_i8``: int8-limb correlation via lax.conv — the XLA/MXU path. The
  Toeplitz structure is expressed as a convolution so XLA's conv lowering
  feeds the MXU without materializing N x N matrices.
- ``pallas``: fused Pallas kernel (see ops/pallas/), the TPU flagship path.

Throughput comes from the batch axis: one blind rotation bootstraps B
ciphertexts, replacing B worker `map` rpcs of the reference coordinator
(reference src/execution/worker/grpc/grpc_worker_group.cpp:85-94).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops import poly
from herdsman_tpu.ops.decomp import signed_decompose
from herdsman_tpu.ops.server_key import DeviceServerKey

U32 = jnp.uint32
I32 = jnp.int32
I8 = jnp.int8

BOOL_MU = 1 << 29  # q/8


# ---------------------------------------------------------------------------
# External-product engines
# ---------------------------------------------------------------------------

def _ep_gather_u32(p: TFHEParams, digits: jax.Array,
                   bsk_ext_i: jax.Array) -> jax.Array:
    """digits [B, R, N] i32, bsk_ext_i [R, k+1, 2N] u32 -> [B, k+1, N] u32."""
    T = poly.negacyclic_toeplitz(bsk_ext_i[..., : p.N])  # [R, k+1, N, N]
    d = digits.astype(U32)
    return jnp.einsum("brn,rknc->bkc", d, T)


def _ep_conv_i8(p: TFHEParams, digits: jax.Array,
                bsk_conv_i: jax.Array) -> jax.Array:
    """Int8-limb MXU engine via conv. bsk_conv_i: [R, (k+1)*4, 2N-1] i8."""
    d8 = digits.astype(I8)  # [B, R, N]; |digit| <= Bg/2 <= 128
    out = jax.lax.conv_general_dilated(
        d8,
        bsk_conv_i,
        window_strides=(1,),
        padding=[(p.N - 1, p.N - 1)],
        dimension_numbers=("NCH", "IOH", "NCH"),
        preferred_element_type=I32,
    )  # [B, (k+1)*4, N] i32
    out = out.reshape(out.shape[0], p.k + 1, 4, p.N)
    return poly.from_i32_limb_partials(jnp.moveaxis(out, 2, -1))


# engine name -> (fn(params, digits, bsk_i), which key layout it consumes)
ENGINES: dict[str, tuple[Callable, str]] = {
    "gather_u32": (_ep_gather_u32, "bsk_ext"),
    "conv_i8": (_ep_conv_i8, "bsk_conv"),
}

# whole-step engines: fn(params, acc, a_i, bsk_i) -> new acc (kernels that
# fuse rotate+decompose+external-product+accumulate)
STEP_ENGINES: dict[str, tuple[Callable, str]] = {}

# whole-rotation engines: fn(params, acc0, a_t, bsk) -> final acc (a single
# kernel owning the entire n-step loop; no lax.scan)
ROTATION_ENGINES: dict[str, tuple[Callable, str]] = {}


def _register_pallas_engine(engine: str = "") -> None:
    # Imported lazily: pallas engines self-register.
    from herdsman_tpu.ops.pallas import blind_rotate as _  # noqa: F401
    from herdsman_tpu.ops.pallas import mega as _mega  # noqa: F401

    if (engine and engine not in ROTATION_ENGINES
            and engine not in STEP_ENGINES and engine not in ENGINES):
        # superseded engines (mega1-6, 9, 10) live in the archive module —
        # loaded only when explicitly requested (round-4; VERDICT r3 #5)
        from herdsman_tpu.ops.pallas import legacy as _legacy  # noqa: F401


# ---------------------------------------------------------------------------
# Bootstrap pipeline
# ---------------------------------------------------------------------------

def mod_switch_2N(p: TFHEParams, ct: jax.Array,
                  coarse_bits: int = 0) -> jax.Array:
    """Round LWE coords from q=2^32 to 2N: [..., n+1] u32 -> i32 in [0, 2N).

    `coarse_bits` = log2(k) rounds to multiples of k instead (the
    reduced-precision modulus switch of many-LUT PBS: rotation lands on
    every k-th coefficient so k interleaved LUTs can be extracted from one
    blind rotation)."""
    shift = 32 - (p.log2_2N + 1) + coarse_bits
    r = ct >> U32(shift)
    idx = ((r + U32(1)) >> U32(1)).astype(I32) & I32(
        (p.two_N >> coarse_bits) - 1)
    return idx << coarse_bits if coarse_bits else idx


def blind_rotate_batch(
    dsk: DeviceServerKey,
    ct: jax.Array,
    test_poly: jax.Array,
    engine: str = "conv_i8",
    unroll: bool = False,
    coarse_bits: int = 0,
) -> jax.Array:
    """GINX blind rotation of a batch. ct [B, n+1] u32 -> acc [B, k+1, N] u32."""
    p = dsk.params
    if engine.startswith("pallas"):
        _register_pallas_engine(engine)
    step_mode = engine in STEP_ENGINES
    rotation_mode = engine in ROTATION_ENGINES
    if rotation_mode:
        rot_fn, key_layout = ROTATION_ENGINES[engine]
    elif step_mode:
        step_fn, key_layout = STEP_ENGINES[engine]
    else:
        ep, key_layout = ENGINES[engine]
    bsk = getattr(dsk, key_layout)
    B0 = ct.shape[0]
    if (step_mode or rotation_mode) and B0 > 128 and B0 % 128:
        pad = (-B0) % 128
        ct = jnp.concatenate(
            [ct, jnp.zeros((pad, ct.shape[1]), dtype=ct.dtype)], axis=0
        )
    B = ct.shape[0]
    tilde = mod_switch_2N(p, ct, coarse_bits)  # [B, n+1]
    a_t = tilde[:, : p.n]
    b_t = tilde[:, p.n]

    body = poly.negacyclic_monomial_mul(
        jnp.broadcast_to(test_poly.astype(U32), (B, p.N)),
        (I32(p.two_N) - b_t) & I32(p.two_N - 1),
    )
    acc0 = jnp.concatenate(
        [jnp.zeros((B, p.k, p.N), dtype=U32), body[:, None, :]], axis=1
    )

    if rotation_mode:
        return rot_fn(p, acc0, a_t.T, bsk)[:B0]

    if step_mode:
        def step(acc, xs):
            bsk_i, a_i = xs
            return step_fn(p, acc, a_i, bsk_i), None
    else:
        def step(acc, xs):
            bsk_i, a_i = xs
            rot = poly.negacyclic_monomial_mul(acc, a_i[:, None])
            diff = rot - acc
            digits = signed_decompose(diff, p.bg_bits, p.levels)
            digits = jnp.moveaxis(digits, -1, 2).reshape(B, dsk.R, p.N)
            prod = ep(p, digits, bsk_i)
            return acc + prod, None

    if unroll:
        # Python-loop variant: identical math, no lax.scan. Used for CPU
        # tests of Pallas engines (interpret-mode pallas inside scan is
        # pathologically slow to compile) and for step-level debugging.
        acc = acc0
        for i in range(p.n):
            acc, _ = step(acc, (bsk[i], a_t.T[i]))
        return acc[:B0]
    acc, _ = jax.lax.scan(step, acc0, (bsk, a_t.T))
    return acc[:B0]


def sample_extract_batch(p: TFHEParams, acc: jax.Array,
                         offset: int = 0) -> jax.Array:
    """Extract coeff `offset`: [B, k+1, N] u32 -> LWE [B, kN+1] u32.

    Coefficient j of a * s is sum_i a[(j - i) mod N] * s[i] with the
    negacyclic sign (+ for i <= j, - for i > j)."""
    a_polys = acc[:, : p.k, :]  # [B, k, N]
    if offset == 0:
        first = a_polys[..., :1]
        rest = jnp.zeros_like(a_polys[..., :0:-1]) - a_polys[..., :0:-1]
        a_out = jnp.concatenate([first, rest], axis=-1)
    else:
        rev = a_polys[..., ::-1]
        rolled = jnp.roll(rev, offset + 1, axis=-1)  # [i] = a[(j - i) mod N]
        keep = (jnp.arange(p.N) <= offset)
        a_out = jnp.where(keep, rolled, jnp.zeros_like(rolled) - rolled)
    a_out = a_out.reshape(acc.shape[0], p.kN)
    b_out = acc[:, p.k, offset:offset + 1]
    return jnp.concatenate([a_out, b_out], axis=-1)


def key_switch_batch(dsk: DeviceServerKey, ct: jax.Array) -> jax.Array:
    """Switch extracted LWEs to the n-key: [B, kN+1] u32 -> [B, n+1] u32.

    One int8 MXU matmul: digits [B, kN*t] x ksk_limbs [kN*t, (n+1)*4].
    BALANCED signed digits (see core.reference.key_switch): kills the
    KSK-noise sample-mean bias and cuts the KS variance ~3x vs unsigned.
    """
    p = dsk.params
    B = ct.shape[0]
    a = ct[:, : p.kN]
    b = ct[:, p.kN]
    digits = signed_decompose(a, p.ks_base_bits, p.ks_levels)  # [B, kN, t]
    d8 = digits.reshape(B, p.kN * p.ks_levels).astype(I8)
    partial = jnp.dot(d8, dsk.ksk_limbs, preferred_element_type=I32)
    partial = partial.reshape(B, p.n + 1, 4)
    contrib = poly.from_i32_limb_partials(partial)  # [B, n+1] u32
    out = jnp.zeros((B, p.n + 1), dtype=U32).at[:, p.n].set(b)
    return out - contrib


def make_test_poly(p: TFHEParams, mu: int = BOOL_MU) -> jax.Array:
    return jnp.full((p.N,), jnp.asarray(mu & 0xFFFFFFFF, dtype=U32))


@functools.partial(jax.jit, static_argnames=("engine", "unroll"))
def bootstrap_raw_batch(
    dsk: DeviceServerKey, ct: jax.Array, test_poly: jax.Array,
    engine: str = "conv_i8", unroll: bool = False,
) -> jax.Array:
    """blind rotate + extract (no key switch): [B, n+1] -> [B, kN+1]."""
    acc = blind_rotate_batch(dsk, ct, test_poly, engine=engine, unroll=unroll)
    return sample_extract_batch(dsk.params, acc)


@functools.partial(jax.jit, static_argnames=("engine", "unroll"))
def bootstrap_bool_batch(
    dsk: DeviceServerKey, ct: jax.Array, engine: str = "conv_i8",
    unroll: bool = False,
) -> jax.Array:
    """Full sign bootstrap back to the n-LWE key: [B, n+1] -> [B, n+1]."""
    p = dsk.params
    raw = bootstrap_raw_batch(dsk, ct, make_test_poly(p), engine=engine,
                              unroll=unroll)
    return key_switch_batch(dsk, raw)
