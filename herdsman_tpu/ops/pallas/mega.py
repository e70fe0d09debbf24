"""The mega-kernel: an ENTIRE GINX blind rotation in one pallas_call.

Grid (batch-chunk, step i, phase j): for each of the n CMux steps, phase
j = 0 rotates the VMEM-resident accumulator by the per-row amount a~_i and
writes gadget digits to a VMEM scratch; phases j = 1..R run the
external-product MXU contraction for GGSW row j-1 against the streamed
block-Toeplitz key blocks; the last phase recombines limbs and adds into
the accumulator. The accumulator NEVER leaves VMEM during the whole
rotation — HBM traffic is exactly: the bootstrapping key streamed once per
batch-chunk, plus one read of acc0 and one write of the result. There are
no per-step kernel launches, no scan glue, no intermediate arrays.

On the kernel-variant near-duplication: each variant's kernel body IS the
experiment — the textual op order, digit pack order, scratch topology and
dot shape are exactly what the within-session A/Bs measure (BENCH_LOG
sessions 4-6), so the rotate/decompose blocks are deliberately NOT
factored into a shared helper whose refactors would silently perturb every
measured engine at once. Bit-exactness of every variant against
core.reference is enforced per-engine in tests/test_ops_bitexact.py.

This module holds only the SURVIVING tiers: mega7/mega8 (bench fallback
chain) and mega11..mega14 (the headline class). Superseded variants
(mega1-6, 9, 10) are archived in ops/pallas/legacy.py as
measured-negative records, registered lazily on request and tested behind
``pytest -m legacy``.
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

_ablate_warned: set[str] = set()


def _ablate_knob() -> str:
    """HERDSMAN_MEGA_ABLATE, gated LOUDLY: the ablation modes (rot1,
    nodigits, nocombine, nodot) are PROBE-ONLY — they deliberately produce
    INVALID ciphertexts so scripts/mega_variants.py can time kernel
    sections.  A stray value left in the environment of a production run
    would silently corrupt every bootstrap (round-2 advisor finding), so
    any non-empty value logs a warning once per distinct value."""
    import logging
    import os

    ablate = os.environ.get("HERDSMAN_MEGA_ABLATE", "")
    if ablate and ablate not in _ablate_warned:
        _ablate_warned.add(ablate)
        logging.getLogger("herdsman.mega").warning(
            "HERDSMAN_MEGA_ABLATE=%s is active: blind-rotation outputs are "
            "INVALID ciphertexts (probe-only ablation mode) — results are "
            "non-production", ablate)
    return ablate


def _neg_shift(v, s, N):
    return jnp.concatenate(
        [jnp.zeros_like(v[:, N - s:]) - v[:, N - s:], v[:, : N - s]], axis=-1
    )


def _neg_shift_nd(v, s, N):
    """_neg_shift over the LAST axis for any rank (mega10's fused 3D
    stream)."""
    return jnp.concatenate(
        [jnp.zeros_like(v[..., N - s:]) - v[..., N - s:], v[..., : N - s]],
        axis=-1,
    )



def _mega7_kernel(a_ref, acc0_ref, btj_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int):
    """mega-v7: mega6's staggering + PACKED digits.

    The j-major contraction (`_ep_column_total_jmajor`) re-concatenates up
    to HALF*R digit tiles into a fresh [Bt, K] i8 operand for EVERY column
    tile — the same digit data is copied HALF times per chunk-step.  Here
    the decompose writes ONE [Bt, HALF*R*P] buffer ordered (sub descending,
    r minor); each column tile's positive and negative runs are then
    contiguous slices of that buffer (`_ep_column_total_jmajor_packed`),
    so digit data is materialized exactly once per chunk-step.
    """
    from herdsman_tpu.ops.pallas.blind_rotate import (
        _ep_column_total_jmajor_packed,
    )

    i = pl.program_id(1)
    Bt = acc_sc.shape[2]

    @pl.when(i == 0)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                acc_sc[g, c] = acc0_ref[g * Bt:(g + 1) * Bt, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj_ref.shape[-1]
    btj_flat = btj_ref[0].reshape(HALF * R * P, C4P)

    def compute_digits(g):
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        tiles: dict[tuple[int, int], jax.Array] = {}
        for c in range(p.k + 1):
            v = acc_sc[g, c]
            rolled = v
            for bit in range(p.log2_2N):
                s = 1 << bit
                shifted = (
                    _neg_shift(rolled, s, p.N) if s < p.N
                    else jnp.zeros_like(rolled) - rolled
                )
                take_bit = (r_amt >> U32(bit)) & U32(1)
                mask = (U32(0) - take_bit)[:, None]
                rolled = jnp.where(
                    jnp.broadcast_to(mask, rolled.shape) != U32(0),
                    shifted, rolled)
            diff = rolled - v
            val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
                + U32(offset)
            for lev in range(p.levels):
                shift = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[:, sub * P:(sub + 1) * P]
        # pack once: (sub descending, r minor) -> [Bt, HALF*R*P]
        return jnp.concatenate(
            [tiles[(r, sub)]
             for sub in range(HALF - 1, -1, -1) for r in range(R)],
            axis=-1,
        )

    def combine_into(g, ct, total):
        a = total.reshape(total.shape[0], p.k + 1, 4, P).astype(U32)
        for c in range(p.k + 1):
            combined = (
                a[:, c, 0, :]
                + (a[:, c, 1, :] << U32(8))
                + (a[:, c, 2, :] << U32(16))
                + (a[:, c, 3, :] << U32(24))
            )
            acc_sc[g, c, :, ct * P:(ct + 1) * P] = (
                acc_sc[g, c, :, ct * P:(ct + 1) * P] + combined
            )

    def do_dots(g, D):
        prev = None
        for ct in range(HALF):
            total = _ep_column_total_jmajor_packed(D, btj_flat, ct, P,
                                                   HALF, R)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_digits(0)
    for g in range(G):
        D_next = compute_digits(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega7_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj: jax.Array) -> jax.Array:
    """Same contract (and block geometry) as mega5/mega6_blind_rotate."""
    import os
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    Bt = B if B <= 128 else 128
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (8 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega7_kernel, p=p, P=P, HALF=HALF, R=R, G=G),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Bt, p.k + 1, p.N), lambda bo, i: (bo, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, HALF, R, P, C4P),
                lambda bo, i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G * Bt, p.k + 1, p.N),
                               lambda bo, i: (bo, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, Bt, p.N), U32),       # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0, bsk_btj)


def _mega8_kernel(a_ref, acc0_ref, btj2_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int,
                  ablate: str = "", defer: bool = False):
    """mega-v8: ONE MXU dot per column tile with a STATIONARY digit
    operand and a SLIDING key window.

    The ``bsk_btj2`` layout stores all 2*HALF negacyclic diagonal groups
    in window order (group g = diagonal block (HALF-1-g) mod 2*HALF; the
    negated blocks come from ext[t+N] = -ext[t] at key prep, so no i8
    negation happens anywhere).  Column tile ct's whole contraction —
    positive AND negative runs — is then

        total = D @ btj2_flat[(HALF-1-ct)*R*P : (2*HALF-1-ct)*R*P]

    with D the [Bt, HALF*R*P] digit buffer ordered (sub ASCENDING, r
    minor), packed once per chunk-step.  vs mega7: half the dot count, no
    i32 subtract, no per-tile digit slicing; cost: 2x key bytes
    (6.4 GiB at STD128_FAST — fits v5e; at N=2048 shortint params it does
    not, keep mega7 there).
    """
    i = pl.program_id(1)
    Bt = acc_sc.shape[2]

    @pl.when(i == 0)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                acc_sc[g, c] = acc0_ref[g * Bt:(g + 1) * Bt, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj2_ref.shape[-1]
    btj2_flat = btj2_ref[0].reshape(2 * HALF * R * P, C4P)

    def compute_digits(g):
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        tiles: dict[tuple[int, int], jax.Array] = {}
        for c in range(p.k + 1):
            v = acc_sc[g, c]
            rolled = v
            # probe-only ablation "rot1": a single barrel stage, isolating
            # the rotate cost as (full - rot1) * S/(S-1)
            nbits = 1 if ablate == "rot1" else p.log2_2N
            for bit in range(nbits):
                s = 1 << bit
                shifted = (
                    _neg_shift(rolled, s, p.N) if s < p.N
                    else jnp.zeros_like(rolled) - rolled
                )
                take_bit = (r_amt >> U32(bit)) & U32(1)
                mask = (U32(0) - take_bit)[:, None]
                rolled = jnp.where(
                    jnp.broadcast_to(mask, rolled.shape) != U32(0),
                    shifted, rolled)
            diff = rolled - v
            val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
                + U32(offset)
            for lev in range(p.levels):
                shift = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[:, sub * P:(sub + 1) * P]
        # pack once: (sub ASCENDING = virtual row-tile, r minor)
        return jnp.concatenate(
            [tiles[(r, sub)] for sub in range(HALF) for r in range(R)],
            axis=-1,
        )

    def combine_into(g, ct, total):
        a = total.reshape(total.shape[0], p.k + 1, 4, P).astype(U32)
        for c in range(p.k + 1):
            combined = (
                a[:, c, 0, :]
                + (a[:, c, 1, :] << U32(8))
                + (a[:, c, 2, :] << U32(16))
                + (a[:, c, 3, :] << U32(24))
            )
            acc_sc[g, c, :, ct * P:(ct + 1) * P] = (
                acc_sc[g, c, :, ct * P:(ct + 1) * P] + combined
            )

    def cheap_consume(g, ct, total):
        # probe-only: keep EVERY output column live (a partial consume
        # lets XLA shrink the dot itself and fake the measurement)
        s = total[:, 0:P]
        for t in range(1, total.shape[-1] // P):
            s = s + total[:, t * P:(t + 1) * P]
        acc_sc[g, 0, :, ct * P:(ct + 1) * P] = (
            acc_sc[g, 0, :, ct * P:(ct + 1) * P] + s.astype(U32)
        )

    def do_dots(g, D):
        if ablate == "nodot":  # probe-only: consume all of D, no MXU
            s = D[:, 0:P]
            for t in range(1, HALF * R):
                s = s + D[:, t * P:(t + 1) * P]
            for c in range(p.k + 1):
                acc_sc[g, c, :, 0:P] = (
                    acc_sc[g, c, :, 0:P] + s.astype(U32)
                )
            return
        prev = None
        for ct in range(HALF):
            o = (HALF - 1 - ct) * R * P
            total = jnp.dot(D, btj2_flat[o:o + HALF * R * P],
                            preferred_element_type=I32)
            if ablate == "nocombine":
                cheap_consume(g, ct, total)
                continue
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        if ablate != "nocombine":
            combine_into(g, prev[0], prev[1])

    def dots_only(g, D):
        return [jnp.dot(D, btj2_flat[(HALF - 1 - ct) * R * P:
                                     (2 * HALF - 1 - ct) * R * P],
                        preferred_element_type=I32)
                for ct in range(HALF)]

    if defer:
        # chunk-deferred combines: issue ALL of chunk g's dots before doing
        # chunk g-1's combines + chunk g+1's rotate/decompose, so the MXU
        # queue always holds a full chunk of dots while the VPU works
        D = compute_digits(0)
        pend = None
        for g in range(G):
            totals = dots_only(g, D)
            if pend is not None:
                for ct in range(HALF):
                    combine_into(pend[0], ct, pend[1][ct])
            pend = (g, totals)
            D = compute_digits(g + 1) if g + 1 < G else None
        for ct in range(HALF):
            combine_into(pend[0], ct, pend[1][ct])
    else:
        D = compute_digits(0)
        for g in range(G):
            D_next = compute_digits(g + 1) if g + 1 < G else None
            do_dots(g, D)
            D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega8_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj2: jax.Array) -> jax.Array:
    """Same contract as mega5/6/7 but consuming the windowed ``bsk_btj2``
    key layout [n, 2*HALF, R, P, C4P].  HERDSMAN_MEGA_BT sets the chunk
    rows (default 128): bigger chunks halve the VPU op COUNT of the
    rotate/decompose stream at constant element volume — the residual
    non-MXU cost is spread over many small ops (BENCH_LOG session 6)."""
    import os
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (8 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    ablate = _ablate_knob()
    defer = os.environ.get("HERDSMAN_MEGA_DEFER", "") == "1"
    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega8_kernel, p=p, P=P, HALF=HALF, R=R, G=G,
                          ablate=ablate, defer=defer),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Bt, p.k + 1, p.N), lambda bo, i: (bo, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 2 * HALF, R, P, C4P),
                lambda bo, i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G * Bt, p.k + 1, p.N),
                               lambda bo, i: (bo, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, Bt, p.N), U32),       # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0, bsk_btj2)



def _mega11_kernel(a_ref, acc0_ref, btj2j_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, R: int, G: int,
                   ablate: str = "", extract: str = "base"):
    """mega-v11: mega10's fused-poly VPU stream + LIMB-MAJOR key columns.

    The ``bsk_btj2j`` layout orders output columns (j, c, q) instead of
    mega8/10's (c, j, q) — a free host-side permutation at key prep.  The
    limb recombine then slices WHOLE limb planes ([Bt, (k+1)*P] each) off
    the dot result and runs ONE shift/add chain for all polys instead of
    (k+1) narrow per-poly chains: 1/(k+1) the recombine op count at equal
    element volume.  The K2 ablations (docs/BENCH_LOG.md round 2) put the
    recombine at ~25 ms of the 141 ms batch — the second-largest non-MXU
    term after the decompose stream."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[2]
    kp1 = p.k + 1

    @pl.when(i == 0)
    def _():
        for g in range(G):
            for c in range(kp1):
                acc_sc[g, c] = acc0_ref[g * Bt:(g + 1) * Bt, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj2j_ref.shape[-1]
    btj2_flat = btj2j_ref[0].reshape(2 * HALF * R * P, C4P)
    KP = kp1 * P

    def compute_digits(g):
        if ablate == "nodigits":
            # probe-only: constant digits, no rotate/decompose/pack at all —
            # the dots+combine+grid floor
            return jnp.ones((Bt, HALF * R * P), dtype=I8)
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                    # [k+1, Bt, N] fused
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            shifted = (
                _neg_shift_nd(rolled, s, p.N) if s < p.N
                else jnp.zeros_like(rolled) - rolled
            )
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, :, None]    # [1, Bt, 1]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
            + U32(offset)
        if extract == "sx":
            # sign-extend extraction: one xor flips every digit's sign bit
            # ((d + half) mod Bg then ^half == the digit's two's-complement
            # byte), then each digit is a left-align + arithmetic right
            # shift — no mask, no subtract (EXACT, A/B candidate)
            xor_all = sum(half << (p.bg_bits * t) for t in range(p.levels))
            valx = (val ^ U32(xor_all)).astype(I32)
        tiles: dict[tuple[int, int], jax.Array] = {}
        for lev in range(p.levels):
            shift = p.bg_bits * (p.levels - 1 - lev)
            if extract == "sx":
                d8 = ((valx << I32(32 - shift - p.bg_bits))
                      >> I32(32 - p.bg_bits)).astype(I8)
            else:
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)            # [k+1, Bt, N]
            for c in range(kp1):
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[c, :, sub * P:(sub + 1) * P]
        return jnp.concatenate(
            [tiles[(r, sub)] for sub in range(HALF) for r in range(R)],
            axis=-1,
        )

    def combine_into(g, ct, total):
        a = total.astype(U32)                    # [Bt, C4P], cols (j, c, q)
        comb = (
            a[:, 0:KP]
            + (a[:, KP:2 * KP] << U32(8))
            + (a[:, 2 * KP:3 * KP] << U32(16))
            + (a[:, 3 * KP:4 * KP] << U32(24))
        )                                        # [Bt, (k+1)*P], cols (c, q)
        for c in range(kp1):
            acc_sc[g, c, :, ct * P:(ct + 1) * P] = (
                acc_sc[g, c, :, ct * P:(ct + 1) * P]
                + comb[:, c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        for ct in range(HALF):
            o = (HALF - 1 - ct) * R * P
            total = jnp.dot(D, btj2_flat[o:o + HALF * R * P],
                            preferred_element_type=I32)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_digits(0)
    for g in range(G):
        D_next = compute_digits(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(kp1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega11_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btj2j: jax.Array) -> jax.Array:
    """Same contract as mega8/10 but consuming the limb-major ``bsk_btj2j``
    key layout.  HERDSMAN_MEGA_ABLATE in {rot1, nodigits} are probe-only
    knobs; HERDSMAN_MEGA_EXTRACT=sx selects the (exact) sign-extend digit
    extraction."""
    import os
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (8 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    ablate = _ablate_knob()
    # sx (sign-extend) extraction is exact and measured faster (114.9 vs
    # 117.0 ms/batch same-session, docs/BENCH_LOG.md round 2)
    extract = os.environ.get("HERDSMAN_MEGA_EXTRACT", "sx")
    return pl.pallas_call(
        functools.partial(_mega11_kernel, p=p, P=P, HALF=HALF, R=R, G=G,
                          ablate=ablate, extract=extract),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Bt, p.k + 1, p.N), lambda bo, i: (bo, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 2 * HALF, R, P, C4P),
                lambda bo, i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G * Bt, p.k + 1, p.N),
                               lambda bo, i: (bo, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, Bt, p.N), U32),       # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0, bsk_btj2j)


def _mega12_kernel(a_ref, acc0_ref, btjj_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, R: int, G: int,
                   extract: str = "base"):
    """mega-v12: mega7's SINGLE-WIDTH two-dot contraction with mega11's
    limb-major recombine and mega10's fused-poly VPU stream.

    Purpose: the N = 2048 shortint/radix tier — the doubled windowed key
    of mega8/10/11 (~19 GiB there) does not fit HBM, but the recombine
    overhead GROWS with HALF (= 16 at N = 2048: 16 column tiles of narrow
    per-poly shift/add chains per chunk-step).  ``bsk_btjj`` is the btj
    layout with (j, c, q) output-column order (free at key prep), so the
    recombine slices whole limb planes exactly as mega11; digits are
    packed (sub DESCENDING, r minor) for the contiguous two-dot
    positive/negative runs of `_ep_column_total_jmajor_packed`.
    """
    from herdsman_tpu.ops.pallas.blind_rotate import (
        _ep_column_total_jmajor_packed,
    )

    i = pl.program_id(1)
    Bt = acc_sc.shape[2]
    kp1 = p.k + 1

    @pl.when(i == 0)
    def _():
        for g in range(G):
            for c in range(kp1):
                acc_sc[g, c] = acc0_ref[g * Bt:(g + 1) * Bt, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btjj_ref.shape[-1]
    btj_flat = btjj_ref[0].reshape(HALF * R * P, C4P)
    KP = kp1 * P

    def compute_digits(g):
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                    # [k+1, Bt, N] fused
        rolled = v
        for bit in range(p.log2_2N):
            s = 1 << bit
            shifted = (
                _neg_shift_nd(rolled, s, p.N) if s < p.N
                else jnp.zeros_like(rolled) - rolled
            )
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, :, None]    # [1, Bt, 1]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
            + U32(offset)
        if extract == "sx":
            xor_all = sum(half << (p.bg_bits * t) for t in range(p.levels))
            valx = (val ^ U32(xor_all)).astype(I32)
        tiles: dict[tuple[int, int], jax.Array] = {}
        for lev in range(p.levels):
            shift = p.bg_bits * (p.levels - 1 - lev)
            if extract == "sx":
                d8 = ((valx << I32(32 - shift - p.bg_bits))
                      >> I32(32 - p.bg_bits)).astype(I8)
            else:
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)            # [k+1, Bt, N]
            for c in range(kp1):
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[c, :, sub * P:(sub + 1) * P]
        # pack once: (sub DESCENDING, r minor) -> [Bt, HALF*R*P]
        return jnp.concatenate(
            [tiles[(r, sub)]
             for sub in range(HALF - 1, -1, -1) for r in range(R)],
            axis=-1,
        )

    def combine_into(g, ct, total):
        a = total.astype(U32)                    # [Bt, C4P], cols (j, c, q)
        comb = (
            a[:, 0:KP]
            + (a[:, KP:2 * KP] << U32(8))
            + (a[:, 2 * KP:3 * KP] << U32(16))
            + (a[:, 3 * KP:4 * KP] << U32(24))
        )                                        # [Bt, (k+1)*P], cols (c, q)
        for c in range(kp1):
            acc_sc[g, c, :, ct * P:(ct + 1) * P] = (
                acc_sc[g, c, :, ct * P:(ct + 1) * P]
                + comb[:, c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        for ct in range(HALF):
            total = _ep_column_total_jmajor_packed(D, btj_flat, ct, P,
                                                   HALF, R)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_digits(0)
    for g in range(G):
        D_next = compute_digits(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(kp1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega12_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btjj: jax.Array) -> jax.Array:
    """Same contract/geometry as mega7 but limb-major key columns."""
    import os
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (8 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    extract = os.environ.get("HERDSMAN_MEGA_EXTRACT", "sx")
    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega12_kernel, p=p, P=P, HALF=HALF, R=R, G=G,
                          extract=extract),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Bt, p.k + 1, p.N), lambda bo, i: (bo, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, HALF, R, P, C4P),
                lambda bo, i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((G * Bt, p.k + 1, p.N),
                               lambda bo, i: (bo, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, Bt, p.N), U32),       # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0, bsk_btjj)


def _mega13_kernel(a_ref, acc0_ref, btT_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, PT: int, G: int,
                   S: int = 1, ablate: str = "", order: str = "g"):
    """mega-v13: TRANSPOSED accumulator + bitcast digit stream.

    The accumulator lives as [k+1, N(sublanes), Bt(lanes)] — the layout
    that makes ``pltpu.bitcast(u32 -> i8)``'s sublane expansion land the
    gadget digit bytes directly on the dot's contraction axis.  The whole
    decompose/pack stream of mega7..12 (per-level shift extraction + the
    HALF*R tile re-concat, the ~25-33 ms residue of BENCH_LOG round 2)
    collapses to: one rounding shift, one mask/shift/or packing the
    coefficient pair (r, r + N/2) into each u32, one xor (the sx
    sign-extend trick), one bitcast.  The key's contraction axis is
    reordered to match at prep time (``bsk_btT``) — free.

    Requires bg_bits == 8, levels == 2 (byte-aligned digits), N >= 2P.
    Bit-exactness vs core.reference is enforced in
    tests/test_ops_bitexact.py like every other engine."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[3]
    kp1 = p.k + 1
    W = p.bg_bits * p.levels  # = 16
    KP = kp1 * P              # rows per limb plane of the dot result
    WIN = PT * 4 * P          # contraction window length per c_in

    @pl.when(i == 0)
    def _():
        for g in range(G):
            acc_sc[g] = acc0_ref[:, :, g * Bt:(g + 1) * Bt]

    def compute_digits(g, st):
        if ablate in ("nodigits", "dotsonly"):
            return jnp.ones((kp1, 4 * (p.N // 2), Bt), dtype=I8)
        r_amt = a_ref[st, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                # [k+1, N, Bt]
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            if s < p.N:
                top = rolled[:, p.N - s:, :]
                shifted = jnp.concatenate(
                    [jnp.zeros_like(top) - top, rolled[:, : p.N - s, :]],
                    axis=1,
                )
            else:
                shifted = jnp.zeros_like(rolled) - rolled
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, None, :]    # [1, 1, Bt]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        # balanced offset (0x8080 at bg=8, l=2) then the per-byte ^0x80 of
        # the sx sign-extend trick — each byte becomes the two's-complement
        # signed digit, ready for the MXU as-is after the bitcast
        half = 1 << (p.bg_bits - 1)
        offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
        lo = val[:, : p.N // 2, :] & U32(0xFFFF)
        hi = val[:, p.N // 2:, :] << U32(16)
        packed = (lo | hi) ^ U32(0x80808080)         # [k+1, N/2, Bt]
        return pltpu.bitcast(packed, jnp.int8)       # [k+1, 2N, Bt]

    def do_dot(D, ct, st):
        o = (HALF - 1 - ct) * 4 * P
        total = None
        for c in range(kp1):
            part = jnp.dot(btT_ref[st, c, :, o:o + WIN], D[c],
                           preferred_element_type=I32)
            total = part if total is None else total + part
        return total                                  # [C4P, Bt] i32

    def combine_into(g, ct, total):
        a = total.astype(U32)                         # rows (j, c, q)
        if ablate in ("nocombine", "dotsonly"):
            # probe: keep the dots live (the write consumes them) but skip
            # the limb-recombine shift/add chain — prices the combine's
            # non-overlapped share; outputs are INVALID
            for c in range(kp1):
                acc_sc[g, c, ct * P:(ct + 1) * P, :] = a[c * P:(c + 1) * P]
            return
        comb = (
            a[0:KP]
            + (a[KP:2 * KP] << U32(8))
            + (a[2 * KP:3 * KP] << U32(16))
            + (a[3 * KP:4 * KP] << U32(24))
        )                                             # [KP, Bt], rows (c, q)
        for c in range(kp1):
            acc_sc[g, c, ct * P:(ct + 1) * P, :] = (
                acc_sc[g, c, ct * P:(ct + 1) * P, :]
                + comb[c * P:(c + 1) * P]
            )

    def do_dots(g, D, st):
        prev = None
        tiles = 1 if ablate == "onedot" else HALF  # probe: 1/HALF the dots
        for ct in range(tiles):
            total = do_dot(D, ct, st)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    for st in range(S):
        if order == "ct":
            # ct-OUTER order (HERDSMAN_MEGA_ORDER=ct, round-4 probe): all
            # G group dots sharing one key slice run back-to-back
            # (weight-stationary MXU) — targets the measured dot-section
            # residual; all digit streams are computed upfront (~3.5 ms,
            # G * [k+1, 2N, Bt] i8 = ~13 MB VMEM at G=16).  Bit-exact:
            # each (g, ct) writes a distinct acc slice.
            Ds = [compute_digits(g, st) for g in range(G)]
            prev = None
            for ct in range(1 if ablate == "onedot" else HALF):
                for g in range(G):
                    total = do_dot(Ds[g], ct, st)
                    if prev is not None:
                        combine_into(prev[0], prev[1], prev[2])
                    prev = (g, ct, total)
            combine_into(prev[0], prev[1], prev[2])
        else:
            D = compute_digits(0, st)
            for g in range(G):
                D_next = compute_digits(g + 1, st) if g + 1 < G else None
                do_dots(g, D, st)
                D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            out_ref[:, :, g * Bt:(g + 1) * Bt] = acc_sc[g]


def mega13_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btT: jax.Array) -> jax.Array:
    """Same contract as mega11/12, consuming the transposed ``bsk_btT``
    key layout; the [B, k+1, N] <-> [k+1, N, B] transposes happen ONCE per
    batch outside the kernel (XLA transpose, negligible vs the n-step
    rotation)."""
    import os
    p = params
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 2, \
        "mega13 needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N >= 2 * P, "mega13 needs N >= 2P (pair packing)"
    PT = p.N // (2 * P)
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    KEXT = bsk_btT.shape[-1]
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    # BO=1 whenever the whole batch's group accumulators fit VMEM: with
    # the VPU stream nearly free, one key pass + more group chains beat
    # mega8's G=16 VMEM collapse — measured +17.8% at B=2048/G=16
    # (docs/BENCH_LOG.md round 3)
    G = int(g_env) if g_env else max(1, min(BC, (13 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("HERDSMAN_MEGA_VMEM",
                                                100 * 1024 * 1024)),
        )
    ablate = _ablate_knob()
    # STEPS=S: S CMux steps per grid cell (key block grows S-fold, cell
    # count shrinks S-fold — probes the per-cell overhead share)
    S = int(os.environ.get("HERDSMAN_MEGA_STEPS", "1"))
    assert p.n % S == 0, "n must divide by STEPS"
    acc0_T = jnp.transpose(acc0, (1, 2, 0))          # [k+1, N, B]
    out_T = pl.pallas_call(
        functools.partial(_mega13_kernel, p=p, P=P, HALF=HALF, PT=PT, G=G,
                          S=S, ablate=ablate,
                          order=os.environ.get("HERDSMAN_MEGA_ORDER", "g")),
        grid=(BO, p.n // S),
        in_specs=[
            pl.BlockSpec((S, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k + 1, p.N, G * Bt), lambda bo, i: (0, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, p.k + 1, C4P, KEXT),
                         lambda bo, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.k + 1, p.N, G * Bt),
                               lambda bo, i: (0, 0, bo),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.k + 1, p.N, B), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, p.N, Bt), U32),   # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0_T, bsk_btT)
    return jnp.transpose(out_T, (2, 0, 1))


def _mega14_kernel(a_ref, acc0_ref, btT2_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, PT: int, G: int,
                   ablate: str = ""):
    """mega-v14: mega13 with a PT-MAJOR digit stream — ONE dot per output
    column tile.

    mega13 pays (k+1) dots + k full-size [C4P, Bt] i32 adds per tile
    because its bitcast stream is c_in-major while the window slides in
    pair-tile units.  Here the packed u32 stream is reordered
    [k+1, PT, P, Bt] -> [PT, k+1, P, Bt] BEFORE the bitcast — an
    outer-dim transpose (vreg relabeling, no lane/sublane shuffles) of
    N/2-volume — so the byte stream is already (pt, c_in, w, byte) and
    the whole contraction is one [C4P, PT*(k+1)*4P] x [.., Bt] dot
    against the ``bsk_btT2`` window.  Removes 2/3 of the dot-result VPU
    add traffic at equal MXU work."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[3]
    kp1 = p.k + 1
    W = p.bg_bits * p.levels
    KP = kp1 * P
    WIN = PT * kp1 * 4 * P

    @pl.when(i == 0)
    def _():
        for g in range(G):
            acc_sc[g] = acc0_ref[:, :, g * Bt:(g + 1) * Bt]

    def compute_digits(g):
        if ablate == "nodigits":
            return jnp.ones((PT * kp1 * 4 * P, Bt), dtype=I8)
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                # [k+1, N, Bt]
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            if s < p.N:
                top = rolled[:, p.N - s:, :]
                shifted = jnp.concatenate(
                    [jnp.zeros_like(top) - top, rolled[:, : p.N - s, :]],
                    axis=1,
                )
            else:
                shifted = jnp.zeros_like(rolled) - rolled
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, None, :]    # [1, 1, Bt]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        half = 1 << (p.bg_bits - 1)
        offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
        lo = val[:, : p.N // 2, :] & U32(0xFFFF)
        hi = val[:, p.N // 2:, :] << U32(16)
        packed = (lo | hi) ^ U32(0x80808080)         # [k+1, N/2, Bt]
        packed = jnp.transpose(
            packed.reshape(kp1, PT, P, Bt), (1, 0, 2, 3)
        )                                            # [PT, k+1, P, Bt]
        d8 = pltpu.bitcast(packed, jnp.int8)         # [PT, k+1, 4P, Bt]
        return d8.reshape(PT * kp1 * 4 * P, Bt)

    def combine_into(g, ct, total):
        a = total.astype(U32)                         # rows (j, c, q)
        comb = (
            a[0:KP]
            + (a[KP:2 * KP] << U32(8))
            + (a[2 * KP:3 * KP] << U32(16))
            + (a[3 * KP:4 * KP] << U32(24))
        )                                             # [KP, Bt], rows (c, q)
        for c in range(kp1):
            acc_sc[g, c, ct * P:(ct + 1) * P, :] = (
                acc_sc[g, c, ct * P:(ct + 1) * P, :]
                + comb[c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        for ct in range(HALF):
            o = (HALF - 1 - ct) * kp1 * 4 * P
            total = jnp.dot(btT2_ref[0, :, o:o + WIN], D,
                            preferred_element_type=I32)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_digits(0)
    for g in range(G):
        D_next = compute_digits(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            out_ref[:, :, g * Bt:(g + 1) * Bt] = acc_sc[g]


def mega14_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btT2: jax.Array) -> jax.Array:
    """mega13's wrapper against the pt-major ``bsk_btT2`` key."""
    import os
    p = params
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 2, \
        "mega14 needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N >= 2 * P, "mega14 needs N >= 2P (pair packing)"
    PT = p.N // (2 * P)
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    KEXT = bsk_btT2.shape[-1]
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    # same BO=1-when-it-fits heuristic as mega13 (measured there)
    G = int(g_env) if g_env else max(1, min(BC, (13 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    ablate = _ablate_knob()
    acc0_T = jnp.transpose(acc0, (1, 2, 0))          # [k+1, N, B]
    out_T = pl.pallas_call(
        functools.partial(_mega14_kernel, p=p, P=P, HALF=HALF, PT=PT, G=G,
                          ablate=ablate),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k + 1, p.N, G * Bt), lambda bo, i: (0, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4P, KEXT), lambda bo, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.k + 1, p.N, G * Bt),
                               lambda bo, i: (0, 0, bo),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.k + 1, p.N, B), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, p.N, Bt), U32),   # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0_T, bsk_btT2)
    return jnp.transpose(out_T, (2, 0, 1))



def _mega15_kernel(a_ref, acc0_ref, btT4_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, G: int,
                   ablate: str = ""):
    """mega-v15: the l=4 byte-aligned gadget with a DIGIT-side window.

    Built for the N=2048 integer tier's l=4 hardware A/B (VERDICT r3 #8):
    bg=2^8, levels=4 puts one coefficient's four digit bytes in each u32,
    so `pltpu.bitcast` needs no pair packing, and — because l=4's
    extended key would be 24.9 GiB at N=2048 (over HBM) — the key stays
    SINGLE-WIDTH ([C4P, 4N] per step/c_in) and the output-tile shift
    moves to the digit stream instead.  Negacyclic wrap sign: digits of
    -diff are NOT the negated digits of diff (a -128 digit renormalizes
    with carries), so a +-extended digit stream would break bit-exactness
    with core.reference; instead each tile's contraction splits at the
    wrap boundary into two dots over the SAME stream/key —
        out[ct*P + q] = key[:, :4(N-ct*P)] . D[4*ct*P:]      (unwrapped)
                      - key[:, 4(N-ct*P):] . D[:4*ct*P]      (wrapped,
                        extK[q-r+N] = -extK[q-r])
    — exact i32 arithmetic, identical digits to the reference, identical
    MAC count.  The batch-scaling probe's c = 5.3 ms bound says moving
    HBM traffic between key and stream is a wash (docs/BENCH_LOG.md
    round 4) — this kernel exists to measure the l=4 MAC trade, not to
    win it."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[3]
    kp1 = p.k + 1
    KP = kp1 * P
    KEXT = 4 * p.N

    @pl.when(i == 0)
    def _():
        for g in range(G):
            acc_sc[g] = acc0_ref[:, :, g * Bt:(g + 1) * Bt]

    def compute_stream(g):
        if ablate == "nodigits":
            return jnp.ones((kp1, 4 * p.N, Bt), dtype=I8)
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                # [k+1, N, Bt]
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            if s < p.N:
                top = rolled[:, p.N - s:, :]
                shifted = jnp.concatenate(
                    [jnp.zeros_like(top) - top, rolled[:, : p.N - s, :]],
                    axis=1,
                )
            else:
                shifted = jnp.zeros_like(rolled) - rolled
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, None, :]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        # W = 32: EXACT decomposition — no rounding shift; balanced
        # offset + per-byte ^0x80 = two's-complement signed digits
        w32 = (diff + U32(0x80808080)) ^ U32(0x80808080)
        return pltpu.bitcast(w32, jnp.int8)           # [k+1, 4N, Bt]

    def do_dot(D, ct):
        split = 4 * (p.N - ct * P)  # wrap boundary in sublanes
        total = None
        for c in range(kp1):
            part = jnp.dot(btT4_ref[0, c, :, :split],
                           D[c][KEXT - split:],
                           preferred_element_type=I32)
            if ct > 0:
                part = part - jnp.dot(btT4_ref[0, c, :, split:],
                                      D[c][: KEXT - split],
                                      preferred_element_type=I32)
            total = part if total is None else total + part
        return total                                  # [C4P, Bt] i32

    def combine_into(g, ct, total):
        a = total.astype(U32)                         # rows (j, c, q)
        comb = (
            a[0:KP]
            + (a[KP:2 * KP] << U32(8))
            + (a[2 * KP:3 * KP] << U32(16))
            + (a[3 * KP:4 * KP] << U32(24))
        )
        for c in range(kp1):
            acc_sc[g, c, ct * P:(ct + 1) * P, :] = (
                acc_sc[g, c, ct * P:(ct + 1) * P, :]
                + comb[c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        tiles = 1 if ablate == "onedot" else HALF
        for ct in range(tiles):
            total = do_dot(D, ct)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_stream(0)
    for g in range(G):
        D_next = compute_stream(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            out_ref[:, :, g * Bt:(g + 1) * Bt] = acc_sc[g]


def mega15_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btT4: jax.Array) -> jax.Array:
    """Same contract as mega13, consuming the single-width l=4
    ``bsk_btT4`` layout."""
    import os
    p = params
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 4, \
        "mega15 needs the byte-aligned l=4 gadget (bg_bits=8, levels=4)"
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    KEXT = 4 * p.N
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (13 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("HERDSMAN_MEGA_VMEM",
                                                100 * 1024 * 1024)),
        )
    ablate = _ablate_knob()
    acc0_T = jnp.transpose(acc0, (1, 2, 0))          # [k+1, N, B]
    out_T = pl.pallas_call(
        functools.partial(_mega15_kernel, p=p, P=P, HALF=HALF, G=G,
                          ablate=ablate),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k + 1, p.N, G * Bt), lambda bo, i: (0, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.k + 1, C4P, KEXT),
                         lambda bo, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.k + 1, p.N, G * Bt),
                               lambda bo, i: (0, 0, bo),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.k + 1, p.N, B), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, p.N, Bt), U32),   # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0_T, bsk_btT4)
    return jnp.transpose(out_T, (2, 0, 1))


def _mega16_kernel(a_ref, acc0_ref, btTs_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, G: int,
                   ablate: str = ""):
    """mega-v16: l=2 bitcast stream with ADJACENT-pair packing and a
    single-width key (the digit-window form of the flagship class).

    mega13 packs coefficient pairs (r, r + N/2) per u32, which forces the
    sliding-window (2.5x extended) key: a halves-pair stream's negacyclic
    wrap boundary interleaves within each 4-byte sublane group, so the
    tile shift cannot move to the digit side.  Packing ADJACENT pairs
    (2r', 2r'+1) instead puts the wrap at the single contiguous sublane
    κ = 2(N - ct*P), so each tile is mega15's two-dot wrap-split

        out[ct*P + q] = key[:, :2(N-ct*P)] . D[2*ct*P:]
                      - key[:, 2(N-ct*P):] . D[:2*ct*P]

    over the SAME [C4P, 2N] single-width key — identical MACs and digits
    to mega13 (bit-exactness enforced per-engine), 2.5x less key HBM, and
    the only flagship-class kernel whose key fits the N=2048 tier
    (6.44 GiB at STD128_SHORTINT_FAST; measured A/B in BENCH_LOG r4)."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[3]
    kp1 = p.k + 1
    W = p.bg_bits * p.levels  # = 16
    KP = kp1 * P
    KEXT = 2 * p.N

    @pl.when(i == 0)
    def _():
        for g in range(G):
            acc_sc[g] = acc0_ref[:, :, g * Bt:(g + 1) * Bt]

    def compute_stream(g):
        if ablate == "nodigits":
            return jnp.ones((kp1, 2 * p.N, Bt), dtype=I8)
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                # [k+1, N, Bt]
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            if s < p.N:
                top = rolled[:, p.N - s:, :]
                shifted = jnp.concatenate(
                    [jnp.zeros_like(top) - top, rolled[:, : p.N - s, :]],
                    axis=1,
                )
            else:
                shifted = jnp.zeros_like(rolled) - rolled
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, None, :]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        half = 1 << (p.bg_bits - 1)
        offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
        pairs = val.reshape(kp1, p.N // 2, 2, Bt)    # adjacent coeffs
        lo = pairs[:, :, 0, :] & U32(0xFFFF)
        hi = pairs[:, :, 1, :] << U32(16)
        packed = (lo | hi) ^ U32(0x80808080)         # [k+1, N/2, Bt]
        return pltpu.bitcast(packed, jnp.int8)       # [k+1, 2N, Bt]

    def do_dot(D, ct):
        split = 2 * (p.N - ct * P)  # wrap boundary in stream sublanes
        total = None
        for c in range(kp1):
            part = jnp.dot(btTs_ref[0, c, :, :split],
                           D[c][KEXT - split:],
                           preferred_element_type=I32)
            if ct > 0:
                part = part - jnp.dot(btTs_ref[0, c, :, split:],
                                      D[c][: KEXT - split],
                                      preferred_element_type=I32)
            total = part if total is None else total + part
        return total                                  # [C4P, Bt] i32

    def combine_into(g, ct, total):
        a = total.astype(U32)                         # rows (j, c, q)
        comb = (
            a[0:KP]
            + (a[KP:2 * KP] << U32(8))
            + (a[2 * KP:3 * KP] << U32(16))
            + (a[3 * KP:4 * KP] << U32(24))
        )
        for c in range(kp1):
            acc_sc[g, c, ct * P:(ct + 1) * P, :] = (
                acc_sc[g, c, ct * P:(ct + 1) * P, :]
                + comb[c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        tiles = 1 if ablate == "onedot" else HALF
        for ct in range(tiles):
            total = do_dot(D, ct)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_stream(0)
    for g in range(G):
        D_next = compute_stream(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            out_ref[:, :, g * Bt:(g + 1) * Bt] = acc_sc[g]


def mega16_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btTs: jax.Array) -> jax.Array:
    """Same contract as mega13, consuming the single-width l=2
    ``bsk_btTs`` layout."""
    import os
    p = params
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 2, \
        "mega16 needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N % 2 == 0, "mega16 needs even N (adjacent-pair packing)"
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    KEXT = 2 * p.N
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (13 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("HERDSMAN_MEGA_VMEM",
                                                100 * 1024 * 1024)),
        )
    ablate = _ablate_knob()
    acc0_T = jnp.transpose(acc0, (1, 2, 0))          # [k+1, N, B]
    out_T = pl.pallas_call(
        functools.partial(_mega16_kernel, p=p, P=P, HALF=HALF, G=G,
                          ablate=ablate),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k + 1, p.N, G * Bt), lambda bo, i: (0, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.k + 1, C4P, KEXT),
                         lambda bo, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.k + 1, p.N, G * Bt),
                               lambda bo, i: (0, 0, bo),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.k + 1, p.N, B), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, p.N, Bt), U32),   # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0_T, bsk_btTs)
    return jnp.transpose(out_T, (2, 0, 1))


def _mega17_kernel(a_ref, acc0_ref, btT3_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, G: int,
                   ablate: str = ""):
    """mega-v17: the byte-aligned l=3 gadget in the flagship (bitcast
    stream + single-width key) kernel class — the integer tier's
    kernel-class upgrade (VERDICT r4 #1).

    bg=2^8, levels=3 gives W=24: each coefficient's val holds THREE digit
    bytes, so four coefficients' 12 digits pack exactly into three u32s
    (3-of-4 packing — zero wasted bytes, zero wasted MACs, unlike a
    one-coeff-per-u32 layout whose fourth zero byte would burn 33% more
    MXU work).  From val quads (q0..q3, 24-bit values):

        w0 = q0         | q1 << 24      (bytes: z0d0 z0d1 z0d2 z1d0)
        w1 = q1 >> 8    | q2 << 16      (bytes: z1d1 z1d2 z2d0 z2d1)
        w2 = q2 >> 16   | q3 << 8       (bytes: z2d2 z3d0 z3d1 z3d2)

    then ^0x80808080 (sx sign-extend) and one bitcast yields the byte
    stream s = 3z + lb (coefficient-major, LSB digit first) — the same
    collapse of the shift-extract decompose that mega13/16 bought the
    bool tier (+45%/+5.9%, BENCH_LOG r3/r4).  Adjacent-coefficient order
    keeps the negacyclic wrap a single sublane split at 3*(N - ct*P), so
    each output tile is mega16's wrap-split two-dot

        out[ct*P + q] = key[:, :3(N-ct*P)] . D[3*ct*P:]
                      - key[:, 3(N-ct*P):] . D[:3*ct*P]

    over the single-width [C4P, 3N] ``bsk_btT3`` key — identical digits
    and MAC count (R = 6) to mega12@bg=2^7 l=3, bit-exactness enforced
    per-engine in tests/test_ops_bitexact.py."""
    i = pl.program_id(1)
    Bt = acc_sc.shape[3]
    kp1 = p.k + 1
    W = p.bg_bits * p.levels  # = 24
    KP = kp1 * P
    KEXT = 3 * p.N

    @pl.when(i == 0)
    def _():
        for g in range(G):
            acc_sc[g] = acc0_ref[:, :, g * Bt:(g + 1) * Bt]

    def compute_stream(g):
        if ablate in ("nodigits", "dotsonly"):
            return jnp.ones((kp1, 3 * p.N, Bt), dtype=I8)
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        v = acc_sc[g]                                # [k+1, N, Bt]
        rolled = v
        nbits = 1 if ablate == "rot1" else p.log2_2N
        for bit in range(nbits):
            s = 1 << bit
            if s < p.N:
                top = rolled[:, p.N - s:, :]
                shifted = jnp.concatenate(
                    [jnp.zeros_like(top) - top, rolled[:, : p.N - s, :]],
                    axis=1,
                )
            else:
                shifted = jnp.zeros_like(rolled) - rolled
            take_bit = (r_amt >> U32(bit)) & U32(1)
            mask = (U32(0) - take_bit)[None, None, :]
            rolled = jnp.where(
                jnp.broadcast_to(mask, rolled.shape) != U32(0),
                shifted, rolled)
        diff = rolled - v
        half = 1 << (p.bg_bits - 1)
        offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
        val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
        # the offset add can carry past bit W-1 (val up to ~1.5*2^24);
        # the carry is outside the digit bytes and must not leak into the
        # OR-packed neighbor's byte (mega16's &0xFFFF did this implicitly)
        val = val & U32(0xFFFFFF)
        quads = val.reshape(kp1, p.N // 4, 4, Bt)    # adjacent coeffs
        q0, q1 = quads[:, :, 0, :], quads[:, :, 1, :]
        q2, q3 = quads[:, :, 2, :], quads[:, :, 3, :]
        w0 = q0 | (q1 << U32(24))
        w1 = (q1 >> U32(8)) | (q2 << U32(16))
        w2 = (q2 >> U32(16)) | (q3 << U32(8))
        packed = jnp.stack([w0, w1, w2], axis=2)     # [k+1, N/4, 3, Bt]
        packed = (packed.reshape(kp1, 3 * p.N // 4, Bt)
                  ^ U32(0x80808080))
        return pltpu.bitcast(packed, jnp.int8)       # [k+1, 3N, Bt]

    def do_dot(D, ct):
        split = 3 * (p.N - ct * P)  # wrap boundary in stream sublanes
        total = None
        for c in range(kp1):
            part = jnp.dot(btT3_ref[0, c, :, :split],
                           D[c][KEXT - split:],
                           preferred_element_type=I32)
            if ct > 0:
                part = part - jnp.dot(btT3_ref[0, c, :, split:],
                                      D[c][: KEXT - split],
                                      preferred_element_type=I32)
            total = part if total is None else total + part
        return total                                  # [C4P, Bt] i32

    def combine_into(g, ct, total):
        a = total.astype(U32)                         # rows (j, c, q)
        if ablate in ("nocombine", "dotsonly"):
            for c in range(kp1):
                acc_sc[g, c, ct * P:(ct + 1) * P, :] = a[c * P:(c + 1) * P]
            return
        comb = (
            a[0:KP]
            + (a[KP:2 * KP] << U32(8))
            + (a[2 * KP:3 * KP] << U32(16))
            + (a[3 * KP:4 * KP] << U32(24))
        )
        for c in range(kp1):
            acc_sc[g, c, ct * P:(ct + 1) * P, :] = (
                acc_sc[g, c, ct * P:(ct + 1) * P, :]
                + comb[c * P:(c + 1) * P]
            )

    def do_dots(g, D):
        prev = None
        tiles = 1 if ablate == "onedot" else HALF
        for ct in range(tiles):
            total = do_dot(D, ct)
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    D = compute_stream(0)
    for g in range(G):
        D_next = compute_stream(g + 1) if g + 1 < G else None
        do_dots(g, D)
        D = D_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            out_ref[:, :, g * Bt:(g + 1) * Bt] = acc_sc[g]


def mega17_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btT3: jax.Array) -> jax.Array:
    """Same contract as mega13/16, consuming the single-width l=3
    ``bsk_btT3`` layout."""
    import os
    p = params
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 3, \
        "mega17 needs the byte-aligned l=3 gadget (bg_bits=8, levels=3)"
    assert p.N % 4 == 0, "mega17 needs N % 4 == 0 (3-of-4 packing)"
    B = acc0.shape[0]
    bt_env = int(os.environ.get("HERDSMAN_MEGA_BT", "128"))
    Bt = B if B <= bt_env else (bt_env if B % bt_env == 0 else 128)
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    KEXT = 3 * p.N
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (13 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("HERDSMAN_MEGA_VMEM",
                                                100 * 1024 * 1024)),
        )
    ablate = _ablate_knob()
    acc0_T = jnp.transpose(acc0, (1, 2, 0))          # [k+1, N, B]
    out_T = pl.pallas_call(
        functools.partial(_mega17_kernel, p=p, P=P, HALF=HALF, G=G,
                          ablate=ablate),
        grid=(BO, p.n),
        in_specs=[
            pl.BlockSpec((1, 1, G * Bt), lambda bo, i: (i, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k + 1, p.N, G * Bt), lambda bo, i: (0, 0, bo),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.k + 1, C4P, KEXT),
                         lambda bo, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p.k + 1, p.N, G * Bt),
                               lambda bo, i: (0, 0, bo),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p.k + 1, p.N, B), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, p.N, Bt), U32),   # group acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0_T, bsk_btT3)
    return jnp.transpose(out_T, (2, 0, 1))


def _register() -> None:
    bs.ROTATION_ENGINES = getattr(bs, "ROTATION_ENGINES", {})
    bs.ROTATION_ENGINES.setdefault("pallas_mega17",
                                   (mega17_blind_rotate, "bsk_btT3"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega16",
                                   (mega16_blind_rotate, "bsk_btTs"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega15",
                                   (mega15_blind_rotate, "bsk_btT4"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega7",
                                   (mega7_blind_rotate, "bsk_btj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega8",
                                   (mega8_blind_rotate, "bsk_btj2"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega11",
                                   (mega11_blind_rotate, "bsk_btj2j"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega12",
                                   (mega12_blind_rotate, "bsk_btjj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega13",
                                   (mega13_blind_rotate, "bsk_btT"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega14",
                                   (mega14_blind_rotate, "bsk_btT2"))


_register()
