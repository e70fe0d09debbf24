"""Superseded mega-kernel engines (pallas_mega .. mega6, mega9, mega10) —
the measured-negative experiment record, moved out of the hot import/test
path (round-4).  Each variant's kernel body IS the experiment (see
mega.py's header note); their per-engine bit-exactness tests run behind
``pytest -m legacy`` (tests/test_ops_bitexact.py).  The surviving tiers —
mega7/mega8 (bench fallback chain) and mega11..mega14 (headline class) —
live in mega.py.  Measured A/B history: docs/BENCH_LOG.md.

Importing this module registers the engines; ops.bootstrap lazily imports
it when an unknown ``pallas_mega*`` engine name is requested, so
``engine="pallas_mega3"`` still works everywhere without the default path
paying for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops.pallas.mega import (
    I8,
    I32,
    U32,
    _ablate_knob,
    _neg_shift,
    _neg_shift_nd,
)
from herdsman_tpu.ops.server_key import bt_tile


def _mega_kernel(a_ref, acc0_ref, bt_ref, out_ref,
                 acc_sc, dig_sc, ep_sc, *, p: TFHEParams, P: int,
                 HALF: int, R: int):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        for c in range(p.k + 1):
            acc_sc[c] = acc0_ref[:, c, :]

    # ---- phase 0: rotate + decompose into dig_sc ----
    @pl.when(j == 0)
    def _():
        r_amt = a_ref[0, 0, :].astype(U32)            # [Bt]
        W = p.bg_bits * p.levels
        Bg = 1 << p.bg_bits
        half = Bg >> 1
        offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
        for c in range(p.k + 1):
            v = acc_sc[c]
            rolled = v
            for bit in range(p.log2_2N):
                s = 1 << bit
                shifted = (
                    _neg_shift(rolled, s, p.N) if s < p.N
                    else jnp.zeros_like(rolled) - rolled
                )
                # 32-bit mask select: Mosaic cannot reshape i1 vectors here
                # ("insertion of minor dim ... only supported for 32-bit")
                take_bit = (r_amt >> U32(bit)) & U32(1)     # [Bt] in {0,1}
                mask = (U32(0) - take_bit)[:, None]          # 0 or 0xFFFFFFFF
                rolled = (shifted & mask) | (rolled & ~mask)
            diff = rolled - v
            val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) + U32(offset)
            for lev in range(p.levels):
                shift = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    dig_sc[row * HALF + sub] = d8[:, sub * P:(sub + 1) * P]

    # ---- phases 1..R: external product for GGSW row j-1 ----
    @pl.when(j > 0)
    def _():
        from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total

        r_row = (j - 1) * HALF
        bt_flat = bt_ref[0, 0].reshape(HALF * P, bt_ref.shape[-1])
        for ct in range(HALF):
            total = _ep_column_total(
                lambda sub: dig_sc[r_row + sub], bt_flat, ct, P, HALF
            )

            @pl.when(j == 1)
            def _(ct=ct, total=total):
                ep_sc[ct] = total

            @pl.when(j > 1)
            def _(ct=ct, total=total):
                ep_sc[ct] = ep_sc[ct] + total

    # ---- last phase: recombine limbs, CMux-accumulate into acc ----
    @pl.when(j == R)
    def _():
        for ct in range(HALF):
            a = ep_sc[ct].reshape(ep_sc.shape[1], p.k + 1, 4, P).astype(U32)
            for c in range(p.k + 1):
                combined = (
                    a[:, c, 0, :]
                    + (a[:, c, 1, :] << U32(8))
                    + (a[:, c, 2, :] << U32(16))
                    + (a[:, c, 3, :] << U32(24))
                )
                acc_sc[c, :, ct * P:(ct + 1) * P] = (
                    acc_sc[c, :, ct * P:(ct + 1) * P] + combined
                )

    @pl.when(jnp.logical_and(i == pl.num_programs(1) - 1, j == R))
    def _():
        for c in range(p.k + 1):
            out_ref[:, c, :] = acc_sc[c]


def mega_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                      bsk_bt: jax.Array) -> jax.Array:
    """acc0 [B, k+1, N] u32 (rotated test poly), a_t [n, B] i32 in [0, 2N),
    bsk_bt [n, R, HALF, P, C4P] i8 -> final accumulator [B, k+1, N] u32."""
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    # Bt stays 128 here: the mega kernel's three scratches leave no VMEM
    # for cross-phase DMA double-buffering at 256 (measured: 1862/s at
    # Bt=256 vs ~2900/s class at 128 — pipelining loss dwarfs the
    # streaming win that helps the per-step kernel).
    Bt = B if B <= 128 else 128
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P

    return pl.pallas_call(
        functools.partial(_mega_kernel, p=p, P=P, HALF=HALF, R=R),
        grid=(BC, p.n, R + 1),
        in_specs=[
            pl.BlockSpec((1, 1, Bt), lambda bc, i, j: (i, 0, bc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i, j: (bc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, HALF, P, C4P),
                lambda bc, i, j: (i, jnp.maximum(j - 1, 0), 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i, j: (bc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((p.k + 1, Bt, p.N), U32),          # acc
            pltpu.VMEM((R * HALF, Bt, P), I8),            # digits
            pltpu.VMEM((HALF, Bt, C4P), I32),             # ep accumulator
        ],
        interpret=jax.default_backend() != "tpu",
    )(a_t.reshape(p.n, 1, B), acc0, bsk_bt)


def _mega2_kernel(a_ref, acc0_ref, bt_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, S: int = 1):
    """mega-v2: ONE grid cell per (batch-chunk, S steps) — rotation, all R
    row contractions and the CMux accumulate inlined with no phase axis.
    5x fewer grid cells and no pl.when phase branching than the phased
    mega kernel; each cell's key block (S steps x R rows) is one BlockSpec
    block, double-buffered across cells."""
    from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for c in range(p.k + 1):
            acc_sc[c] = acc0_ref[:, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = bt_ref.shape[-1]

    for st in range(S):
        # ---- rotate + decompose (digits stay in registers) ----
        r_amt = a_ref[0, st, :].astype(U32)            # [Bt]
        digs: dict[tuple[int, int], jax.Array] = {}
        for c in range(p.k + 1):
            v = acc_sc[c]
            rolled = v
            for bit in range(p.log2_2N):
                s = 1 << bit
                shifted = (
                    _neg_shift(rolled, s, p.N) if s < p.N
                    else jnp.zeros_like(rolled) - rolled
                )
                take_bit = (r_amt >> U32(bit)) & U32(1)
                mask = (U32(0) - take_bit)[:, None]
                rolled = (shifted & mask) | (rolled & ~mask)
            diff = rolled - v
            val = ((diff + U32(1 << (32 - W - 1))) >> U32(32 - W)) \
                + U32(offset)
            for lev in range(p.levels):
                shift = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]

        # ---- external product over all R rows + CMux accumulate ----
        for ct in range(HALF):
            total = None
            for r in range(R):
                bt_flat = bt_ref[0, st, r].reshape(HALF * P, C4P)
                t = _ep_column_total(
                    lambda sub, r=r: digs[(r, sub)], bt_flat, ct, P, HALF
                )
                total = t if total is None else total + t
            a = total.reshape(total.shape[0], p.k + 1, 4, P).astype(U32)
            for c in range(p.k + 1):
                combined = (
                    a[:, c, 0, :]
                    + (a[:, c, 1, :] << U32(8))
                    + (a[:, c, 2, :] << U32(16))
                    + (a[:, c, 3, :] << U32(24))
                )
                acc_sc[c, :, ct * P:(ct + 1) * P] = (
                    acc_sc[c, :, ct * P:(ct + 1) * P] + combined
                )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for c in range(p.k + 1):
            out_ref[:, c, :] = acc_sc[c]


def mega2_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_bt: jax.Array) -> jax.Array:
    """Same contract as mega_blind_rotate; grid (batch-chunk, step).
    Larger chunks (HERDSMAN_MEGA_BT) cut key re-streams — mega2's only
    scratch is the accumulator, so VMEM headroom allows it (unlike the
    phased mega kernel, where Bt=256 collapsed pipelining)."""
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
    S = int(os.environ.get("HERDSMAN_MEGA_STEPS", "1"))
    if p.n % S:
        S = 1

    kwargs = {}
    if jax.default_backend() == "tpu":
        # the double-buffered key block + per-row bt_flat copies scale with
        # N (~60 MB per cell at N=2048); v5e has 128 MB VMEM
        lim = 100 if p.N >= 2048 or S > 1 else 64
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=lim * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega2_kernel, p=p, P=P, HALF=HALF, R=R, S=S),
        grid=(BC, p.n // S),
        in_specs=[
            pl.BlockSpec((1, S, Bt), lambda bc, i: (i, 0, bc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i: (bc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, S, R, HALF, P, C4P),
                lambda bc, i: (i, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i: (bc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((p.k + 1, Bt, p.N), U32),          # acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n // S, S, B), acc0,
      bsk_bt.reshape((p.n // S, S) + bsk_bt.shape[1:]))


def _mega3_kernel(a_ref, acc0_ref, btj_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, S: int = 1):
    """mega-v3: mega2's one-cell-per-step structure with two VPU cuts
    measured by scripts/mega_variants.py:

    - j-major key blocks (``bsk_btj``): each column tile is TWO MXU dots
      over ALL R GGSW rows (K up to R*N, accumulation inside the MXU) —
      removes the (R-1) x HALF [Bt, C4P] i32 add passes per step that were
      part of mega2's measured 28.5 us/step/chunk MXU-floor (ideal 10.9).
    - rotation select via jnp.where/vsel (the fastest variant measured:
      sel2 198.8 ms vs full's and/andn/or masking).
    """
    from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total_jmajor

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        for c in range(p.k + 1):
            acc_sc[c] = acc0_ref[:, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj_ref.shape[-1]

    for st in range(S):
        r_amt = a_ref[0, st, :].astype(U32)            # [Bt]
        digs: dict[tuple[int, int], jax.Array] = {}
        for c in range(p.k + 1):
            v = acc_sc[c]
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
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]

        btj_flat = btj_ref[0, st].reshape(HALF * R * P, C4P)
        for ct in range(HALF):
            total = _ep_column_total_jmajor(
                lambda r, sub: digs[(r, sub)], btj_flat, ct, P, HALF, R
            )
            a = total.reshape(total.shape[0], p.k + 1, 4, P).astype(U32)
            for c in range(p.k + 1):
                combined = (
                    a[:, c, 0, :]
                    + (a[:, c, 1, :] << U32(8))
                    + (a[:, c, 2, :] << U32(16))
                    + (a[:, c, 3, :] << U32(24))
                )
                acc_sc[c, :, ct * P:(ct + 1) * P] = (
                    acc_sc[c, :, ct * P:(ct + 1) * P] + combined
                )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for c in range(p.k + 1):
            out_ref[:, c, :] = acc_sc[c]


def mega3_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj: jax.Array) -> jax.Array:
    """Same contract as mega2_blind_rotate but consuming the j-major key
    layout (``bsk_btj`` [n, HALF, R, P, C4P])."""
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
    S = int(os.environ.get("HERDSMAN_MEGA_STEPS", "1"))
    if p.n % S:
        S = 1

    kwargs = {}
    if jax.default_backend() == "tpu":
        lim = 100 if p.N >= 2048 or S > 1 else 64
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=lim * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega3_kernel, p=p, P=P, HALF=HALF, R=R, S=S),
        grid=(BC, p.n // S),
        in_specs=[
            pl.BlockSpec((1, S, Bt), lambda bc, i: (i, 0, bc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i: (bc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, S, HALF, R, P, C4P),
                lambda bc, i: (i, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, i: (bc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((p.k + 1, Bt, p.N), U32),          # acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n // S, S, B), acc0,
      bsk_btj.reshape((p.n // S, S) + bsk_btj.shape[1:]))


def _mega4_kernel(a_ref, acc0_ref, btj_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int,
                  S: int = 1):
    """mega-v4: grid (batch-group, step i, chunk g) with the CHUNK axis
    INNERMOST and the accumulators of all G chunks resident in one VMEM
    scratch.  The key block index depends only on i, so Pallas fetches each
    step's key block ONCE per group instead of once per chunk — key HBM
    traffic drops G-fold (mega2/3 re-stream the full multi-GB key for every
    128-row chunk).  Same per-chunk step sequence as mega3 (i outer /
    g inner preserves the CMux recurrence), so bit-exactness is unchanged.

    MEASURED NEGATIVE (docs/BENCH_LOG.md fourth session): 4046/s vs
    mega3's 4360 — key DMA was already overlapped behind the ~28 us of
    per-cell compute, and the dynamic scratch indexing + pinned-index
    block juggling costs ~7%.  Kept as a working reference for the
    chunk-innermost structure (it wins if future params push the key
    past what double-buffering can hide)."""
    from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total_jmajor

    i = pl.program_id(1)
    g = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        for c in range(p.k + 1):
            acc_sc[g, c] = acc0_ref[:, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj_ref.shape[-1]

    for st in range(S):
        r_amt = a_ref[0, st, :].astype(U32)            # [Bt]
        digs: dict[tuple[int, int], jax.Array] = {}
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
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]

        btj_flat = btj_ref[0, st].reshape(HALF * R * P, C4P)
        for ct in range(HALF):
            total = _ep_column_total_jmajor(
                lambda r, sub: digs[(r, sub)], btj_flat, ct, P, HALF, R
            )
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

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for c in range(p.k + 1):
            out_ref[:, c, :] = acc_sc[g, c]


def mega4_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj: jax.Array) -> jax.Array:
    """Same contract as mega3_blind_rotate (j-major key layout)."""
    import os
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = acc0.shape[0]
    Bt = B if B <= 128 else 128
    assert B % Bt == 0, "pad batch to a multiple of 128 first"
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P
    # G chunks' accumulators live in one scratch; budget ~32 MB of VMEM
    acc_bytes = (p.k + 1) * Bt * p.N * 4
    g_env = os.environ.get("HERDSMAN_MEGA_G")
    G = int(g_env) if g_env else max(1, min(BC, (32 << 20) // acc_bytes))
    while BC % G:
        G -= 1
    BO = BC // G
    S = int(os.environ.get("HERDSMAN_MEGA_STEPS", "1"))
    if p.n % S:
        S = 1
    NS = p.n // S
    last = NS - 1

    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega4_kernel, p=p, P=P, HALF=HALF, R=R, G=G, S=S),
        grid=(BO, NS, G),
        in_specs=[
            pl.BlockSpec((1, S, Bt), lambda bo, i, g: (i, 0, bo * G + g),
                         memory_space=pltpu.VMEM),
            # acc0 chunk g is only read at i == 0; pin the index afterwards
            # so the block is fetched exactly G times per group
            pl.BlockSpec(
                (Bt, p.k + 1, p.N),
                lambda bo, i, g: (
                    jnp.where(i == 0, bo * G + g, bo * G + G - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # key block depends only on i -> fetched once per step per group
            pl.BlockSpec(
                (1, S, HALF, R, P, C4P),
                lambda bo, i, g: (i, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # written only at i == last; pinned index avoids per-cell writebacks
        out_specs=pl.BlockSpec(
            (Bt, p.k + 1, p.N),
            lambda bo, i, g, last=last: (
                jnp.where(i == last, bo * G + g, bo * G), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((G, p.k + 1, Bt, p.N), U32),       # all-chunk acc
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(NS, S, B), acc0,
      bsk_btj.reshape((NS, S) + bsk_btj.shape[1:]))


def _mega5_kernel(a_ref, acc0_ref, btj_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int):
    """mega-v5: grid (batch-group, step) — one cell processes ALL G chunks
    of the group for step i as a STATIC python loop.  Gets mega4's
    key-once-per-step-per-group HBM traffic with none of its machinery
    (block indices are plain (bo,...)/(i,...) tuples that change naturally;
    scratch indices are python ints), and hands the VLIW scheduler G
    independent chunk dependency-chains so chunk g+1's rotate/decompose
    (VPU) can pack against chunk g's dots (MXU)."""
    from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total_jmajor

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

    for g in range(G):
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        digs: dict[tuple[int, int], jax.Array] = {}
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
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]

        for ct in range(HALF):
            total = _ep_column_total_jmajor(
                lambda r, sub: digs[(r, sub)], btj_flat, ct, P, HALF, R
            )
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

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega5_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj: jax.Array) -> jax.Array:
    """Same contract as mega3_blind_rotate (j-major key layout)."""
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
    # acc scratch + acc0/out group blocks all scale with G; ~8 MB of acc
    # per 32 MB budget line keeps the three under ~32 MB total at FAST
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
        functools.partial(_mega5_kernel, p=p, P=P, HALF=HALF, R=R, G=G),
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


def _mega6_kernel(a_ref, acc0_ref, btj_ref, out_ref, acc_sc, *,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int,
                  ablate: str = ""):
    """mega-v6: mega5 with EXPLICIT software pipelining instead of trusting
    the scheduler to find the overlap across chunk chains.

    Two staggers (both pure reorderings of mega5's op stream — the math is
    identical, bit-exact):

    - column-tile stagger: the [Bt, C4P] limb-recombine + acc update (VPU)
      of column tile ct is emitted AFTER the MXU dots of tile ct+1 have been
      issued, so the wait on dot(ct)'s result always has the next dot
      already in the MXU pipe;
    - chunk stagger: chunk g+1's barrel rotate + gadget decompose (the
      dominant VPU cost, ~log2(2N) select stages over [Bt, N] u32) is
      emitted BEFORE chunk g's dots, so the in-order issue stream never
      parks the VPU behind an MXU dependency (mega5 interleaves
      rotate(g) -> dots(g) -> rotate(g+1), which leaves the rotate of the
      next chunk textually behind the dots that stall on scratch writes).
    """
    from herdsman_tpu.ops.pallas.blind_rotate import _ep_column_total_jmajor

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
        digs: dict[tuple[int, int], jax.Array] = {}
        for c in range(p.k + 1):
            v = acc_sc[g, c]
            rolled = v
            # probe-only ablation: "rot1" keeps a single barrel stage so
            # (full - rot1) * S/(S-1) isolates the rotate cost without
            # changing the code shape Mosaic sees; never the default.
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
                    digs[(row, sub)] = d8[:, sub * P:(sub + 1) * P]
        return digs

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

    def do_dots(g, digs):
        if ablate == "nodot":  # probe-only: consume digits without the MXU
            for c in range(p.k + 1):
                s = digs[(c * p.levels, 0)].astype(U32)
                for row in range(c * p.levels, (c + 1) * p.levels):
                    for sub in range(HALF):
                        if (row, sub) != (c * p.levels, 0):
                            s = s + digs[(row, sub)].astype(U32)
                acc_sc[g, c, :, 0:P] = acc_sc[g, c, :, 0:P] + s
            return
        prev = None
        for ct in range(HALF):
            total = _ep_column_total_jmajor(
                lambda r, sub: digs[(r, sub)], btj_flat, ct, P, HALF, R
            )
            if prev is not None:
                combine_into(g, prev[0], prev[1])
            prev = (ct, total)
        combine_into(g, prev[0], prev[1])

    digs = compute_digits(0)
    for g in range(G):
        digs_next = compute_digits(g + 1) if g + 1 < G else None
        do_dots(g, digs)
        digs = digs_next

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_sc[g, c]


def mega6_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj: jax.Array) -> jax.Array:
    """Same contract (and block geometry) as mega5_blind_rotate."""
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

    ablate = _ablate_knob()
    kwargs = {}
    if jax.default_backend() == "tpu":
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(_mega6_kernel, p=p, P=P, HALF=HALF, R=R, G=G,
                          ablate=ablate),
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


def _mega9_kernel(a_ref, acc0_ref, btj2_ref, out_ref, *acc_refs,
                  p: TFHEParams, P: int, HALF: int, R: int, G: int):
    """mega-v9: mega8 with ONE VMEM SCRATCH PER CHUNK instead of a single
    [G, ...] scratch.  The per-chunk dependency chains (rotate/decompose ->
    dot -> recombine) are already independent across chunks, but with one
    shared scratch buffer Mosaic's alias analysis must serialize the
    combine writes of chunk g against the rotate reads of chunk g+1;
    distinct buffers make the independence structural, so the scheduler is
    free to co-issue chunk g+1's VPU stream under chunk g's pending MXU
    dots (the measured ~50% non-MXU time that never overlapped)."""
    i = pl.program_id(1)
    Bt = acc_refs[0].shape[1]

    @pl.when(i == 0)
    def _():
        for g in range(G):
            for c in range(p.k + 1):
                acc_refs[g][c] = acc0_ref[g * Bt:(g + 1) * Bt, c, :]

    W = p.bg_bits * p.levels
    Bg = 1 << p.bg_bits
    half = Bg >> 1
    offset = sum(half << (p.bg_bits * t) for t in range(p.levels))
    C4P = btj2_ref.shape[-1]
    btj2_flat = btj2_ref[0].reshape(2 * HALF * R * P, C4P)

    def compute_digits(g):
        r_amt = a_ref[0, 0, g * Bt:(g + 1) * Bt].astype(U32)
        tiles = {}
        for c in range(p.k + 1):
            v = acc_refs[g][c]
            rolled = v
            for bit in range(p.log2_2N):
                sft = 1 << bit
                shifted = (
                    _neg_shift(rolled, sft, p.N) if sft < p.N
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
                sh = p.bg_bits * (p.levels - 1 - lev)
                d8 = (((val >> U32(sh)) & U32(Bg - 1)).astype(I32)
                      - I32(half)).astype(I8)
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[:, sub * P:(sub + 1) * P]
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
            acc_refs[g][c, :, ct * P:(ct + 1) * P] = (
                acc_refs[g][c, :, ct * P:(ct + 1) * P] + combined
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
            for c in range(p.k + 1):
                out_ref[g * Bt:(g + 1) * Bt, c, :] = acc_refs[g][c]


def mega9_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                       bsk_btj2: jax.Array) -> jax.Array:
    """Same contract as mega8_blind_rotate (windowed bsk_btj2 layout)."""
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
        functools.partial(_mega9_kernel, p=p, P=P, HALF=HALF, R=R, G=G),
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
            pltpu.VMEM((p.k + 1, Bt, p.N), U32) for _ in range(G)
        ],
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(a_t.reshape(p.n, 1, B), acc0, bsk_btj2)


def _mega10_kernel(a_ref, acc0_ref, btj2_ref, out_ref, acc_sc, *,
                   p: TFHEParams, P: int, HALF: int, R: int, G: int):
    """mega-v10: mega8's windowed single-dot contraction with the
    rotate/decompose VPU stream FUSED across the (k+1) accumulator polys.

    mega8 runs the barrel rotate, diff, gadget rounding and digit
    extraction (k+1) times per chunk-step on [Bt, N] arrays; the budget
    ablations (docs/BENCH_LOG.md "Revised budget") show this un-overlapped
    VPU stream — many small ops — is the entire remaining gap to the MXU
    floor.  Here the accumulator group is viewed as ONE [(k+1)*Bt, N]
    array: one barrel rotate, one diff, one rounding chain and one digit
    extraction per level for ALL polys — same element volume, (k+1)x fewer
    VPU ops, so per-op overhead stops dominating.  Digit tiles are then
    sliced from the fused array ((c, sub) sublane/lane blocks, both
    tile-aligned at Bt = 128, P = 128) into the same (sub ASC, r minor)
    pack and the identical sliding-window dots as mega8."""
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
    C4P = btj2_ref.shape[-1]
    btj2_flat = btj2_ref[0].reshape(2 * HALF * R * P, C4P)

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
        tiles: dict[tuple[int, int], jax.Array] = {}
        for lev in range(p.levels):
            shift = p.bg_bits * (p.levels - 1 - lev)
            d8 = (((val >> U32(shift)) & U32(Bg - 1)).astype(I32)
                  - I32(half)).astype(I8)                # [k+1, Bt, N]
            for c in range(kp1):
                row = c * p.levels + lev
                for sub in range(HALF):
                    tiles[(row, sub)] = d8[c, :, sub * P:(sub + 1) * P]
        return jnp.concatenate(
            [tiles[(r, sub)] for sub in range(HALF) for r in range(R)],
            axis=-1,
        )

    def combine_into(g, ct, total):
        a = total.reshape(total.shape[0], kp1, 4, P).astype(U32)
        for c in range(kp1):
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


def mega10_blind_rotate(params: TFHEParams, acc0: jax.Array, a_t: jax.Array,
                        bsk_btj2: jax.Array) -> jax.Array:
    """Same contract and key layout as mega8; fused-poly VPU stream."""
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
    return pl.pallas_call(
        functools.partial(_mega10_kernel, p=p, P=P, HALF=HALF, R=R, G=G),
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



def _register() -> None:
    bs.ROTATION_ENGINES = getattr(bs, "ROTATION_ENGINES", {})
    bs.ROTATION_ENGINES.setdefault("pallas_mega",
                                   (mega_blind_rotate, "bsk_bt"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega2",
                                   (mega2_blind_rotate, "bsk_bt"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega3",
                                   (mega3_blind_rotate, "bsk_btj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega4",
                                   (mega4_blind_rotate, "bsk_btj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega5",
                                   (mega5_blind_rotate, "bsk_btj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega6",
                                   (mega6_blind_rotate, "bsk_btj"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega9",
                                   (mega9_blind_rotate, "bsk_btj2"))
    bs.ROTATION_ENGINES.setdefault("pallas_mega10",
                                   (mega10_blind_rotate, "bsk_btj2"))


_register()
