"""Device-resident evaluation key material and its MXU-friendly layouts.

The host `core.reference.ServerKey` (what the coordinator's KeyService stores
per session, reference src/service/key_service.cpp:19-44) is re-laid-out at
upload time into the forms the device engines consume:

- ``bsk_ext``   u32 [n, R, k+1, 2N]      negacyclic-extended BSK polys
                                          (R = (k+1)*levels GGSW rows),
                                          ext(p) = concat(p, -p) — a Toeplitz
                                          row gather table.
- ``bsk_conv``  i8  [n, R, (k+1)*4, 2N-1] the same keys as int8-limb
                                          correlation kernels for
                                          lax.conv (MXU engine): kernel
                                          [o, row, dx] = limb_j(ext[(N-1-dx)
                                          mod 2N]) with o = col*4+j.
- ``ksk_limbs`` i8  [kN*t, (n+1)*4]      key-switching key as int8 limbs for
                                          one big MXU matmul.
- ``bsk_bt``    i8  [n, R, HALF, P, (k+1)*4*P]
    Block-Toeplitz expansion for the Pallas MXU engine (P = min(128, N),
    HALF = N/P).  The virtual external-product matrix
        M[(r, n_r), (c, n_c, j)] = limb_j(ext[r, c][(n_c - n_r) mod 2N])
    is Toeplitz at P-granularity: the P x P tile at (row-tile rt, col-tile
    ct) equals diagonal block m = (ct - rt) mod (2N/P) of the (r, c) poly.
    Since ext[t + N] = -ext[t] (negacyclic), block m + N/P is the negation
    of block m, so only HALF = N/P diagonal blocks are stored per poly and
    the kernel subtracts instead of adds when m >= N/P.  Storage:
    n * R * (k+1) * 4 * N * P bytes (~4.8 GiB for STD128).
- ``bsk_btj``   i8  [n, HALF, R, P, (k+1)*4*P]
    The same blocks with the stored-diagonal index j MAJOR and the GGSW
    row r minor.  With j-major rows, the positive (j <= ct) and negative
    (j > ct) runs of a column tile stay contiguous ACROSS all R rows, so
    the whole external product for one column tile is TWO MXU dots with
    K up to R*N — the per-row partial sums accumulate inside the systolic
    array instead of as R-1 [Bt, C4P] i32 VPU adds (pallas_mega3).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.core.reference import ServerKey


def _np_ext(p: np.ndarray) -> np.ndarray:
    """concat(p, -p) over the last axis (uint32)."""
    return np.concatenate([p, (np.uint32(0) - p)], axis=-1)


def _np_i8_limbs(x: np.ndarray) -> np.ndarray:
    """Balanced signed base-256 limbs: [...] u32 -> [..., 4] int8."""
    u = x.astype(np.uint32) + np.uint32(0x80808080)
    shifts = np.array([0, 8, 16, 24], dtype=np.uint32)
    limbs = (u[..., None] >> shifts) & np.uint32(0xFF)
    return (limbs.astype(np.int32) - 128).astype(np.int8)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceServerKey:
    params: TFHEParams = dataclasses.field(metadata=dict(static=True))
    bsk_ext: Any       # u32 [n, R, k+1, 2N]
    bsk_conv: Any      # i8  [n, R, (k+1)*4, 2N-1]
    bsk_bt: Any        # i8  [n, R, HALF, P, (k+1)*4*P] block-Toeplitz (below)
    ksk_limbs: Any     # i8  [kN*ks_levels, (n+1)*4]
    ksk: Any           # u32 [kN, ks_levels, n+1] (fallback engine)
    bsk_btj: Any = None  # i8 [n, HALF, R, P, (k+1)*4*P] j-major BT (mega3)
    bsk_btj2: Any = None  # i8 [n, 2*HALF, R, P, (k+1)*4*P] windowed (mega8)
    bsk_btj2j: Any = None  # as btj2 with (j, c, q) column order (mega11)
    bsk_btjj: Any = None   # as btj with (j, c, q) column order (mega12)
    bsk_btT: Any = None    # i8 [n, k+1, C4P, KEXT] transposed (mega13)
    bsk_btT2: Any = None   # i8 [n, C4P, KEXT] pt-major transposed (mega14)
    bsk_btT4: Any = None   # i8 [n, k+1, C4P, 4N] l=4 single-width (mega15)
    bsk_btTs: Any = None   # i8 [n, k+1, C4P, 2N] l=2 single-width (mega16)
    bsk_btT3: Any = None   # i8 [n, k+1, C4P, 3N] l=3 single-width (mega17)

    @property
    def R(self) -> int:
        p = self.params
        return (p.k + 1) * p.levels


def _enable_compile_cache() -> None:
    """Key-prep cost is COMPILE-dominated (the flat btT build runs in
    ~4 s but its slice-stack HLO takes ~70-100 s to compile); the
    persistent compilation cache turns every later session's prep into
    seconds (measured 3.2 s warm vs 68.7 s cold through the axon tunnel,
    scripts/probe_btT_prep.py).  Respects an explicit
    JAX_COMPILATION_CACHE_DIR; disable with HERDSMAN_NO_COMPILE_CACHE=1.
    Default location is PER-USER (~/.cache/herdsman/jax, uid-suffixed /tmp
    fallback) — a world-shared fixed /tmp path could be pre-created or
    poisoned by another local user (round-4 advisor finding)."""
    if os.environ.get("HERDSMAN_NO_COMPILE_CACHE"):
        return
    try:
        if not jax.config.jax_compilation_cache_dir:
            default = os.path.join(
                os.path.expanduser("~"), ".cache", "herdsman", "jax")
            try:
                os.makedirs(default, exist_ok=True)
            except OSError:
                default = f"/tmp/herdsman_jax_cache_{os.getuid()}"
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR", default))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def device_server_key(
    sk: ServerKey, layouts: tuple[str, ...] = ("bsk_ext", "bsk_conv")
) -> DeviceServerKey:
    """Host-side re-layout of the server key into device engine formats.

    ``layouts`` selects which BSK layouts to materialize/ship (each is
    ~O(n*R*(k+1)*2N) bytes; skip the ones your engine doesn't use to save
    HBM and transfer time).
    """
    _enable_compile_cache()
    p = sk.params
    R = (p.k + 1) * p.levels
    N = p.N
    bsk = sk.bsk.reshape(p.n, R, p.k + 1, N)
    ext = _np_ext(bsk)  # [n, R, k+1, 2N]

    bsk_conv = None
    if "bsk_conv" in layouts:
        # conv kernel layout: [n, R, k+1, 4, 2N-1] -> merge (k+1,4) out chans
        dx = np.arange(2 * N - 1)
        w_idx = (N - 1 - dx) % (2 * N)  # [2N-1]
        conv_src = ext[..., w_idx]  # [n, R, k+1, 2N-1] u32
        conv_limbs = _np_i8_limbs(conv_src)  # [n, R, k+1, 2N-1, 4]
        bsk_conv = jnp.asarray(
            np.moveaxis(conv_limbs, -1, 3)
            .reshape(p.n, R, (p.k + 1) * 4, 2 * N - 1)
        )

    bsk_bt = None
    if "bsk_bt" in layouts:
        bsk_bt = _block_toeplitz_layout_device(p, ext)

    bsk_btj = None
    if "bsk_btj" in layouts:
        if bsk_bt is not None:
            bsk_btj = jax.jit(
                lambda x: jnp.transpose(x, (0, 2, 1, 3, 4)))(bsk_bt)
        else:
            bsk_btj = _block_toeplitz_layout_device(p, ext, j_major=True)

    bsk_btj2 = None
    if "bsk_btj2" in layouts:
        bsk_btj2 = _block_toeplitz_layout_device(p, ext, windowed=True)

    bsk_btjj = None
    if "bsk_btjj" in layouts:
        bsk_btjj = _block_toeplitz_layout_device(p, ext, j_major=True,
                                                 col_order="jcq")

    bsk_btj2j = None
    if "bsk_btj2j" in layouts:
        bsk_btj2j = _block_toeplitz_layout_device(p, ext, windowed=True,
                                                  col_order="jcq")

    bsk_btT = None
    if "bsk_btT" in layouts:
        bsk_btT = _btT_layout_device(p, ext)

    bsk_btT2 = None
    if "bsk_btT2" in layouts:
        bsk_btT2 = _btT_layout_device(p, ext, pt_major=True)

    bsk_btT4 = None
    if "bsk_btT4" in layouts:
        bsk_btT4 = _btT4_layout_device(p, ext)

    bsk_btTs = None
    if "bsk_btTs" in layouts:
        bsk_btTs = _btTs_layout_device(p, ext)

    bsk_btT3 = None
    if "bsk_btT3" in layouts:
        bsk_btT3 = _btT3_layout_device(p, ext)

    ksk = sk.ksk  # [kN, t, n+1] u32
    ksk_limbs = _np_i8_limbs(ksk).reshape(p.kN * p.ks_levels, (p.n + 1) * 4)

    return DeviceServerKey(
        params=p,
        bsk_ext=jnp.asarray(ext) if "bsk_ext" in layouts else None,
        bsk_conv=bsk_conv,
        bsk_bt=bsk_bt,
        ksk_limbs=jnp.asarray(ksk_limbs),
        ksk=jnp.asarray(ksk) if "ksk" in layouts else None,
        bsk_btj=bsk_btj,
        bsk_btj2=bsk_btj2,
        bsk_btj2j=bsk_btj2j,
        bsk_btjj=bsk_btjj,
        bsk_btT=bsk_btT,
        bsk_btT2=bsk_btT2,
        bsk_btT4=bsk_btT4,
        bsk_btTs=bsk_btTs,
        bsk_btT3=bsk_btT3,
    )


def _btT_layout_device(p: TFHEParams, ext: np.ndarray,
                       pt_major: bool = False) -> jax.Array:
    """mega13's transposed key via the FLAT-INTERLEAVE Toeplitz build.

    The round-3 builder (kept below as `_btT_layout_device_ref`, still
    used for mega14's pt-major variant) assembled [pt, b, c_in, c_out, w,
    q, j] blocks and finished with a 7-dim transpose interleaving the two
    size-4 axes through the 128x128 minor tiles — XLA lowers that to a
    near-gather and a production key took 450 s on device (BENCH_r03).

    Observation: with the digit byte b PRE-INTERLEAVED into the
    polynomial axis, the whole key column space flattens to ONE Toeplitz
    index.  Define per step i the reversed 4-way table

        Grev[ci, co, u*4 + b] = limb_j( ext[i, ci*levels + lev(b), co]
                                        [ (N - 1 - u - toff(b)) mod 2N ] )

    (lev(b) = levels-1-(b%2), toff(b) = (b//2)*N/2).  Then with the flat
    column index c' = pt*4P + w*4 + b and row tile coordinate q:

        keyT[..., q, c'] = Grev[(P-1-q)*4 + c']

    — for fixed q a CONTIGUOUS slice of length KEXT, so the build is: one
    limb split of the small ext step, one reversal, 4 row-selected
    slices, and a P-slice Toeplitz stack, all pure data movement (the
    same structure as `_block_toeplitz_layout_device`).  ~14x faster on
    hardware (scripts/probe_btT_prep.py).  Bit-identical to the ref
    builder (tests/test_ops_bitexact.py::test_btT_flat_matches_ref).
    """
    if pt_major:
        return _btT_layout_device_ref(p, ext, pt_major=True)
    n, R, kp1, twoN = ext.shape
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 2, \
        "bsk_btT needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N >= 2 * P, "bsk_btT needs N >= 2P (pair packing)"
    PT_EXT = p.N // (2 * P) + HALF - 1
    KEXT = PT_EXT * P * 4
    x = jnp.asarray(ext)
    # C=4 balances compile size vs per-step overhead (68.7 s cold compile
    # vs C=16's 101.7 s; execution is ~1 s either way)
    C = max(1, int(os.environ.get("HERDSMAN_BTT_CHUNK", "4")))
    while n % C:
        C //= 2
    # NB: the final [n//C, C, ...] -> [n, ...] reshape must live INSIDE
    # the jit: as a standalone dispatch it holds input + output buffers
    # concurrently (2 x 8.4 GiB at STD128_K2 -> device OOM)
    return _btT_jit(p, n, R, kp1, twoN, C)(x)


@functools.lru_cache(maxsize=8)
def _btT_jit(p: TFHEParams, n: int, R: int, kp1: int, twoN: int, C: int):
    """Cached jitted flat-interleave builder (see _btT_layout_device)."""
    P, HALF = bt_tile(p)
    PT_EXT = p.N // (2 * P) + HALF - 1
    KEXT = PT_EXT * P * 4
    U = 3 * p.N // 2
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    row_sel = [jnp.asarray([c * p.levels + (p.levels - 1 - (b % 2))
                            for c in range(kp1)]) for b in range(4)]

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        u32 = e + jnp.uint32(0x80808080)
        limbs = (((u32[None] >> shifts[:, None, None, None])
                  & jnp.uint32(0xFF)).astype(jnp.int32) - 128).astype(
            jnp.int8)  # [4(j), R, kp1, 2N]
        red = jnp.concatenate([limbs, limbs, limbs], axis=-1)[..., ::-1]
        # red[..., s] = limb[..., (-1 - s) mod 2N]
        planes = []
        for b in range(4):
            toff = (b // 2) * (p.N // 2)
            sel = jnp.take(red, row_sel[b], axis=1)  # [4, ci, co, 6N]
            planes.append(jax.lax.slice_in_dim(
                sel, toff + p.N, toff + p.N + U, axis=-1))
        q_flat = jnp.stack(planes, axis=-1).reshape(4, kp1, kp1, U * 4)
        rows_q = jnp.stack(
            [jax.lax.slice_in_dim(q_flat, (P - 1 - q) * 4,
                                  (P - 1 - q) * 4 + KEXT, axis=-1)
             for q in range(P)],
            axis=3,
        )  # [4(j), ci, co, P(q), KEXT]
        t = jnp.transpose(rows_q, (1, 0, 2, 3, 4))  # [ci, j, co, q, KEXT]
        return t.reshape(kp1, 4 * kp1 * P, KEXT)

    if C > 1:
        f = jax.vmap(one)
        return jax.jit(lambda a: jax.lax.map(
            f, a.reshape(n // C, C, R, kp1, twoN)).reshape(
                n, kp1, 4 * kp1 * P, KEXT))
    return jax.jit(lambda a: jax.lax.map(one, a))


def _btT4_layout_device(p: TFHEParams, ext: np.ndarray) -> jax.Array:
    """mega15's l=4 SINGLE-WIDTH transposed key: [n, k+1, C4P, 4N] i8.

    The l=4 byte-aligned gadget (bg=2^8, W=32, EXACT decomposition) puts
    one coefficient's 4 digit bytes in each u32, so the bitcast digit
    stream needs no pair packing and — because mega15 slides the DIGIT
    window (a slice of the precomputed negacyclic +-diff stream) instead
    of the key — the key is single-width:

        keyT4[i, c_in, (j, c_out, q), (w, b)] =
            limb_j( ext[i, c_in*levels + (levels-1-b), c_out]
                    [ (q - w) mod 2N ] )

    (byte 0 = LSB digit = level levels-1).  Same flat-interleave Toeplitz
    build as ``bsk_btT``: with the reversed b-interleaved table
    T[u*4+b] = poly_row(b)[P-1-u], row tile q is the contiguous slice
    starting at (P-1-q)*4 of length 4N.  Built per VERDICT r3 #8 — the
    N=2048-tier l=4 hardware A/B."""
    n, R, kp1, twoN = ext.shape
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 4, \
        "bsk_btT4 needs the byte-aligned l=4 gadget (bg_bits=8, levels=4)"
    C = max(1, int(os.environ.get("HERDSMAN_BTT_CHUNK", "4")))
    while n % C:
        C //= 2
    return _btT4_jit(p, n, R, kp1, twoN, C)(jnp.asarray(ext))


@functools.lru_cache(maxsize=8)
def _btT4_jit(p: TFHEParams, n: int, R: int, kp1: int, twoN: int, C: int):
    P, HALF = bt_tile(p)
    KEXT = 4 * p.N
    U = p.N + P - 1
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    row_sel = [jnp.asarray([c * p.levels + (p.levels - 1 - b)
                            for c in range(kp1)]) for b in range(4)]

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        u32 = e + jnp.uint32(0x80808080)
        limbs = (((u32[None] >> shifts[:, None, None, None])
                  & jnp.uint32(0xFF)).astype(jnp.int32) - 128).astype(
            jnp.int8)  # [4(j), R, kp1, 2N]
        red = jnp.concatenate([limbs, limbs, limbs], axis=-1)[..., ::-1]
        # red[..., s] = limb[..., (-1 - s) mod 2N]; T[u] = poly[P-1-u]
        # = red[(u - P) mod 2N] -> slice at offset 2N - P
        planes = []
        for b in range(4):
            sel = jnp.take(red, row_sel[b], axis=1)  # [4, ci, co, 6N]
            planes.append(jax.lax.slice_in_dim(
                sel, twoN - P, twoN - P + U, axis=-1))
        q_flat = jnp.stack(planes, axis=-1).reshape(4, kp1, kp1, U * 4)
        rows_q = jnp.stack(
            [jax.lax.slice_in_dim(q_flat, (P - 1 - q) * 4,
                                  (P - 1 - q) * 4 + KEXT, axis=-1)
             for q in range(P)],
            axis=3,
        )  # [4(j), ci, co, P(q), 4N]
        t = jnp.transpose(rows_q, (1, 0, 2, 3, 4))  # [ci, j, co, q, 4N]
        return t.reshape(kp1, 4 * kp1 * P, KEXT)

    if C > 1:
        f = jax.vmap(one)
        return jax.jit(lambda a: jax.lax.map(
            f, a.reshape(n // C, C, R, kp1, twoN)).reshape(
                n, kp1, 4 * kp1 * P, KEXT))
    return jax.jit(lambda a: jax.lax.map(one, a))


def _btTs_layout_device(p: TFHEParams, ext: np.ndarray) -> jax.Array:
    """mega16's l=2 SINGLE-WIDTH transposed key: [n, k+1, C4P, 2N] i8.

    The l=2 byte-aligned gadget with ADJACENT-pair packing (coefficients
    2r', 2r'+1 share a u32, unlike mega13's (r, r+N/2) halves-pairing):
    adjacency makes the negacyclic wrap boundary a single contiguous
    sublane split, so the output-tile shift moves to the digit stream
    (mega15's wrap-split dots) and the key needs NO sliding-window
    extension — 2.5x smaller than ``bsk_btT`` (3.62 vs 9.06 GiB at
    STD128_K2) and the first flagship-class layout that FITS the N=2048
    tier (6.44 GiB at STD128_SHORTINT_FAST vs 18.5 GiB for the extended
    form, over HBM).

    With the flat column index κ = 2z + lb (z = 2w' + (b//2) the stream
    coefficient offset, lb = b%2 the byte-within-value):

        keyT[i, c_in, (j, c_out, q), κ] =
            limb_j( ext[i, c_in*levels + (1 - lb), c_out]
                    [ (q - z) mod 2N ] )

    — same flat-interleave Toeplitz build as ``bsk_btT4`` at 2-fold (not
    4-fold) interleave: T[u*2+lb] = poly_row(1-lb)[P-1-u], row tile q =
    the contiguous slice starting at (P-1-q)*2 of length 2N."""
    n, R, kp1, twoN = ext.shape
    assert p.bg_bits == 8 and p.levels == 2, \
        "bsk_btTs needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N % 2 == 0, "bsk_btTs needs even N (adjacent-pair packing)"
    C = max(1, int(os.environ.get("HERDSMAN_BTT_CHUNK", "4")))
    while n % C:
        C //= 2
    return _btTs_jit(p, n, R, kp1, twoN, C)(jnp.asarray(ext))


@functools.lru_cache(maxsize=8)
def _btTs_jit(p: TFHEParams, n: int, R: int, kp1: int, twoN: int, C: int):
    P, HALF = bt_tile(p)
    KEXT = 2 * p.N
    U = p.N + P - 1
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    row_sel = [jnp.asarray([c * p.levels + (p.levels - 1 - lb)
                            for c in range(kp1)]) for lb in range(2)]

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        u32 = e + jnp.uint32(0x80808080)
        limbs = (((u32[None] >> shifts[:, None, None, None])
                  & jnp.uint32(0xFF)).astype(jnp.int32) - 128).astype(
            jnp.int8)  # [4(j), R, kp1, 2N]
        red = jnp.concatenate([limbs, limbs, limbs], axis=-1)[..., ::-1]
        planes = []
        for lb in range(2):
            sel = jnp.take(red, row_sel[lb], axis=1)  # [4, ci, co, 6N]
            planes.append(jax.lax.slice_in_dim(
                sel, twoN - P, twoN - P + U, axis=-1))
        q_flat = jnp.stack(planes, axis=-1).reshape(4, kp1, kp1, U * 2)
        rows_q = jnp.stack(
            [jax.lax.slice_in_dim(q_flat, (P - 1 - q) * 2,
                                  (P - 1 - q) * 2 + KEXT, axis=-1)
             for q in range(P)],
            axis=3,
        )  # [4(j), ci, co, P(q), 2N]
        t = jnp.transpose(rows_q, (1, 0, 2, 3, 4))  # [ci, j, co, q, 2N]
        return t.reshape(kp1, 4 * kp1 * P, KEXT)

    if C > 1:
        f = jax.vmap(one)
        return jax.jit(lambda a: jax.lax.map(
            f, a.reshape(n // C, C, R, kp1, twoN)).reshape(
                n, kp1, 4 * kp1 * P, KEXT))
    return jax.jit(lambda a: jax.lax.map(one, a))


def _btT3_layout_device(p: TFHEParams, ext: np.ndarray) -> jax.Array:
    """mega17's l=3 SINGLE-WIDTH transposed key: [n, k+1, C4P, 3N] i8.

    The byte-aligned l=3 gadget (bg=2^8, W=24) gives each coefficient
    THREE digit bytes; mega17 packs four coefficients' 12 digits into
    three u32s (3-of-4 packing, zero wasted bytes/MACs), so the bitcast
    byte stream at position s decodes as coefficient z = s // 3, byte
    lb = s % 3 (byte 0 = LSB digit = level levels-1).  Adjacent-coefficient
    order keeps the negacyclic wrap a single contiguous sublane split at
    3*(N - ct*P), so the output-tile shift rides the digit stream
    (mega15/16's wrap-split dots) and the key is single-width:

        keyT3[i, c_in, (j, c_out, q), 3z + lb] =
            limb_j( ext[i, c_in*levels + (levels-1-lb), c_out]
                    [ (q - z) mod 2N ] )

    — the same flat-interleave Toeplitz build as ``bsk_btTs`` at 3-fold
    interleave: T[u*3+lb] = poly_row(lb)[P-1-u], row tile q = the
    contiguous slice starting at (P-1-q)*3 of length 3N.  Same R = 6 MAC
    count as STD128_SHORTINT's bg=2^7 l=3 gadget; built for the
    integer-tier kernel-class A/B (VERDICT r4 #1; the worker herd this
    tier replaces: reference grpc_worker_group.cpp:85-94)."""
    n, R, kp1, twoN = ext.shape
    assert p.bg_bits == 8 and p.levels == 3, \
        "bsk_btT3 needs the byte-aligned l=3 gadget (bg_bits=8, levels=3)"
    assert p.N % 4 == 0, "bsk_btT3 needs N % 4 == 0 (3-of-4 packing)"
    C = max(1, int(os.environ.get("HERDSMAN_BTT_CHUNK", "4")))
    while n % C:
        C //= 2
    return _btT3_jit(p, n, R, kp1, twoN, C)(jnp.asarray(ext))


@functools.lru_cache(maxsize=8)
def _btT3_jit(p: TFHEParams, n: int, R: int, kp1: int, twoN: int, C: int):
    P, HALF = bt_tile(p)
    KEXT = 3 * p.N
    U = p.N + P - 1
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    row_sel = [jnp.asarray([c * p.levels + (p.levels - 1 - lb)
                            for c in range(kp1)]) for lb in range(3)]

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        u32 = e + jnp.uint32(0x80808080)
        limbs = (((u32[None] >> shifts[:, None, None, None])
                  & jnp.uint32(0xFF)).astype(jnp.int32) - 128).astype(
            jnp.int8)  # [4(j), R, kp1, 2N]
        red = jnp.concatenate([limbs, limbs, limbs], axis=-1)[..., ::-1]
        planes = []
        for lb in range(3):
            sel = jnp.take(red, row_sel[lb], axis=1)  # [4, ci, co, 6N]
            planes.append(jax.lax.slice_in_dim(
                sel, twoN - P, twoN - P + U, axis=-1))
        q_flat = jnp.stack(planes, axis=-1).reshape(4, kp1, kp1, U * 3)
        rows_q = jnp.stack(
            [jax.lax.slice_in_dim(q_flat, (P - 1 - q) * 3,
                                  (P - 1 - q) * 3 + KEXT, axis=-1)
             for q in range(P)],
            axis=3,
        )  # [4(j), ci, co, P(q), 3N]
        t = jnp.transpose(rows_q, (1, 0, 2, 3, 4))  # [ci, j, co, q, 3N]
        return t.reshape(kp1, 4 * kp1 * P, KEXT)

    if C > 1:
        f = jax.vmap(one)
        return jax.jit(lambda a: jax.lax.map(
            f, a.reshape(n // C, C, R, kp1, twoN)).reshape(
                n, kp1, 4 * kp1 * P, KEXT))
    return jax.jit(lambda a: jax.lax.map(one, a))


def _btT_layout_device_ref(p: TFHEParams, ext: np.ndarray,
                           pt_major: bool = False) -> jax.Array:
    """mega13's TRANSPOSED windowed key: [n, k+1(c_in), C4P, KEXT] i8.

    The mega13 kernel keeps the accumulator as [k+1, N, Bt] (coefficients
    on SUBLANES, batch on LANES) so the gadget digits come straight out of
    ``pltpu.bitcast(u32 -> i8)`` — which expands along sublanes — with
    ZERO per-level shift extraction and ZERO tile re-concatenation.  Two
    coefficients' digit pairs (r, r + N/2) are packed per u32, so the
    bitcast byte stream at sublane 4r + b decodes as:

        lev(b)  = levels - 1 - (b % 2)     (byte 0 = LSB digit)
        coeff(b) = r + (b // 2) * N/2

    Rows are (j_limb, c_out, q) — mega11's limb-major recombine order, so
    limb planes slice contiguously (now on sublanes).  Columns are
    (pt_ext, w, b) with r = pt*P + w; column tile ct of the output slices
    the window [ (HALF-1-ct)*4P : ... + (N/(2P))*4P ] per c_in — the
    sliding-window trick of bsk_btj2 along the new contraction order
    (extension factor (N/2 + (HALF-1)P) / (N/2), ~2.5x base at K2 vs
    btj2j's 2x).

        keyT[i, c_in, (j,c_out,q), (pt,w,b)] =
          limb_j( ext[i, c_in*levels + lev(b), c_out]
                  [ ((HALF-1-pt)*P + q - w - (b//2)*(N//2)) mod 2N ] )

    Requires bg_bits == 8, levels == 2 (byte-aligned digits) and
    N >= 2P."""
    n, R, kp1, twoN = ext.shape
    P, HALF = bt_tile(p)
    assert p.bg_bits == 8 and p.levels == 2, \
        "bsk_btT needs byte-aligned digits (bg_bits=8, levels=2)"
    assert p.N >= 2 * P, "bsk_btT needs N >= 2P (pair packing)"
    PT = p.N // (2 * P)
    PT_EXT = PT + HALF - 1
    span = twoN + P
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        # slices reach up to index 2*2N + P: triple the poly
        ed = jnp.concatenate([e, e, e], axis=-1)  # [R, kp1, 6N]
        rows = jnp.stack(
            [jax.lax.slice_in_dim(ed, twoN - w, twoN - w + span, axis=-1)
             for w in range(P)],
            axis=2,
        )  # [R, kp1, P(w), span]; [..., w, t] = e[(t - w) mod 2N]
        cols = []
        for pt in range(PT_EXT):
            for b in range(4):
                lev = p.levels - 1 - (b % 2)
                toff = (b // 2) * (p.N // 2)
                o = ((HALF - 1 - pt) * P - toff) % twoN
                blk = jax.lax.slice_in_dim(rows, o, o + P, axis=-1)
                # pick GGSW row c_in*levels + lev per c_in
                sel = jnp.take(
                    blk,
                    jnp.asarray([c * p.levels + lev for c in range(kp1)]),
                    axis=0,
                )  # [kp1(c_in), kp1(c_out), P(w), P(q)] u32
                cols.append(sel)
        colsA = jnp.stack(cols, axis=0).reshape(
            PT_EXT, 4, kp1, kp1, P, P)
        u = colsA + jnp.uint32(0x80808080)
        limbs = ((u[..., None] >> shifts) & jnp.uint32(0xFF)).astype(
            jnp.int32) - 128
        if pt_major:
            # mega14: columns (pt_ext, c_in, w, b) — ONE dot per output
            # tile (the kernel reorders its digit stream to match with a
            # cheap outer-dim transpose before the bitcast)
            # [pt, b, c_in, c_out, w, q, j] -> [j, c_out, q, pt, c_in, w, b]
            t = jnp.transpose(limbs.astype(jnp.int8), (6, 3, 5, 0, 2, 4, 1))
            return t.reshape(4 * kp1 * P, PT_EXT * kp1 * P * 4)
        # [pt, b, c_in, c_out, w, q, j] -> [c_in, j, c_out, q, pt, w, b]
        t = jnp.transpose(limbs.astype(jnp.int8), (2, 6, 3, 5, 0, 4, 1))
        return t.reshape(kp1, 4 * kp1 * P, PT_EXT * P * 4)

    return jax.jit(lambda x: jax.lax.map(one, x))(jnp.asarray(ext))


def layouts_for_engine(engine: str) -> tuple[str, ...]:
    """Key layout(s) an engine consumes (single source of truth — used by
    the eager API, shortint, the coordinator and bench)."""
    if engine == "pallas_mega13":
        return ("bsk_btT",)
    if engine == "pallas_mega14":
        return ("bsk_btT2",)
    if engine == "pallas_mega15":
        return ("bsk_btT4",)
    if engine == "pallas_mega16":
        return ("bsk_btTs",)
    if engine == "pallas_mega17":
        return ("bsk_btT3",)
    if engine == "pallas_mega11":
        return ("bsk_btj2j",)
    if engine == "pallas_mega12":
        return ("bsk_btjj",)
    if engine in ("pallas_mega8", "pallas_mega9", "pallas_mega10"):
        return ("bsk_btj2",)
    if engine in ("pallas_mega3", "pallas_mega4", "pallas_mega5",
                  "pallas_mega6", "pallas_mega7"):
        return ("bsk_btj",)
    if engine.startswith("pallas"):
        return ("bsk_bt",)
    if engine == "conv_i8":
        return ("bsk_conv",)
    return ("bsk_ext",)


def fit_engine(engine: str, params: TFHEParams,
               hbm_budget_bytes: int = 12 * (1 << 30)) -> str:
    """Engine the key material actually fits on-device for ``params``.

    mega8/9's windowed ``bsk_btj2`` layout stores all 2*HALF diagonal
    groups — double the single-width key; at N = 2048 shortint params that
    is ~19 GiB, over v5e HBM.  Falls back to pallas_mega12 (single-width
    ``bsk_btjj``, limb-major recombine — measured +6.3% over mega7 at the
    N = 2048 tier: 1130.7 vs 1064.1 bootstraps/s/chip, round-3 hardware
    A/B via scripts/ab_shortint_engine.py) when the doubled layout would
    not fit.  Every entry point that builds a DeviceServerKey from an
    engine name (eager API, shortint, coordinator, bench) must route
    through this so none of them can OOM the device at key ingest."""
    P, HALF = bt_tile(params)
    btj2_bytes = (params.n * 2 * HALF * (params.k + 1) * params.levels
                  * P * (params.k + 1) * 4 * P)
    if engine in ("pallas_mega13", "pallas_mega14"):
        # transposed key: n * (k+1) * C4P * KEXT bytes, and the engine
        # needs byte-aligned digits + pair packing; when the extended key
        # cannot serve, prefer mega16 (same kernel class, single-width
        # key — e.g. the N=2048 shortint_fast tier, where it measured
        # +5.9% over mega12, BENCH_LOG r4), then mega11's doubled key,
        # else the single-width mega12
        PT_EXT = params.N // (2 * P) + HALF - 1
        btT_bytes = (params.n * (params.k + 1) * 4 * (params.k + 1) * P
                     * PT_EXT * P * 4)
        if (params.bg_bits == 8 and params.levels == 2
                and params.N >= 2 * P and btT_bytes <= hbm_budget_bytes):
            return engine
        btTs_bytes = (params.n * (params.k + 1) * (params.k + 1) * 4
                      * P * 2 * params.N)
        if (params.bg_bits == 8 and params.levels == 2
                and params.N % 2 == 0 and btTs_bytes <= hbm_budget_bytes):
            return "pallas_mega16"
        return ("pallas_mega11" if btj2_bytes <= hbm_budget_bytes
                else "pallas_mega12")
    if engine == "pallas_mega16":
        # l=2 single-width key: n*(k+1)^2*4P*2N bytes — 2.5x smaller than
        # mega13's extended bsk_btT; serves both the K2 flagship and the
        # N=2048 byte-aligned (shortint_fast) tier
        btTs_bytes = (params.n * (params.k + 1) * (params.k + 1) * 4
                      * P * 2 * params.N)
        if (params.bg_bits == 8 and params.levels == 2
                and params.N % 2 == 0 and btTs_bytes <= hbm_budget_bytes):
            return engine
        return ("pallas_mega11" if btj2_bytes <= hbm_budget_bytes
                else "pallas_mega12")
    if engine == "pallas_mega17":
        # l=3 byte-aligned single-width key: n*(k+1)^2*4P*3N bytes
        # (9.66 GiB at STD128_SHORTINT_B8 — same bytes as mega12's btjj
        # at the same R); needs the bg=2^8 l=3 gadget, else the generic
        # single-width mega12 serves the l=3 tier
        btT3_bytes = (params.n * (params.k + 1) * (params.k + 1) * 4
                      * P * 3 * params.N)
        if (params.bg_bits == 8 and params.levels == 3
                and params.N % 4 == 0 and btT3_bytes <= hbm_budget_bytes):
            return engine
        return ("pallas_mega11" if btj2_bytes <= hbm_budget_bytes
                else "pallas_mega12")
    if engine == "pallas_mega15":
        # l=4 byte-aligned tier probe (12.9 GiB key at N=2048) — outside
        # the serving budget and measured strictly worse than mega12 at
        # the N=2048 tier (4/3 more MACs, docs/BENCH_LOG.md round 4);
        # production configs fall back like the mega13 family
        btT4_bytes = (params.n * (params.k + 1) * (params.k + 1) * 4
                      * P * 4 * params.N)
        if (params.bg_bits == 8 and params.levels == 4
                and btT4_bytes <= hbm_budget_bytes):
            return engine
        return ("pallas_mega11" if btj2_bytes <= hbm_budget_bytes
                else "pallas_mega12")
    if engine not in ("pallas_mega8", "pallas_mega9", "pallas_mega10",
                      "pallas_mega11"):
        return engine
    if btj2_bytes > hbm_budget_bytes:
        return "pallas_mega12"
    return engine


def bt_tile(params: TFHEParams) -> tuple[int, int]:
    """(P, HALF) for the block-Toeplitz layout: P = min(128, N), HALF = N/P."""
    P = min(128, params.N)
    return P, params.N // P


def _block_toeplitz_layout(p: TFHEParams, ext: np.ndarray) -> np.ndarray:
    """Build bsk_bt [n, R, HALF, P, (k+1)*4*P] int8 from ext [n, R, k+1, 2N].

    Stored diagonal block m (m in [0, HALF)) at (p_row, q_col) holds
    limb_j(ext[r, c][(P*m + q - p_row) mod 2N]); columns ordered (c, j, q).
    Blocks m in [HALF, 2*HALF) are the negations (ext[t+N] = -ext[t]) and are
    reconstructed by the kernel via subtraction.
    """
    n, R, kp1, twoN = ext.shape
    P, HALF = bt_tile(p)
    m_idx = np.arange(HALF)[:, None, None]
    p_idx = np.arange(P)[None, :, None]
    q_idx = np.arange(P)[None, None, :]
    idx = (P * m_idx + q_idx - p_idx) % twoN  # [HALF, P, P]
    out = np.empty((n, R, HALF, P, kp1 * 4 * P), dtype=np.int8)
    step = max(1, (1 << 28) // (R * kp1 * HALF * P * P * 4))  # ~256MB chunks
    for i0 in range(0, n, step):
        i1 = min(i0 + step, n)
        blocks = ext[i0:i1][..., idx]  # [chunk, R, k+1, HALF, P, P] u32
        limbs = _np_i8_limbs(blocks)   # [chunk, R, k+1, HALF, P, P, 4]
        # -> [chunk, R, HALF, P, k+1, 4, P]
        reord = np.transpose(limbs, (0, 1, 3, 4, 2, 6, 5))
        out[i0:i1] = reord.reshape(i1 - i0, R, HALF, P, kp1 * 4 * P)
    return out


def _block_toeplitz_layout_device(p: TFHEParams, ext: np.ndarray,
                                  j_major: bool = False,
                                  windowed: bool = False,
                                  col_order: str = "cjq") -> jax.Array:
    """`_block_toeplitz_layout` computed ON DEVICE: ships only ext
    (n*R*(k+1)*2N u32, ~50 MB at STD128_FAST) and expands with a jitted
    per-step gather + limb split (`lax.map` over the n steps), writing the
    multi-GB bt layout straight into HBM. The chunked-NumPy host path takes
    ~15 min for a production key; this takes seconds and removes the
    multi-GB host->device transfer entirely. Bit-identical to the NumPy
    layout (tests/test_ops_bitexact.py::test_bt_layout_device_matches_host).
    """
    n, R, kp1, twoN = ext.shape
    P, HALF = bt_tile(p)
    shifts = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)

    def one(e: jax.Array) -> jax.Array:  # e [R, kp1, 2N] u32
        # blocks[m, p_row, q] = e[(P*m + q - p_row) mod 2N].  A gather with
        # that index set is ~1 elem/cycle on the TPU (hundreds of seconds
        # for a production key); but for FIXED p_row it is a contiguous
        # slice of the doubled poly, so build it as P static slices instead
        # (zero gather work, pure data movement).
        span = twoN if windowed else p.N
        M = 2 * HALF if windowed else HALF
        ed = jnp.concatenate([e, e], axis=-1)  # [R, kp1, 4N]
        rows = jnp.stack(
            [jax.lax.slice_in_dim(ed, twoN - pr, twoN - pr + span, axis=-1)
             for pr in range(P)],
            axis=2,
        )  # [R, kp1, P, span]; [..., pr, t] = e[(t - pr) mod 2N]
        blocks = jnp.swapaxes(
            rows.reshape(R, kp1, P, M, P), 2, 3
        )  # [R, kp1, M, P, P] u32
        if windowed:
            # sliding-window group order for pallas_mega8: group g holds
            # diagonal block m = (HALF-1-g) mod 2*HALF, so column tile ct's
            # whole contraction (positive run j <= ct, negated run j > ct —
            # block m = j + HALF IS -block m = j via ext[t+N] = -ext[t]) is
            # the contiguous groups [HALF-1-ct, 2*HALF-1-ct).
            order = jnp.asarray([(HALF - 1 - g) % (2 * HALF)
                                 for g in range(2 * HALF)])
            blocks = jnp.take(blocks, order, axis=2)
        u = blocks + jnp.uint32(0x80808080)
        limbs = ((u[..., None] >> shifts) & jnp.uint32(0xFF)).astype(
            jnp.int32) - 128  # [R, kp1, M, P, P, 4]
        if j_major or windowed:
            if col_order == "jcq":
                # limb-major columns (j, c, q): the kernel's recombine then
                # slices WHOLE limbs ([Bt, (k+1)P] each) instead of 4*(k+1)
                # per-c chains — 1/(k+1) the shift/add op count (mega11)
                reord = jnp.transpose(limbs.astype(jnp.int8),
                                      (2, 0, 3, 5, 1, 4))
            else:
                reord = jnp.transpose(limbs.astype(jnp.int8),
                                      (2, 0, 3, 1, 5, 4))
            return reord.reshape(M, R, P, kp1 * 4 * P)
        reord = jnp.transpose(limbs.astype(jnp.int8), (0, 2, 3, 1, 5, 4))
        return reord.reshape(R, M, P, kp1 * 4 * P)

    return jax.jit(lambda x: jax.lax.map(one, x))(jnp.asarray(ext))
