"""Pallas TPU kernels for the external-product contraction — the
blind-rotation hot loop (the compute that replaces the reference worker
herd's OpenFHE gate evaluation, reference
src/execution/worker/grpc/grpc_worker_group.cpp:85-94).

Engine ``pallas_bt``: the negacyclic Toeplitz matrix of each
bootstrapping-key polynomial is pre-expanded at key-prep into P x P diagonal
blocks (server_key.bsk_bt; only the first N/P diagonals are stored — the
rest are negations). The per-step external product

    prod[b, c, :] = sum_r digits[b, r, :] (*) bsk_i[r, c, :]   (negacyclic)

then becomes a pure gathered-block int8 matmul: grid (b-chunk, col-tile,
row-tile), each cell one [Bt, P] x [P, (k+1)*4*P] MXU dot accumulated into a
VMEM scratch; the diagonal-block gather is BlockSpec index_map arithmetic
(m = (ct - rt mod HALF) mod 2*HALF), so there is ZERO expansion work at run
time — the kernel is DMA + MXU only. Limb recombination to uint32 and the
CMux accumulate (acc += prod, engine ``pallas_fused``) happen in-kernel on
the last row-tile.
"""

from __future__ import annotations

import functools
import os

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

# Batch rows per EP grid cell. Larger chunks amortize BT-key streaming
# (the key re-streams once per chunk per step) at the cost of VMEM: the
# acc scratch is HALF * Bt * (k+1)*4*P int32 (8 MB at Bt=256 for N=1024),
# which needs the scoped-vmem limit raised past the 16 MB default (done
# below). Validated on v5e hardware: Bt=256 is ~5% faster than 128 and
# Bt=512 adds only ~1% more for 4x the compile time, so 256 is the default
# (HERDSMAN_BT_CHUNK overrides). Batches that are not a multiple of the
# chunk fall back to 128 (the padding granularity of blind_rotate_batch).
BT_CHUNK = int(os.environ.get("HERDSMAN_BT_CHUNK", "256"))


def _pick_chunk(B: int, bt_chunk: int) -> int:
    if B <= bt_chunk:
        return B
    if B % bt_chunk == 0:
        return bt_chunk
    assert B % 128 == 0, "pad batch to a multiple of 128 first"
    return 128


def _combine_limbs(acc: jax.Array, kp1: int, P: int) -> jax.Array:
    a = acc.reshape(acc.shape[0], kp1, 4, P).astype(U32)
    return (
        a[:, :, 0, :]
        + (a[:, :, 1, :] << U32(8))
        + (a[:, :, 2, :] << U32(16))
        + (a[:, :, 3, :] << U32(24))
    )


def _ep_column_total(d_rows, bt_flat, ct: int, P: int, HALF: int):
    """External-product partial for column-tile ct: the negacyclic sign
    pattern is two CONTIGUOUS runs over stored-block index j (+ for
    j <= ct, - for j > ct), so the whole HALF-block contraction collapses
    into TWO MXU dots with the accumulation inside the systolic array
    (K = (ct+1)*P and (HALF-1-ct)*P) plus at most ONE i32 subtract —
    instead of HALF dots chained by [Bt, C4P] i32 adds on the VPU (the
    measured bottleneck at HALF = 8).

    d_rows: callable sub -> [Bt, P] i8 digit chunk of this GGSW row.
    bt_flat: [HALF*P, C4P] i8 — stored diagonal blocks, j-major.
    Row order: stored block j pairs with digit chunk sub = ct - j (j <= ct,
    positive diagonals) or sub = HALF + ct - j (j > ct, negated ones).
    """
    pos = jnp.concatenate([d_rows(ct - j) for j in range(ct + 1)], axis=-1)
    total = jnp.dot(pos, bt_flat[: (ct + 1) * P],
                    preferred_element_type=I32)
    if ct + 1 < HALF:
        neg = jnp.concatenate(
            [d_rows(HALF + ct - j) for j in range(ct + 1, HALF)], axis=-1
        )
        total = total - jnp.dot(neg, bt_flat[(ct + 1) * P:],
                                preferred_element_type=I32)
    return total


def _ep_column_total_jmajor(d_rows, btj_flat, ct: int, P: int, HALF: int,
                            R: int):
    """External product for column tile ct over ALL R GGSW rows in TWO MXU
    dots.  Requires the j-MAJOR key layout (server_key ``bsk_btj``): stored
    diagonal block j holds all R row-polys contiguously, so the positive
    (j <= ct) and negative (j > ct) runs cover rows [0, (ct+1)*R*P) and
    [(ct+1)*R*P, HALF*R*P) of btj_flat.  The per-row partials accumulate
    INSIDE the systolic array (K up to R*N) instead of as R-1 [Bt, C4P]
    i32 VPU adds — the measured floor of the r-major mega2 kernel
    (scripts/mega_variants.py: mxu_only 28.5 us/step/chunk vs 10.9 ideal).

    d_rows: callable (r, sub) -> [Bt, P] i8 digit chunk.
    btj_flat: [HALF*R*P, C4P] i8, j-major / r-minor.
    Pairing (see _ep_column_total): block j x digit sub = ct - j for
    j <= ct, sub = HALF + ct - j negated for j > ct; same for every r.
    """
    pos = jnp.concatenate(
        [d_rows(r, ct - j) for j in range(ct + 1) for r in range(R)],
        axis=-1,
    )
    total = jnp.dot(pos, btj_flat[: (ct + 1) * R * P],
                    preferred_element_type=I32)
    if ct + 1 < HALF:
        neg = jnp.concatenate(
            [d_rows(r, HALF + ct - j)
             for j in range(ct + 1, HALF) for r in range(R)],
            axis=-1,
        )
        total = total - jnp.dot(neg, btj_flat[(ct + 1) * R * P:],
                                preferred_element_type=I32)
    return total


def _ep_column_total_jmajor_packed(D, btj_flat, ct: int, P: int, HALF: int,
                                   R: int):
    """`_ep_column_total_jmajor` with the digits PRE-PACKED once per
    chunk-step instead of re-concatenated per column tile.

    D: [Bt, HALF*R*P] i8 — digit tiles ordered (sub DESCENDING, r minor),
    i.e. column block b holds digit chunk sub = HALF-1 - b//R of GGSW row
    r = b % R.  With that order, column tile ct's positive run (stored
    blocks j = 0..ct pairing sub = ct-j, descending) is the contiguous
    TAIL D[:, (HALF-1-ct)*R*P:], and the negative run (j = ct+1..HALF-1
    pairing sub = HALF+ct-j, also descending) is the contiguous HEAD —
    both dots slice one buffer, eliminating the 32-tile re-concat per tile
    (the same digit data was copied HALF times per chunk-step in
    _ep_column_total_jmajor).
    """
    split = (HALF - 1 - ct) * R * P
    total = jnp.dot(D[:, split:], btj_flat[: (ct + 1) * R * P],
                    preferred_element_type=I32)
    if split:
        total = total - jnp.dot(D[:, :split], btj_flat[(ct + 1) * R * P:],
                                preferred_element_type=I32)
    return total


def _kernel(d_ref, bt_ref, out_ref, acc_ref, *, P: int, HALF: int,
            R: int, kp1: int, fused: bool, glwe_ref=None):
    """Grid (bc, r): one cell processes ALL column tiles of GGSW row-poly r
    — every BT diagonal index is STATIC and each column tile is two MXU
    dots (see _ep_column_total), so per-cell overhead is amortized.

    d_ref   [HALF, Bt, P] i8   digits row-tiles of poly r
    bt_ref  [1, HALF, P, C4P]  the HALF stored diagonal blocks of poly r
    acc_ref [HALF, Bt, C4P] i32 scratch, persists across r
    out_ref [Bt, kp1, N] u32   written at the last r
    """
    r = pl.program_id(1)
    bt_flat = bt_ref[0].reshape(HALF * P, bt_ref.shape[-1])

    for ct in range(HALF):
        total = _ep_column_total(
            lambda sub: d_ref[sub], bt_flat, ct, P, HALF
        )

        @pl.when(r == 0)
        def _(ct=ct, total=total):
            acc_ref[ct] = total

        @pl.when(r > 0)
        def _(ct=ct, total=total):
            acc_ref[ct] = acc_ref[ct] + total

    @pl.when(r == R - 1)
    def _():
        for ct in range(HALF):
            combined = _combine_limbs(acc_ref[ct], kp1, P)  # [Bt, kp1, P]
            if fused:
                combined = glwe_ref[:, :, ct * P:(ct + 1) * P] + combined
            out_ref[:, :, ct * P:(ct + 1) * P] = combined


def _kernel_fused(d_ref, bt_ref, glwe_ref, out_ref, acc_ref, **kw):
    _kernel(d_ref, bt_ref, out_ref, acc_ref, glwe_ref=glwe_ref, **kw)


def _use_interpret() -> bool:
    """Interpret mode off-TPU so the kernels are testable on CPU CI."""
    return jax.default_backend() != "tpu"


def external_product_bt_pretiled(
    params: TFHEParams, d8: jax.Array, bsk_bt_i: jax.Array,
    glwe: jax.Array | None = None, bt_chunk: int = 128,
) -> jax.Array:
    """d8 [RT, B, P] i8 row-tile-major digits; bsk_bt_i
    [R, HALF, P, (k+1)*4*P] i8.  Returns the external product [B, k+1, N]
    u32 — plus `glwe` if given (the fused CMux accumulate)."""
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    B = d8.shape[1]
    Bt = _pick_chunk(B, bt_chunk)
    BC = B // Bt
    C4P = (p.k + 1) * 4 * P

    in_specs = [
        pl.BlockSpec((HALF, Bt, P), lambda bc, r: (r, bc, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HALF, P, C4P), lambda bc, r: (r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [d8, bsk_bt_i]
    kernel = _kernel
    if glwe is not None:
        in_specs.append(
            pl.BlockSpec((Bt, p.k + 1, p.N), lambda bc, r: (bc, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(glwe)
        kernel = _kernel_fused

    kwargs = {}
    if not _use_interpret() and Bt > 128:
        # the default 16 MB scoped-vmem limit fits Bt=128; larger chunks
        # (bigger acc scratch) need the limit raised — v5e has headroom
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        functools.partial(kernel, P=P, HALF=HALF, R=R, kp1=p.k + 1,
                          fused=glwe is not None),
        grid=(BC, R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Bt, p.k + 1, p.N), lambda bc, r: (bc, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, p.k + 1, p.N), U32),
        scratch_shapes=[
            pltpu.VMEM((HALF, Bt, C4P), I32),
        ],
        interpret=_use_interpret(),
        **kwargs,
    )(*args)


def external_product_bt(params: TFHEParams, digits: jax.Array,
                        bsk_bt_i: jax.Array) -> jax.Array:
    """digits [B, R, N] i32 (values in [-Bg/2, Bg/2)) -> [B, k+1, N] u32."""
    p = params
    P, HALF = bt_tile(p)
    R = (p.k + 1) * p.levels
    RT = R * HALF
    B = digits.shape[0]
    Bt = B if B <= 128 else 128
    pad = (-B) % Bt
    d8 = digits.astype(I8).reshape(B, RT, P)
    if pad:
        d8 = jnp.concatenate(
            [d8, jnp.zeros((pad, RT, P), dtype=I8)], axis=0
        )
    # [RT, B, P]: blocks (1, Bt, P) satisfy Mosaic's trailing-dims rule
    d8 = jnp.swapaxes(d8, 0, 1)
    out = external_product_bt_pretiled(p, d8, bsk_bt_i)
    return out[:B]


def _ep_pallas_bt(p: TFHEParams, digits: jax.Array,
                  bsk_bt_i: jax.Array) -> jax.Array:
    return external_product_bt(p, digits, bsk_bt_i)


def _step_pallas_fused(p: TFHEParams, acc: jax.Array, a_i: jax.Array,
                       bsk_bt_i: jax.Array) -> jax.Array:
    """Whole CMux step with both pallas kernels: acc <- acc + BSK (x)
    (X^a * acc - acc)."""
    from herdsman_tpu.ops.pallas.rotate_decompose import rotate_decompose

    d8 = rotate_decompose(p, acc, a_i, bt_chunk=BT_CHUNK)
    return external_product_bt_pretiled(p, d8, bsk_bt_i, glwe=acc,
                                        bt_chunk=BT_CHUNK)


# self-registration (imported lazily from ops.bootstrap)
bs.ENGINES.setdefault("pallas_bt", (_ep_pallas_bt, "bsk_bt"))
bs.STEP_ENGINES = getattr(bs, "STEP_ENGINES", {})
bs.STEP_ENGINES.setdefault("pallas_fused", (_step_pallas_fused, "bsk_bt"))
