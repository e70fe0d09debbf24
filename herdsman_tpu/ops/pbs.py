"""Programmable bootstrapping (functional/LUT bootstrap).

Beyond boolean gates: a bootstrap whose test polynomial encodes an arbitrary
look-up table evaluates f(m) for a small integer message m while refreshing
noise — the building block of shortint-style arithmetic (tfhe-rs shortint,
OpenFHE EvalFunc).

Encoding: messages m in [0, 2^msg_bits) with one padding bit, i.e.
Delta = q / 2^(msg_bits+1); the padding bit keeps the phase in the positive
half-torus so the negacyclic constraint (v(X + N) = -v(X)) never bites.
The LUT output uses the same encoding, so PBS outputs compose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops.server_key import DeviceServerKey

U32 = jnp.uint32


def lut_test_poly(params: TFHEParams, table, msg_bits: int) -> jax.Array:
    """Test polynomial for f given as `table` (length 2^msg_bits ints,
    values in [0, 2^msg_bits)).

    Phase m*Delta mod-switches to m * 2N / 2^(msg_bits+1); coefficient
    windows of v must hold f(m)*Delta over the window centered on each m
    (half-window shifted so rounding noise lands inside the right segment).
    """
    p = params
    space = 1 << (msg_bits + 1)  # incl. padding bit
    assert len(table) == (1 << msg_bits)
    delta = (1 << 32) // space
    window = 2 * p.N // space     # coefficients per message segment
    assert window >= 1, "message space too large for N"
    v = np.zeros(p.N, dtype=np.uint32)
    # segment centers: phase m*Delta -> rotation index m*window; after the
    # half-window shift the coefficient block [m*window - window/2,
    # m*window + window/2) must equal f(m)*Delta.  Build by filling and then
    # negacyclically rotating by +window/2.
    for m in range(1 << msg_bits):
        f = int(table[m]) % space
        val = np.uint32((f * delta) & 0xFFFFFFFF)
        start = m * window
        for j in range(window):
            idx = start + j
            if idx < p.N:
                v[idx] = val
            # indices >= N fold negacyclically; with a padding bit the
            # phase never reaches them, so they are irrelevant — leave 0.
    # rotate v by X^{-window/2} so each window is centered on its segment
    # midpoint: coefficients wrapping past index 0 negate (X^N = -1)
    half = window // 2
    if half:
        v = np.concatenate([v[half:], np.uint32(0) - v[:half]])
    return jnp.asarray(v)


def encode(params: TFHEParams, m, msg_bits: int) -> np.ndarray:
    delta = (1 << 32) // (1 << (msg_bits + 1))
    return (np.asarray(m, dtype=np.uint64) * delta & 0xFFFFFFFF).astype(
        np.uint32)


def decode(params: TFHEParams, phase: np.ndarray, msg_bits: int) -> np.ndarray:
    space = 1 << (msg_bits + 1)
    delta = (1 << 32) // space
    return ((phase.astype(np.uint64) + delta // 2) // delta % space).astype(
        np.int64) % (1 << msg_bits)


@functools.lru_cache(maxsize=None)
def _pbs_exec(engine: str, k: int):
    """Jitted whole-PBS pipeline for k interleaved LUTs: one compiled
    program per (engine, k, shape) instead of dozens of eager dispatches —
    the LUT content (`tv`) is a runtime argument, so changing tables never
    retraces."""
    coarse = k.bit_length() - 1

    def fn(dsk, ct, tv):
        acc = bs.blind_rotate_batch(dsk, ct, tv, engine=engine,
                                    coarse_bits=coarse)
        raws = [bs.sample_extract_batch(dsk.params, acc, offset=j)
                for j in range(k)]
        return bs.key_switch_batch(dsk, jnp.concatenate(raws, axis=0))

    return jax.jit(fn)


def pbs_batch(dsk: DeviceServerKey, ct: jax.Array, table,
              msg_bits: int, engine: str = "conv_i8",
              unroll: bool = False) -> jax.Array:
    """Apply f (the LUT) under encryption with noise refresh:
    [B, n+1] -> [B, n+1], messages in [0, 2^msg_bits)."""
    tv = lut_test_poly(dsk.params, table, msg_bits)
    if not unroll:
        return _pbs_exec(engine, 1)(dsk, ct, tv)
    # unroll: eager pipeline for interpret-mode pallas on CPU (no jit/scan)
    acc = bs.blind_rotate_batch(dsk, ct, tv, engine=engine, unroll=unroll)
    raw = bs.sample_extract_batch(dsk.params, acc)
    return bs.key_switch_batch(dsk, raw)


# ---------------------------------------------------------------------------
# Many-LUT PBS (PBSmanyLUT, Chillotti-Ligier-Orfila-Tap class): k LUTs from
# ONE blind rotation. The modulus switch rounds to multiples of k (rotation
# lands on every k-th coefficient), the test polynomial interleaves the k
# functions at fine indices k*u + j, and coefficient j is sample-extracted
# per LUT. Cost: one rotation + k cheap extract/key-switch passes instead of
# k full rotations; the price is a k-times-coarser rounding window.
# ---------------------------------------------------------------------------

def many_lut_capacity(params: TFHEParams, msg_bits: int,
                      min_window: int = 32) -> int:
    """Largest power-of-two LUT count whose per-message fine-index window
    stays >= min_window (the mod-switch noise safety criterion; 32 fine
    indices leaves ~5 sigma at n=768)."""
    space = 1 << (msg_bits + 1)
    k = 1
    while 2 * params.N // (space * 2 * k) >= min_window:
        k *= 2
    return k


def lut_test_poly_many(params: TFHEParams, tables, msg_bits: int) -> jax.Array:
    """Interleaved test polynomial: fine coefficient k*u + j holds
    f_j(message of coarse index u). The k=1 case reduces to
    lut_test_poly."""
    p = params
    k = len(tables)
    assert k & (k - 1) == 0, "LUT count must be a power of two"
    space = 1 << (msg_bits + 1)
    window_c = (2 * p.N // k) // space  # coarse indices per message
    assert window_c >= 1, "message space too large for N/k"
    delta = (1 << 32) // space
    v = np.zeros(p.N, dtype=np.uint32)
    for m in range(1 << msg_bits):
        vals = [np.uint32((int(t[m]) % space * delta) & 0xFFFFFFFF)
                for t in tables]
        for uu in range(window_c):
            base = k * (m * window_c + uu)
            for j in range(k):
                idx = base + j
                if idx < p.N:
                    v[idx] = vals[j]
    half = k * window_c // 2  # center each window (fine units)
    if half:
        v = np.concatenate([v[half:], np.uint32(0) - v[:half]])
    return jnp.asarray(v)


def pbs_many_batch(dsk: DeviceServerKey, ct: jax.Array, tables,
                   msg_bits: int, engine: str = "conv_i8",
                   unroll: bool = False) -> list[jax.Array]:
    """Evaluate k LUTs over the SAME ciphertext batch with one blind
    rotation: [B, n+1] -> k x [B, n+1]. The k key switches run as one
    batched MXU matmul."""
    p = dsk.params
    k = len(tables)
    if k == 1:
        return [pbs_batch(dsk, ct, tables[0], msg_bits, engine=engine,
                          unroll=unroll)]
    coarse = k.bit_length() - 1
    assert (1 << coarse) == k, "LUT count must be a power of two"
    tv = lut_test_poly_many(p, tables, msg_bits)
    B = ct.shape[0]
    if not unroll:
        out = _pbs_exec(engine, k)(dsk, ct, tv)
    else:
        acc = bs.blind_rotate_batch(dsk, ct, tv, engine=engine,
                                    unroll=unroll, coarse_bits=coarse)
        raws = [bs.sample_extract_batch(p, acc, offset=j) for j in range(k)]
        out = bs.key_switch_batch(dsk, jnp.concatenate(raws, axis=0))
    return [out[j * B:(j + 1) * B] for j in range(k)]
