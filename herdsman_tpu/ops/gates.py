"""Batched boolean gate evaluation (the device analog of the reference
workers' OpenFHE binfhe gate evaluation; booleans encoded as +-q/8 LWE).

Uniform two-input-gate form: every standard gate is
    bootstrap_bool( w1*c1 + w2*c2 + (0,...,0, bias) )
with per-gate (w1, w2, bias), so a heterogeneous batch of gates (one circuit
level) is ONE device program: a linear combine + one batched bootstrap.
NOT is linear (no bootstrap); MUX uses two raw bootstraps + one key switch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops.server_key import DeviceServerKey

U32 = jnp.uint32
I32 = jnp.int32

Q8 = 1 << 29   # q/8
Q4 = 1 << 30   # q/4

# gate -> (w1, w2, bias) for the pre-bootstrap linear combination
GATE_COEFFS: dict[str, tuple[int, int, int]] = {
    "AND":  (1, 1, -Q8),
    "OR":   (1, 1, Q8),
    "NAND": (-1, -1, Q8),
    "NOR":  (-1, -1, -Q8),
    "XOR":  (2, 2, Q4),
    "XNOR": (-2, -2, -Q4),
}

GATE_IDS: dict[str, int] = {g: i for i, g in enumerate(GATE_COEFFS)}

# numpy (not jnp) at module level: a device array here would force jax
# backend initialization at import time, which breaks processes that import
# the service layer before the TPU plugin is ready. Converted (and
# constant-folded) inside the jitted callers.
_COEFF_NP = np.array(
    [[w1 & 0xFFFFFFFF, w2 & 0xFFFFFFFF, b & 0xFFFFFFFF]
     for (w1, w2, b) in GATE_COEFFS.values()],
    dtype=np.uint32,
)


class GateBatch(NamedTuple):
    """A heterogeneous batch of two-input gates (one circuit level)."""

    gate_ids: jax.Array  # [B] int32, indices into GATE_COEFFS order
    c1: jax.Array        # [B, n+1] u32
    c2: jax.Array        # [B, n+1] u32


def gate_linear(p_n: int, gate_ids: jax.Array, c1: jax.Array,
                c2: jax.Array) -> jax.Array:
    """Per-element (w1*c1 + w2*c2 + bias_on_body): [B, n+1] u32."""
    coeffs = jnp.asarray(_COEFF_NP)[gate_ids]  # [B, 3] u32
    w1 = coeffs[:, 0:1]
    w2 = coeffs[:, 1:2]
    bias = coeffs[:, 2]
    lin = w1 * c1 + w2 * c2
    return lin.at[:, p_n].add(bias)


@functools.partial(jax.jit, static_argnames=("engine",))
def gate_batch(dsk: DeviceServerKey, batch: GateBatch,
               engine: str = "conv_i8") -> jax.Array:
    """Evaluate a heterogeneous batch of two-input gates: [B, n+1] u32 out."""
    lin = gate_linear(dsk.params.n, batch.gate_ids, batch.c1, batch.c2)
    return bs.bootstrap_bool_batch(dsk, lin, engine=engine)


def gate_not(ct: jax.Array) -> jax.Array:
    """NOT is ciphertext negation — linear, no bootstrap."""
    return jnp.zeros_like(ct) - ct


@functools.partial(jax.jit, static_argnames=("engine",))
def mux_batch(dsk: DeviceServerKey, sel: jax.Array, a: jax.Array,
              b: jax.Array, engine: str = "conv_i8") -> jax.Array:
    """Batched MUX(sel, a, b): two raw bootstraps + one key switch."""
    p = dsk.params
    tv = bs.make_test_poly(p)
    and_bias = jnp.asarray((-Q8) & 0xFFFFFFFF, dtype=U32)
    lin1 = (sel + a).at[:, p.n].add(and_bias)          # AND(sel, a)
    lin2 = (b - sel).at[:, p.n].add(and_bias)          # AND(!sel, b)
    t1 = bs.bootstrap_raw_batch(dsk, lin1, tv, engine=engine)
    t2 = bs.bootstrap_raw_batch(dsk, lin2, tv, engine=engine)
    u = (t1 + t2).at[:, p.kN].add(jnp.asarray(Q8, dtype=U32))
    return bs.key_switch_batch(dsk, u)
