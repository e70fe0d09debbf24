"""Eager encrypted-integer API — the ergonomic front end.

Where `circuit/` builds static circuits for the coordinator's Map/Reduce
plans, this module gives client-style eager computation on encrypted
integers (tfhe-rs "FheUint" ergonomics): every operator call immediately
executes batched gate bootstraps on the device.  Values are vectorized: one
`EncUint` holds a whole batch of encrypted integers, and a ripple-carry add
over a batch of 1000 u8s runs the same number of device programs as over
one (each bit level is ONE batched bootstrap).

Example:
    ctx = HerdContext(STD128, engine="pallas_fused")
    a = ctx.encrypt([3, 200, 17], width=8)
    b = ctx.encrypt([5, 100, 4], width=8)
    assert ctx.decrypt(a + b) == [8, 44, 21]
    assert ctx.decrypt(a.min(b)) == [3, 100, 4]
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from herdsman_tpu.core import reference as ref
from herdsman_tpu.core.params import TFHEParams
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops import gates
from herdsman_tpu.ops.server_key import device_server_key

U32 = jnp.uint32


class HerdContext:
    def __init__(self, params: TFHEParams, engine: str = "conv_i8",
                 seed: int = 0, keys=None):
        self.params = params
        self.engine = engine
        self._rng = np.random.default_rng(seed)
        if keys is None:
            self.ck, self.sk = ref.keygen(params, self._rng)
        else:
            self.ck, self.sk = keys
        layouts = ("bsk_bt",) if engine.startswith("pallas") else (
            "bsk_conv",) if engine == "conv_i8" else ("bsk_ext",)
        self.dsk = device_server_key(self.sk, layouts=layouts)

    # ---- client ops ----

    def encrypt(self, values: Sequence[int] | int, width: int = 8) -> "EncUint":
        vals = np.atleast_1d(np.asarray(values, dtype=np.int64))
        bits = np.zeros((len(vals), width), dtype=bool)
        for i in range(width):
            bits[:, i] = (vals >> i) & 1
        ct = ref.encrypt_bool(self.ck, bits, self._rng)  # [B, width, n+1]
        return EncUint(self, jnp.asarray(ct), width)

    def encrypt_bits(self, values: Sequence[bool]) -> "EncBit":
        bits = np.asarray(values, dtype=bool)
        ct = ref.encrypt_bool(self.ck, bits, self._rng)
        return EncBit(self, jnp.asarray(ct))

    def decrypt(self, x: "EncUint | EncBit") -> list:
        if isinstance(x, EncBit):
            return [bool(v) for v in
                    ref.lwe_decrypt_bool(self.ck, np.asarray(x.data))]
        bits = ref.lwe_decrypt_bool(self.ck, np.asarray(x.data))
        vals = np.zeros(bits.shape[0], dtype=np.int64)
        for i in range(x.width):
            vals |= bits[:, i].astype(np.int64) << i
        return [int(v) for v in vals]

    # ---- eager gate plumbing ----

    def _gate(self, name: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """One heterogeneous-batch gate call on stacked bit ciphertexts
        [..., n+1] (leading dims flattened into the batch). The flat batch is
        padded to the next power of two so eager chains reuse a handful of
        compiled program shapes instead of recompiling per call."""
        shape = a.shape[:-1]
        width = a.shape[-1]
        flat_a = a.reshape(-1, width)
        flat_b = b.reshape(-1, width)
        n_flat = flat_a.shape[0]
        padded = max(8, 1 << (n_flat - 1).bit_length())
        if padded != n_flat:
            pad = padded - n_flat
            flat_a = jnp.concatenate(
                [flat_a, jnp.zeros((pad, width), dtype=flat_a.dtype)], axis=0)
            flat_b = jnp.concatenate(
                [flat_b, jnp.zeros((pad, width), dtype=flat_b.dtype)], axis=0)
        ids = jnp.full((padded,), gates.GATE_IDS[name], dtype=jnp.int32)
        out = gates.gate_batch(
            self.dsk, gates.GateBatch(ids, flat_a, flat_b),
            engine=self.engine,
        )[:n_flat]
        return out.reshape(*shape, width)

    def _mux(self, sel, a, b):
        shape = a.shape[:-1]
        width = a.shape[-1]
        out = gates.mux_batch(
            self.dsk, sel.reshape(-1, width), a.reshape(-1, width),
            b.reshape(-1, width), engine=self.engine,
        )
        return out.reshape(*shape, width)

    def _const_bit(self, batch: int, value: bool) -> jnp.ndarray:
        mu = int(bs.BOOL_MU) if value else ((1 << 32) - int(bs.BOOL_MU))
        ct = jnp.zeros((batch, self.params.n + 1), dtype=U32)
        return ct.at[:, self.params.n].set(jnp.asarray(mu, dtype=U32))


@dataclasses.dataclass
class EncBit:
    ctx: HerdContext
    data: jnp.ndarray  # [B, n+1]

    def _g(self, name, other):
        return EncBit(self.ctx, self.ctx._gate(name, self.data, other.data))

    def __and__(self, o): return self._g("AND", o)
    def __or__(self, o): return self._g("OR", o)
    def __xor__(self, o): return self._g("XOR", o)
    def __invert__(self):
        return EncBit(self.ctx, gates.gate_not(self.data))

    def mux(self, a: "EncUint", b: "EncUint") -> "EncUint":
        """self ? a : b (bitwise over words)."""
        sel = jnp.broadcast_to(self.data[:, None, :], a.data.shape)
        return EncUint(self.ctx, self.ctx._mux(sel, a.data, b.data), a.width)


@dataclasses.dataclass
class EncUint:
    ctx: HerdContext
    data: jnp.ndarray  # [B, width, n+1]
    width: int

    @property
    def batch(self) -> int:
        return self.data.shape[0]

    def _bit(self, i: int) -> jnp.ndarray:
        return self.data[:, i, :]

    def __xor__(self, o): return EncUint(
        self.ctx, self.ctx._gate("XOR", self.data, o.data), self.width)

    def __and__(self, o): return EncUint(
        self.ctx, self.ctx._gate("AND", self.data, o.data), self.width)

    def __or__(self, o): return EncUint(
        self.ctx, self.ctx._gate("OR", self.data, o.data), self.width)

    def __invert__(self):
        return EncUint(self.ctx, gates.gate_not(self.data), self.width)

    def _ripple(self, other: "EncUint", subtract: bool) -> "EncUint":
        ctx = self.ctx
        y = (~other).data if subtract else other.data
        carry = ctx._const_bit(self.batch, subtract)
        out_bits = []
        for i in range(self.width):
            x = self._bit(i)
            yb = y[:, i, :]
            s = ctx._gate("XOR", x[:, None, :], yb[:, None, :])[:, 0, :]
            out_bits.append(
                ctx._gate("XOR", s[:, None, :], carry[:, None, :])[:, 0, :]
            )
            if i + 1 < self.width:
                xy = ctx._gate("AND", x[:, None, :], yb[:, None, :])[:, 0, :]
                sc = ctx._gate("AND", s[:, None, :], carry[:, None, :])[:, 0, :]
                carry = ctx._gate("OR", xy[:, None, :], sc[:, None, :])[:, 0, :]
        return EncUint(ctx, jnp.stack(out_bits, axis=1), self.width)

    def __add__(self, o: "EncUint") -> "EncUint":
        return self._ripple(o, subtract=False)

    def __sub__(self, o: "EncUint") -> "EncUint":
        return self._ripple(o, subtract=True)

    def __mul__(self, o: "EncUint") -> "EncUint":
        """Shift-and-add multiply, mod 2^width."""
        ctx = self.ctx
        w = self.width
        acc = None
        for i in range(w):
            yb = jnp.broadcast_to(o._bit(i)[:, None, :],
                                  (self.batch, w - i, self.ctx.params.n + 1))
            masked = ctx._gate("AND", self.data[:, : w - i, :], yb)
            zeros = jnp.stack(
                [ctx._const_bit(self.batch, False)] * i, axis=1
            ) if i else masked[:, :0, :]
            partial = EncUint(ctx, jnp.concatenate([zeros, masked], axis=1), w)
            acc = partial if acc is None else acc + partial
        return acc

    def eq(self, o: "EncUint") -> EncBit:
        ctx = self.ctx
        x = ctx._gate("XNOR", self.data, o.data)  # [B, w, n+1]
        acc = x[:, 0, :]
        for i in range(1, self.width):
            acc = ctx._gate("AND", acc[:, None, :], x[:, i:i + 1, :])[:, 0, :]
        return EncBit(ctx, acc)

    def lt(self, o: "EncUint") -> EncBit:
        """Unsigned less-than (MSB-down ripple)."""
        ctx = self.ctx
        lt = None
        eq = None
        for i in reversed(range(self.width)):
            x = self._bit(i)[:, None, :]
            y = o._bit(i)[:, None, :]
            nx = gates.gate_not(x)
            bit_lt = ctx._gate("AND", nx, y)[:, 0, :]
            bit_eq = ctx._gate("XNOR", x, y)[:, 0, :]
            if lt is None:
                lt, eq = bit_lt, bit_eq
            else:
                t = ctx._gate("AND", eq[:, None, :],
                              bit_lt[:, None, :])[:, 0, :]
                lt = ctx._gate("OR", lt[:, None, :], t[:, None, :])[:, 0, :]
                eq = ctx._gate("AND", eq[:, None, :],
                               bit_eq[:, None, :])[:, 0, :]
        return EncBit(ctx, lt)

    def min(self, o: "EncUint") -> "EncUint":
        return self.lt(o).mux(self, o)

    def max(self, o: "EncUint") -> "EncUint":
        return self.lt(o).mux(o, self)
