"""Circuit builder DSL — the client-side circuit-construction analog of the
(non-vendored) `herd` client library (SURVEY.md §2.5).

Wires are lightweight handles; multi-bit `Word`s support ripple-carry
arithmetic and comparisons, enough to express realistic map/reduce circuits
(sums, minima, equality filters) over encrypted columns.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

from herdsman_tpu.circuit.model import (
    Circuit,
    ColumnMeta,
    DataType,
    GateNode,
    GateOp,
    MappingError,
    OutputColumn,
)


@dataclasses.dataclass(frozen=True)
class Wire:
    builder: "CircuitBuilder" = dataclasses.field(repr=False)
    wire_id: int

    def _g(self, op: GateOp, *others: "Wire") -> "Wire":
        return self.builder.gate(op, self, *others)

    def __and__(self, o: "Wire") -> "Wire":
        return self._g(GateOp.AND, o)

    def __or__(self, o: "Wire") -> "Wire":
        return self._g(GateOp.OR, o)

    def __xor__(self, o: "Wire") -> "Wire":
        return self._g(GateOp.XOR, o)

    def __invert__(self) -> "Wire":
        return self._g(GateOp.NOT)

    def nand(self, o: "Wire") -> "Wire":
        return self._g(GateOp.NAND, o)

    def nor(self, o: "Wire") -> "Wire":
        return self._g(GateOp.NOR, o)

    def xnor(self, o: "Wire") -> "Wire":
        return self._g(GateOp.XNOR, o)

    def mux(self, a: "Wire", b: "Wire") -> "Wire":
        """self ? a : b"""
        return self.builder.gate(GateOp.MUX, self, a, b)


@dataclasses.dataclass(frozen=True)
class Word:
    """A multi-bit value, LSB-first."""

    bits: tuple[Wire, ...]

    def __len__(self) -> int:
        return len(self.bits)

    @property
    def builder(self) -> "CircuitBuilder":
        return self.bits[0].builder

    def __xor__(self, o: "Word") -> "Word":
        return Word(tuple(a ^ b for a, b in zip(self.bits, o.bits, strict=True)))

    def __and__(self, o: "Word") -> "Word":
        return Word(tuple(a & b for a, b in zip(self.bits, o.bits, strict=True)))

    def __or__(self, o: "Word") -> "Word":
        return Word(tuple(a | b for a, b in zip(self.bits, o.bits, strict=True)))

    def __invert__(self) -> "Word":
        return Word(tuple(~a for a in self.bits))

    def __add__(self, o: "Word") -> "Word":
        """Ripple-carry add (mod 2^width)."""
        assert len(self) == len(o)
        b = self.builder
        carry = b.const(False)
        out = []
        for x, y in zip(self.bits, o.bits):
            s = x ^ y
            out.append(s ^ carry)
            carry = (x & y) | (s & carry)
        return Word(tuple(out))

    def __sub__(self, o: "Word") -> "Word":
        """x - y = x + ~y + 1 (two's complement)."""
        assert len(self) == len(o)
        b = self.builder
        carry = b.const(True)
        out = []
        for x, y in zip(self.bits, o.bits):
            ny = ~y
            s = x ^ ny
            out.append(s ^ carry)
            carry = (x & ny) | (s & carry)
        return Word(tuple(out))

    def eq(self, o: "Word") -> Wire:
        assert len(self) == len(o)
        acc = self.bits[0].xnor(o.bits[0])
        for x, y in zip(self.bits[1:], o.bits[1:]):
            acc = acc & x.xnor(y)
        return acc

    def lt(self, o: "Word") -> Wire:
        """Unsigned less-than, MSB-down ripple."""
        assert len(self) == len(o)
        lt = None
        eq_so_far = None
        for x, y in zip(reversed(self.bits), reversed(o.bits)):
            bit_lt = ~x & y
            if lt is None:
                lt = bit_lt
                eq_so_far = x.xnor(y)
            else:
                lt = lt | (eq_so_far & bit_lt)
                eq_so_far = eq_so_far & x.xnor(y)
        return lt

    def mux(self, sel: Wire, other: "Word") -> "Word":
        """sel ? self : other, bitwise."""
        return Word(
            tuple(sel.mux(a, b) for a, b in zip(self.bits, other.bits, strict=True))
        )

    def __mul__(self, o: "Word") -> "Word":
        """Shift-and-add multiply, mod 2^width."""
        assert len(self) == len(o)
        b = self.builder
        width = len(self)
        zero = b.const(False)
        acc: "Word | None" = None
        for i in range(width):
            # partial = (self & o.bits[i]) << i, truncated to width
            masked = [self.bits[k] & o.bits[i] for k in range(width - i)]
            partial = Word(tuple([zero] * i + masked))
            acc = partial if acc is None else acc + partial
        return acc

    def min(self, o: "Word") -> "Word":
        return self.mux(self.lt(o), o)

    def max(self, o: "Word") -> "Word":
        return o.mux(self.lt(o), self)


class CircuitBuilder:
    def __init__(self, input_columns: Sequence[ColumnMeta]):
        self._inputs = tuple(input_columns)
        self._gates: list[GateNode] = []
        self._outputs: list[OutputColumn] = []
        self._n_input_bits = sum(c.dtype.bit_width for c in self._inputs)
        self._const_cache: dict[bool, Wire] = {}

    # ---- inputs ----

    def input_column(self, name: str) -> Word:
        off = 0
        for c in self._inputs:
            if c.name == name:
                return Word(
                    tuple(
                        Wire(self, off + i) for i in range(c.dtype.bit_width)
                    )
                )
            off += c.dtype.bit_width
        raise MappingError(f"no input column {name!r}")

    def input_column_at(self, index: int) -> Word:
        """Column by position — needed for reduce combiners, whose input
        schema is the row schema doubled (left row then right row) and thus
        has duplicate column names."""
        if not 0 <= index < len(self._inputs):
            raise MappingError(f"no input column index {index}")
        off = sum(c.dtype.bit_width for c in self._inputs[:index])
        w = self._inputs[index].dtype.bit_width
        return Word(tuple(Wire(self, off + i) for i in range(w)))

    def input_bit(self, name: str) -> Wire:
        w = self.input_column(name)
        if len(w) != 1:
            raise MappingError(f"column {name!r} is not a single bit")
        return w.bits[0]

    # ---- gates ----

    def gate(self, op: GateOp, *args: Wire) -> Wire:
        for a in args:
            if a.builder is not self:
                raise MappingError("wire from a different builder")
        self._gates.append(GateNode(op, tuple(a.wire_id for a in args)))
        return Wire(self, self._n_input_bits + len(self._gates) - 1)

    def const(self, value: bool) -> Wire:
        if value not in self._const_cache:
            op = GateOp.CONST_1 if value else GateOp.CONST_0
            self._const_cache[value] = self.gate(op)
        return self._const_cache[value]

    def const_word(self, value: int, width: int) -> Word:
        return Word(
            tuple(self.const(bool((value >> i) & 1)) for i in range(width))
        )

    # ---- outputs ----

    def output(self, name: str, value: Wire | Word,
               dtype: DataType | None = None) -> None:
        if isinstance(value, Wire):
            value = Word((value,))
        if dtype is None:
            dtype = {1: DataType.BIT, 8: DataType.UINT8,
                     16: DataType.UINT16, 32: DataType.UINT32}[len(value)]
        self._outputs.append(
            OutputColumn(name, dtype, tuple(w.wire_id for w in value.bits))
        )

    def build(self) -> Circuit:
        c = Circuit(self._inputs, tuple(self._gates), tuple(self._outputs))
        c.validate()
        return c
