"""Circuit-optimizer correctness: exhaustive logical equivalence against
`evaluate_plain`, fold-specific shape assertions, and cost monotonicity.

The reference has no optimizer (workers evaluate circuits gate-for-gate as
submitted); equivalence here is the safety contract that lets the compiler
run optimized circuits while preserving the submitted plan's semantics.
"""

import random

from herdsman_tpu.circuit.builder import CircuitBuilder
from herdsman_tpu.circuit.model import (
    Circuit,
    ColumnMeta,
    DataType,
    GateNode,
    GateOp,
    OutputColumn,
)
from herdsman_tpu.compiler.lower import circuit_cost, evaluate_plain
from herdsman_tpu.compiler.optimizer import optimize_circuit


def _assert_equivalent(circuit: Circuit, opt: Circuit, max_bits: int = 12):
    """Exhaustive (or sampled) plaintext equivalence over input space."""
    widths = [c.dtype.bit_width for c in circuit.input_columns]
    total = sum(widths)
    if total <= max_bits:
        rows = [
            [(v >> sum(widths[:i])) & ((1 << w) - 1)
             for i, w in enumerate(widths)]
            for v in range(1 << total)
        ]
    else:
        rng = random.Random(7)
        rows = [
            [rng.getrandbits(w) for w in widths] for _ in range(256)
        ]
    assert evaluate_plain(circuit, rows) == evaluate_plain(opt, rows)


def _bootstraps(c: Circuit) -> int:
    return circuit_cost(c)["bootstraps_per_row"]


def test_random_circuits_equivalent():
    """Random SSA circuits: optimize preserves semantics, never costs more."""
    rng = random.Random(1234)
    ops2 = [GateOp.AND, GateOp.OR, GateOp.NAND, GateOp.NOR,
            GateOp.XOR, GateOp.XNOR]
    for trial in range(30):
        n_in = rng.randint(2, 10)
        cols = (ColumnMeta("x", DataType.UINT8),)
        n_in = 8
        gates = []
        n_wires = n_in
        for _ in range(rng.randint(5, 60)):
            r = rng.random()
            if r < 0.55:
                op = rng.choice(ops2)
                args = (rng.randrange(n_wires), rng.randrange(n_wires))
            elif r < 0.7:
                op = GateOp.NOT
                args = (rng.randrange(n_wires),)
            elif r < 0.85:
                op = GateOp.MUX
                args = (rng.randrange(n_wires), rng.randrange(n_wires),
                        rng.randrange(n_wires))
            else:
                op = rng.choice([GateOp.CONST_0, GateOp.CONST_1])
                args = ()
            gates.append(GateNode(op, args))
            n_wires += 1
        out_wires = tuple(
            rng.randrange(n_wires) for _ in range(8)
        )
        circuit = Circuit(
            cols, tuple(gates),
            (OutputColumn("y", DataType.UINT8, out_wires),),
        )
        circuit.validate()
        opt = optimize_circuit(circuit)
        _assert_equivalent(circuit, opt)
        assert _bootstraps(opt) <= _bootstraps(circuit), f"trial {trial}"


def test_cse_and_demorgan():
    """AND(~a,~b) and NOR(a,b) unify; duplicate commuted gates unify."""
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    a0, a1 = w.bits[0], w.bits[1]
    d1 = (~a0) & (~a1)           # == NOR(a0, a1)
    d2 = a0.nor(a1)
    d3 = a1.nor(a0)              # commuted
    s1 = a0 ^ a1
    s2 = a1 ^ a0                 # commuted duplicate
    b.output("y", s1 ^ s2 ^ d1 ^ d2 ^ d3)   # odd use of d*: y == d (xors cancel)
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    # all three d's are ONE node; s1^s2 == 0 folds away entirely: the result
    # is a single OR/NOR bootstrap.
    assert _bootstraps(opt) == 1


def test_constant_folding_and_double_not():
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    a = w.bits[0]
    one = b.const(True)
    zero = b.const(False)
    v = (a & one) | zero          # == a
    v = ~~v                       # double NOT
    v = v ^ zero                  # == a
    b.output("y", v)
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert _bootstraps(opt) == 0
    assert len(opt.gates) == 0    # output is the input wire itself


def test_mux_strength_reduction():
    """mux(s,a,~a) -> XNOR (1 bootstrap instead of 2)."""
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    s, a = w.bits[0], w.bits[1]
    b.output("y", s.mux(a, ~a))
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert _bootstraps(opt) == 1
    assert all(g.op != GateOp.MUX for g in opt.gates)


def test_mux_const_arm_reduction():
    """mux(s,a,0) -> AND, mux(s,1,b) -> OR, mux with const sel -> arm."""
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    s, a, bb = w.bits[0], w.bits[1], w.bits[2]
    y0 = s.mux(a, b.const(False))         # AND(s, a)
    y1 = s.mux(b.const(True), bb)         # OR(s, bb)
    y2 = b.const(True).mux(a, bb)         # a
    b.output("y", y0 ^ y1 ^ y2)
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert all(g.op != GateOp.MUX for g in opt.gates)
    assert _bootstraps(opt) == 4          # and, or, 2 xors


def test_dead_code_elimination():
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    _dead = (w.bits[0] & w.bits[1]) ^ w.bits[2]   # never used
    b.output("y", w.bits[3] | w.bits[4])
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert _bootstraps(opt) == 1


def test_negated_only_node_emits_negated_form():
    """A node consumed only negated comes out as NAND, not AND+NOT."""
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    v = ~(w.bits[0] & w.bits[1])
    b.output("y", v)
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert [g.op for g in opt.gates] == [GateOp.NAND]


def test_word_adder_optimizes_and_stays_correct():
    """Realistic circuit (8-bit add + compare) survives optimization."""
    b = CircuitBuilder([ColumnMeta("a", DataType.UINT8),
                        ColumnMeta("b", DataType.UINT8)])
    wa, wb = b.input_column("a"), b.input_column("b")
    b.output("sum", wa + wb)
    b.output("lt", wa.lt(wb))
    c = b.build()
    opt = optimize_circuit(c)
    widths = [8, 8]
    rng = random.Random(3)
    rows = [[rng.getrandbits(8), rng.getrandbits(8)] for _ in range(200)]
    rows += [[0, 0], [255, 255], [255, 1]]
    assert evaluate_plain(c, rows) == evaluate_plain(opt, rows)
    assert _bootstraps(opt) <= _bootstraps(c)


def test_xor_chain_cancellation():
    """x ^ y ^ x == y exactly, through literal XOR normalization."""
    b = CircuitBuilder([ColumnMeta("x", DataType.UINT8)])
    w = b.input_column("x")
    v = w.bits[0] ^ w.bits[1]
    v = v ^ w.bits[0]
    b.output("y", v)
    c = b.build()
    opt = optimize_circuit(c)
    _assert_equivalent(c, opt)
    assert _bootstraps(opt) == 0
