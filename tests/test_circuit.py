"""Circuit model / builder / serde / levelizer tests (plaintext only)."""

import pytest

from herdsman_tpu.circuit import (
    Circuit,
    CircuitBuilder,
    ColumnMeta,
    DataType,
    GateNode,
    GateOp,
    MappingError,
    OutputColumn,
)
from herdsman_tpu.compiler import evaluate_plain, levelize


def adder_circuit(width=8):
    b = CircuitBuilder([
        ColumnMeta("x", DataType.UINT8), ColumnMeta("y", DataType.UINT8)
    ])
    b.output("sum", b.input_column("x") + b.input_column("y"))
    return b.build()


def test_adder_plain():
    c = adder_circuit()
    rows = [(3, 5), (200, 100), (255, 1), (0, 0)]
    out = evaluate_plain(c, rows)
    for (x, y), o in zip(rows, out):
        assert o["sum"] == (x + y) % 256


def test_sub_and_compare_plain():
    b = CircuitBuilder([
        ColumnMeta("x", DataType.UINT8), ColumnMeta("y", DataType.UINT8)
    ])
    x, y = b.input_column("x"), b.input_column("y")
    b.output("diff", x - y)
    b.output("lt", x.lt(y))
    b.output("eq", x.eq(y))
    b.output("min", x.min(y))
    c = b.build()
    rows = [(3, 5), (200, 100), (17, 17), (0, 255)]
    for (xv, yv), o in zip(rows, evaluate_plain(c, rows)):
        assert o["diff"] == (xv - yv) % 256
        assert o["lt"] == int(xv < yv)
        assert o["eq"] == int(xv == yv)
        assert o["min"] == min(xv, yv)


def test_mux_and_const_plain():
    b = CircuitBuilder([ColumnMeta("s", DataType.BIT),
                        ColumnMeta("v", DataType.UINT8)])
    s = b.input_bit("s")
    v = b.input_column("v")
    fallback = b.const_word(42, 8)
    b.output("r", v.mux(s, fallback))
    c = b.build()
    assert evaluate_plain(c, [(1, 7)])[0]["r"] == 7
    assert evaluate_plain(c, [(0, 7)])[0]["r"] == 42


def test_signed_output():
    b = CircuitBuilder([ColumnMeta("x", DataType.INT8),
                        ColumnMeta("y", DataType.INT8)])
    b.output("d", b.input_column("x") - b.input_column("y"),
             dtype=DataType.INT8)
    c = b.build()
    out = evaluate_plain(c, [(5 % 256, 9 % 256), ((-3) % 256, 4 % 256)])
    assert out[0]["d"] == -4
    assert out[1]["d"] == -7


def test_serde_roundtrip():
    c = adder_circuit()
    c2 = Circuit.from_json(c.to_json())
    assert c2 == c


def test_validation_errors():
    cols = (ColumnMeta("a", DataType.BIT),)
    # forward reference
    with pytest.raises(MappingError):
        Circuit(cols, (GateNode(GateOp.AND, (0, 5)),),
                (OutputColumn("o", DataType.BIT, (1,)),)).validate()
    # wrong arity
    with pytest.raises(MappingError):
        Circuit(cols, (GateNode(GateOp.NOT, (0, 0)),),
                (OutputColumn("o", DataType.BIT, (1,)),)).validate()
    # output width mismatch
    with pytest.raises(MappingError):
        Circuit(cols, (GateNode(GateOp.NOT, (0,)),),
                (OutputColumn("o", DataType.UINT8, (1,)),)).validate()
    # duplicate outputs
    with pytest.raises(MappingError):
        Circuit(cols, (GateNode(GateOp.NOT, (0,)),),
                (OutputColumn("o", DataType.BIT, (1,)),
                 OutputColumn("o", DataType.BIT, (0,)),)).validate()
    # no outputs
    with pytest.raises(MappingError):
        Circuit(cols, (), ()).validate()
    # malformed json
    with pytest.raises(MappingError):
        Circuit.from_json("{not json")
    with pytest.raises(MappingError):
        Circuit.from_dict({"input_columns": []})


def test_levelize_depths():
    b = CircuitBuilder([ColumnMeta(n, DataType.BIT) for n in "abcd"])
    a, bb, c, d = (b.input_bit(n) for n in "abcd")
    x = a & bb          # level 1
    y = c | d           # level 1
    z = x ^ y           # level 2
    w = ~z              # linear, still level 2
    v = w & a           # level 3
    b.output("o", v)
    circ = b.build()
    levels, depth = levelize(circ)
    assert len(levels) == 3
    assert len(levels[0].bootstrap_gates) == 2
    assert len(levels[1].bootstrap_gates) == 1
    assert len(levels[2].bootstrap_gates) == 1
    n_in = circ.num_input_bits
    assert depth[n_in + 3] == 2  # NOT inherits depth


def test_builder_errors():
    b = CircuitBuilder([ColumnMeta("a", DataType.UINT8)])
    with pytest.raises(MappingError):
        b.input_column("missing")
    with pytest.raises(MappingError):
        b.input_bit("a")  # not single-bit
    b2 = CircuitBuilder([ColumnMeta("x", DataType.BIT)])
    w2 = b2.input_bit("x")
    with pytest.raises(MappingError):
        b.gate(GateOp.NOT, w2)  # cross-builder wire


def test_multiply_plain():
    b = CircuitBuilder([
        ColumnMeta("x", DataType.UINT8), ColumnMeta("y", DataType.UINT8)
    ])
    b.output("p", b.input_column("x") * b.input_column("y"))
    c = b.build()
    rows = [(3, 5), (200, 100), (255, 255), (0, 77), (16, 16)]
    for (x, y), o in zip(rows, evaluate_plain(c, rows)):
        assert o["p"] == (x * y) % 256, (x, y)
