"""Word-library extensions (shifts, rotations, signed compares, division)
against Python integer semantics via the plaintext oracle.

The reference's client circuit library lives in the non-vendored `herd`
repo (SURVEY.md §2.5); these ops define the builder-DSL surface a client
needs for realistic encrypted analytics.
"""

import random

import pytest

from herdsman_tpu.circuit.builder import CircuitBuilder
from herdsman_tpu.circuit.model import ColumnMeta, DataType
from herdsman_tpu.compiler.lower import evaluate_plain
from herdsman_tpu.compiler.optimizer import optimize_circuit

W = 8
MASK = (1 << W) - 1


def _run(build_outputs, rows):
    b = CircuitBuilder([ColumnMeta("a", DataType.UINT8),
                        ColumnMeta("b", DataType.UINT8)])
    build_outputs(b, b.input_column("a"), b.input_column("b"))
    c = b.build()
    opt = optimize_circuit(c)
    got = evaluate_plain(c, rows)
    assert got == evaluate_plain(opt, rows)  # optimizer-safe
    return got


def _signed(v):
    return v - 256 if v & 0x80 else v


RNG = random.Random(42)
ROWS = ([[RNG.getrandbits(8), RNG.getrandbits(8)] for _ in range(64)]
        + [[0, 0], [255, 255], [0, 255], [255, 0], [128, 127], [1, 255]])


@pytest.mark.parametrize("k", [0, 1, 3, 7, 8])
def test_const_shifts(k):
    def build(b, wa, wb):
        b.output("shl", wa << k)
        b.output("shr", wa >> k)
        b.output("sar", wa.shift_right_arith(k))
        b.output("rol", wa.rotl(k))
        b.output("ror", wa.rotr(k))
    for row, got in zip(ROWS, _run(build, ROWS)):
        a = row[0]
        assert got["shl"] == (a << k) & MASK
        assert got["shr"] == a >> k
        sa = _signed(a) >> k if k < W else (-1 if a & 0x80 else 0)
        assert got["sar"] == sa & MASK
        kk = k % W
        rol = ((a << kk) | (a >> (W - kk))) & MASK if kk else a
        ror = ((a >> kk) | (a << (W - kk))) & MASK if kk else a
        assert got["rol"] == rol
        assert got["ror"] == ror


def test_encrypted_amount_shifts():
    def build(b, wa, wb):
        b.output("shl", wa.shift_left_enc(wb))
        b.output("shr", wa.shift_right_enc(wb))
    for row, got in zip(ROWS, _run(build, ROWS)):
        a, k = row
        assert got["shl"] == ((a << k) & MASK if k < 256 else 0)
        if k >= W:
            assert got["shl"] == 0 and got["shr"] == 0
        else:
            assert got["shl"] == (a << k) & MASK
            assert got["shr"] == a >> k


def test_encrypted_amount_arith_shift_and_rotates():
    def build(b, wa, wb):
        b.output("sar", wa.shift_right_arith_enc(wb))
        b.output("rol", wa.rotl_enc(wb))
        b.output("ror", wa.rotr_enc(wb))
    for row, got in zip(ROWS, _run(build, ROWS)):
        a, k = row
        sa = _signed(a) >> k if k < W else (-1 if a & 0x80 else 0)
        assert got["sar"] == sa & MASK
        kk = k % W
        rol = ((a << kk) | (a >> (W - kk))) & MASK if kk else a
        ror = ((a >> kk) | (a << (W - kk))) & MASK if kk else a
        assert got["rol"] == rol
        assert got["ror"] == ror


def test_divmod_signed():
    """C semantics: truncation toward zero, remainder takes the dividend's
    sign (x == q*y + r for all representable cases)."""
    def build(b, wa, wb):
        q, r = wa.divmod_signed(wb)
        b.output("q", q)
        b.output("r", r)
    rows = [[7, 3], [249, 3], [7, 253], [249, 253], [255, 1], [1, 255],
            [128, 255], [100, 7], [156, 7], [100, 249], [156, 249]]
    for row, got in zip(rows, _run(build, rows)):
        x, y = _signed(row[0]), _signed(row[1])
        assert got["q"] == int(x / y) & MASK, (x, y)
        assert got["r"] == (x - int(x / y) * y) & MASK, (x, y)


def test_comparisons_unsigned_and_signed():
    def build(b, wa, wb):
        b.output("ne", wa.ne(wb))
        b.output("le", wa.le(wb))
        b.output("gt", wa.gt(wb))
        b.output("ge", wa.ge(wb))
        b.output("slt", wa.lt_signed(wb))
        b.output("sle", wa.le_signed(wb))
        b.output("sgt", wa.gt_signed(wb))
        b.output("sge", wa.ge_signed(wb))
    for row, got in zip(ROWS, _run(build, ROWS)):
        a, b_ = row
        sa, sb = _signed(a), _signed(b_)
        assert got["ne"] == int(a != b_)
        assert got["le"] == int(a <= b_)
        assert got["gt"] == int(a > b_)
        assert got["ge"] == int(a >= b_)
        assert got["slt"] == int(sa < sb)
        assert got["sle"] == int(sa <= sb)
        assert got["sgt"] == int(sa > sb)
        assert got["sge"] == int(sa >= sb)


def test_neg_abs():
    def build(b, wa, wb):
        b.output("neg", wa.neg())
        b.output("abs", wa.abs_signed())
    for row, got in zip(ROWS, _run(build, ROWS)):
        a = row[0]
        assert got["neg"] == (-a) & MASK
        assert got["abs"] == abs(_signed(a)) & MASK


def test_divmod():
    def build(b, wa, wb):
        q, r = wa.divmod(wb)
        b.output("q", q)
        b.output("r", r)
    for row, got in zip(ROWS, _run(build, ROWS)):
        a, d = row
        if d == 0:
            # hardware restoring-division convention (tfhe-rs compatible)
            assert got["q"] == MASK
            assert got["r"] == a
        else:
            assert got["q"] == a // d
            assert got["r"] == a % d


def test_div_exhaustive_4bit():
    """Every (a, d) pair at width 4 through the full divider."""
    from herdsman_tpu.circuit.builder import Word

    b = CircuitBuilder([ColumnMeta("a", DataType.UINT8),
                        ColumnMeta("b", DataType.UINT8)])
    wa = Word(b.input_column("a").bits[:4])
    wb = Word(b.input_column("b").bits[:4])
    q, r = wa.divmod(wb)
    for i in range(4):
        b.output(f"q{i}", q.bits[i])
        b.output(f"r{i}", r.bits[i])
    c = b.build()
    opt = optimize_circuit(c)
    rows = [[a, d] for a in range(16) for d in range(16)]
    got = evaluate_plain(c, rows)
    assert got == evaluate_plain(opt, rows)
    for row, g in zip(rows, got):
        a, d = row
        qv = sum(g[f"q{i}"] << i for i in range(4))
        rv = sum(g[f"r{i}"] << i for i in range(4))
        if d == 0:
            assert (qv, rv) == (15, a)
        else:
            assert (qv, rv) == (a // d, a % d)


def test_floordiv_mod_operators():
    def build(b, wa, wb):
        b.output("q", wa // wb)
        b.output("r", wa % wb)
    rows = [[100, 7], [255, 16], [13, 13], [5, 9]]
    for row, got in zip(rows, _run(build, rows)):
        a, d = row
        assert got["q"] == a // d and got["r"] == a % d


def test_add_with_carry_and_overflow():
    def build(b, wa, wb):
        s, c = wa.add_with_carry(wb)
        b.output("s", s)
        b.output("c", c)
        d, borrow = wa.overflowing_sub(wb)
        b.output("d", d)
        b.output("bw", borrow)
    rows = [[200, 100], [255, 1], [5, 9], [0, 0]]
    for row, got in zip(rows, _run(build, rows)):
        a, bb = row
        assert got["s"] == (a + bb) & MASK
        assert got["c"] == int(a + bb > MASK)
        assert got["d"] == (a - bb) & MASK
        assert got["bw"] == int(a < bb)


def test_mul_full_double_width():
    def build(b, wa, wb):
        b.output("p", wa.mul_full(wb), )
    rows = [[200, 100], [255, 255], [13, 0], [17, 15]]
    for row, got in zip(rows, _run(build, rows)):
        a, bb = row
        assert got["p"] == a * bb
