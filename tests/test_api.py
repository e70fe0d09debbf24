"""Eager encrypted-integer API tests (TOY params, CPU)."""

import pytest

from herdsman_tpu.api import HerdContext
from herdsman_tpu.core import TOY


@pytest.fixture(scope="module")
def ctx(toy_keys):
    ck, sk, _ = toy_keys
    return HerdContext(TOY, engine="conv_i8", keys=(ck, sk))


def test_add_sub(ctx):
    a = ctx.encrypt([3, 200, 255, 0], width=8)
    b = ctx.encrypt([5, 100, 1, 0], width=8)
    assert ctx.decrypt(a + b) == [8, 44, 0, 0]
    assert ctx.decrypt(a - b) == [(3 - 5) % 256, 100, 254, 0]


def test_bitwise(ctx):
    a = ctx.encrypt([0b1100, 0b1010], width=4)
    b = ctx.encrypt([0b1010, 0b0110], width=4)
    assert ctx.decrypt(a ^ b) == [0b0110, 0b1100]
    assert ctx.decrypt(a & b) == [0b1000, 0b0010]
    assert ctx.decrypt(a | b) == [0b1110, 0b1110]
    assert ctx.decrypt(~a) == [0b0011, 0b0101]


def test_compare_and_select(ctx):
    a = ctx.encrypt([3, 200, 17], width=8)
    b = ctx.encrypt([5, 100, 17], width=8)
    assert ctx.decrypt(a.lt(b)) == [True, False, False]
    assert ctx.decrypt(a.eq(b)) == [False, False, True]
    assert ctx.decrypt(a.min(b)) == [3, 100, 17]
    assert ctx.decrypt(a.max(b)) == [5, 200, 17]


def test_enc_bits(ctx):
    x = ctx.encrypt_bits([True, False, True])
    y = ctx.encrypt_bits([True, True, False])
    assert ctx.decrypt(x & y) == [True, False, False]
    assert ctx.decrypt(x ^ y) == [False, True, True]
    assert ctx.decrypt(~x) == [False, True, False]
    a = ctx.encrypt([1, 2, 3], width=4)
    b = ctx.encrypt([9, 10, 11], width=4)
    assert ctx.decrypt(x.mux(a, b)) == [1, 10, 3]


def test_multiply(ctx):
    a = ctx.encrypt([3, 7, 15], width=4)
    b = ctx.encrypt([5, 3, 15], width=4)
    assert ctx.decrypt(a * b) == [(3 * 5) % 16, (7 * 3) % 16, (15 * 15) % 16]


def test_shifts_and_rotations(ctx):
    a = ctx.encrypt([0b1011, 0b0110, 0b1111], width=4)
    assert ctx.decrypt(a << 1) == [0b0110, 0b1100, 0b1110]
    assert ctx.decrypt(a >> 2) == [0b0010, 0b0001, 0b0011]
    assert ctx.decrypt(a.shift_right_arith(1)) == [0b1101, 0b0011, 0b1111]
    assert ctx.decrypt(a.rotl(1)) == [0b0111, 0b1100, 0b1111]
    assert ctx.decrypt(a.rotr(1)) == [0b1101, 0b0011, 0b1111]
    assert ctx.decrypt(a << 0) == [0b1011, 0b0110, 0b1111]
    assert ctx.decrypt(a << 9) == [0, 0, 0]


def test_encrypted_amount_shifts(ctx):
    a = ctx.encrypt([0b1011, 0b0110, 0b1111, 0b0001], width=4)
    k = ctx.encrypt([1, 2, 4, 0], width=4)
    assert ctx.decrypt(a.shift_left_enc(k)) == [0b0110, 0b1000, 0, 0b0001]
    assert ctx.decrypt(a.shift_right_enc(k)) == [0b0101, 0b0001, 0, 0b0001]


def test_derived_comparisons(ctx):
    a = ctx.encrypt([3, 200, 17], width=8)
    b = ctx.encrypt([5, 100, 17], width=8)
    assert ctx.decrypt(a.ne(b)) == [True, True, False]
    assert ctx.decrypt(a.le(b)) == [True, False, True]
    assert ctx.decrypt(a.gt(b)) == [False, True, False]
    assert ctx.decrypt(a.ge(b)) == [False, True, True]


def test_signed_comparisons(ctx):
    # 8-bit two's complement: -3 = 253, -100 = 156
    a = ctx.encrypt([253, 5, 156], width=8)     # -3, 5, -100
    b = ctx.encrypt([5, 253, 156], width=8)     # 5, -3, -100
    assert ctx.decrypt(a.lt_signed(b)) == [True, False, False]
    assert ctx.decrypt(a.gt_signed(b)) == [False, True, False]
    assert ctx.decrypt(a.le_signed(b)) == [True, False, True]
    assert ctx.decrypt(a.ge_signed(b)) == [False, True, True]


def test_neg_abs(ctx):
    a = ctx.encrypt([0, 3, 253], width=8)       # 0, 3, -3
    assert ctx.decrypt(a.neg()) == [0, 253, 3]
    assert ctx.decrypt(a.abs_signed()) == [0, 3, 3]


def test_divmod(ctx):
    a = ctx.encrypt([13, 15, 7, 9], width=4)
    b = ctx.encrypt([3, 4, 9, 0], width=4)
    q, r = a.divmod(b)
    # div-by-zero convention: q = 2^w - 1, r = dividend
    assert ctx.decrypt(q) == [4, 3, 0, 15]
    assert ctx.decrypt(r) == [1, 3, 7, 9]
    assert ctx.decrypt(a // b) == [4, 3, 0, 15]
    assert ctx.decrypt(a % b) == [1, 3, 7, 9]


def test_divmod_signed(ctx):
    # values as 4-bit two's complement: -7, 7, -6, 5
    a = ctx.encrypt([(-7) % 16, 7, (-6) % 16, 5], width=4)
    b = ctx.encrypt([3, (-3) % 16, (-2) % 16, 0], width=4)
    q, r = a.divmod_signed(b)
    def s4(v):  # decode 4-bit two's complement
        return v - 16 if v >= 8 else v
    got_q = [s4(v) for v in ctx.decrypt(q)]
    got_r = [s4(v) for v in ctx.decrypt(r)]
    # C semantics: trunc toward zero, remainder takes dividend's sign
    assert got_q[:3] == [-2, -2, 3]
    assert got_r[:3] == [-1, 1, 0]
    # div by zero: |q| = 15 (all ones) negated by sign(a)^sign(b)=0 -> -1
    assert got_q[3] == -1 and got_r[3] == 5


def test_mul_full_and_zero_extend(ctx):
    a = ctx.encrypt([13, 15, 9], width=4)
    b = ctx.encrypt([11, 15, 0], width=4)
    assert ctx.decrypt(a.mul_full(b)) == [143, 225, 0]
    assert ctx.decrypt(a.zero_extend(6)) == [13, 15, 9]


def test_overflow_flags(ctx):
    a = ctx.encrypt([200, 55, 3], width=8)
    b = ctx.encrypt([100, 200, 5], width=8)
    s, c = a.overflowing_add(b)
    assert ctx.decrypt(s) == [44, 255, 8]
    assert ctx.decrypt(c) == [True, False, False]
    d, br = a.overflowing_sub(b)
    assert ctx.decrypt(d) == [100, (55 - 200) % 256, (3 - 5) % 256]
    assert ctx.decrypt(br) == [False, True, True]


def test_enc_amount_arith_shift_and_rotates(ctx):
    a = ctx.encrypt([0b1011, 0b0110, 0b1000], width=4)
    k = ctx.encrypt([1, 2, 5], width=3)
    # arithmetic shift: sign fills; amount 5 >= width saturates to all-sign
    assert ctx.decrypt(a.shift_right_arith_enc(k)) == [
        0b1101, 0b0001, 0b1111]
    assert ctx.decrypt(a.rotl_enc(k)) == [
        0b0111, 0b1001, 0b0001]  # rot amounts mod 4: 1, 2, 1
    assert ctx.decrypt(a.rotr_enc(k)) == [
        0b1101, 0b1001, 0b0100]
