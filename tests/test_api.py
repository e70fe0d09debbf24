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
