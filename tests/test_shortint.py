"""Encrypted short-integer (PBS-backed) API tests."""

import pytest

from herdsman_tpu.core import TEST_PBS
from herdsman_tpu.shortint import ShortContext


@pytest.fixture(scope="module")
def sctx(pbs_keys):
    # TOY's N=64 cannot host the 32-slot working space (mod-switch noise
    # exceeds the slot width); TEST_PBS's N=256 gives 16 indices per slot
    # and its n=64 keeps the rounding noise ~5 sigma inside one
    ck, sk, _ = pbs_keys
    return ShortContext(TEST_PBS, msg_bits=2, carry_bits=2, keys=(ck, sk))


def test_roundtrip(sctx):
    vals = [0, 1, 2, 3]
    assert sctx.decrypt(sctx.encrypt(vals)) == vals


def test_add_with_auto_reduce(sctx):
    a = sctx.encrypt([1, 2, 3, 0])
    b = sctx.encrypt([3, 3, 2, 1])
    s = a + b
    assert sctx.decrypt(s) == [(x + y) % 4 for x, y in
                               zip([1, 2, 3, 0], [3, 3, 2, 1])]
    # chain of adds crosses the carry space and auto-reduces
    total = a
    for _ in range(5):
        total = total + b
    assert sctx.decrypt(total) == [(x + 5 * y) % 4 for x, y in
                                   zip([1, 2, 3, 0], [3, 3, 2, 1])]


def test_scalar_mul(sctx):
    a = sctx.encrypt([0, 1, 2, 3])
    assert sctx.decrypt(a.scalar_mul(3)) == [0, 3, 6 % 4, 9 % 4]


def test_apply_lut(sctx):
    a = sctx.encrypt([0, 1, 2, 3])
    sq = a.apply_lut(lambda v: v * v)
    assert sctx.decrypt(sq) == [0, 1, 0, 1]  # squares mod 4


def test_ct_multiplication(sctx):
    a = sctx.encrypt([0, 1, 2, 3, 3])
    b = sctx.encrypt([3, 3, 3, 3, 2])
    p = a * b
    assert sctx.decrypt(p) == [0, 3, 6 % 4, 9 % 4, 6 % 4]


def test_mixed_expression(sctx):
    # (a*b + 2*a) mod 4
    av, bv = [1, 2, 3], [2, 3, 1]
    a = sctx.encrypt(av)
    b = sctx.encrypt(bv)
    r = (a * b) + a.scalar_mul(2)
    assert sctx.decrypt(r) == [(x * y + 2 * x) % 4 for x, y in zip(av, bv)]


def test_bool_only_params_rejected():
    """STD128_SHORTINT_FAST is hardware-measured decrypt-WRONG for the
    shortint slot encoding (1.9 sigma to the half-slot boundary,
    docs/BENCH_LOG.md round 4): ShortContext must refuse bool-only sets
    rather than silently corrupt."""
    import pytest

    from herdsman_tpu.core.params import STD128_SHORTINT_FAST
    from herdsman_tpu.shortint import ShortContext

    with pytest.raises(ValueError, match="bool-gate-only"):
        ShortContext(STD128_SHORTINT_FAST)
