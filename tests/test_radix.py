"""Radix-integer (shortint-block) arithmetic tests — TEST_SMALL params, CPU.

Covers the lazy-carry discipline (adds accumulate, propagation repays),
two's-complement subtraction, batched-PBS schoolbook multiplication,
comparisons and selection. Every op decrypts exactly (TEST_SMALL noise is
real but reduced)."""

import pytest

from herdsman_tpu.core import TEST_PBS
from herdsman_tpu.radix import RadixContext
from herdsman_tpu.shortint import ShortContext


@pytest.fixture(scope="module")
def rctx(pbs_keys):
    ck, sk, _ = pbs_keys
    short = ShortContext(TEST_PBS, msg_bits=2, carry_bits=2, keys=(ck, sk))
    return RadixContext(short, n_blocks=3)  # 6-bit integers


MOD = 64


def test_roundtrip(rctx):
    vals = [0, 1, 37, 63]
    assert rctx.decrypt(rctx.encrypt(vals)) == vals


def test_add_chain_lazy_carries(rctx):
    a_v, b_v = [13, 37, 63, 0], [21, 45, 63, 1]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    s = a + b
    assert rctx.decrypt(s) == [(x + y) % MOD for x, y in zip(a_v, b_v)]
    # chain: forces propagation mid-chain (carry space is 2 bits)
    total = a
    for _ in range(6):
        total = total + b
    assert rctx.decrypt(total) == [(x + 6 * y) % MOD
                                   for x, y in zip(a_v, b_v)]


def test_scalar_add(rctx):
    a = rctx.encrypt([5, 60, 0])
    assert rctx.decrypt(a.scalar_add(7)) == [12, 3, 7]
    assert rctx.decrypt(a.scalar_add(0)) == [5, 60, 0]


def test_neg_sub(rctx):
    a_v, b_v = [5, 0, 63, 20], [9, 0, 1, 20]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    assert rctx.decrypt(-a) == [(-x) % MOD for x in a_v]
    assert rctx.decrypt(a - b) == [(x - y) % MOD for x, y in zip(a_v, b_v)]


def test_block_shifts(rctx):
    a = rctx.encrypt([0b110110, 0b000011])
    assert rctx.decrypt(a.shift_blocks_left(1)) == [0b011000, 0b001100]
    assert rctx.decrypt(a.shift_blocks_right(1)) == [0b001101, 0b000000]


def test_multiply(rctx):
    a_v, b_v = [7, 9, 63, 0], [9, 7, 63, 5]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    assert rctx.decrypt(a * b) == [(x * y) % MOD for x, y in zip(a_v, b_v)]


def test_scalar_mul(rctx):
    a_v = [7, 21, 63]
    a = rctx.encrypt(a_v)
    assert rctx.decrypt(a.scalar_mul(5)) == [(x * 5) % MOD for x in a_v]
    assert rctx.decrypt(a.scalar_mul(0)) == [0, 0, 0]
    assert rctx.decrypt(a.scalar_mul(1)) == a_v


def test_mul_after_add_propagates(rctx):
    """Carries pending from adds must be repaid before packing."""
    a = rctx.encrypt([3, 14])
    b = rctx.encrypt([3, 7])
    s = a + b          # blocks hold unpropagated sums
    p = s * b
    assert rctx.decrypt(p) == [(6 * 3) % MOD, (21 * 7) % MOD]


def test_compare(rctx):
    a_v, b_v = [5, 20, 20, 63], [9, 20, 3, 0]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    assert rctx.decrypt_flag(a.eq(b)) == [x == y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.ne(b)) == [x != y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.lt(b)) == [x < y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.le(b)) == [x <= y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.gt(b)) == [x > y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.ge(b)) == [x >= y for x, y in zip(a_v, b_v)]


def test_mux_min_max(rctx):
    a_v, b_v = [5, 40, 63], [9, 12, 63]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    sel = a.lt(b)
    assert rctx.decrypt(a.mux(sel, b)) == [x if x < y else y
                                           for x, y in zip(a_v, b_v)]
    assert rctx.decrypt(a.min(b)) == [min(x, y) for x, y in zip(a_v, b_v)]
    assert rctx.decrypt(a.max(b)) == [max(x, y) for x, y in zip(a_v, b_v)]


def test_divmod(rctx):
    """Bit-serial restoring division at 4 bits (2 blocks), incl. the
    div-by-zero convention (q = 2^W - 1, r = dividend)."""
    from herdsman_tpu.radix import RadixContext
    r4 = RadixContext(rctx.short, n_blocks=2)
    a_v, b_v = [13, 15, 7, 9], [3, 4, 9, 0]
    a, b = r4.encrypt(a_v), r4.encrypt(b_v)
    q, r = a.divmod(b)
    assert r4.decrypt(q) == [4, 3, 0, 15]
    assert r4.decrypt(r) == [1, 3, 7, 9]


def test_bits_roundtrip(rctx):
    a_v = [0b101101, 0, 63]
    a = rctx.encrypt(a_v)
    bits = a.bits()
    got = [rctx.short.decrypt(b) for b in bits]  # [W][batch]
    for bi, vals in enumerate(got):
        assert vals == [(v >> bi) & 1 for v in a_v], f"bit {bi}"
    back = rctx._from_bits(bits)
    assert rctx.decrypt(back) == a_v


def test_bitwise(rctx):
    a_v, b_v = [0b101101, 0b110011, 0, 63], [0b011011, 0b110011, 63, 0]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    assert rctx.decrypt(a & b) == [x & y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt(a | b) == [x | y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt(a ^ b) == [x ^ y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt(~a) == [x ^ 63 for x in a_v]


def test_sum_many(rctx):
    vals = [[13, 63], [21, 63], [9, 63], [50, 63], [7, 1]]
    encs = [rctx.encrypt(v) for v in vals]
    got = rctx.decrypt(rctx.sum(encs))
    assert got == [sum(col) % MOD for col in zip(*vals)]


def test_mul_wide(rctx):
    r4 = RadixContext(rctx.short, n_blocks=2)
    a_v, b_v = [13, 15, 7, 0], [11, 15, 9, 5]
    p = r4.encrypt(a_v).mul_wide(r4.encrypt(b_v))
    assert p.ctx.n_blocks == 4
    assert p.ctx.decrypt(p) == [x * y for x, y in zip(a_v, b_v)]


def test_shift_bits_cleartext(rctx):
    a_v = [0b101101, 0b000111, 63]
    a = rctx.encrypt(a_v)
    for k in (0, 1, 3, 5, 6, 9):
        assert rctx.decrypt(a.shift_bits_left(k)) == \
            [(x << k) % MOD for x in a_v], f"<< {k}"
        assert rctx.decrypt(a.shift_bits_right(k)) == \
            [x >> k for x in a_v], f">> {k}"
    for k in (1, 5, 6):
        want = [((x << (k % 6)) | (x >> (6 - k % 6))) % MOD for x in a_v]
        assert rctx.decrypt(a.rotate_bits_left(k)) == want, f"rol {k}"
        wantr = [((x >> (k % 6)) | (x << (6 - k % 6))) % MOD for x in a_v]
        assert rctx.decrypt(a.rotate_bits_right(k)) == wantr, f"ror {k}"


def test_shift_encrypted_amount(rctx):
    """Barrel shifter over a power-of-two width (W=4), amounts 0..3
    in one batch (amount is taken mod W, tfhe-rs semantics)."""
    r4 = RadixContext(rctx.short, n_blocks=2)
    a_v = [0b1011, 0b1011, 0b1011, 0b1011]
    k_v = [0, 1, 2, 3]
    a, k = r4.encrypt(a_v), r4.encrypt(k_v)
    assert r4.decrypt(a.shift_left(k)) == \
        [(x << s) % 16 for x, s in zip(a_v, k_v)]
    assert r4.decrypt(a.shift_right(k)) == \
        [x >> s for x, s in zip(a_v, k_v)]
    assert r4.decrypt(a.rotate_left(k)) == \
        [((x << s) | (x >> (4 - s))) % 16 if s else x
         for x, s in zip(a_v, k_v)]
    assert r4.decrypt(a.rotate_right(k)) == \
        [((x >> s) | (x << (4 - s))) % 16 if s else x
         for x, s in zip(a_v, k_v)]


def test_signed_compare_abs(rctx):
    a_v, b_v = [-5, 3, -32, 31, -1], [3, -5, 31, -32, -1]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    assert rctx.decrypt_signed(a) == a_v
    assert rctx.decrypt_flag(a.lt_signed(b)) == \
        [x < y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(a.ge_signed(b)) == \
        [x >= y for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_signed(a.min_signed(b)) == \
        [min(x, y) for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_signed(a.max_signed(b)) == \
        [max(x, y) for x, y in zip(a_v, b_v)]
    # |INT_MIN| wraps to itself in W-bit two's complement
    assert rctx.decrypt_signed(a.abs_signed()) == \
        [abs(x) if x != -32 else -32 for x in a_v]
    assert rctx.decrypt_flag(a.sign_bit()) == [x < 0 for x in a_v]


def test_signed_divmod(rctx):
    """C semantics: truncation toward zero, remainder takes the
    dividend's sign."""
    r4 = RadixContext(rctx.short, n_blocks=2)
    a_v, b_v = [7, -7, 7, -7], [3, 3, -3, -3]
    a, b = r4.encrypt(a_v), r4.encrypt(b_v)
    q, r = a.divmod_signed(b)
    dec = r4.decrypt_signed
    assert dec(q) == [int(x / y) for x, y in zip(a_v, b_v)]
    assert dec(r) == [x - int(x / y) * y for x, y in zip(a_v, b_v)]


def test_arithmetic_right_shift(rctx):
    a_v = [-20, 20, -1, 1]
    a = rctx.encrypt(a_v)
    for k in (0, 1, 3):
        assert rctx.decrypt_signed(a.shift_bits_right_signed(k)) == \
            [x >> k for x in a_v], f">>s {k}"


def test_many_lut_radix():
    """Many-LUT PBS (lo+hi splits, digit products and bit layers from ONE
    blind rotation each) is exact end-to-end. Needs N=1024 so the k=2
    rounding window stays safe (TEST_PBS's N=256 auto-disables it)."""
    import dataclasses

    import numpy as np

    from herdsman_tpu.core import reference as ref_mod

    p = dataclasses.replace(TEST_PBS, name="test_pbs_many", N=1024)
    rng = np.random.default_rng(7)
    keys = ref_mod.keygen(p, rng)
    short = ShortContext(p, msg_bits=2, carry_bits=2, keys=keys)
    assert short.many_lut  # auto-enabled at N=1024
    r4 = RadixContext(short, n_blocks=2)
    a_v, b_v = [13, 7, 15, 0], [11, 6, 15, 3]
    a, b = r4.encrypt(a_v), r4.encrypt(b_v)
    assert r4.decrypt(a * b) == [(x * y) % 16 for x, y in zip(a_v, b_v)]
    s = a + b + a  # forces _split-based carry propagation
    assert r4.decrypt(s) == [(2 * x + y) % 16 for x, y in zip(a_v, b_v)]
    bits = a.bits()
    got = [r4.short.decrypt(bb) for bb in bits]
    for bi, vals in enumerate(got):
        assert vals == [(v >> bi) & 1 for v in a_v], f"bit {bi}"


def test_overflowing_add_sub(rctx):
    a_v, b_v = [60, 1, 32, 63], [10, 2, 32, 63]
    a, b = rctx.encrypt(a_v), rctx.encrypt(b_v)
    s, over = a.overflowing_add(b)
    assert rctx.decrypt(s) == [(x + y) % MOD for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(over) == [x + y >= MOD for x, y in zip(a_v, b_v)]
    d, borrow = a.overflowing_sub(b)
    assert rctx.decrypt(d) == [(x - y) % MOD for x, y in zip(a_v, b_v)]
    assert rctx.decrypt_flag(borrow) == [x < y for x, y in zip(a_v, b_v)]


def test_count_ones_zeros(rctx):
    vals = [0, 1, 0b101101, 63]
    a = rctx.encrypt(vals)
    assert rctx.decrypt(a.count_ones()) == [bin(v).count("1") for v in vals]
    assert rctx.decrypt(a.count_zeros()) == [
        6 - bin(v).count("1") for v in vals]


def test_leading_trailing_zeros(rctx):
    vals = [0, 1, 0b000100, 0b101000, 63]
    a = rctx.encrypt(vals)
    def lz(v):
        return 6 if v == 0 else 6 - v.bit_length()
    def tz(v):
        return 6 if v == 0 else (v & -v).bit_length() - 1
    assert rctx.decrypt(a.leading_zeros()) == [lz(v) for v in vals]
    assert rctx.decrypt(a.trailing_zeros()) == [tz(v) for v in vals]


def test_ilog2(rctx):
    vals = [1, 2, 3, 17, 63]
    a = rctx.encrypt(vals)
    assert rctx.decrypt(a.ilog2()) == [v.bit_length() - 1 for v in vals]


def test_noise_level_tracking_and_refresh(rctx):
    """tfhe-rs NoiseLevel discipline: column-accumulated multiply outputs
    record summed noise (>1 on carry-free blocks), refresh() repays it in
    one batched PBS, and packed-LUT ops (the chained multiply that failed
    on hardware, docs/ROADMAP.md) consume only fresh operands."""
    a = rctx.encrypt([5, 9, 13, 60])
    b = rctx.encrypt([3, 7, 11, 2])
    c = a * b
    # the accumulate leaves at least one block with summed (stale) noise
    assert any(blk.noise_level > 1 for blk in c.blocks)
    r = c.refresh()
    assert all(blk.noise_level == 1 for blk in r.blocks)
    assert all(blk.max_val < rctx.short.modulus for blk in r.blocks)
    # chained multiply goes through refresh() internally and stays exact
    d = c * b
    exp = [(x * y * y) % MOD for x, y in zip([5, 9, 13, 60], [3, 7, 11, 2])]
    assert rctx.decrypt(d) == exp


def test_noise_level_shortint_ops(rctx):
    """EncShort linear ops sum/scale noise levels; PBS-backed ops reset
    them; the bivariate multiply refreshes stale operands."""
    s = rctx.short
    x = s.encrypt([1, 2]); y = s.encrypt([3, 1])
    t = x + y
    assert t.noise_level == 2
    assert t.scalar_mul(2).noise_level in (1, 2, 4)  # may reduce first
    assert (t * y).noise_level == 1  # PBS output is fresh
    assert list(s.decrypt((t * y).reduce())) == [(4 * 3) % 4, (3 * 1) % 4]


def test_trivial_and_scalar_compares(rctx):
    ctx = rctx
    vals = [0, 7, 32, 50, 63]
    x = ctx.encrypt(vals)
    # trivial encryption round-trips without the client key's rng
    t = ctx.trivial([5, 6, 7, 8, 9])
    assert ctx.decrypt(t) == [5, 6, 7, 8, 9]
    assert ctx.decrypt(x + t) == [(v + w) % MOD
                                  for v, w in zip(vals, [5, 6, 7, 8, 9])]
    # scalar comparisons against a broadcast cleartext
    k = 32
    assert ctx.decrypt_flag(x.scalar_eq(k)) == [v == k for v in vals]
    assert ctx.decrypt_flag(x.scalar_lt(k)) == [v < k for v in vals]
    assert ctx.decrypt_flag(x.scalar_ge(k)) == [v >= k for v in vals]
    assert ctx.decrypt(x.scalar_min(k)) == [min(v, k) for v in vals]
    assert ctx.decrypt(x.scalar_max(k)) == [max(v, k) for v in vals]
    # negatives normalize mod 2^width, same as encrypt()
    assert ctx.decrypt(ctx.trivial([-1, -2, -MOD, 1, 2])) \
        == [MOD - 1, MOD - 2, 0, 1, 2]
