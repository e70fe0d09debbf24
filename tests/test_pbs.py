"""Programmable (LUT) bootstrapping tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from herdsman_tpu.core import TOY
from herdsman_tpu.core import reference as ref
from herdsman_tpu.ops import pbs
from herdsman_tpu.ops.server_key import device_server_key


@pytest.fixture(scope="module")
def pbs_setup(toy_keys):
    ck, sk, rng = toy_keys
    return ck, sk, device_server_key(sk, layouts=("bsk_conv",))


@pytest.mark.parametrize("msg_bits,table_fn", [
    (2, lambda m: (m * m) % 4),        # squaring mod 4
    (2, lambda m: (m + 1) % 4),        # increment
    (3, lambda m: (7 - m) % 8),        # reversal, 3-bit
])
def test_pbs_lut(pbs_setup, msg_bits, table_fn):
    ck, sk, dsk = pbs_setup
    rng = np.random.default_rng(1000 + msg_bits)
    table = [table_fn(m) for m in range(1 << msg_bits)]
    msgs = rng.integers(0, 1 << msg_bits, 16)
    mu = pbs.encode(TOY, msgs, msg_bits)
    ct = jnp.asarray(ref.lwe_encrypt_raw(ck, mu, rng))
    out = pbs.pbs_batch(dsk, ct, table, msg_bits)
    phase = ref.lwe_phase(ck.lwe_key, np.asarray(out))
    got = pbs.decode(TOY, phase, msg_bits)
    np.testing.assert_array_equal(got, [table[int(m)] for m in msgs])


def test_pbs_lut_flagship_engine():
    """PBS (incl. the many-LUT coarse mod switch) on the FLAGSHIP
    transposed engine: the integer tier rides the same blind-rotation
    entry point, so the bitcast kernel must decode LUTs exactly too."""
    import dataclasses as dc

    p = dc.replace(TOY, name="toy_b8l2_pbs", n=8, N=256, k=2,
                   bg_bits=8, levels=2)
    rng = np.random.default_rng(4100)
    ck, sk = ref.keygen(p, rng)
    dsk = device_server_key(sk, layouts=("bsk_btT",))
    table = [(3 * m + 1) % 4 for m in range(4)]
    msgs = rng.integers(0, 4, 6)
    ct = jnp.asarray(ref.lwe_encrypt_raw(ck, pbs.encode(p, msgs, 2), rng))
    out = pbs.pbs_batch(dsk, ct, table, 2, engine="pallas_mega13",
                        unroll=True)
    got = pbs.decode(p, ref.lwe_phase(ck.lwe_key, np.asarray(out)), 2)
    np.testing.assert_array_equal(got, [table[int(m)] for m in msgs])
    # many-LUT: two tables, one rotation, coarse mod switch
    sq = [(m * m) % 4 for m in range(4)]
    outs = pbs.pbs_many_batch(dsk, ct, (table, sq), 2,
                              engine="pallas_mega13", unroll=True)
    for tbl, o in zip((table, sq), outs):
        got = pbs.decode(p, ref.lwe_phase(ck.lwe_key, np.asarray(o)), 2)
        np.testing.assert_array_equal(got, [tbl[int(m)] for m in msgs])


def test_pbs_composes(pbs_setup):
    """PBS output encoding feeds the next PBS (noise refreshed each hop)."""
    ck, sk, dsk = pbs_setup
    rng = np.random.default_rng(2000)
    inc = [(m + 1) % 4 for m in range(4)]
    msgs = np.array([0, 1, 2, 3])
    ct = jnp.asarray(
        ref.lwe_encrypt_raw(ck, pbs.encode(TOY, msgs, 2), rng))
    out = pbs.pbs_batch(dsk, ct, inc, 2)
    out = pbs.pbs_batch(dsk, out, inc, 2)
    phase = ref.lwe_phase(ck.lwe_key, np.asarray(out))
    got = pbs.decode(TOY, phase, 2)
    np.testing.assert_array_equal(got, (msgs + 2) % 4)


def test_pbs_many_lut(pbs_setup):
    """Two LUTs from ONE blind rotation (many-LUT PBS): both outputs
    decode correctly and compose."""
    ck, sk, dsk = pbs_setup
    rng = np.random.default_rng(3000)
    sq = [(m * m) % 4 for m in range(4)]
    inc = [(m + 1) % 4 for m in range(4)]
    msgs = rng.integers(0, 4, 16)
    ct = jnp.asarray(
        ref.lwe_encrypt_raw(ck, pbs.encode(TOY, msgs, 2), rng))
    out_sq, out_inc = pbs.pbs_many_batch(dsk, ct, [sq, inc], 2)
    for out, table in ((out_sq, sq), (out_inc, inc)):
        phase = ref.lwe_phase(ck.lwe_key, np.asarray(out))
        got = pbs.decode(TOY, phase, 2)
        np.testing.assert_array_equal(got, [table[int(m)] for m in msgs])
    # outputs compose into a further (single-LUT) PBS
    out2 = pbs.pbs_batch(dsk, out_inc, inc, 2)
    phase = ref.lwe_phase(ck.lwe_key, np.asarray(out2))
    np.testing.assert_array_equal(pbs.decode(TOY, phase, 2), (msgs + 2) % 4)


def test_many_lut_capacity():
    from herdsman_tpu.core import PARAM_SETS, TEST_PBS
    assert pbs.many_lut_capacity(TEST_PBS, 4) == 1       # N=256: too tight
    assert pbs.many_lut_capacity(
        PARAM_SETS["std128_shortint"], 4) == 4           # N=2048
    assert pbs.many_lut_capacity(PARAM_SETS["std128_fast"], 4) == 2


def test_pbs_with_real_noise(small_keys):
    """LUT bootstrap decodes correctly at TEST_SMALL's realistic noise."""
    ck, sk, rng = small_keys
    from herdsman_tpu.core import TEST_SMALL

    dsk = device_server_key(sk, layouts=("bsk_conv",))
    table = [(3 * m) % 4 for m in range(4)]
    msgs = rng.integers(0, 4, 32)
    ct = jnp.asarray(
        ref.lwe_encrypt_raw(ck, pbs.encode(TEST_SMALL, msgs, 2), rng))
    out = pbs.pbs_batch(dsk, ct, table, 2)
    phase = ref.lwe_phase(ck.lwe_key, np.asarray(out))
    got = pbs.decode(TEST_SMALL, phase, 2)
    np.testing.assert_array_equal(got, [table[int(m)] for m in msgs])
