"""NTT / modular-math / RNS tests (BASELINE config 3 path) — all exact."""

import numpy as np
import jax.numpy as jnp
import pytest

from herdsman_tpu.ops import modmath as mm
from herdsman_tpu.ops import ntt as nttm
from herdsman_tpu.ops import rns


def host_negacyclic_mod(a, b, p):
    full = np.convolve(a.astype(object), b.astype(object))
    N = len(a)
    out = full[:N].copy()
    out[: N - 1] -= full[N:]
    return np.array([int(v) % p for v in out], dtype=np.uint32)


def test_mulhi32():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, 2000, dtype=np.uint64)
    b = rng.integers(0, 1 << 32, 2000, dtype=np.uint64)
    got = np.asarray(mm.mulhi32(jnp.asarray(a.astype(np.uint32)),
                                jnp.asarray(b.astype(np.uint32))))
    expect = ((a * b) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_barrett():
    rng = np.random.default_rng(1)
    for p in (8355329, 12289, 3, (1 << 31) - 1):
        mu = (1 << 32) // p
        x = rng.integers(0, 1 << 32, 1000, dtype=np.uint64)
        got = np.asarray(mm.barrett_u32(jnp.asarray(x.astype(np.uint32)),
                                        p, mu))
        np.testing.assert_array_equal(got, (x % p).astype(np.uint32))


def test_montgomery():
    rng = np.random.default_rng(2)
    p = 8355329
    ctx = mm.MontgomeryCtx.make(p)
    a = rng.integers(0, p, 1000).astype(np.uint32)
    b = rng.integers(0, p, 1000).astype(np.uint32)
    am = mm.to_mont(jnp.asarray(a), ctx)
    prod = np.asarray(mm.mont_mul(am, jnp.asarray(b), ctx))
    np.testing.assert_array_equal(
        prod, (a.astype(np.uint64) * b % p).astype(np.uint32)
    )
    back = np.asarray(mm.from_mont(am, ctx))
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize("N", [64, 256])
def test_ntt_roundtrip_and_polymul(N):
    p = nttm.ntt_primes_for(N, 1)[0]
    plan = nttm.make_plan(p, N)
    rng = np.random.default_rng(3)
    a = rng.integers(0, p, (2, N)).astype(np.uint32)
    b = rng.integers(0, p, (2, N)).astype(np.uint32)
    back = np.asarray(nttm.ntt_inv(plan, nttm.ntt_fwd(plan, jnp.asarray(a))))
    np.testing.assert_array_equal(back, a)
    got = np.asarray(
        nttm.negacyclic_polymul_ntt(plan, jnp.asarray(a), jnp.asarray(b))
    )
    for r in range(2):
        np.testing.assert_array_equal(
            got[r], host_negacyclic_mod(a[r], b[r], p), err_msg=f"row {r}"
        )


def test_rns_polymul_matches_bigint():
    N = 64
    ctx = rns.make_rns(N, 3)
    rng = np.random.default_rng(4)
    a = np.array([int(x) for x in rng.integers(0, 1 << 62, N)],
                 dtype=object) % ctx.Q
    b = np.array([int(x) for x in rng.integers(0, 1 << 62, N)],
                 dtype=object) % ctx.Q
    got_res = np.asarray(
        rns.polymul(ctx, jnp.asarray(rns.to_rns(ctx, a)),
                    jnp.asarray(rns.to_rns(ctx, b)))
    )
    got = rns.from_rns(ctx, got_res)
    expect = rns.host_negacyclic_polymul(ctx, a, b)
    assert (got == expect).all()


def test_rns_roundtrip():
    N = 64
    ctx = rns.make_rns(N, 3)
    rng = np.random.default_rng(5)
    vals = np.array([int(x) for x in rng.integers(0, 1 << 60, N)],
                    dtype=object)
    back = rns.from_rns(ctx, rns.to_rns(ctx, vals))
    assert (back == vals % ctx.Q).all()


def test_rns_key_switch():
    N = 64
    ctx = rns.make_rns(N, 3)
    rng = np.random.default_rng(6)
    s1 = rng.integers(0, 2, N)
    s2 = rng.integers(0, 2, N)
    ksk = rns.keyswitch_keygen(ctx, s1, s2, rng)

    # RLWE ct under s2 with a 8-bit message in the top bits
    msg = rng.integers(0, 256, N)
    delta = ctx.Q // 256
    a_res = np.stack(
        [rng.integers(0, p, N).astype(np.uint32) for p in ctx.primes], axis=0
    )
    a_int = rns.from_rns(ctx, a_res)
    e = np.rint(rng.normal(0, 3.2, N)).astype(int)
    b_int = (
        rns.host_negacyclic_polymul(ctx, a_int, s2)
        + np.asarray(msg, dtype=object) * delta
        + np.asarray(e, dtype=object)
    ) % ctx.Q
    ct = np.stack([a_res, rns.to_rns(ctx, b_int)], axis=0)

    out = np.asarray(rns.key_switch(ctx, ksk, jnp.asarray(ct)))
    a2 = rns.from_rns(ctx, out[0])
    b2 = rns.from_rns(ctx, out[1])
    phase = (b2 - rns.host_negacyclic_polymul(ctx, a2, s1)) % ctx.Q
    # decode: round(phase / delta) mod 256
    got = np.array(
        [int((int(v) + delta // 2) // delta) % 256 for v in phase]
    )
    np.testing.assert_array_equal(got, msg)
    # noise must be far below delta/2
    err = np.array(
        [min(int(v) % delta, delta - int(v) % delta) for v in phase],
        dtype=float,
    )
    assert err.max() < delta / 16
