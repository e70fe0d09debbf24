"""Sharded NTT (all-to-all stage exchange) must be bit-identical to the
single-device NTT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from herdsman_tpu.mesh import ntt_sharded
from herdsman_tpu.ops import ntt as nttm


@pytest.fixture(scope="module")
def mesh4():
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    return Mesh(devs, axis_names=("batch", "limb"))


@pytest.mark.parametrize("N", [256, 1024])
def test_sharded_ntt_bit_identical(mesh4, N):
    p = nttm.ntt_primes_for(N, 1)[0]
    plan = nttm.make_plan(p, N)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, p, (3, N)).astype(np.uint32))

    single = np.asarray(nttm.ntt_fwd(plan, x))
    sharded = np.asarray(ntt_sharded.ntt_fwd_sharded(plan, mesh4, x))
    np.testing.assert_array_equal(sharded, single)

    back = np.asarray(ntt_sharded.ntt_inv_sharded(plan, mesh4,
                                                  jnp.asarray(single)))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_sharded_polymul(mesh4):
    N = 256
    p = nttm.ntt_primes_for(N, 1)[0]
    plan = nttm.make_plan(p, N)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, p, (2, N)).astype(np.uint32))
    b = jnp.asarray(rng.integers(0, p, (2, N)).astype(np.uint32))
    single = np.asarray(nttm.negacyclic_polymul_ntt(plan, a, b))
    sharded = np.asarray(ntt_sharded.polymul_sharded(plan, mesh4, a, b))
    np.testing.assert_array_equal(sharded, single)
