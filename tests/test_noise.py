"""Statistical noise-margin tests at realistic (reduced) parameters: gates
must decrypt correctly through chained bootstraps, and the measured output
noise must leave a comfortable margin to the q/16 decision boundary.

(The production STD128 margin analysis lives in core/params.py; this test
validates the noise model empirically at TEST_SMALL scale.)"""

import numpy as np
import jax.numpy as jnp

from herdsman_tpu.core import TEST_SMALL
from herdsman_tpu.core import reference as ref
from herdsman_tpu.ops import bootstrap as bs
from herdsman_tpu.ops import gates
from herdsman_tpu.ops.server_key import device_server_key


def phase_error(ck, cts, bits):
    """|phase - ±q/8| as fraction of q."""
    ph = ref.lwe_phase(ck.lwe_key, np.asarray(cts)).astype(np.int64)
    mu = np.where(bits, 1 << 29, -(1 << 29))
    d = (ph - mu) % (1 << 32)
    d = np.where(d >= 1 << 31, d - (1 << 32), d)
    return np.abs(d) / float(1 << 32)


def test_gate_chain_noise(small_keys):
    ck, sk, rng = small_keys
    dsk = device_server_key(sk, layouts=("bsk_conv",))
    B = 64
    bits1 = rng.integers(0, 2, B).astype(bool)
    bits2 = rng.integers(0, 2, B).astype(bool)
    c1 = jnp.asarray(ref.encrypt_bool(ck, bits1, rng))
    c2 = jnp.asarray(ref.encrypt_bool(ck, bits2, rng))

    # depth-2 chain: XOR then AND with fresh ciphertext
    x = gates.gate_batch(
        dsk, gates.GateBatch(
            jnp.full((B,), gates.GATE_IDS["XOR"], dtype=jnp.int32), c1, c2
        ), engine="conv_i8",
    )
    xb = bits1 ^ bits2
    assert (ref.lwe_decrypt_bool(ck, np.asarray(x)) == xb).all()

    y = gates.gate_batch(
        dsk, gates.GateBatch(
            jnp.full((B,), gates.GATE_IDS["AND"], dtype=jnp.int32), x, c1
        ), engine="conv_i8",
    )
    yb = xb & bits1
    assert (ref.lwe_decrypt_bool(ck, np.asarray(y)) == yb).all()

    # margin: error well below the 1/16 decision distance
    err = phase_error(ck, y, yb)
    assert err.max() < 1 / 32, f"max phase error {err.max():.4f} too close"
