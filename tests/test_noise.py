"""Noise-margin tests: (a) statistical, at realistic (reduced) parameters —
gates must decrypt correctly through chained bootstraps with a comfortable
measured margin; (b) CLOSED-FORM, at the production parameter sets of
record — the core.noise accounting (calibrated against the hardware
measurements in docs/BENCH_LOG.md) must keep every documented margin above
its bar, so a params/gadget change that silently erodes a margin fails CI
instead of surfacing as rare decrypt failures on hardware."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from herdsman_tpu.core import PARAM_SETS
from herdsman_tpu.core import noise as nz
from herdsman_tpu.core import reference as ref
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


# ---------------------------------------------------------------------------
# Closed-form margins at the parameter sets of record (core/noise.py)
# ---------------------------------------------------------------------------

GATE_MARGIN_BAR = 8.0    # sigmas — the repo's production bar for bool gates
PACKED_MARGIN_BAR = 5.0  # sigmas — the packed-bivariate bar as shipped


@pytest.mark.parametrize("name", [
    "std128", "std128_fast", "std128_k2", "std128_k4",
    "std128_shortint", "std128_shortint_fast",
])
def test_gate_margin_above_bar(name):
    """Every production bool-gate set keeps >= 8 sigma to the q/16
    decision boundary under the (conservative) closed-form model."""
    m = nz.gate_margin_sigma(PARAM_SETS[name])
    assert m >= GATE_MARGIN_BAR, (
        f"{name}: closed-form gate margin {m:.1f} sigma is below the "
        f"{GATE_MARGIN_BAR}-sigma production bar — this params/gadget "
        "change erodes the bool decision margin")


def test_shortint_margins_above_bar():
    """The shortint/radix tier at STD128_SHORTINT: unary PBS inputs and
    the PACKED bivariate multiply inputs (ct = 4x + y) both clear their
    bars, including the mod-switch floor."""
    p = PARAM_SETS["std128_shortint"]
    unary = nz.shortint_unary_margin_sigma(p)
    packed = nz.packed_bivariate_margin_sigma(p)
    assert unary >= PACKED_MARGIN_BAR + 2, (
        f"unary shortint margin {unary:.1f} sigma eroded")
    assert packed >= PACKED_MARGIN_BAR, (
        f"packed bivariate margin {packed:.2f} sigma is below the "
        f"{PACKED_MARGIN_BAR}-sigma as-shipped bar (documented 5.6 sigma "
        "measured, BENCH_LOG 'Post-rebalance margins')")
    # packing always costs margin; the model must preserve the ordering
    assert packed < unary


def test_glwe_frame_margin_at_production_params():
    """GLWE-domain intermediate frames add pack + unpack keyswitch noise;
    the closed-form margin must stay above the production bar at the
    params of record (round-2 advisor medium finding) — the coordinator
    refuses the flag below 8 sigma (service/coordinator.py)."""
    for name in ("std128", "std128_k2"):
        m = nz.glwe_frame_margin_sigma(PARAM_SETS[name])
        plain = nz.gate_margin_sigma(PARAM_SETS[name])
        assert m >= GATE_MARGIN_BAR, (
            f"{name}: glwe-frame margin {m:.1f} sigma below bar")
        # the round-trip can only cost margin, and at these params the
        # cost must be small (< 10% of the plain-gate margin)
        assert plain * 0.9 <= m <= plain


def test_packed_many_lut_still_infeasible():
    """Round-2 measured verdict: packed many-LUT (coarse mod switch on
    packed bivariate inputs) is margin-capped below the 8-sigma bar at
    STD128_SHORTINT.  If this assertion ever FAILS, a params change has
    created the headroom to re-enable `many_lut_packed=True` and win back
    the shared-rotation product layer (~77.5 muls/s vs 54.5) — revisit
    shortint.py, do not just relax the test."""
    p = PARAM_SETS["std128_shortint"]
    m = nz.packed_bivariate_margin_sigma(p, coarse_bits=1)
    assert m < GATE_MARGIN_BAR, (
        f"packed many-LUT margin is now {m:.1f} sigma >= 8: re-enabling "
        "packed many-LUT may be sound — see docs/ROADMAP.md")


def test_noise_model_calibration_frozen():
    """Pin the model to the hardware record (docs/BENCH_LOG.md) on FROZEN
    copies of the params as measured: predictions must stay conservative
    (at or below measured) but within 2x.  These literals deliberately do
    NOT read PARAM_SETS, so evolving the live sets cannot silently
    invalidate the calibration."""
    from herdsman_tpu.core.params import TFHEParams

    frozen_k2 = TFHEParams(
        name="frozen_k2", n=768, lwe_std=float(2 ** 14), N=512, k=2,
        glwe_std=128.0, bg_bits=8, levels=2, ks_base_bits=3, ks_levels=5)
    frozen_fast = dataclasses.replace(frozen_k2, name="frozen_fast",
                                      N=1024, k=1)
    frozen_short = dataclasses.replace(
        frozen_k2, name="frozen_short", N=2048, k=1, glwe_std=4.0,
        bg_bits=7, levels=3, ks_base_bits=2, ks_levels=12)
    measured = {  # BENCH_LOG measured margins/sigmas on hardware
        "gate_k2": 15.9, "gate_fast": 13.9,
        "short_sigma1": 4.9e-4,  # per-PBS sigma backed out of 6.88e-4 q
        "ms_floor_n2048": 1.95e-3,
    }
    pred_k2 = nz.gate_margin_sigma(frozen_k2)
    pred_fast = nz.gate_margin_sigma(frozen_fast)
    assert measured["gate_k2"] / 2 < pred_k2 <= measured["gate_k2"] * 1.05
    assert (measured["gate_fast"] / 2 < pred_fast
            <= measured["gate_fast"] * 1.05)
    # predicted per-PBS sigma conservative vs measured (within 2x above)
    s1 = nz.pbs_out_sigma(frozen_short)
    assert measured["short_sigma1"] <= s1 * 1.05 < measured["short_sigma1"] * 2
    ms = nz.mod_switch_sigma(frozen_short)
    assert abs(ms - measured["ms_floor_n2048"]) / ms < 0.05
