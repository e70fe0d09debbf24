"""Production parameter pinning (docs/SECURITY.md).

Every set claiming security_bits = 128 is pinned to the exact security-
relevant tuple documented in the dossier; editing params without updating
docs/SECURITY.md (and re-checking the estimator calibration) fails here.
"""

import math

from herdsman_tpu.core.params import PARAM_SETS

# (n, sigma_lwe, k, N, sigma_glwe) per docs/SECURITY.md "Production
# instances".  q = 2^32 is structural (TFHEParams.q_bits).
PINNED = {
    "std128":               (768, 2.0 ** 14, 1, 1024, 128.0),
    "std128_fast":          (768, 2.0 ** 14, 1, 1024, 128.0),
    "std128_k2":            (768, 2.0 ** 14, 2, 512, 128.0),
    "std128_k4":            (768, 2.0 ** 14, 4, 256, 128.0),
    "std128_shortint":      (768, 2.0 ** 14, 1, 2048, 4.0),
    "std128_shortint_fast": (768, 2.0 ** 14, 1, 2048, 4.0),
    "std128_shortint_b8":   (768, 2.0 ** 14, 1, 2048, 4.0),
    "std128_shortint_l4":   (768, 2.0 ** 14, 1, 2048, 4.0),
}


def test_production_params_pinned():
    prod = {name: p for name, p in PARAM_SETS.items()
            if p.security_bits == 128}
    assert set(prod) == set(PINNED), (
        "production set list changed — update docs/SECURITY.md + PINNED")
    for name, p in prod.items():
        n, lwe_std, k, N, glwe_std = PINNED[name]
        assert (p.n, p.lwe_std, p.k, p.N, p.glwe_std) == \
            (n, lwe_std, k, N, glwe_std), name
        assert p.q_bits == 32, name


def test_rho_meets_dossier_floor():
    """The dossier's hardness metric rho = dim / log2(q/sigma) must meet
    the documented floor (42.7 LWE / 41.0 GLWE at kN=1024) for every
    128-bit set — a params edit that silently WEAKENS an instance (larger
    sigma is fine, smaller is not) trips this before the dossier math is
    redone."""
    for name, p in PARAM_SETS.items():
        if p.security_bits != 128:
            continue
        rho_lwe = p.n / (32 - math.log2(p.lwe_std))
        assert rho_lwe >= 42.6, (name, rho_lwe)
        rho_glwe = p.kN / (32 - math.log2(p.glwe_std))
        assert rho_glwe >= 40.9, (name, rho_glwe)


def test_nonproduction_sets_claim_nothing():
    for name, p in PARAM_SETS.items():
        if name not in PINNED:
            assert p.security_bits == 0, (
                f"{name} claims {p.security_bits} bits without a dossier "
                "entry")
