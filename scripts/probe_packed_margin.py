"""Empirical margin of PACKED bivariate PBS inputs under the many-LUT
coarse modulus switch — the measurement behind the packed-many-LUT
verdict (docs/ROADMAP.md).

For the packed input ct = 4*x + y (both fresh), the blind rotation lands
at index L = (b~ - sum_j a~_j s_j) mod 2N after the modulus switch; the
LUT decodes correctly iff L falls inside the half-window around the
message's ideal index m * 2N/space.  This script computes L EXACTLY (the
client key is available) for a large sample and reports the index-error
sigma and margin, for coarse_bits = 0 (standard switch, what the shipped
`many_lut_packed=False` path uses) and coarse_bits = 1 (what re-enabling
packed many-LUT would use).  Pure integer statistics — no bootstrap runs,
CPU-fast at production parameters.

Usage: python scripts/probe_packed_margin.py [--params std128_shortint]
       [--samples 4096] [--msg-bits 2] [--carry-bits 2]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from herdsman_tpu.core import PARAM_SETS  # noqa: E402
from herdsman_tpu.core import reference as ref  # noqa: E402
from herdsman_tpu.ops import pbs as pbs_mod  # noqa: E402


def mod_switch_np(p, ct: np.ndarray, coarse_bits: int) -> np.ndarray:
    """NumPy mirror of ops.bootstrap.mod_switch_2N (round-half-up)."""
    shift = 32 - (p.log2_2N + 1) + coarse_bits
    r = ct >> np.uint32(shift)
    idx = ((r + np.uint32(1)) >> np.uint32(1)).astype(np.int64) & (
        (p.two_N >> coarse_bits) - 1)
    return idx << coarse_bits if coarse_bits else idx


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="std128_shortint")
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--msg-bits", type=int, default=2)
    ap.add_argument("--carry-bits", type=int, default=2)
    args = ap.parse_args()

    p = PARAM_SETS[args.params]
    space_bits = args.msg_bits + args.carry_bits
    space = 1 << (space_bits + 1)
    m_mod = 1 << args.msg_bits
    rng = np.random.default_rng(0xBEEF)
    ck, _ = ref.keygen(p, rng)
    s = ck.lwe_key.astype(np.int64)

    xs = rng.integers(0, m_mod, args.samples)
    ys = rng.integers(0, m_mod, args.samples)
    ct_x = ref.lwe_encrypt_raw(ck, pbs_mod.encode(p, xs, space_bits), rng)
    ct_y = ref.lwe_encrypt_raw(ck, pbs_mod.encode(p, ys, space_bits), rng)
    packed = (ct_x * np.uint32(m_mod) + ct_y).astype(np.uint32)
    msgs = (xs * m_mod + ys) % space

    for coarse in (0, 1):
        t = mod_switch_np(p, packed, coarse)          # [S, n+1] indices
        landing = (t[:, p.n] - (t[:, : p.n] * s[None, :]).sum(axis=1)) \
            % p.two_N
        ideal = msgs * (p.two_N // space)
        err = ((landing - ideal + p.N) % p.two_N) - p.N  # centered
        half_window = p.two_N // (2 * space)
        sigma = err.std()
        print(f"coarse_bits={coarse}: index-error sigma = {sigma:.2f} "
              f"(half-window {half_window}) -> margin "
              f"{half_window / sigma:.2f} sigma; worst |err| = "
              f"{np.abs(err).max()} "
              f"({(np.abs(err) >= half_window).sum()} of {args.samples} "
              "outside the window)", flush=True)


if __name__ == "__main__":
    main()
