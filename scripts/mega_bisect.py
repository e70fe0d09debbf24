"""Bisect which part of the mega-kernel breaks the Mosaic remote compiler.

Variants:
  rot   — rotation+decompose phase only (grid (bc, n, 1))
  ep    — EP phases only, digits scratch pre-filled by a trivial phase
  full  — the real mega kernel
Each runs one tiny STD128-shaped execution with random key material.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402
import functools  # noqa: E402

from herdsman_tpu.core import PARAM_SETS  # noqa: E402
from herdsman_tpu.ops.pallas import mega  # noqa: E402
from herdsman_tpu.ops.server_key import bt_tile  # noqa: E402

p = PARAM_SETS["std128"]
P, HALF = bt_tile(p)
R = (p.k + 1) * p.levels
B = 128
C4P = (p.k + 1) * 4 * P
n_steps = 8  # tiny step count for compile testing

rng = np.random.default_rng(0)
bsk = jnp.asarray(rng.integers(-128, 128, (n_steps, R, HALF, P, C4P))
                  .astype(np.int8))
acc0 = jnp.asarray(rng.integers(0, 1 << 32, (B, p.k + 1, p.N),
                                dtype=np.uint64).astype(np.uint32))
a_t = jnp.asarray(rng.integers(0, 2 * p.N, (n_steps, B)).astype(np.int32))


def try_variant(name, kernel_mod):
    t0 = time.time()
    try:
        import dataclasses

        p_small = dataclasses.replace(p, name="bisect", n=n_steps)
        out = np.asarray(
            kernel_mod.mega_blind_rotate(p_small, acc0, a_t, bsk)
        )
        print(f"{name}: OK in {time.time() - t0:.1f}s "
              f"(out checksum {int(out.sum()) & 0xFFFF})", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        print(f"{name}: FAIL ---- full error tail ----", flush=True)
        print(msg[-3000:], flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    if which == "full":
        try_variant("full-mega(n=8)", mega)
    elif which == "norot":
        # monkey-patch: disable the rotation phase body
        import herdsman_tpu.ops.pallas.mega as m

        orig = m._mega_kernel

        def no_rot_kernel(a_ref, acc0_ref, bt_ref, out_ref, acc_sc, dig_sc,
                          ep_sc, **kw):
            # same kernel but with the rotation phase writing constants
            pp = kw["p"]
            import jax.numpy as jn
            i = pl.program_id(1)
            j = pl.program_id(2)

            @pl.when(jn.logical_and(i == 0, j == 0))
            def _():
                acc_sc[:] = acc0_ref[:]

            @pl.when(j == 0)
            def _():
                for row in range(kw["R"] * kw["HALF"]):
                    dig_sc[row] = jn.ones(
                        (dig_sc.shape[1], dig_sc.shape[2]), jn.int8)

            @pl.when(j > 0)
            def _():
                r_row = (j - 1) * kw["HALF"]
                for ct in range(kw["HALF"]):
                    total = None
                    for sub in range(kw["HALF"]):
                        mm = (ct - sub) % (2 * kw["HALF"])
                        tile = bt_ref[0, 0, mm % kw["HALF"]]
                        prod = jn.dot(dig_sc[r_row + sub], tile,
                                      preferred_element_type=jn.int32)
                        if mm >= kw["HALF"]:
                            prod = -prod
                        total = prod if total is None else total + prod

                    @pl.when(j == 1)
                    def _(ct=ct, total=total):
                        ep_sc[ct] = total

                    @pl.when(j > 1)
                    def _(ct=ct, total=total):
                        ep_sc[ct] = ep_sc[ct] + total

            @pl.when(j == kw["R"])
            def _():
                for ct in range(kw["HALF"]):
                    a = ep_sc[ct].reshape(ep_sc.shape[1], kw["kp1"] if "kp1"
                                          in kw else pp.k + 1, 4, kw["P"])
                    acc_sc[:, :, ct * kw["P"]:(ct + 1) * kw["P"]] = (
                        acc_sc[:, :, ct * kw["P"]:(ct + 1) * kw["P"]]
                        + a.astype(jn.uint32)[:, :, 0, :]
                    )

            @pl.when(jn.logical_and(i == pl.num_programs(1) - 1, j == kw["R"]))
            def _():
                out_ref[:] = acc_sc[:]

        m._mega_kernel = functools.wraps(orig)(no_rot_kernel)
        try_variant("mega-no-rotation", m)
        m._mega_kernel = orig
    elif which == "rotonly":
        import herdsman_tpu.ops.pallas.mega as m

        orig = m._mega_kernel

        def rot_only(a_ref, acc0_ref, bt_ref, out_ref, acc_sc, dig_sc,
                     ep_sc, **kw):
            pp = kw["p"]
            import jax.numpy as jn
            i = pl.program_id(1)
            j = pl.program_id(2)

            @pl.when(jn.logical_and(i == 0, j == 0))
            def _():
                acc_sc[:] = acc0_ref[:]

            @pl.when(j == 0)
            def _():
                r_amt = a_ref[0, 0, :].astype(jn.uint32)
                W = pp.bg_bits * pp.levels
                Bg = 1 << pp.bg_bits
                half = Bg >> 1
                offset = sum(half << (pp.bg_bits * t)
                             for t in range(pp.levels))
                for c in range(pp.k + 1):
                    v = acc_sc[:, c, :]
                    rolled = v
                    for bit in range(pp.log2_2N):
                        s = 1 << bit
                        shifted = (
                            mega._neg_shift(rolled, s, pp.N) if s < pp.N
                            else jn.zeros_like(rolled) - rolled
                        )
                        take = ((r_amt >> jn.uint32(bit)) & jn.uint32(1)) != 0
                        rolled = jn.where(take[:, None], shifted, rolled)
                    diff = rolled - v
                    val = ((diff + jn.uint32(1 << (32 - W - 1)))
                           >> jn.uint32(32 - W)) + jn.uint32(offset)
                    for lev in range(pp.levels):
                        shift = pp.bg_bits * (pp.levels - 1 - lev)
                        d8 = (((val >> jn.uint32(shift)) & jn.uint32(Bg - 1))
                              .astype(jn.int32) - jn.int32(half)).astype(jn.int8)
                        row = c * pp.levels + lev
                        for sub in range(kw["HALF"]):
                            dig_sc[row * kw["HALF"] + sub] = \
                                d8[:, sub * kw["P"]:(sub + 1) * kw["P"]]
                # consume digits trivially so nothing is DCE'd
                acc_sc[:, 0, :1] = acc_sc[:, 0, :1] + \
                    dig_sc[0][:, :1].astype(jn.uint32)

            @pl.when(jn.logical_and(i == pl.num_programs(1) - 1, j == kw["R"]))
            def _():
                out_ref[:] = acc_sc[:]

        m._mega_kernel = functools.wraps(orig)(rot_only)
        try_variant("mega-rotation-only", m)
        m._mega_kernel = orig
