"""Stage-by-stage hardware debug of the radix 8-bit multiply.

`bench.py --metric radix` reports exact=False at std128_shortint on TPU
(docs/ROADMAP.md "Correctness (open items)") while the same pipeline is
bit-exact on CPU at TEST_PBS and shortint's 3-PBS chain passes at 17.3
sigma. This script localizes the failure: it decrypt-checks and
margin-measures each stage of `EncRadix.__mul__`:

  1. propagate(a), propagate(b)       (carry-split PBS layers)
  2. _digit_products (packed bivariate lo/hi LUTs — a_i*m + b_j packing
     multiplies a's noise by m=4; with many-LUT the rounding window is
     also 2 bits coarser: the prime suspect)
  3. _accumulate_columns (carry-save + final propagate)

Run with --many-lut 0 to force single-LUT PBS everywhere: if stage 2/3
then passes, the many-LUT margin at space_bits=4/N=2048 is the culprit;
if it still fails, the bug is in the packed-product or carry-save logic
at production params.

Usage:
  python scripts/debug_radix.py [--batch 256] [--params std128_shortint]
                                [--many-lut 1|0] [--engine pallas_mega5]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def margins(ck, s, blk, expect_digits):
    """Slot-phase error stats of an EncShort batch vs expected digits."""
    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import pbs as pbs_mod

    phase = ref.lwe_phase(ck.lwe_key, np.asarray(blk.data)).astype(np.int64)
    enc = pbs_mod.encode(s.params, np.asarray(expect_digits) % s.space,
                         s.space_bits).astype(np.int64)
    err = (phase - enc) % (1 << 32)
    err = np.where(err >= 1 << 31, err - (1 << 32), err).astype(float)
    sigma = err.std() / (1 << 32)
    worst = np.abs(err).max() / (1 << 32)
    delta_half = 1.0 / (1 << (s.space_bits + 2))  # half-slot in q units
    return sigma, worst, delta_half


def check(name, got, expect):
    got = np.asarray(got)
    expect = np.asarray(expect)
    bad = int((got != expect).sum())
    print(f"  {name:34s} bad={bad}/{got.size}"
          + ("" if bad == 0 else
             f"  first bad idx={int(np.argwhere(got != expect)[0][0])}"),
          flush=True)
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--params", default="std128_shortint")
    ap.add_argument("--many-lut", type=int, default=1)
    ap.add_argument("--engine", default="pallas_mega5")
    args = ap.parse_args()

    from herdsman_tpu.core import PARAM_SETS
    from herdsman_tpu.radix import RadixContext
    from herdsman_tpu.shortint import ShortContext

    p = PARAM_SETS[args.params]
    ck, sk = get_keys(args.params)
    t0 = time.time()
    s = ShortContext(p, msg_bits=2, carry_bits=2, engine=args.engine,
                     keys=(ck, sk), many_lut=bool(args.many_lut))
    print(f"key prep {time.time() - t0:.1f}s; many_lut={s.many_lut} "
          f"(capacity would be "
          f"{__import__('herdsman_tpu.ops.pbs', fromlist=['x']).many_lut_capacity(p, s.space_bits)})",
          flush=True)
    ctx = RadixContext(s, n_blocks=4)  # 8-bit
    m = s.modulus

    rng = np.random.default_rng(5)
    B = args.batch
    av = rng.integers(0, 256, B)
    bv = rng.integers(0, 256, B)
    a = ctx.encrypt(av)
    b = ctx.encrypt(bv)

    # stage 0: encrypt/decrypt round trip
    check("stage0 decrypt(a)", ctx.decrypt(a), av)

    # stage 1: propagate
    ap_, bp_ = a.propagate(), b.propagate()
    check("stage1 propagate(a)", ctx.decrypt(ap_), av)
    check("stage1 propagate(b)", ctx.decrypt(bp_), bv)
    for j, blk in enumerate(ap_.blocks):
        dig = (av >> (j * s.msg_bits)) & (m - 1)
        sg, worst, dh = margins(ck, s, blk, dig)
        print(f"    a.block[{j}]: sigma={sg:.2e} q worst={worst:.3e} "
              f"half-slot={dh:.3e} ({dh / sg:.1f} sigma)", flush=True)

    # stage 2: packed digit products, checked column by column
    cols = a._digit_products(b)
    ad = [(av >> (i * s.msg_bits)) & (m - 1) for i in range(4)]
    bd = [(bv >> (i * s.msg_bits)) & (m - 1) for i in range(4)]
    exp_cols: list[list[np.ndarray]] = [[] for _ in range(4)]
    for i in range(4):
        for j in range(4 - i):
            exp_cols[i + j].append((ad[i] * bd[j]) % m)
    for i in range(4):
        for j in range(4 - i):
            if i + j + 1 < 4:
                exp_cols[i + j + 1].append((ad[i] * bd[j]) // m)
    total_bad = 0
    for c, (got_col, exp_col) in enumerate(zip(cols, exp_cols)):
        assert len(got_col) == len(exp_col), (c, len(got_col), len(exp_col))
        for t, (gb, eb) in enumerate(zip(got_col, exp_col)):
            got = np.asarray(s.decrypt(gb))
            total_bad += check(f"stage2 col{c} term{t}", got, eb % m)
            sg, worst, dh = margins(ck, s, gb, eb)
            print(f"    sigma={sg:.2e} worst={worst:.3e} "
                  f"({dh / max(sg, 1e-12):.1f} sigma to half-slot)",
                  flush=True)
    print(f"stage2 total bad: {total_bad}", flush=True)

    # stage 3: full multiply
    r = a * b
    check("stage3 (a*b) mod 256", ctx.decrypt(r), (av * bv) % 256)


if __name__ == "__main__":
    main()
