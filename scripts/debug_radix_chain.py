"""Chained-multiply hardware debug: is the radix chain failure stale
RESULTS from re-executing the same jitted program (tunnel memoization) or
real corruption?

Decrypt-checks c1 = a*b, c2 = c1*b, c3 = c2*b individually and prints
which (if any) step diverges and WHAT it decrypts to (the previous step's
value => memoization; garbage => compute/noise).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--params", default="std128_shortint")
    ap.add_argument("--engine", default="pallas_mega5")
    ap.add_argument("--many-lut", type=int, default=1)
    args = ap.parse_args()

    from herdsman_tpu.core import PARAM_SETS
    from herdsman_tpu.radix import RadixContext
    from herdsman_tpu.shortint import ShortContext

    p = PARAM_SETS[args.params]
    ck, sk = get_keys(args.params)
    t0 = time.time()
    s = ShortContext(p, msg_bits=2, carry_bits=2, engine=args.engine,
                     keys=(ck, sk), many_lut=bool(args.many_lut))
    print(f"key prep {time.time() - t0:.1f}s many_lut={s.many_lut}",
          flush=True)
    ctx = RadixContext(s, n_blocks=4)

    rng = np.random.default_rng(42)
    B = args.batch
    av = rng.integers(0, 256, B)
    bv = rng.integers(1, 256, B)
    a, b = ctx.encrypt(av), ctx.encrypt(bv)

    cur, cv = a, av.copy()
    prev_cv = None
    for step in range(1, 4):
        t0 = time.time()
        cur = cur * b
        cv = (cv * bv) % 256
        got = np.array(ctx.decrypt(cur))
        bad = int((got != cv).sum())
        msg = f"step {step}: bad={bad}/{B}  ({time.time() - t0:.1f}s)"
        if bad and prev_cv is not None:
            stale = int((got == prev_cv).sum())
            msg += f"  [matches PREVIOUS step's value: {stale}/{B}]"
        if bad:
            i = int(np.argwhere(got != cv)[0][0])
            msg += (f"  first bad: got={got[i]} want={cv[i]}"
                    f" prev={prev_cv[i] if prev_cv is not None else '-'}"
                    f" a={av[i]} b={bv[i]}")
        print(msg, flush=True)
        prev_cv = cv.copy()


if __name__ == "__main__":
    main()
