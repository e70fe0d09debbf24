#!/usr/bin/env python
"""Time the bsk_btT key-layout prep on the real TPU (VERDICT r3 #2: the
round-3 builder took 450 s; target <= 120 s).

Run ONE at a time through the tunnel:
    timeout 1200 python scripts/probe_btT_prep.py [--ref] [--n N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="std128_k2")
    ap.add_argument("--ref", action="store_true",
                    help="time the round-3 reference builder instead")
    ap.add_argument("--n", type=int, default=0,
                    help="truncate the key to N steps (0 = full)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from bench import get_keys
    from herdsman_tpu.ops import server_key as skm

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    ck, sk = get_keys(args.params)
    p = sk.params
    R = (p.k + 1) * p.levels
    ext = skm._np_ext(sk.bsk.reshape(p.n, R, p.k + 1, p.N))
    if args.n:
        import dataclasses
        ext = ext[: args.n]
        p = dataclasses.replace(p, n=args.n)
    build = skm._btT_layout_device_ref if args.ref else skm._btT_layout_device
    t0 = time.time()
    out = build(p, ext)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{'ref' if args.ref else 'flat'} builder n={p.n}: {dt:.1f}s "
          f"shape={out.shape} ({out.size / 2**30:.2f} GiB)", file=sys.stderr)
    if not args.ref:
        del out
        t0 = time.time()
        out = build(p, ext)  # cached jit: pure transfer+exec
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(f"second call (compile cached): {dt:.1f}s", file=sys.stderr)
    # correctness spot check: one step vs numpy-free device ref at step 0
    if not args.ref and p.n <= 96:
        refout = np.asarray(skm._btT_layout_device_ref(p, ext[:4]))
        np.testing.assert_array_equal(np.asarray(out[:4]), refout)
        print("spot check vs ref builder: OK", file=sys.stderr)
    print(dt)


if __name__ == "__main__":
    main()
