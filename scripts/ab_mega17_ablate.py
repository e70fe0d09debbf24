"""Pin mega17's loss vs mega12 (A/B said -3.3%): section ablations.

One process, one key build (bsk_btT3 at STD128_SHORTINT_B8), three legs:
  full      — the production kernel
  nodigits  — constant digit stream (no rotate/pack): dots+combine+grid
  dotsonly  — constant digits AND no limb recombine: the pure dot floor
The deltas price the 3-of-4 pack stream and the wrap-split dot section
separately (outputs of the ablated legs are INVALID by design — timing
probe only, per the HERDSMAN_MEGA_ABLATE contract in ops/pallas/mega.py).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import get_keys  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    params_name = sys.argv[1] if len(sys.argv) > 1 else "std128_shortint_b8"
    engine = sys.argv[2] if len(sys.argv) > 2 else "pallas_mega17"
    B = 2048
    ck, sk = get_keys(params_name)
    dsk = device_server_key(sk, layouts=layouts_for_engine(engine))
    for lay in layouts_for_engine(engine):
        jax.block_until_ready(getattr(dsk, lay))
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, B).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    jax.block_until_ready(ct)

    K = 4
    for ablate in ("", "nodigits", "dotsonly", "", "nodigits", "dotsonly"):
        if ablate:
            os.environ["HERDSMAN_MEGA_ABLATE"] = ablate
        else:
            os.environ.pop("HERDSMAN_MEGA_ABLATE", None)
        jax.clear_caches()
        fn = lambda c: bs.bootstrap_bool_batch(dsk, c, engine=engine)
        out = np.asarray(fn(ct))  # compile
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits).sum())
        t0 = time.time()
        c = ct
        for _ in range(K):
            c = fn(c)
        np.asarray(c)
        dt = (time.time() - t0) / K
        print(f"{engine:14s} ablate={ablate or 'full':9s} "
              f"{dt * 1e3:7.1f} ms/batch ({B / dt:7.1f} bs/s, bad={bad})",
              flush=True)


if __name__ == "__main__":
    main()
