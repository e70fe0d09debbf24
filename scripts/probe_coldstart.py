"""Production cold-start probe: can the ~80-170 s first-process Mosaic
compile ride an ahead-of-time serialized executable? (VERDICT r4 #3)

Round-4 state: the persistent XLA compilation cache (ops/server_key.
_enable_compile_cache) cut key-layout prep 450 s -> seconds, but the FIRST
pallas kernel compile in each process still pays a large Mosaic
infrastructure warm-up that the cache does not cover — now the dominant
cold-start term.

Phases (run each in a FRESH process; one TPU process at a time):

  save  — build the flagship jitted bootstrap program at production
          geometry, compile, serialize the compiled executable
          (jax.experimental.serialize_executable) to --aot-path, and
          report the in-process compile time.
  cold  — the production path as-is: import -> key prep -> first batch,
          warm persistent cache.  The baseline being attacked.
  aot   — import -> key prep -> deserialize_and_load(--aot-path) ->
          first batch.  If the Mosaic cost lives in executable
          compilation, this skips it; if it is device-runtime warm-up,
          the numbers will say so.

Usage:
  python scripts/probe_coldstart.py --phase save
  python scripts/probe_coldstart.py --phase cold
  python scripts/probe_coldstart.py --phase aot
"""

from __future__ import annotations

import argparse
import os
import sys
import time

T0 = time.time()


def stamp(msg: str) -> None:
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["save", "cold", "aot"],
                    required=True)
    ap.add_argument("--params", default="std128_k2")
    ap.add_argument("--engine", default="pallas_mega13")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--aot-path", default="/tmp/herdsman_aot_bootstrap.bin")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))

    import numpy as np

    stamp("importing jax/herdsman ...")
    import jax
    import jax.numpy as jnp

    from bench import get_keys
    from herdsman_tpu.core import reference as ref
    from herdsman_tpu.ops import bootstrap as bs
    from herdsman_tpu.ops.server_key import (device_server_key,
                                             layouts_for_engine)

    stamp(f"jax up, devices={jax.devices()}")
    ck, sk = get_keys(args.params)
    stamp("host keys loaded")
    t0 = time.time()
    dsk = device_server_key(sk, layouts=layouts_for_engine(args.engine))
    for lay in layouts_for_engine(args.engine):
        jax.block_until_ready(getattr(dsk, lay))
    stamp(f"key prep done ({time.time() - t0:.1f}s)")

    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, args.batch).astype(bool)
    ct = jnp.asarray(ref.encrypt_bool(ck, bits, rng))
    jax.block_until_ready(ct)

    def fn(d, c):
        return bs.bootstrap_bool_batch.__wrapped__(d, c,
                                                   engine=args.engine)

    jfn = jax.jit(fn)

    if args.phase in ("save", "cold"):
        t0 = time.time()
        out = np.asarray(jfn(dsk, ct))
        stamp(f"first batch (compile+run): {time.time() - t0:.1f}s")
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits).sum())
        stamp(f"decrypt bad={bad}")
        if args.phase == "save":
            from jax.experimental import serialize_executable as se

            t0 = time.time()
            lowered = jfn.lower(dsk, ct)
            compiled = lowered.compile()
            blob, in_tree, out_tree = se.serialize(compiled)
            with open(args.aot_path, "wb") as f:
                import pickle

                pickle.dump((blob, in_tree, out_tree), f)
            stamp(f"serialized executable: {len(blob) / 1e6:.1f} MB "
                  f"({time.time() - t0:.1f}s) -> {args.aot_path}")
    else:  # aot
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        import pickle

        with open(args.aot_path, "rb") as f:
            blob, in_tree, out_tree = pickle.load(f)
        compiled = se.deserialize_and_load(blob, in_tree, out_tree)
        stamp(f"deserialize_and_load: {time.time() - t0:.1f}s")
        t0 = time.time()
        out = np.asarray(compiled(dsk, ct))
        stamp(f"first batch via AOT: {time.time() - t0:.1f}s")
        bad = int((ref.lwe_decrypt_bool(ck, out) != bits).sum())
        stamp(f"decrypt bad={bad}")
    # a second batch isolates steady-state from any first-run residue
    t0 = time.time()
    r = jfn(dsk, ct) if args.phase != "aot" else compiled(dsk, ct)
    np.asarray(r)
    stamp(f"second batch: {time.time() - t0:.2f}s")
    stamp(f"TOTAL import->first-result wall clock above; phase="
          f"{args.phase}")


if __name__ == "__main__":
    main()
