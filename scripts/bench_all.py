"""Consolidated TPU benchmark: one process, one key transfer per param set,
all engine/batch measurements + noise + per-step breakdown. Writes results
to stdout as they complete (unbuffered lines)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from herdsman_tpu.core import PARAM_SETS  # noqa: E402
from herdsman_tpu.core import reference as ref  # noqa: E402
from herdsman_tpu.ops import bootstrap as bs  # noqa: E402
from herdsman_tpu.ops import gates  # noqa: E402
from herdsman_tpu.ops.server_key import device_server_key  # noqa: E402
from herdsman_tpu.utils import roofline  # noqa: E402


def say(msg):
    print(msg, flush=True)


def get_keys(name):
    import os

    p = PARAM_SETS[name]
    cache = f"/tmp/herdsman_bench_keys_{name}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return ref.ClientKey(p, z["lwe_key"], z["glwe_key"]), \
            ref.ServerKey(p, z["bsk"], z["ksk"])
    rng = np.random.default_rng(0xBEEF)
    ck, sk = ref.keygen(p, rng)
    np.savez(cache, lwe_key=ck.lwe_key, glwe_key=ck.glwe_key, bsk=sk.bsk,
             ksk=sk.ksk)
    return ck, sk


def run_param_set(name, engines, batches):
    p = PARAM_SETS[name]
    say(f"== {name} (n={p.n}, N={p.N}, Bg=2^{p.bg_bits}, l={p.levels})")
    t0 = time.time()
    ck, sk = get_keys(name)
    say(f"keys: {time.time() - t0:.0f}s")
    t0 = time.time()
    # BT expansion now runs on device (seconds) — no disk cache needed
    dsk = device_server_key(sk, layouts=("bsk_bt",))
    jax.block_until_ready(dsk.bsk_bt)
    say(f"BT prep (on device): {time.time() - t0:.0f}s "
        f"({dsk.bsk_bt.size / 1e9:.1f} GB)")

    rng = np.random.default_rng(7)
    for B in batches:
        # distinct inputs per timed iteration (the tunnel runtime memoizes
        # repeated identical executions)
        bit_sets = [rng.integers(0, 2, B).astype(bool) for _ in range(4)]
        ct_sets = [jnp.asarray(ref.encrypt_bool(ck, b, rng))
                   for b in bit_sets]
        for c in ct_sets:
            jax.block_until_ready(c)
        for engine in engines:
            try:
                fn = lambda c: bs.bootstrap_bool_batch(dsk, c, engine=engine)
                t0 = time.time()
                out = np.asarray(fn(ct_sets[0]))  # host fetch = real barrier
                compile_s = time.time() - t0
                # timing: K chained dependent bootstraps ending in a host
                # fetch — immune to async/no-op block_until_ready quirks of
                # the tunnel runtime
                K = 8
                t0 = time.time()
                chained = ct_sets[1]
                for _ in range(K):
                    chained = fn(chained)
                np.asarray(chained)
                dt = (time.time() - t0) / K
                ok = (ref.lwe_decrypt_bool(ck, out) == bit_sets[0]).all()
                sol = roofline.speed_of_light(p, B)
                rate = B / dt
                say(f"{name} {engine:14s} B={B:5d}: {rate:8.1f} bs/s/chip "
                    f"({dt * 1e3:7.1f} ms; compile {compile_s:.0f}s; "
                    f"decrypt_ok={ok}; "
                    f"{100 * rate / sol['roofline_bootstraps_per_sec']:.0f}% "
                    "SOL)")
            except Exception as e:  # noqa: BLE001
                say(f"{name} {engine} B={B}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")

    # noise margin (chained XOR -> AND)
    B = batches[-1]
    b1 = rng.integers(0, 2, B).astype(bool)
    b2 = rng.integers(0, 2, B).astype(bool)
    c1 = jnp.asarray(ref.encrypt_bool(ck, b1, rng))
    c2 = jnp.asarray(ref.encrypt_bool(ck, b2, rng))
    eng = engines[0]
    x = gates.gate_batch(dsk, gates.GateBatch(
        jnp.full((B,), gates.GATE_IDS["XOR"], dtype=jnp.int32), c1, c2),
        engine=eng)
    y = gates.gate_batch(dsk, gates.GateBatch(
        jnp.full((B,), gates.GATE_IDS["AND"], dtype=jnp.int32), x, c1),
        engine=eng)
    xb, yb = b1 ^ b2, (b1 ^ b2) & b1
    okx = (ref.lwe_decrypt_bool(ck, np.asarray(x)) == xb).all()
    oky = (ref.lwe_decrypt_bool(ck, np.asarray(y)) == yb).all()
    ph = ref.lwe_phase(ck.lwe_key, np.asarray(y)).astype(np.int64)
    mu = np.where(yb, 1 << 29, -(1 << 29))
    d = (ph - mu) % (1 << 32)
    d = np.where(d >= 1 << 31, d - (1 << 32), d).astype(float) / (1 << 32)
    sd = d.std()
    say(f"{name} noise: xor_ok={okx} and_ok={oky} phase_std={sd:.3e}q "
        f"margin={(1 / 16) / sd:.1f} sigma")


if __name__ == "__main__":
    run_param_set("std128_k2", ["pallas_mega13", "pallas_mega11"],
                  [1024, 2048])
    run_param_set("std128", ["pallas_fused", "pallas_bt"], [512, 1024])
    run_param_set("std128_fast", ["pallas_fused"], [1024])
