"""AOT executable cache (ops/aot.py): serialize/deserialize round trip,
cache-hit reuse, stale-entry fallback, and source fingerprinting.  On
hardware this path cuts flagship cold start 89 s -> 18 s (BENCH_LOG round
5).

The round-trip tests run in a SINGLE-DEVICE subprocess: deserialize_and_
load binds an executable to all local devices, so under the suite's
forced 8-device CPU client a 1-device entry cannot execute (that topology
is part of the cache key for exactly this reason) — production is the
1-chip TPU client, which the subprocess mirrors.
"""

import os
import subprocess
import sys
import textwrap

from herdsman_tpu.ops import aot

_SUBPROC = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np, jax.numpy as jnp
    from herdsman_tpu.ops import aot

    @jax.jit
    def f(x):
        return (x * 3 + 1).astype(jnp.uint32)

    x = jnp.arange(8, dtype=jnp.uint32)
    expect = np.arange(8, dtype=np.uint32) * 3 + 1

    c1 = aot.load_or_compile(f, (x,), ["t1"])          # compile + save
    assert np.array_equal(np.asarray(c1(x)), expect)
    entries = list(aot.cache_dir().glob("*.aotx"))
    assert len(entries) == 1, entries

    c2 = aot.load_or_compile(f, (x,), ["t1"])          # loads from disk
    assert np.array_equal(np.asarray(c2(x)), expect)
    assert len(list(aot.cache_dir().glob("*.aotx"))) == 1

    aot.load_or_compile(f, (x,), ["t2"])               # distinct key
    assert len(list(aot.cache_dir().glob("*.aotx"))) == 2

    [e] = [p for p in aot.cache_dir().glob("*.aotx")
           if p.name.startswith(aot._key(["t1"]))]
    e.write_bytes(b"not a pickle")                     # corrupt entry
    c3 = aot.load_or_compile(f, (x,), ["t1"])          # recompiles
    assert np.array_equal(np.asarray(c3(x)), expect)
    print("AOT-SUBPROC-OK")
""")


def test_roundtrip_in_single_device_process(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single CPU device, like the 1-chip TPU
    env["HERDSMAN_AOT_CACHE_DIR"] = str(tmp_path / "aot")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", _SUBPROC], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "AOT-SUBPROC-OK" in out.stdout


def test_code_fingerprint_tracks_module_source():
    from herdsman_tpu.ops import bootstrap as bs

    fp1 = aot.code_fingerprint(bs)
    fp2 = aot.code_fingerprint(bs)
    assert fp1 == fp2 and len(fp1) == 16
    from herdsman_tpu.ops import poly

    assert aot.code_fingerprint(bs, poly) != fp1


def test_key_includes_device_topology():
    # same parts, same client -> same key; the key builder folds in
    # jax version/platform/device_kind/device_count (deserialize binds to
    # all local devices, so topology is identity)
    assert aot._key(["x"]) == aot._key(["x"])
    assert aot._key(["x"]) != aot._key(["y"])
