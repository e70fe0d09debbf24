"""Ahead-of-time executable cache: serialize compiled XLA programs to disk
and reload them in later processes, skipping compilation entirely.

Why this exists: the persistent XLA compilation cache (ops/server_key.
_enable_compile_cache) makes RE-compiles cheap, but a fresh process still
pays a large first-compile/infra warm-up on the flagship Pallas programs —
measured on hardware (scripts/probe_coldstart.py, docs/BENCH_LOG.md round
5): fully cold 89 s import->first-batch, warm persistent cache 75 s, AOT
deserialize **18 s** (deserialize_and_load 0.4 s + first batch 1.6 s).
That makes this the production cold-start path for fixed-shape programs
(the headline bootstrap chain; circuit plans at a stable batch size).

Cache entries are pickles (jax.experimental.serialize_executable), so the
cache directory is PER-USER (0700, like the XLA persistent cache) — never
point HERDSMAN_AOT_CACHE_DIR at a world-writable location.  Entries are
keyed by jax version, backend/device kind, and caller-supplied parts; any
load failure (version bump, changed toolchain, truncated file) falls back
to a normal compile and rewrites the entry.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from pathlib import Path
from typing import Any, Callable, Sequence

log = logging.getLogger("herdsman.aot")


def cache_dir() -> Path:
    env = os.environ.get("HERDSMAN_AOT_CACHE_DIR")
    if env:
        d = Path(env)
    else:
        d = Path.home() / ".cache" / "herdsman" / "aot"
    d.mkdir(parents=True, exist_ok=True)
    try:
        os.chmod(d, 0o700)
    except OSError:
        pass
    return d


def _key(parts: Sequence[object]) -> str:
    import jax

    backend = jax.devices()[0]
    # device_count is part of the identity: deserialize_and_load binds the
    # executable to ALL local devices, so an entry from an N-device client
    # cannot serve an M-device one
    ident = "\x1f".join(
        [jax.__version__, backend.platform,
         getattr(backend, "device_kind", "?"), str(jax.device_count())]
        + [repr(p) for p in parts]
    )
    return hashlib.sha256(ident.encode()).hexdigest()[:32]


def code_fingerprint(*modules: Any) -> str:
    """Hash the SOURCE of the modules that define a cached program: a
    cached executable embeds the code it was compiled from, so a kernel
    edit must invalidate the entry (otherwise a stale binary silently
    serves the old semantics)."""
    h = hashlib.sha256()
    for m in modules:
        f = getattr(m, "__file__", None)
        if f and os.path.exists(f):
            h.update(Path(f).read_bytes())
    return h.hexdigest()[:16]


def load_or_compile(jitted: Callable, example_args: tuple,
                    key_parts: Sequence[object]) -> Callable:
    """Return a compiled executable for ``jitted`` at ``example_args``'
    shapes: deserialized from the AOT cache when a matching entry exists,
    otherwise compiled now and serialized for the next process.

    ``jitted`` must be a ``jax.jit``-wrapped callable; ``key_parts`` must
    pin everything that changes the program (param-set name, engine,
    batch/shape knobs, relevant env toggles) — jax version and device kind
    are always included.  The returned callable takes the same positional
    arguments as ``jitted``.
    """
    from jax.experimental import serialize_executable as se

    path = cache_dir() / (_key(key_parts) + ".aotx")
    if path.exists():
        try:
            with open(path, "rb") as f:
                blob, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(blob, in_tree, out_tree)
            log.debug("aot: loaded %s (%d MB)", path.name,
                      len(blob) >> 20)
            return compiled
        except Exception as e:  # noqa: BLE001 — any stale entry: recompile
            log.warning("aot: reload of %s failed (%s: %s); recompiling",
                        path.name, type(e).__name__, e)
            try:
                path.unlink()
            except OSError:
                pass
    compiled = jitted.lower(*example_args).compile()
    try:
        blob, in_tree, out_tree = se.serialize(compiled)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        try:
            with open(tmp, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
            os.replace(tmp, path)
        finally:
            tmp.unlink(missing_ok=True)
        log.debug("aot: saved %s (%d MB)", path.name, len(blob) >> 20)
    except Exception as e:  # noqa: BLE001 — serialization is best-effort
        log.warning("aot: serialize failed (%s: %s); running without "
                    "cache", type(e).__name__, e)
    return compiled
