"""Profiling/tracing hooks — the observability layer the reference lacks
(SURVEY.md §5 marks tracing/profiling absent in the coordinator; the only
instrument there is leveled logging).

Two levels:

- `trace(dir)` — a context manager around ``jax.profiler.trace``: captures a
  full XLA/TPU profile (HLO timelines, per-op device time) viewable in
  TensorBoard/Perfetto.  Wired into job execution via the
  ``logging.profile_dir`` config key: when set, every job writes a profile
  under ``<profile_dir>/<job_uuid>/``.
- `annotate(name)` — ``jax.profiler.TraceAnnotation``: names a region so
  stage boundaries (map/reduce per plan node) show up inside the captured
  timeline.  No-op cost when no trace is active.

These complement the existing counters (per-job tasks/bootstraps/wall time
on JobDescriptor, utils.roofline speed-of-light model): counters answer
"how fast", traces answer "where did the time go".
"""

from __future__ import annotations

import contextlib
import pathlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    pathlib.Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield


def annotate(name: str):
    """Named region inside an active trace (cheap when not tracing)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
