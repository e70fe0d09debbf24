"""Multi-host (DCN) runtime initialization and hybrid mesh construction.

The reference scales out by adding gRPC workers to a static fleet
(reference src/execution/worker/grpc/grpc_worker_group.cpp:18-30) — the
"fleet" here is a TPU pod slice: one JAX process per host, devices joined
by ICI within a host/slice and DCN across hosts. This module owns the two
pieces the coordinator needs:

- `init_multihost()` — `jax.distributed.initialize` wrapper taking explicit
  arguments or the standard env vars (`COORDINATOR_ADDRESS`, `NUM_PROCESSES`,
  `PROCESS_ID`), idempotent, no-op for single-process runs;
- `make_pod_mesh()` — a ("batch", "limb") mesh over all global devices with
  the batch axis laid out DCN-outermost, so ciphertext-batch (DP-analog)
  sharding crosses hosts over DCN while GGSW-row/limb (TP-analog) collectives
  stay on ICI (SURVEY.md §2.3: "shardings so collectives ride ICI, not DCN").

Geometry convention (BASELINE configs: 1 chip / 8 chips 1 host / 16 chips
2 hosts): `batch = num_hosts * (local_devices // limb)` — scaling hosts
grows the batch axis, never the limb axis.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)

_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the JAX distributed runtime across hosts.

    Arguments default to the conventional env vars; with neither arguments
    nor env vars (single-host run) this is a no-op. Returns True when a
    multi-process runtime is active after the call. Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single-process run: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    log.info(
        "joined distributed runtime: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def make_pod_mesh(limb: int = 1,
                  devices: Optional[Sequence] = None) -> Mesh:
    """("batch", "limb") mesh over ALL global devices, DCN-outermost.

    Device order along the batch axis groups each host's devices
    contiguously (host-major), so neighboring batch shards share ICI where
    possible and only the host boundary rides DCN. The limb axis never
    crosses hosts (asserted) — GGSW-row psum stays on ICI.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % limb == 0, f"{n} devices not divisible by limb={limb}"
    # host-major order: sort by (process_index, device id) when available
    def sort_key(d):
        return (getattr(d, "process_index", 0), getattr(d, "id", 0))

    devices = sorted(devices, key=sort_key)
    per_host: dict[int, int] = {}
    for d in devices:
        p = getattr(d, "process_index", 0)
        per_host[p] = per_host.get(p, 0) + 1
    assert all(c % limb == 0 for c in per_host.values()), (
        f"limb={limb} would cross a host boundary (per-host device counts "
        f"{per_host})"
    )
    dev_array = np.array(devices).reshape(n // limb, limb)
    return Mesh(dev_array, axis_names=("batch", "limb"))
