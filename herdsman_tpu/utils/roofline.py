"""Speed-of-light accounting for the TFHE hot kernels.

Computes per-bootstrap work (MXU MACs, HBM bytes) from the parameter set and
evaluates measured throughput against the device roofline — the
"per-kernel speed-of-light comparisons" required by the north star
(SURVEY.md §5 tracing/profiling, BASELINE.md).
"""

from __future__ import annotations

import dataclasses

from herdsman_tpu.core.params import TFHEParams


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    name: str
    int8_tops: float          # dense int8 TOPS (MACs*2)
    hbm_gbps: float           # HBM bandwidth GB/s
    hbm_gib: float


# public specs
V5E = DeviceSpec("TPU v5e", int8_tops=394.0, hbm_gbps=819.0, hbm_gib=16.0)
V5P = DeviceSpec("TPU v5p", int8_tops=918.0, hbm_gbps=2765.0, hbm_gib=95.0)


@dataclasses.dataclass
class BootstrapCost:
    macs: float               # int8 MACs per bootstrap (external products)
    ks_macs: float            # key-switch MACs per bootstrap
    hbm_bytes_per_batch: float  # key streaming per batch (amortized over B)

    def total_macs(self) -> float:
        return self.macs + self.ks_macs


def bootstrap_cost(p: TFHEParams) -> BootstrapCost:
    """Work per gate bootstrap with the block-Toeplitz engine."""
    R = (p.k + 1) * p.levels
    # per blind-rotation step: digits [R*N] x virtual matrix [R*N, (k+1)*N*4]
    ep_macs = p.n * (R * p.N) * ((p.k + 1) * p.N * 4)
    ks_macs = (p.kN * p.ks_levels) * ((p.n + 1) * 4)
    # per batch: the BT expansion streamed once per step
    bt_bytes = p.n * R * p.N // 1 * (p.k + 1) * 4 * min(128, p.N)
    return BootstrapCost(ep_macs, ks_macs, float(bt_bytes))


def speed_of_light(p: TFHEParams, batch: int,
                   dev: DeviceSpec = V5E) -> dict:
    """Theoretical ceilings for bootstraps/sec/chip at the given batch."""
    c = bootstrap_cost(p)
    compute_s = batch * c.total_macs() * 2 / (dev.int8_tops * 1e12)
    memory_s = c.hbm_bytes_per_batch / (dev.hbm_gbps * 1e9)
    bound = max(compute_s, memory_s)
    return {
        "device": dev.name,
        "macs_per_bootstrap": c.total_macs(),
        "bt_bytes_per_batch": c.hbm_bytes_per_batch,
        "compute_bound_bootstraps_per_sec": batch / compute_s,
        "memory_bound_bootstraps_per_sec": batch / memory_s,
        "roofline_bootstraps_per_sec": batch / bound,
        # Hardware-measured PRACTICAL dot ceiling: the mega13 dots-only
        # ablation sustains ~72% of the nameplate int8 rate through the
        # K-chained i8-accumulation dataflow (212.0 ms vs the 150.9 ms
        # nameplate floor at B=2048/STD128_K2; every non-dot cost measured
        # <= 3.5+5.3 ms — docs/BENCH_LOG.md round 4).  Utilization against
        # this ceiling is what kernel work can actually recover.  NOTE the
        # 0.712 factor is the STD128_K2 geometry's (WIN=1024 contraction);
        # dot efficiency RISES with window length — the N=2048 tier
        # (WIN=4096) measured 84.5% of nameplate end-to-end, so readings
        # >100% at large-N geometries are expected and fine.
        "practical_dot_ceiling_bootstraps_per_sec": batch / bound * 0.712,
    }


def utilization(p: TFHEParams, batch: int, measured_per_sec: float,
                dev: DeviceSpec = V5E) -> float:
    """Fraction of the roofline achieved (0..1)."""
    sol = speed_of_light(p, batch, dev)
    return measured_per_sec / sol["roofline_bootstraps_per_sec"]
