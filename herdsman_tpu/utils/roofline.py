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


# Hardware-measured practical dot-efficiency anchors, keyed by the
# flagship-class contraction window length WIN = 2N (the single-width
# bsk_btTs/btT key's K dimension).  RE-BASED to the K=16 deep-chain
# measurement frame (round 5): the old K=4 legs folded the end-of-chain
# host fetch into the kernel time, understating steady state 15-20%
# (BENCH_LOG round 5 K-sweep).
#  - WIN=1024 (STD128_K2): mega13 full kernel sustains 84.4% of nameplate
#    END-TO-END (11,456.7/s at B=2048, 178.8 ms, K=32 frame); the round-4
#    ablations showed the full kernel within 3.2% of its pure-dot bound,
#    so the dot section's efficiency is ~0.87.
#  - WIN=4096 (N=2048 tier): mega16 measured 88.2% of nameplate
#    END-TO-END (1,685.2/s, K=16 frame; per-batch fetch share there is
#    ~1%, so the K=32 correction is within noise) — a lower bound on its
#    dot efficiency.
# Between/beyond the anchors the factor is log2(WIN)-linear interpolated
# and clamped; dot efficiency rises monotonically with contraction length
# on the MXU (measured both ways, VERDICT r4 #3).
_DOT_EFF_ANCHORS = ((1024, 0.871), (4096, 0.882))


def practical_dot_efficiency(p: TFHEParams) -> tuple[float, int, str]:
    """(efficiency factor, window length, basis) for the flagship-class
    dot section at this geometry.  basis says whether the factor is a
    direct measurement at this window or an interpolation/extrapolation —
    bench prints it so ceiling readings are never silently cross-applied
    between geometries (round-4 advisor finding)."""
    import math

    win = 2 * p.N
    (w0, f0), (w1, f1) = _DOT_EFF_ANCHORS
    if win == w0 or win == w1:
        return (f0 if win == w0 else f1), win, "measured at this window"
    t = (math.log2(win) - math.log2(w0)) / (math.log2(w1) - math.log2(w0))
    f = f0 + t * (f1 - f0)
    f = min(0.95, max(0.60, f))
    basis = ("interpolated between measured windows" if 0 <= t <= 1
             else "extrapolated beyond measured windows")
    return f, win, basis


def speed_of_light(p: TFHEParams, batch: int,
                   dev: DeviceSpec = V5E) -> dict:
    """Theoretical ceilings for bootstraps/sec/chip at the given batch."""
    c = bootstrap_cost(p)
    compute_s = batch * c.total_macs() * 2 / (dev.int8_tops * 1e12)
    memory_s = c.hbm_bytes_per_batch / (dev.hbm_gbps * 1e9)
    bound = max(compute_s, memory_s)
    eff, win, basis = practical_dot_efficiency(p)
    return {
        "device": dev.name,
        "macs_per_bootstrap": c.total_macs(),
        "bt_bytes_per_batch": c.hbm_bytes_per_batch,
        "compute_bound_bootstraps_per_sec": batch / compute_s,
        "memory_bound_bootstraps_per_sec": batch / memory_s,
        "roofline_bootstraps_per_sec": batch / bound,
        # Hardware-measured PRACTICAL dot ceiling (what kernel work can
        # actually recover), scaled by the geometry's contraction window —
        # see _DOT_EFF_ANCHORS.
        "practical_dot_ceiling_bootstraps_per_sec": batch / bound * eff,
        "practical_dot_ceiling_window": win,
        "practical_dot_ceiling_basis": basis,
    }


def utilization(p: TFHEParams, batch: int, measured_per_sec: float,
                dev: DeviceSpec = V5E) -> float:
    """Fraction of the roofline achieved (0..1)."""
    sol = speed_of_light(p, batch, dev)
    return measured_per_sec / sol["roofline_bootstraps_per_sec"]
