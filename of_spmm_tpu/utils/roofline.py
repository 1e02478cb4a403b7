"""Roofline model + timing harness for the sparse kernels.

The analog of the reference's CI speed gates
(ci/test/test_speed_multi_client.sh) re-expressed for TPU HBM-bandwidth
rooflines: SpMM traffic is dominated by the nnz row-gathers of the dense
operand, so speed-of-light is bytes_moved / HBM_bandwidth.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax

# Per-chip peak HBM bandwidth (bytes/s). Sources: public TPU spec sheets
# (v5e: 819 GB/s, v5p: 2765 GB/s, v4: 1228 GB/s).
PEAK_HBM_BYTES_PER_S: Dict[str, float] = {
    "v5e": 819e9,
    "v5litepod": 819e9,
    "v5 lite": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6e": 1640e9,
    "cpu": 50e9,  # nominal, for smoke-test readouts only
}


def detect_peak_bw() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in PEAK_HBM_BYTES_PER_S.items():
        if key in kind:
            return bw
    return PEAK_HBM_BYTES_PER_S["cpu"]


@dataclasses.dataclass(frozen=True)
class SpmmTraffic:
    """Minimum HBM traffic of one Y = A @ X (bytes)."""

    nnz: int
    n_rows: int
    n_cols: int
    d: int
    bytes_val: int = 4
    bytes_idx: int = 4

    @property
    def gather_bytes(self) -> int:
        return self.nnz * self.d * self.bytes_val  # X row reads (dominant)

    @property
    def structure_bytes(self) -> int:
        return self.nnz * (self.bytes_val + self.bytes_idx)  # vals + cols

    @property
    def output_bytes(self) -> int:
        return self.n_rows * self.d * self.bytes_val

    @property
    def total_bytes(self) -> int:
        return self.gather_bytes + self.structure_bytes + self.output_bytes

    @property
    def flops(self) -> int:
        return 2 * self.nnz * self.d

    def speed_of_light_s(self, peak_bw: Optional[float] = None) -> float:
        return self.total_bytes / (peak_bw or detect_peak_bw())


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds of fn(*args) with device sync."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def spmm_report(
    seconds: float, traffic: SpmmTraffic, peak_bw: Optional[float] = None
) -> Dict[str, float]:
    bw = peak_bw or detect_peak_bw()
    return {
        "seconds": seconds,
        "gflops": traffic.flops / seconds / 1e9,
        "nnz_per_s": traffic.nnz / seconds,
        "achieved_gb_s": traffic.total_bytes / seconds / 1e9,
        "roofline_fraction": (traffic.total_bytes / seconds) / bw,
        "speed_of_light_ms": traffic.speed_of_light_s(bw) * 1e3,
        "peak_bw_gb_s": bw / 1e9,
    }
