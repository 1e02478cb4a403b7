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


def _force(out) -> None:
    """Force completion: fetch one element to host.

    On remotely-attached (tunneled) devices ``block_until_ready`` can
    return before execution finishes; a host read of the result cannot.
    """
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall-clock seconds of fn(*args) with forced host sync."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def time_chained(
    make_chained: Callable[[int], Callable],
    *args,
    k1: int = 1,
    k2: Optional[int] = None,
    warmup: int = 2,
    iters: int = 8,
    est_iter_s: Optional[float] = None,
    target_marginal_s: float = 0.1,
    max_chain: int = 4096,
) -> float:
    """Per-iteration seconds via delta timing, cancelling fixed dispatch cost.

    ``make_chained(k)`` must return a jitted fn running the op k times
    back-to-back (data-dependent chain). Returns
    (t(k2) - t(k1)) / (k2 - k1) — the marginal cost of one iteration,
    immune to the per-call round-trip latency of tunneled devices.

    If ``k2`` is None it is chosen from ``est_iter_s`` (e.g. the
    speed-of-light estimate) so that the marginal work is at least
    ``target_marginal_s`` — small ops need long chains to rise above the
    per-call noise of a remotely-attached chip. If the measured delta is
    still below the run-to-run noise, the chain is lengthened and
    re-measured (up to ``max_chain``).
    """
    if k2 is None:
        est = est_iter_s or 1e-3
        k2 = k1 + min(max_chain, max(4, int(target_marginal_s / est)))
    f1 = make_chained(k1)
    t1 = time_fn(f1, *args, warmup=warmup, iters=iters)
    while True:
        f2 = make_chained(k2)
        t2 = time_fn(f2, *args, warmup=warmup, iters=iters)
        delta = t2 - t1
        # Noise guard: the delta must dominate the base measurement's
        # scale; otherwise lengthen the chain (compile time is O(1) in k
        # thanks to fori_loop) and try again.
        if delta > 0.25 * t1 or (k2 - k1) >= max_chain:
            break
        k2 = min(k1 + max_chain, k1 + 4 * (k2 - k1))
    return max(delta, 1e-9) / (k2 - k1)


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
