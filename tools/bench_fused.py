"""Real-chip bring-up bench for the fused SpMM engine.

Usage: python tools/bench_fused.py [graph] [R] [T] [hot_budget]

Prints plan-build time, correctness vs the XLA oracle, and delta-timed
ms/spmm + roofline fraction. Single TPU process; run alone.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ablate(plan, mode):
    """Plan surgery for cost attribution: zero the staging counts
    ("nodma") or mark every step non-compute ("nocompute")."""
    import dataclasses as dc

    import numpy as np

    segs = []
    for seg in plan.segments:
        ctrl = np.array(seg.ctrl)
        if mode == "nodma":
            ctrl[:, 0, 3] = 0
            ctrl[:, 0, 6] = 0
        elif mode == "nocompute":
            ctrl[:, 0, 0] = -1
            ctrl[:, 0, 1] = 0
        segs.append(dc.replace(seg, ctrl=ctrl))
    return dc.replace(plan, segments=tuple(segs))


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    graph = pos[0] if len(pos) > 0 else "ogbn-arxiv"
    R = int(pos[1]) if len(pos) > 1 else 512
    T = int(pos[2]) if len(pos) > 2 else 1024
    hot = int(pos[3]) if len(pos) > 3 else 16384
    ablate = "--ablate" in sys.argv
    parity = "--parity" in sys.argv
    window = "--window" in sys.argv
    staging = "rows" if "--staging=rows" in sys.argv else "chunks"
    cq = 32
    tier = 32768
    for a in sys.argv[1:]:
        if a.startswith("--cq="):
            cq = int(a.split("=")[1])
        if a.startswith("--tier="):
            tier = int(a.split("=")[1])

    import jax
    import jax.numpy as jnp

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.pallas.fused import _spmm_fused_jit
    from of_spmm_tpu.sparse.fused import build_fused_plan, place_plan
    from of_spmm_tpu.utils.roofline import SpmmTraffic

    t0 = time.time()
    csr, cfg = load_graph(graph, symmetrize=True)
    csr = normalized_adjacency(csr)
    print(f"[{graph}] loaded n={csr.shape[0]:,} nnz={csr.nnz:,} "
          f"({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    plan = cached(
        "fusedplan",
        f"{graph}|sym|gcn-norm|R{R}|T{T}|hot{hot}|v5"
        f"|st={staging}|w={int(window)}|cq{cq}|tt{tier}",
        lambda: build_fused_plan(csr, R=R, T=T, hot_budget=hot,
                                 staging=staging, window=window,
                                 cq=cq, stage_tier=tier))
    build_s = time.time() - t0
    t0 = time.time()
    plan = place_plan(plan)
    place_s = time.time() - t0
    n_steps = sum(s.n_steps for s in plan.segments)
    print(f"[{graph}] plan: R={R} T={T} hot={plan.n_hot} "
          f"staged={plan.n_staged/1e6:.2f}M lanes={plan.n_lanes/1e6:.2f}M "
          f"(nnz {csr.nnz/1e6:.1f}M, pad_eff "
          f"{plan.padding_efficiency(csr.nnz):.3f}) S_buf={plan.S_buf} "
          f"DMAX={plan.DMAX} steps={n_steps} segs={len(plan.segments)} "
          f"rank1={plan.rank1} build={build_s:.1f}s "
          f"place={place_s:.1f}s", flush=True)

    n, m = plan.shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, 128)).astype(np.float32))

    t0 = time.time()
    y = _spmm_fused_jit(plan, x, False)
    y.block_until_ready()
    print(f"[{graph}] first call (compile): {time.time()-t0:.1f}s",
          flush=True)

    if parity:
        # correctness vs the numpy CSR oracle (the XLA oracle on a
        # tunneled chip pays the slow-gather path — minutes)
        t0 = time.time()
        import numpy as _np

        indptr = _np.asarray(csr.indptr).astype(_np.int64)
        rows = _np.repeat(_np.arange(n), _np.diff(indptr))
        want = _np.zeros((n, 128), _np.float32)
        contrib = _np.asarray(csr.vals)[:, None] * _np.asarray(x)[
            _np.asarray(csr.cols)]
        _np.add.at(want, rows, contrib)
        got = np.asarray(y)[:n]
        denom = np.abs(want).max() + 1e-9
        rel = np.abs(got - want).max() / denom
        print(f"[{graph}] parity vs oracle: rel={rel:.2e} "
              f"({time.time()-t0:.1f}s)", flush=True)

    # delta timing: k chained applications inside one jit (defeats the
    # remote backend's per-call overheads and any dispatch memoization)
    def mk(k):
        def f(p, xx):
            def body(_, carry):
                return _spmm_fused_jit(p, carry, False)
            return jax.lax.fori_loop(0, k, body, xx)
        return jax.jit(f, static_argnums=())

    def timeit(p, label):
        # delta timing with SCALAR-FETCH sync: on the tunneled chip
        # block_until_ready returns before execution finishes (see
        # utils/roofline._force) — only a host read forces completion.
        def mk2(k):
            @jax.jit
            def f(pp, xx):
                def body(i, carry):
                    return _spmm_fused_jit(pp, carry, False)
                return jnp.abs(jax.lax.fori_loop(0, k, body, xx)).sum()
            return f
        import jax.numpy as jnp
        f1, f9 = mk2(1), mk2(9)
        float(f1(p, x)), float(f9(p, x))
        t1, t3 = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f1(p, x))
            t1.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(f9(p, x))
            t3.append(time.perf_counter() - t0)
        sec = (sorted(t3)[2] - sorted(t1)[2]) / 8
        traffic = SpmmTraffic(nnz=csr.nnz, n_rows=n, n_cols=m, d=128)
        sol = traffic.speed_of_light_s()
        print(f"[{graph}] {label}: {sec*1e3:.3f} ms/spmm  "
              f"({sec/n_steps*1e6:.2f} us/step)  roofline={sol/sec:.3f}  "
              f"(SoL {sol*1e3:.3f} ms)", flush=True)
        return sec

    timeit(plan, f"fused R={R} T={T} hot={plan.n_hot}")
    if ablate:
        from of_spmm_tpu.sparse.fused import place_plan as _pp

        timeit(_pp(_ablate(plan, "nodma")), "ablate-nodma (compute only)")
        timeit(_pp(_ablate(plan, "nocompute")), "ablate-nocompute (dma only)")


if __name__ == "__main__":
    main()
