"""Benchmark driver — prints ONE JSON line on stdout.

Headline metric (BASELINE.md north star): CSR SpMM roofline fraction on the
ogbn-products-shaped workload (123M nnz, 128-dim fp32 features) on the
available chip. Details (per-impl timings, per-graph sweeps) go to stderr.

Usage:
    python bench.py                  # headline graph (env OFS_BENCH_GRAPH)
    python bench.py --graph cora --sweep
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_graph(name: str, d: int = 128, iters: int = 10, chain: int = 8):
    """Time Y = A @ X per impl. ``chain`` SpMMs run back-to-back inside ONE
    jitted computation (y <- A_hat y on the normalized adjacency, so values
    stay bounded); this amortizes host->device dispatch latency, which
    otherwise dominates small graphs on a remotely-attached chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops import reference as ref
    from of_spmm_tpu.ops.pallas.spmm import spmm_pallas
    from of_spmm_tpu.sparse.binned import bin_rows
    from of_spmm_tpu.utils.config import on_tpu
    from of_spmm_tpu.utils.roofline import SpmmTraffic, spmm_report, time_fn

    t0 = time.time()
    csr, cfg = load_graph(name)
    log(f"[{name}] graph: n={csr.shape[0]:,} nnz={csr.nnz:,} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    csr = normalized_adjacency(csr)  # bounded spectrum -> safe to chain
    binned = bin_rows(csr)
    eff = binned.padding_efficiency(csr.nnz)
    log(
        f"[{name}] binned: buckets="
        + str([(b.n_ell_rows, b.width) for b in binned.buckets])
        + f" pad_eff={eff:.3f} ({time.time()-t0:.1f}s)"
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((csr.shape[1], d)).astype(np.float32))

    traffic = SpmmTraffic(nnz=csr.nnz, n_rows=csr.shape[0], n_cols=csr.shape[1], d=d)
    results = {}

    impls = {
        "pallas": lambda xx: spmm_pallas(binned, xx, interpret=not on_tpu()),
        "xla": lambda xx: ref.spmm_binned_xla(binned, xx, row_chunk=32768),
    }
    for impl_name, fn in impls.items():
        try:
            chained = jax.jit(
                lambda xx: jax.lax.fori_loop(0, chain, lambda i, a: fn(a), xx)
            )
            secs = time_fn(chained, x, warmup=2, iters=iters) / chain
            rep = spmm_report(secs, traffic)
            results[impl_name] = rep
            log(
                f"[{name}] {impl_name}: {secs*1e3:.3f} ms/spmm (chain={chain})  "
                f"{rep['gflops']:.1f} GF/s  {rep['achieved_gb_s']:.1f} GB/s  "
                f"roofline={rep['roofline_fraction']:.3f}  "
                f"(SoL {rep['speed_of_light_ms']:.3f} ms)"
            )
        except Exception as e:  # keep the bench alive; report what works
            log(f"[{name}] {impl_name} FAILED: {type(e).__name__}: {e}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default=os.environ.get("OFS_BENCH_GRAPH", "ogbn-products"))
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--sweep", action="store_true", help="also run the small graphs")
    args = ap.parse_args()

    if args.sweep:
        for g in ["cora", "citeseer", "ogbn-arxiv", "reddit-small"]:
            bench_graph(g, d=args.d, iters=args.iters, chain=args.chain)

    results = bench_graph(args.graph, d=args.d, iters=args.iters, chain=args.chain)
    best_name, best = max(
        results.items(), key=lambda kv: kv[1]["roofline_fraction"], default=(None, None)
    )
    if best is None:
        print(json.dumps({"metric": "spmm_roofline_fraction", "value": 0.0,
                          "unit": "fraction", "vs_baseline": 0.0}))
        return 1
    log(f"best impl: {best_name}")
    # vs_baseline: ratio against the BASELINE.md target of 60% of the
    # per-chip HBM roofline (>=1.0 means target met).
    print(
        json.dumps(
            {
                "metric": f"spmm_roofline_fraction_{args.graph}_d{args.d}",
                "value": round(best["roofline_fraction"], 4),
                "unit": "fraction_of_hbm_roofline",
                "vs_baseline": round(best["roofline_fraction"] / 0.60, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
