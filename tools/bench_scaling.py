"""Weak/strong-scaling harness for the distributed halo-exchange SpMM.

BASELINE.md north star: >=80% weak-scaling nnz/s efficiency on a multi-host
slice. Real multi-chip hardware is not attached in this environment, so
this harness reports BOTH:

- a BYTES model (the primary artifact): per-shard compute traffic vs
  exchanged halo/hub bytes from the partition plan, turned into a
  weak-scaling efficiency eff = t_comp / (t_comp + t_comm) with
  t_comp = per-shard SpMM traffic / HBM_BW and t_comm = exchanged bytes /
  ICI_BW (v5p: 2765 GB/s HBM, ~90 GB/s ICI effective per link). This is
  hardware-model arithmetic over the exact plan, not interpreted-CPU wall
  clock (VERDICT r2 item 5);
- a CPU-proxy wall clock (``--cpu N``) that validates the collectives
  end-to-end on a virtual mesh; those times are NOT the TPU claim.

Weak scaling: per-shard graph size fixed (rows ~ n0 * shards). Strong
scaling mode (``--graph products-small``): one named graph partitioned at
every shard count — the BASELINE config-5 measurement.

    python tools/bench_scaling.py --cpu 8 --rows-per-shard 4096
    python tools/bench_scaling.py --graph products-small --cpu 8
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

HBM_BW = 2765e9   # v5p per-chip HBM bytes/s (utils/roofline.py)
ICI_BW = 90e9     # effective per-chip ICI bytes/s (public v5p: 4x ICI
#                   links; conservative single-direction effective rate)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bytes_model(plan, csr, d):
    """Per-shard modeled step time split (seconds) from the plan."""
    from of_spmm_tpu.utils.roofline import SpmmTraffic

    S = plan.n_shards
    traffic = SpmmTraffic(nnz=csr.nnz // S, n_rows=plan.rows_per_shard,
                          n_cols=csr.shape[1], d=d)
    stats = plan.comm_stats(d=d)
    t_comp = traffic.total_bytes / HBM_BW
    t_comm = (stats["halo_bytes"] + stats["hub_bytes"]) / ICI_BW
    return {"t_comp_us": t_comp * 1e6, "t_comm_us": t_comm * 1e6,
            "bytes_eff": t_comp / (t_comp + t_comm), **stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices (0 = real devices)")
    ap.add_argument("--rows-per-shard", type=int, default=4096)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--graph", default="",
                    help="strong-scale a named graph (e.g. products-small)"
                         " instead of the weak-scaling synthetics")
    ap.add_argument("--hubs", default="auto",
                    help="replicate top-K in-degree columns, or 'auto'")
    ap.add_argument("--ragged", action="store_true", default=True)
    ap.add_argument("--no-ragged", dest="ragged", action="store_false")
    ap.add_argument("--refine", type=float, default=0.15,
                    help="min-cut boundary refinement slack fraction")
    ap.add_argument("--no-wallclock", action="store_true",
                    help="bytes model only (skip the CPU-proxy timing)")
    ap.add_argument("--json-out", default="",
                    help="write the full per-shard table to this file")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from of_spmm_tpu.data.graphs import (GraphConfig, load_graph,
                                         synthetic_edges)
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.parallel.dist_spmm import dist_spmm
    from of_spmm_tpu.parallel.partition import partition_rows
    from of_spmm_tpu.sparse.formats import COO, CSR
    from of_spmm_tpu.utils.roofline import time_fn

    hubs = args.hubs if args.hubs == "auto" else int(args.hubs)
    devs = jax.devices()
    max_shards = len(devs)
    shard_counts = [s for s in (1, 2, 4, 8, 16, 32) if s <= max_shards]
    results = {}
    table = []

    named_csr = None
    if args.graph:
        named_csr, _cfg = load_graph(args.graph, symmetrize=True)
        named_csr = normalized_adjacency(named_csr)

    for S in shard_counts:
        if named_csr is not None:
            csr = named_csr
            n = csr.shape[0]
        else:
            n = args.rows_per_shard * S
            cfg = GraphConfig(f"scale{S}", n, n * args.deg, power_law=True,
                              n_classes=2)
            src, dst = synthetic_edges(cfg, seed=0)
            csr = normalized_adjacency(
                CSR.from_coo(COO.from_edges(src, dst, n)))
        t0 = time.time()
        plan = partition_rows(
            csr, S, replicate_hubs=hubs if S > 1 else 0,
            ragged=args.ragged and S > 1,
            refine_slack=args.refine if S > 1 else 0.0,
            with_transpose=False)
        plan_s = time.time() - t0
        model = bytes_model(plan, csr, args.d)
        row = {"shards": S, "rows": n, "nnz": int(csr.nnz),
               "plan_s": round(plan_s, 1),
               "halo_H": int(plan.halo_size),
               "offset_widths": (list(plan.offset_widths)
                                 if plan.offset_widths else None),
               "hubs": int(plan.n_hubs),
               **{k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in model.items()}}

        if not args.no_wallclock:
            mesh = Mesh(np.asarray(devs[:S]), ("x",))
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal((csr.shape[1],
                                                          args.d))
                .astype(np.float32))

            def run(xx):
                return dist_spmm(plan, xx, mesh)

            sec = time_fn(jax.jit(run), x, warmup=2, iters=args.iters)
            nnz_s = csr.nnz / sec
            results[S] = nnz_s
            eff_wall = nnz_s / (S * results[1]) if 1 in results else 1.0
            row.update({"ms": sec * 1e3, "mnnz_s": nnz_s / 1e6,
                        "weak_eff_wallclock_proxy": round(eff_wall, 4)})
        log(" ".join(f"{k}={v}" for k, v in row.items()))
        table.append(row)

    S_max = shard_counts[-1]
    final = table[-1]
    out = {
        "metric": (f"halo_saving_vs_allgather_{S_max}shards"
                   + (f"_{args.graph}" if args.graph else "_weak")),
        "value": final["saving"],
        "unit": "fraction_of_allgather_bytes_saved",
        "vs_baseline": round(final["saving"] / 0.5, 4),
        "bytes_eff": final["bytes_eff"],
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"mode": "bytes_model"
                       + ("+cpu_proxy" if args.cpu and not args.no_wallclock
                          else ""),
                       "hbm_bw": HBM_BW, "ici_bw": ICI_BW,
                       "d": args.d, "deg": args.deg, "hubs": args.hubs,
                       "ragged": args.ragged, "refine": args.refine,
                       "graph": args.graph or None,
                       "rows_per_shard": args.rows_per_shard,
                       "table": table, "headline": out}, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
