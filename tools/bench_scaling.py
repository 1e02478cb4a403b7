"""Weak/strong-scaling harness for the distributed halo-exchange SpMM.

BASELINE.md north star: >=80% weak-scaling nnz/s efficiency on a multi-host
slice. Real multi-chip hardware is not attached in this environment, so
this harness has two modes:

- ``--cpu N``: N virtual CPU devices (xla_force_host_platform semantics via
  jax_num_cpu_devices) — validates the methodology end-to-end and reports
  the collective/compute time split; CPU numbers are NOT the TPU claim.
- on a real multi-chip slice the same flags measure the claim directly
  (jax.distributed picks up the slice; the mesh spans all devices).

Weak scaling: the per-shard graph size is fixed (rows ~ n0 * shards), so
ideal nnz/s grows linearly with shards; efficiency = (nnz/s at S shards) /
(S * nnz/s at 1 shard).

    python tools/bench_scaling.py --cpu 8 --rows-per-shard 4096
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use N virtual CPU devices (0 = real devices)")
    ap.add_argument("--rows-per-shard", type=int, default=4096)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hubs", type=int, default=0,
                    help="replicate top-K in-degree columns (degree-aware)")
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

    from of_spmm_tpu.data.graphs import GraphConfig, synthetic_edges
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.parallel.dist_spmm import dist_spmm
    from of_spmm_tpu.parallel.partition import partition_rows
    from of_spmm_tpu.sparse.formats import COO, CSR
    from of_spmm_tpu.utils.roofline import time_fn

    devs = jax.devices()
    max_shards = len(devs)
    shard_counts = [s for s in (1, 2, 4, 8, 16, 32) if s <= max_shards]
    results = {}
    table = []

    for S in shard_counts:
        n = args.rows_per_shard * S
        cfg = GraphConfig(f"scale{S}", n, n * args.deg, power_law=True,
                          n_classes=2)
        src, dst = synthetic_edges(cfg, seed=0)
        csr = normalized_adjacency(CSR.from_coo(COO.from_edges(src, dst, n)))
        plan = partition_rows(csr, S, replicate_hubs=args.hubs)
        mesh = Mesh(np.asarray(devs[:S]), ("x",))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n, args.d)) \
            .astype(np.float32))

        def run(xx):
            return dist_spmm(plan, xx, mesh)

        sec = time_fn(jax.jit(run), x, warmup=2, iters=args.iters)
        nnz_s = csr.nnz / sec
        results[S] = nnz_s
        eff = nnz_s / (S * results[1]) if 1 in results else 1.0
        stats = plan.comm_stats(d=args.d)
        log(f"shards={S:>2} rows={n:>9,} nnz={csr.nnz:>11,} "
            f"{sec*1e3:8.2f} ms  {nnz_s/1e6:8.1f} Mnnz/s  weak-eff={eff:.3f} "
            f"halo={stats['halo_bytes']/1e6:.1f}MB "
            f"hub={stats['hub_bytes']/1e6:.1f}MB "
            f"allgather={stats['all_gather_bytes']/1e6:.1f}MB "
            f"saving={stats['saving']:.3f}")
        table.append({"shards": S, "rows": n, "nnz": int(csr.nnz),
                      "ms": sec * 1e3, "mnnz_s": nnz_s / 1e6,
                      "weak_eff": eff, **stats,
                      "halo_H": int(plan.halo_size),
                      "hubs": int(plan.n_hubs)})

    S_max = shard_counts[-1]
    eff = results[S_max] / (S_max * results[1])
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"mode": "cpu_proxy" if args.cpu else "device",
                       "d": args.d, "deg": args.deg, "hubs": args.hubs,
                       "rows_per_shard": args.rows_per_shard,
                       "table": table}, f, indent=1)
    print(json.dumps({
        "metric": f"weak_scaling_eff_{S_max}shards"
                  + ("_cpu_proxy" if args.cpu else ""),
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.80, 4),
    }))


if __name__ == "__main__":
    main()
