"""Ranges-engine phase ablation — plan surgery on the cached plan.

Same method as tools/bench_fused.py --ablate (PROFILE_r02.md): the SAME
compiled kernel runs with (a) all staging counts zeroed ("nodma" =
compute only, windows stay zero — numerics are garbage, timing is not),
(b) every step marked non-compute ("nocompute" = staging DMAs + the XLA
scattered-take phase only), and (c) take-only (the per-segment XLA take
phase jitted alone). Differences decompose the full time into
take / staging / compute / overlap. Timing is delta-chained with
scalar-fetch sync (utils/roofline.time_chained).

    python tools/bench_ranges.py --graph products-small
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _surgery(plan, mode: str):
    import numpy as np

    from of_spmm_tpu.sparse.ranges import RangesPlan, RangesSegment

    segs = []
    for seg in plan.segments:
        ctrl = np.array(seg.ctrl)
        if mode == "nodma":
            ctrl[:, 0, 3] = 0   # scattered chunk counts
            ctrl[:, 0, 6] = 0
            ctrl[:, 0, 4] = 0   # range copy counts
            ctrl[:, 0, 12] = 0
            ctrl[:, 0, 10] = 0  # range splits (window stays zero)
        elif mode == "nocompute":
            ctrl[:, 0, 0] = -1
            ctrl[:, 0, 9] = 0
            ctrl[:, 0, 10] = 0
        segs.append(dataclasses.replace(seg, ctrl=ctrl))
    return dataclasses.replace(plan, segments=tuple(segs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="products-small")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax"))

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.pallas.fused import _stage_table
    from of_spmm_tpu.ops.pallas.ranges import _spmm_ranges_jit
    from of_spmm_tpu.sparse.ranges import build_ranges_plan
    from of_spmm_tpu.ops.autograd import place_operator
    from of_spmm_tpu.utils.roofline import (SpmmTraffic, spmm_report,
                                            time_chained, time_fn)

    csr, cfg = load_graph(args.graph, symmetrize=True)
    csr = normalized_adjacency(csr)
    plan = cached("rangesplan", f"{args.graph}|ablate|v1",
                  lambda: build_ranges_plan(csr))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((csr.shape[1], 128))
                    .astype(np.float32))
    traffic = SpmmTraffic(nnz=csr.nnz, n_rows=csr.shape[0],
                          n_cols=csr.shape[1], d=128)

    # take-only: the XLA scattered staging phase per segment
    placed = place_operator(plan)

    def take_only(p, xx):
        xs = xx
        acc = 0.0
        for seg in p.segments:
            t = _stage_table(seg, p, xs)
            acc = acc + t[0, 0].astype(jnp.float32) * 1e-30
        return xx + acc

    def mk_take(k):
        def f(p, xx):
            def body(i, carry):
                return take_only(p, carry)
            return jax.lax.fori_loop(0, k, body, xx)
        return jax.jit(f)

    secs_take = time_chained(mk_take, placed, x, k1=1, iters=args.iters,
                             est_iter_s=traffic.speed_of_light_s())
    log(f"[{args.graph}] take-only: {secs_take*1e3:.2f} ms")

    results = {}
    for mode in ("full", "nodma", "nocompute"):
        p = placed if mode == "full" else place_operator(
            _surgery(plan, mode))

        def mk(k, pp=p):
            def f(o, xx):
                def body(i, carry):
                    s, a = carry
                    y = _spmm_ranges_jit(o, a, False)
                    return (s + y.ravel()[0] * 1e-30, y)
                return jax.lax.fori_loop(0, k, body, (0.0, xx))[1]
            return jax.jit(f)

        secs = time_chained(mk, p, x, k1=1, iters=args.iters,
                            est_iter_s=traffic.speed_of_light_s())
        results[mode] = secs
        rep = spmm_report(secs, traffic)
        log(f"[{args.graph}] {mode}: {secs*1e3:.2f} ms  "
            f"roofline={rep['roofline_fraction']:.3f}")
    f, nd, nc = results["full"], results["nodma"], results["nocompute"]
    log(f"overlap achieved: {(nd + nc - f)*1e3:.2f} ms "
        f"(full = compute-only + dma-only - overlap)")
    import json

    print(json.dumps({
        "graph": args.graph,
        "take_ms": round(secs_take * 1e3, 2),
        "full_ms": round(f * 1e3, 2),
        "compute_only_ms": round(nd * 1e3, 2),
        "staging_only_ms": round(nc * 1e3, 2),
        "overlap_ms": round((nd + nc - f) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
