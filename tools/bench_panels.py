"""Panel-engine phase ablation — plan surgery on the cached plan.

Five modes on the SAME kernel (cf. tools/bench_ranges.py, but with a
DCE-proof decomposition — the r3 take-only jit fed only t[0,0] and XLA
gathered one row, which is why PROFILE_r03 misread the engine as
compute-bound):

  A full
  B nodma      = take + grid + compute      (staging counts zeroed)
  C nocompute  = take + grid + DMAs        (tile ids -1)
  D gridonly   = tiny table, no DMA, no compute
  E takeless-compute = tiny table + nodma  (grid + compute)

  take ~= B - E;  compute ~= E - D;  dma ~= C - B + E - D.

    python tools/bench_panels.py --graph products-small
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _surgery(plan, nodma=False, nocompute=False, tinytable=False):
    import numpy as np

    segs = []
    for seg in plan.segments:
        ctrl = np.array(seg.ctrl)
        kw = {}
        if nodma or tinytable:
            ctrl[:, 0, 3] = 0    # scat big
            ctrl[:, 0, 6] = 0
            ctrl[:, 0, 7] = 0    # scat tail
            ctrl[:, 0, 8] = 0
            ctrl[:, 0, 14] = 0   # scat split extent
            ctrl[:, 0, 16] = 0   # direct rows
            ctrl[:, 0, 17] = 0
        if nodma:
            ctrl[:, 0, 4] = 0    # range copies
            ctrl[:, 0, 12] = 0
            ctrl[:, 0, 10] = 0   # range split
        if nocompute:
            ctrl[:, 0, 0] = -1
            ctrl[:, 0, 9] = 0
            ctrl[:, 0, 10] = 0
            ctrl[:, 0, 14] = 0
        if tinytable:
            from of_spmm_tpu.sparse.panels import SCQ

            kw["stage_take"] = np.zeros(SCQ, np.int32)
        segs.append(dataclasses.replace(seg, ctrl=ctrl, **kw))
    return dataclasses.replace(plan, segments=tuple(segs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="products-small")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--key", default="v1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax"))

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.pallas.panels import _spmm_panels_jit
    from of_spmm_tpu.sparse.panels import build_panels_plan
    from of_spmm_tpu.ops.autograd import place_operator
    from of_spmm_tpu.utils.roofline import (SpmmTraffic, spmm_report,
                                            time_chained)

    csr, cfg = load_graph(args.graph, symmetrize=True)
    csr = normalized_adjacency(csr)
    plan = cached("panelsplan", f"{args.graph}|ablate|{args.key}",
                  lambda: build_panels_plan(csr))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((csr.shape[1], 128))
                    .astype(np.float32))
    traffic = SpmmTraffic(nnz=csr.nnz, n_rows=csr.shape[0],
                          n_cols=csr.shape[1], d=128)

    modes = {
        "A_full": {},
        "B_nodma": dict(nodma=True),
        "C_nocompute": dict(nocompute=True),
        "D_gridonly": dict(nodma=True, nocompute=True, tinytable=True),
        "E_takeless_compute": dict(nodma=True, tinytable=True),
    }
    from of_spmm_tpu.sparse.panels import ensure_masks

    res = {}
    plan = ensure_masks(plan, device=jax.devices()[0].platform != "cpu")
    placed = place_operator(plan)
    for mode, kw in modes.items():
        # surgery only swaps the small ctrl/stage_take leaves; the placed
        # masks (GBs over the tunnel) are reused across modes
        p = _surgery(placed, **kw) if kw else placed

        def mk(k, pp=p):
            def f(o, xx):
                def body(i, carry):
                    s, a = carry
                    y = _spmm_panels_jit(o, a, False)
                    return (s + y.ravel()[0] * 1e-30, y)
                return jax.lax.fori_loop(0, k, body, (0.0, xx))[1]
            return jax.jit(f)

        secs = time_chained(mk, p, x, k1=1, iters=args.iters,
                            est_iter_s=traffic.speed_of_light_s())
        res[mode] = secs
        rep = spmm_report(secs, traffic)
        log(f"[{args.graph}] {mode}: {secs*1e3:.2f} ms  "
            f"roofline={rep['roofline_fraction']:.3f}")
    A, B, C, D, E = (res[k] for k in
                     ("A_full", "B_nodma", "C_nocompute", "D_gridonly",
                      "E_takeless_compute"))
    take = B - E
    comp = E - D
    dma = C - B + E - D
    log(f"decomposition: grid={D*1e3:.1f} take={take*1e3:.1f} "
        f"compute={comp*1e3:.1f} dma={dma*1e3:.1f} "
        f"(full={A*1e3:.1f}; overlap hides "
        f"{(D+take+comp+dma-A)*1e3:.1f})")
    import json

    print(json.dumps({
        "graph": args.graph,
        "full_ms": round(A * 1e3, 2),
        "grid_ms": round(D * 1e3, 2),
        "take_ms": round(take * 1e3, 2),
        "compute_ms": round(comp * 1e3, 2),
        "dma_ms": round(dma * 1e3, 2),
        "n_groups": int(plan.n_groups),
        "n_scattered": int(plan.n_scattered),
    }))


if __name__ == "__main__":
    main()
