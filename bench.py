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


def bench_graph(name: str, d: int = 128, iters: int = 8, impls=("xla", "pallas"),
                tier_size=None, layout="auto", shuffled=False):
    """Time Y = A @ X per impl with delta timing: k1 vs k2 chained SpMMs
    inside one jitted computation (y <- A_hat y on the normalized adjacency,
    so values stay bounded); the difference cancels the fixed per-call
    dispatch latency of a remotely-attached chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.autograd import make_operator, spmm_internal
    from of_spmm_tpu.utils.roofline import SpmmTraffic, spmm_report, time_chained

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.ops.autograd import place_operator

    t0 = time.time()

    def build():
        csr, cfg = load_graph(name, symmetrize=True)
        csr = normalized_adjacency(csr)  # bounded spectrum -> safe to chain
        reorder_s = 0.0
        if shuffled:
            # EARN the locality (VERDICT r3 item 3): destroy the
            # generator's community-contiguous ids with a random
            # permutation, then recover them with the committed
            # multilevel matching pass — the headline is no longer
            # conditional on pre-clustered input.
            import numpy as _np

            from of_spmm_tpu.sparse.formats import COO as _COO, CSR as _CSR
            from of_spmm_tpu.sparse.reorder import reorder_locality

            n = csr.shape[0]
            perm = _np.random.default_rng(123).permutation(n)
            rows = _np.repeat(
                _np.arange(n),
                _np.diff(_np.asarray(csr.indptr, _np.int64)))
            csr = _CSR.from_coo(_COO.from_arrays(
                perm[rows].astype(_np.int32),
                perm[_np.asarray(csr.cols, _np.int64)].astype(_np.int32),
                _np.asarray(csr.vals), csr.shape))
            t_r = time.time()
            csr, _ofn, _nfo = reorder_locality(csr, "match")
            reorder_s = time.time() - t_r
        t_b = time.time()
        op = make_operator(csr, place=False, tier_size=tier_size,
                           keep_coo=False, layout=layout)
        # COLD build seconds, stored in the cache record so warm runs
        # still report what a from-scratch build cost (VERDICT r3 #7)
        return op, csr.nnz, csr.shape, reorder_s, time.time() - t_b

    ts_key = f"|ts{tier_size}" if tier_size else ""
    ts_key += "|shufmatch-v2" if shuffled else ""
    if layout == "expansion":
        from of_spmm_tpu.sparse.expansion import (
            DEFAULT_CW, DEFAULT_R, DEFAULT_TILE)

        ly_key = f"|ly-exp3-R{DEFAULT_R}-T{DEFAULT_TILE}-C{DEFAULT_CW}"
    elif layout == "panels":
        from of_spmm_tpu.sparse.panels import (
            _BIG_T_PANELS, DEFAULT_HOT_BUDGET as PHB, DEFAULT_HOT_MIN_RUN
            as PMR, DEFAULT_MIN_BLOCK as PMB, DEFAULT_RANGE_CAP as PRC)
        from of_spmm_tpu.data.graphs import NAMED_CONFIGS
        from of_spmm_tpu.utils.config import FLAGS
        from of_spmm_tpu.sparse.fused import _BIG_T_NNZ, DEFAULT_T

        nnz_est = NAMED_CONFIGS[name].n_edges
        from of_spmm_tpu.sparse.panels import default_panels_t

        FT = int(FLAGS.get("OFS_FUSED_T")) or default_panels_t(
            nnz_est, NAMED_CONFIGS[name].n_nodes)
        ly_key = (f"|ly-panels-T{FT}-hot{PHB}.{PMR}-rc{PRC}-mb{PMB}-v6")
    elif layout in ("fused", "ranges"):
        from of_spmm_tpu.sparse.fused import (
            _BIG_T, _BIG_T_NNZ, DEFAULT_HOT_BUDGET, DEFAULT_R as FR,
            DEFAULT_SEG_STEPS, DEFAULT_T)
        from of_spmm_tpu.data.graphs import NAMED_CONFIGS
        from of_spmm_tpu.utils.config import FLAGS

        cfg_n = NAMED_CONFIGS[name]
        # the generator halves e before symmetrizing, so the built nnz ~=
        # the advertised edge count (data/graphs.py load_graph)
        nnz_est = cfg_n.n_edges
        if layout == "ranges":
            from of_spmm_tpu.sparse.ranges import (
                _BIG_T_RANGES, DEFAULT_RANGE_CAP, DEFAULT_S_CAP)

            FT = int(FLAGS.get("OFS_FUSED_T")) or (
                _BIG_T_RANGES if nnz_est >= _BIG_T_NNZ else DEFAULT_T)
            ly_key = (f"|ly-ranges-R{FR}-T{FT}-hot{DEFAULT_HOT_BUDGET}"
                      f"-rc{DEFAULT_RANGE_CAP}-sc{DEFAULT_S_CAP}-v2")
        else:
            FT = int(FLAGS.get("OFS_FUSED_T")) or (
                _BIG_T if nnz_est >= _BIG_T_NNZ else DEFAULT_T)
            ly_key = (f"|ly-fused-R{FR}-T{FT}-hot{DEFAULT_HOT_BUDGET}"
                      f"-chunks-ss{DEFAULT_SEG_STEPS}-v12")
    else:
        ly_key = f"|ly-{layout}" if layout != "auto" else ""
    cv = cached(
        "op", f"{name}|sym|gcn-norm|auto-ladder|v4{ts_key}{ly_key}", build)
    op, nnz, shape = cv[:3]
    # scalars come back as 0-d numpy arrays from warm cache loads (the
    # cache numpy-ifies every pytree leaf)
    reorder_s = float(cv[3]) if len(cv) > 3 else 0.0
    cold_build_s = float(cv[4]) if len(cv) > 4 else None
    plan_build_s = time.time() - t0
    log(f"[{name}] plan ready: n={shape[0]:,} nnz={nnz:,} "
        f"({plan_build_s:.1f}s"
        + (f"; cold build {cold_build_s:.1f}s" if cold_build_s else "")
        + (f"; shuffled, match reorder {reorder_s:.1f}s" if shuffled
           else "") + ")")
    t0 = time.time()
    op = place_operator(op)
    eff = op.binned.padding_efficiency(nnz)
    from of_spmm_tpu.sparse.tiled import TieredEll

    from of_spmm_tpu.sparse.expansion import ExpansionPlan
    from of_spmm_tpu.sparse.fused import FusedPlan
    from of_spmm_tpu.sparse.ranges import RangesPlan

    from of_spmm_tpu.sparse.panels import PanelPlan

    if isinstance(op.binned, TieredEll):
        layout_s = f"tiered x{len(op.binned.tiers)}"
        widths = sorted({b.width for t in op.binned.tiers for b in t.buckets})
    elif isinstance(op.binned, PanelPlan):
        p = op.binned
        layout_s = (f"panels T={p.T} hot={p.n_hot} RC={p.RC} "
                    f"ranges={p.n_ranges} "
                    f"range_rows={p.n_range_rows/1e6:.1f}M "
                    f"scattered={p.n_scattered/1e6:.1f}M "
                    f"groups={p.n_groups/1e6:.2f}M")
        widths = []
        from of_spmm_tpu.sparse.panels import plan_memory_report as _pmr

        mem = _pmr(p, d=min(d, 128))
        log(f"[{name}] panels HBM model: peak={mem['peak_bytes']/2**30:.2f} "
            f"GiB budget={mem['budget_bytes']/2**30:.2f} GiB "
            f"max_table={mem['max_table_bytes']/2**30:.2f} GiB "
            f"segments={len(p.segments)} fits={mem['fits']}")
    elif isinstance(op.binned, RangesPlan):
        p = op.binned
        layout_s = (f"ranges R={p.R} T={p.T} hot={p.n_hot} RC={p.RC} "
                    f"ranges={p.n_ranges} "
                    f"range_rows={p.n_range_rows/1e6:.1f}M "
                    f"scattered={p.n_scattered/1e6:.1f}M "
                    f"lanes={p.n_lanes/1e6:.1f}M multihot={p.multihot}")
        widths = []
        from of_spmm_tpu.sparse.ranges import plan_memory_report as _rmr

        mem = _rmr(p, d=min(d, 128))
        log(f"[{name}] ranges HBM model: peak={mem['peak_bytes']/2**30:.2f} "
            f"GiB budget={mem['budget_bytes']/2**30:.2f} GiB "
            f"max_table={mem['max_table_bytes']/2**30:.2f} GiB "
            f"segments={len(p.segments)} fits={mem['fits']}")
    elif isinstance(op.binned, FusedPlan):
        p = op.binned
        layout_s = (f"fused R={p.R} T={p.T} hot={p.n_hot} "
                    f"staged={p.n_staged/1e6:.1f}M lanes={p.n_lanes/1e6:.1f}M "
                    f"multihot={p.multihot}")
        widths = []
        from of_spmm_tpu.sparse.fused import plan_memory_report

        mem = plan_memory_report(p, d=min(d, 128))
        log(f"[{name}] fused HBM model: peak={mem['peak_bytes']/2**30:.2f} "
            f"GiB budget={mem['budget_bytes']/2**30:.2f} GiB "
            f"max_table={mem['max_table_bytes']/2**30:.2f} GiB "
            f"segments={len(p.segments)} fits={mem['fits']}")
    elif isinstance(op.binned, ExpansionPlan):
        p = op.binned
        layout_s = (f"expansion R={p.R} TILE={p.TILE} CW={p.CW} "
                    f"steps={p.n_steps} staged={p.n_staged/1e6:.1f}M")
        widths = []
    else:
        layout_s = "binned"
        widths = [b.width for b in op.binned.buckets]
    layout = layout_s
    log(
        f"[{name}] placed: {layout} widths={widths}"
        f" pad_eff={eff:.3f} relabeled={op.relabeled}"
        f" sym_alias={op.transpose_aliased} ({time.time()-t0:.1f}s)"
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((shape[1], d)).astype(np.float32))
    x_int = op.to_internal(x)

    traffic = SpmmTraffic(nnz=nnz, n_rows=shape[0], n_cols=shape[1], d=d)
    results = {}
    results["_meta"] = {"plan_build_s": round(plan_build_s, 2),
                        "layout": layout_s, "failures": {}}
    if cold_build_s is not None:
        results["_meta"]["cold_build_s"] = round(cold_build_s, 2)
    if shuffled:
        results["_meta"]["reorder_s"] = round(reorder_s, 2)

    for impl_name in impls:
        try:
            def mk(k, impl=impl_name):
                # op passed as a pytree ARGUMENT: closing over it would bake
                # the plan arrays into the HLO as giant literals (the
                # tunneled compile service rejects >100MB programs).
                def f(o, xx):
                    def body(i, carry):
                        s, a = carry
                        y = spmm_internal(o, a, impl=impl)
                        return (s + y.ravel()[0] * 1e-30, y)
                    return jax.lax.fori_loop(0, k, body, (0.0, xx))[1]
                return jax.jit(f)

            secs = time_chained(
                mk, op, x_int, k1=1, iters=iters,
                est_iter_s=traffic.speed_of_light_s(),
            )
            rep = spmm_report(secs, traffic)
            results[impl_name] = rep
            log(
                f"[{name}] {impl_name}: {secs*1e3:.3f} ms/spmm  "
                f"{rep['gflops']:.1f} GF/s  {rep['achieved_gb_s']:.1f} GB/s  "
                f"roofline={rep['roofline_fraction']:.3f}  "
                f"(SoL {rep['speed_of_light_ms']:.3f} ms)"
            )
        except Exception as e:  # keep the bench alive; report what works
            log(f"[{name}] {impl_name} FAILED: {type(e).__name__}: {e}")
            # surfaced in the headline JSON so a silent fallback to a
            # slower impl is impossible (VERDICT r2 item 1)
            results["_meta"]["failures"][impl_name] = (
                f"{type(e).__name__}: {e}"[:300])
    return results


def bench_spgemm(name: str, iters: int = 3):
    """SpGEMM A@A 2-hop expansion (BASELINE config 4: functional + measured).

    Two numbers: the host Gustavson plan-time op (native SPA when the
    toolchain is present) and the DEVICE numeric phase (symbolic pattern
    fixed host-side once, multiply-accumulate on the TPU — VERDICT r1
    item 4)."""
    import jax
    import numpy as np

    from of_spmm_tpu import native
    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.ops.autograd import spgemm_numeric, spgemm_symbolic
    from of_spmm_tpu.ops.reference import spgemm

    csr, cfg = load_graph(name, symmetrize=True)
    indptr = np.asarray(csr.indptr).astype(np.int64)
    cols = np.asarray(csr.cols)
    # FLOPs: every (i,k) nonzero of A multiplies against B's row k
    products = int((indptr[cols + 1] - indptr[cols]).sum())
    times = []
    out_nnz = 0
    for _ in range(iters):
        t0 = time.time()
        c = spgemm(csr, csr)
        times.append(time.time() - t0)
        out_nnz = c.nnz
    sec = sorted(times)[len(times) // 2]
    gflops = 2 * products / sec / 1e9
    log(f"[spgemm {name}] host native={native.available()} {sec*1e3:.0f} ms  "
        f"{gflops:.2f} GFLOP/s  in_nnz={csr.nnz:,} out_nnz={out_nnz:,} "
        f"products={products:,}")

    # device numeric phase: bucket-padded gathers + reshape-sum (r4 —
    # the r3 segment_sum scatter measured 0.07 GF/s), delta-chained
    import jax.numpy as jnp

    from of_spmm_tpu.ops.autograd import (spgemm_numeric_padded,
                                          spgemm_symbolic_padded)
    from of_spmm_tpu.utils.roofline import time_chained

    t0 = time.time()
    plan = spgemm_symbolic_padded(csr, csr)
    sym_s = time.time() - t0
    av = jax.device_put(jnp.asarray(np.asarray(csr.vals), jnp.float32))
    buckets = jax.device_put(plan.buckets)

    def mk(k):
        def f(bk, a):
            def body(i, carry):
                s, aa = carry
                v = spgemm_numeric_padded(bk, aa, aa)
                return (s + v[0] * 1e-30, aa + v[0:1] * 1e-30)
            return jax.lax.fori_loop(0, k, body, (0.0, a))[1]
        return jax.jit(f)

    dev_s = time_chained(mk, buckets, av, k1=1, iters=max(iters, 4),
                         est_iter_s=products / 5e9)
    dev_gflops = 2 * products / dev_s / 1e9
    log(f"[spgemm {name}] device numeric {dev_s*1e3:.1f} ms  "
        f"{dev_gflops:.2f} GFLOP/s  (symbolic {sym_s:.1f}s host, "
        f"padded buckets)")

    # product-form numeric (r5): COO-with-dups values in product order —
    # the slot merge moves to the consumer (the framework's sparse
    # engines accept duplicate edges), so the device phase loses the
    # per-product single-element takes (ops/autograd.py
    # ProductSpgemmPlan)
    from of_spmm_tpu.ops.autograd import (spgemm_numeric_products,
                                          spgemm_symbolic_products)

    t0 = time.time()
    pplan = spgemm_symbolic_products(csr, csr)
    psym_s = time.time() - t0

    def mkp(k):
        def f(pl, a):
            def body(i, carry):
                s, aa = carry
                v = spgemm_numeric_products(pl, aa, aa)
                return (s + v[0] * 1e-30, aa + v[0:1] * 1e-30)
            return jax.lax.fori_loop(0, k, body, (0.0, a))[1]
        return jax.jit(f)

    prod_s = time_chained(mkp, pplan, av, k1=1, iters=max(iters, 4),
                          est_iter_s=products / 20e9)
    prod_gflops = 2 * products / prod_s / 1e9
    log(f"[spgemm {name}] device product-form {prod_s*1e3:.1f} ms  "
        f"{prod_gflops:.2f} GFLOP/s  (symbolic {psym_s:.1f}s host, "
        f"n_out={pplan.n_out:,} for {products:,} products)")
    return {"seconds": sec, "gflops": gflops, "out_nnz": out_nnz,
            "device_seconds": dev_s, "device_gflops": dev_gflops,
            "device_products_seconds": prod_s,
            "device_products_gflops": prod_gflops}


def bench_spmv(name: str, iters: int = 8):
    """CSR SpMV (BASELINE config 1): parity vs the reference gather/
    segment-sum semantics + measured ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.autograd import make_operator, spmv

    csr, cfg = load_graph(name, symmetrize=True)
    csr = normalized_adjacency(csr)
    op = make_operator(csr, place=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(csr.shape[1]).astype(np.float32))
    f = jax.jit(lambda o, v: spmv(o, v))
    y = f(op, x)
    y.block_until_ready()
    # parity vs numpy CSR
    indptr = np.asarray(csr.indptr).astype(np.int64)
    want = np.zeros(csr.shape[0], np.float32)
    xv = np.asarray(x)
    contrib = np.asarray(csr.vals) * xv[np.asarray(csr.cols)]
    np.add.at(want, np.repeat(np.arange(csr.shape[0]), np.diff(indptr)),
              contrib)
    rel = float(np.abs(np.asarray(y) - want).max()
                / (np.abs(want).max() + 1e-12))
    # delta-chained timing (utils/roofline.py time_chained): v <- A_hat v
    # inside one jit, k1 vs k2 — the r3 per-call loop measured ~33 ms of
    # tunnel dispatch latency for a 10K-nnz SpMV (VERDICT r3 item 6)
    from of_spmm_tpu.utils.roofline import time_chained

    def mk(k):
        def g(o, v):
            def body(i, carry):
                s, a = carry
                yy = spmv(o, a)
                return (s + yy[0] * 1e-30, yy)
            return jax.lax.fori_loop(0, k, body, (0.0, v))[1]
        return jax.jit(g)

    sec = time_chained(mk, op, x, k1=1, iters=iters, est_iter_s=1e-4)
    log(f"[spmv {name}] {sec*1e6:.1f} us  parity rel={rel:.2e}")
    return {"us": sec * 1e6, "parity_rel": rel}


def bench_all(args):
    """BASELINE.md measurement matrix in one run (VERDICT r1 item 3):
    Cora/Citeseer SpMV+SpMM parity+ms, Reddit row-binned load-balance
    efficiency, ogbn-arxiv SpGEMM (host + device numeric), plus the
    ogbn-products headline roofline."""
    extras = {}
    for g in ("cora", "citeseer"):
        extras[f"spmv_{g}"] = bench_spmv(g, iters=args.iters)
        r = bench_graph(g, d=args.d, iters=args.iters, impls=("xla",))
        if "xla" in r:
            extras[f"spmm_{g}"] = {
                "ms": r["xla"]["seconds"] * 1e3,
                "roofline": r["xla"]["roofline_fraction"]}

    # Reddit row-binned load balance: efficiency = nnz / padded lane slots
    # (ideal-nnz-time / achieved under the ELL padding model) + measured ms
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.autograd import make_operator, place_operator, spmm_internal
    from of_spmm_tpu.utils.roofline import SpmmTraffic, spmm_report, time_chained
    import jax

    rname = args.reddit
    csr, cfg = load_graph(rname, symmetrize=True)
    csr = normalized_adjacency(csr)
    op = make_operator(csr, place=False, layout="binned")
    eff = op.binned.padding_efficiency(csr.nnz)
    op = place_operator(op)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((csr.shape[1], args.d))
                    .astype(np.float32))

    def mk(k):
        def f(o, xx):
            def body(i, carry):
                s, a = carry
                y = spmm_internal(o, a, impl="xla")
                return (s + y.ravel()[0] * 1e-30, y)
            return jax.lax.fori_loop(0, k, body, (0.0, xx))[1]
        return jax.jit(f)

    traffic = SpmmTraffic(nnz=csr.nnz, n_rows=csr.shape[0],
                          n_cols=csr.shape[1], d=args.d)
    secs = time_chained(mk, op, x, k1=1, iters=args.iters,
                        est_iter_s=traffic.speed_of_light_s())
    rep = spmm_report(secs, traffic)
    log(f"[{rname}] row-binned: {secs*1e3:.3f} ms  load_balance_eff={eff:.3f}"
        f"  roofline={rep['roofline_fraction']:.3f}")
    extras[f"spmm_rowbinned_{rname}"] = {
        "ms": secs * 1e3, "load_balance_eff": eff,
        "roofline": rep["roofline_fraction"]}

    sp = bench_spgemm("ogbn-arxiv", iters=max(args.iters // 2, 1))
    extras["spgemm_ogbn-arxiv"] = {
        "host_ms": sp["seconds"] * 1e3, "host_gflops": sp["gflops"],
        "device_ms": sp["device_seconds"] * 1e3,
        "device_gflops": sp["device_gflops"],
        "device_products_ms": sp["device_products_seconds"] * 1e3,
        "device_products_gflops": sp["device_products_gflops"]}
    return extras


def main():
    os.makedirs(os.path.expanduser("~/.cache/ofs_jax"), exist_ok=True)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax")
    )
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default=os.environ.get("OFS_BENCH_GRAPH", "ogbn-products"))
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impls", default="xla,pallas")
    ap.add_argument("--tier-size", type=int, default=None,
                    help="column tier size override (sparse/tiled.py)")
    ap.add_argument("--layout", default="auto",
                    choices=("auto", "binned", "tiered", "expansion",
                             "fused", "ranges", "panels"),
                    help="plan layout (ops/autograd.py make_operator)")
    ap.add_argument("--op", default="spmm", choices=("spmm", "spgemm"),
                    help="which benchmark to run")
    ap.add_argument("--sweep", action="store_true", help="also run the small graphs")
    ap.add_argument("--all", action="store_true",
                    help="BASELINE.md measurement matrix + headline")
    ap.add_argument("--reddit", default="reddit-small",
                    help="reddit config for the load-balance row "
                         "(reddit = full 114M nnz)")
    ap.add_argument("--shuffled", action="store_true",
                    help="randomly permute node ids, then recover "
                         "locality with the matching reorder pass "
                         "(sparse/reorder.py) — the headline without "
                         "pre-clustered input")
    args = ap.parse_args()
    impls = tuple(args.impls.split(","))

    extras = bench_all(args) if getattr(args, "all", False) else None

    if args.op == "spgemm":
        g = args.graph if args.graph != "ogbn-products" else "ogbn-arxiv"
        rep = bench_spgemm(g, iters=max(args.iters // 2, 1))
        print(json.dumps({
            "metric": f"spgemm_gflops_{g}",
            # headline = the DEVICE numeric phase (product-form, r5);
            # the host Gustavson symbolic/full op is reported alongside
            "value": round(rep["device_products_gflops"], 3),
            "unit": "GFLOP/s",
            "vs_baseline": round(rep["device_products_gflops"] / 10.0, 4),
            "host_gflops": round(rep["gflops"], 3),
            "device_padded_gflops": round(rep["device_gflops"], 3),
        }))
        return 0

    if args.sweep:
        for g in ["cora", "citeseer", "ogbn-arxiv", "reddit-small"]:
            bench_graph(g, d=args.d, iters=args.iters, impls=impls,
                        tier_size=args.tier_size, layout=args.layout)

    meta = {}
    if args.layout == "auto" and set(impls) == {"xla", "pallas"}:
        # each impl on its measured-best layout: XLA on the tiered/binned
        # auto choice; the Pallas flagship on the panel plan. The r3
        # ranges engine is RETIRED from the default sweep (r5, VERDICT
        # r4 item 7): the panel engine now covers its last exclusive
        # niche (arbitrary values, via the per-edge mode) and strictly
        # dominates it on every measured config (0.28 vs 0.105 full
        # products; 0.19 vs 0.11 arxiv) while ranges placement cost
        # 120-434 s of the bench tail. Still reachable: --layout ranges.
        results = bench_graph(args.graph, d=args.d, iters=args.iters,
                              impls=("xla",), tier_size=args.tier_size,
                              layout="auto", shuffled=args.shuffled)
        meta["auto"] = results.pop("_meta", {})
        pan = bench_graph(args.graph, d=args.d, iters=args.iters,
                          impls=("pallas",), tier_size=args.tier_size,
                          layout="panels", shuffled=args.shuffled)
        meta["panels"] = pan.pop("_meta", {})
        results.update({"pallas-panels": v for v in pan.values()})
    else:
        results = bench_graph(args.graph, d=args.d, iters=args.iters,
                              impls=impls, tier_size=args.tier_size,
                              layout=args.layout, shuffled=args.shuffled)
        meta[args.layout] = results.pop("_meta", {})
    failures = {f"{ly}:{impl}": msg
                for ly, mm in meta.items()
                for impl, msg in mm.get("failures", {}).items()}
    plan_build_s = {ly: mm.get("plan_build_s") for ly, mm in meta.items()}
    best_name, best = max(
        results.items(), key=lambda kv: kv[1]["roofline_fraction"], default=(None, None)
    )
    if best is None:
        print(json.dumps({"metric": "spmm_roofline_fraction", "value": 0.0,
                          "unit": "fraction", "vs_baseline": 0.0,
                          "failures": failures,
                          "plan_build_s": plan_build_s}))
        return 1
    log(f"best impl: {best_name}")
    # vs_baseline: ratio against the BASELINE.md target of 60% of the
    # per-chip HBM roofline (>=1.0 means target met).
    out = {
        "metric": f"spmm_roofline_fraction_{args.graph}_d{args.d}"
                  + ("_shuffled" if args.shuffled else ""),
        "value": round(best["roofline_fraction"], 4),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(best["roofline_fraction"] / 0.60, 4),
        "best_impl": best_name,
        "ms_per_spmm": round(best["seconds"] * 1e3, 3),
        "plan_build_s": plan_build_s,
        "synthetic_graphs": True,  # degree-law-matched stand-ins (no
        # network egress in this environment; see data/graphs.py)
    }
    cold = {ly: mm.get("cold_build_s") for ly, mm in meta.items()
            if mm.get("cold_build_s") is not None}
    if cold:
        out["cold_build_s"] = cold
    if args.shuffled:
        out["reorder_s"] = {ly: mm.get("reorder_s")
                            for ly, mm in meta.items()}
    if failures:
        out["failures"] = failures  # loud fallback (VERDICT r2 item 1)
    if extras is not None:
        out["matrix"] = extras
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
