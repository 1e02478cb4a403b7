"""Phase timing for the tiered SpMM on the attached chip.

Times, with the same delta-chaining as bench.py:
  gather   — per-bucket jnp.take only (the HBM random-read phase)
  contrib  — gather + multiply-reduce (adds the VPU phase)
  full     — the complete spmm (adds assembly + finish)
plus per-tier-kind splits (hot vs cold buckets), to localize regressions.

    OFS_SPMM_MAX_GATHER_SLOTS=2097152 python tools/profile_spmm.py --tier-size 32768
"""

from __future__ import annotations

import argparse
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="ogbn-products")
    ap.add_argument("--tier-size", type=int, default=None,
                    help="tier size of the cached plan; default = bench.py's key")
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.ops.autograd import place_operator
    from of_spmm_tpu.ops import reference as ref
    from of_spmm_tpu.utils.config import FLAGS
    from of_spmm_tpu.utils.roofline import time_chained, SpmmTraffic
    from of_spmm_tpu.sparse.tiled import TieredEll

    ts_key = f"|ts{args.tier_size}" if args.tier_size else ""
    key = f"{args.graph}|sym|gcn-norm|auto-ladder|v4{ts_key}"
    got = cached("op", key, lambda: (_ for _ in ()).throw(
        RuntimeError(f"no cached op for {key}; run bench.py first")))
    op, nnz, shape = got
    op = place_operator(op)
    tiled = op.binned
    assert isinstance(tiled, TieredEll)
    ts = tiled.tier_size
    d = args.d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((shape[1], d)).astype(np.float32))
    n_pad = -shape[1] % ts
    xp = jnp.pad(x, ((0, n_pad), (0, 0)))
    max_slots = int(FLAGS.get("OFS_SPMM_MAX_GATHER_SLOTS"))

    # stats
    hot_slots = sum(b.cols.size for t in tiled.tiers if t.tier >= 0
                    for b in t.buckets)
    cold_slots = sum(b.cols.size for t in tiled.tiers if t.tier < 0
                     for b in t.buckets)
    n_buckets = sum(len(t.buckets) for t in tiled.tiers)
    log(f"tiers={len(tiled.tiers)} buckets={n_buckets} "
        f"hot_slots={hot_slots:,} cold_slots={cold_slots:,}")

    def phase_fn(kind: str, which: str):
        """kind: gather|contrib ; which: hot|cold|all"""

        def chunked(fn, cols, vals):
            R, K = cols.shape
            if R * K <= max_slots:
                return fn(cols, vals)
            rows_per = max(max_slots // K, 8)
            pad = -R % rows_per
            cols_p = jnp.pad(cols, ((0, pad), (0, 0)))
            vals_p = jnp.pad(vals, ((0, pad), (0, 0)))
            nchunk = (R + pad) // rows_per
            out = jax.lax.map(
                lambda a: fn(*a),
                (cols_p.reshape(nchunk, rows_per, K),
                 vals_p.reshape(nchunk, rows_per, K)))
            return out.reshape(-1, out.shape[-1])[:R]

        def f(tl, xq, s):
            # tl passed as a pytree ARGUMENT: closing over the plan would
            # bake its arrays into the HLO as literals (the tunneled
            # compile service rejects >100MB programs).
            acc = jnp.zeros((d,), jnp.float32)
            for t in tl.tiers:
                if which == "hot" and t.tier < 0:
                    continue
                if which == "cold" and t.tier >= 0:
                    continue
                xt = (xq if t.tier < 0 else jax.lax.dynamic_slice_in_dim(
                    xq, t.tier * ts, ts, axis=0))
                for b in t.buckets:
                    if kind == "gather":
                        def g(cols, vals):
                            return jnp.take(xt, cols, axis=0).sum(axis=(0, 1),
                                                                  keepdims=True)[0]
                        acc = acc + chunked(g, b.cols + (s & 1), b.vals)[0]
                    else:
                        def g(cols, vals):
                            gg = jnp.take(xt, cols, axis=0)
                            return (vals[:, :, None] * gg).sum(axis=1)
                        acc = acc + chunked(g, b.cols + (s & 1), b.vals)[0]
            return acc

        return f

    traffic = SpmmTraffic(nnz=nnz, n_rows=shape[0], n_cols=shape[1], d=d)

    def run_phase(name, kind, which, slots):
        f = phase_fn(kind, which)

        def mk(k):
            def body_fn(tl, xq):
                def body(i, acc):
                    return acc + f(tl, xq, i)[0]
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return jax.jit(body_fn)

        try:
            sec = time_chained(mk, tiled, xp, k1=1, iters=5, est_iter_s=0.3)
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return
        rate = slots / sec / 1e6 if slots else 0
        log(f"{name:16s} {sec*1e3:9.2f} ms   {rate:7.0f} Mslots/s")

    run_phase("gather hot", "gather", "hot", hot_slots)
    run_phase("gather cold", "gather", "cold", cold_slots)
    run_phase("contrib hot", "contrib", "hot", hot_slots)
    run_phase("contrib all", "contrib", "all", hot_slots + cold_slots)

    # full spmm
    from of_spmm_tpu.ops.autograd import spmm_internal

    def mk_full(k):
        def f(o, xx):
            def body(i, carry):
                s, a = carry
                y = spmm_internal(o, a, impl="xla")
                return (s + y.ravel()[0] * 1e-30, y)
            return jax.lax.fori_loop(0, k, body, (0.0, xx))[1]
        return jax.jit(f)

    x_int = op.to_internal(x)
    sec = time_chained(mk_full, op, x_int, k1=1, iters=5,
                       est_iter_s=traffic.speed_of_light_s())
    log(f"{'full spmm':16s} {sec*1e3:9.2f} ms   "
        f"roofline={traffic.total_bytes/sec/819e9:.3f}")


if __name__ == "__main__":
    main()
