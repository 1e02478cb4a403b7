"""Take-phase variants on the REAL full-products plan indices.

Loads the cached panel plan's stage_take (the actual 27.5M-row take the
headline pays 121.7 ms for) and times:
  asis       the committed layout (per-tile shuffled positions)
  blocksort  same multiset, positions regrouped by X block of size C
             (the sectioned-phase order; within a block, tile-major)
  sectioned  one jnp.take per X-block SLICE (small source) in that order
  persort    per-tile SORTED (the pre-r4 banded layout, for reference)

    python tools/microbench_take_real.py [--graph ogbn-products]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/ofs_jax"))

    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="ogbn-products")
    args = ap.parse_args()

    from of_spmm_tpu.data.cache import cached

    op = cached(
        "op", f"{args.graph}|sym|gcn-norm|auto-ladder|v4"
        f"|ly-panels-T4096-hotNone.4-rc24576-mb24-v4",
        lambda: (_ for _ in ()).throw(RuntimeError("op cache miss")))
    plan = op[0].binned
    m = plan.shape[1]

    # per-tile-piece take lists, in plan order
    pieces = []
    for seg in plan.segments:
        st = np.asarray(seg.stage_take).astype(np.int64)
        ctrl = np.asarray(seg.ctrl)
        sel = ctrl[:, 0, 15] == 1
        base = 0
        for ext in ctrl[sel, 0, 14]:
            pieces.append(st[base:base + ext])
            base += int(ext)
    idx_asis = np.concatenate(pieces)
    NIDX = idx_asis.shape[0]
    log(f"{args.graph}: {NIDX/1e6:.1f}M take rows, m={m:,}, "
        f"{len(pieces)} tile pieces")

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((m, 128)).astype(np.float32))

    def timeit(f, *args, iters=5):
        float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.asarray(f(*args).ravel()[0], jnp.float32))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    @jax.jit
    def take_mat(xs, idx):
        y = jnp.take(xs, idx, axis=0, mode="clip")
        y = jax.lax.optimization_barrier(y)
        return y[:8].sum(axis=0)

    s = timeit(take_mat, xs, jnp.asarray(idx_asis.astype(np.int32)))
    log(f"asis (committed layout):    {s*1e3:7.1f} ms  "
        f"{s/NIDX*1e9:5.2f} ns/row")

    # per-tile sorted (banded) — the layout shuffling replaced
    idx_sort = np.concatenate([np.sort(p) for p in pieces])
    s = timeit(take_mat, xs, jnp.asarray(idx_sort.astype(np.int32)))
    log(f"per-tile sorted (banded):   {s*1e3:7.1f} ms  "
        f"{s/NIDX*1e9:5.2f} ns/row")

    for C in (65536, 262144):
        # block-major: concat per (block, tile) spans, tile-major within
        # block; within a span keep sorted col order
        blk_parts = [[] for _ in range(-(-m // C))]
        for p in pieces:
            ps = np.sort(p)
            b = ps // C
            lo = np.searchsorted(b, np.arange(len(blk_parts)))
            hi = np.append(lo[1:], ps.shape[0])
            for bb in range(len(blk_parts)):
                if hi[bb] > lo[bb]:
                    blk_parts[bb].append(ps[lo[bb]:hi[bb]])
        idx_bm = np.concatenate(
            [np.concatenate(bp) for bp in blk_parts if bp])
        s = timeit(take_mat, xs, jnp.asarray(idx_bm.astype(np.int32)))
        log(f"block{C//1024}K-major, one take:  {s*1e3:7.1f} ms  "
            f"{s/NIDX*1e9:5.2f} ns/row")

        # sectioned: per-block take from the SLICE
        ptr = [0]
        locs = []
        for bb, bp in enumerate(blk_parts):
            if bp:
                cat = np.concatenate(bp) - bb * C
                locs.append(cat)
                ptr.append(ptr[-1] + cat.shape[0])
            else:
                ptr.append(ptr[-1])
        idx_loc = jnp.asarray(np.concatenate(locs).astype(np.int32))
        ptrt = tuple(ptr)

        @functools.partial(jax.jit, static_argnames=("C", "ptr"))
        def take_sect(xs, idx, C, ptr):
            outs = []
            for b in range(len(ptr) - 1):
                if ptr[b + 1] == ptr[b]:
                    continue
                sl = jax.lax.slice_in_dim(idx, ptr[b], ptr[b + 1])
                lo = min(b * C, xs.shape[0] - 1)
                hi = min((b + 1) * C, xs.shape[0])
                xt = jax.lax.slice_in_dim(xs, lo, hi, axis=0)
                outs.append(jnp.take(xt, sl, axis=0, mode="clip"))
            y = jnp.concatenate(outs, axis=0)
            y = jax.lax.optimization_barrier(y)
            return y[:8].sum(axis=0)

        s = timeit(take_sect, xs, idx_loc, C, ptrt)
        log(f"sectioned C={C//1024}K slices:   {s*1e3:7.1f} ms  "
            f"{s/NIDX*1e9:5.2f} ns/row")


if __name__ == "__main__":
    main()
