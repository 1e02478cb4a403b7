"""Host-side design sweep for the round-4 panel engine.

Classifies every edge of a graph the way the ranges/panel plan would
(hot | range-window | dense block | scattered) for a grid of design
parameters, and prints predicted per-SpMM cost from the measured v5e
rates (tools/microbench_take_order.py: XLA f32 row gather 7.5 ns/row;
PROFILE_r03: chunk DMA ~0.3 us/issue; dense-mask group ~0.25 us est).

Approximation: the per-tile range window is the densest RC-row window
over the tile's cold columns (no cross-tile persistence) — good enough
to compare design points; the real builder's persistence only raises
range-copy volume, which is minor.

    python tools/plan_sweep.py --graph products-small
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TAKE_NS = 7.52          # XLA f32 row gather, per row
DMA_US = 0.3            # per chunk-copy issue
GROUP_US_BASE = 0.10    # per-group machinery (stream reads, loop, acc)
DECODE_US = 0.055       # mask decode per (128,128) block of mask
MATMUL_US = 0.085       # 128x128x256 bf16 matmul at measured ~50 TMAC/s
HBM_GBS = 700.0


def sweep_one(name, csr, hot_ids, R, RC, min_block, m):
    indptr = np.asarray(csr.indptr, np.int64)
    cols = np.asarray(csr.cols, np.int64)
    n = csr.shape[0]
    deg = np.diff(indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    tiles = rows // R
    n_tiles = -(-n // R)

    hot_rank = np.zeros(m, bool)
    hot_rank[hot_ids] = True
    is_hot = hot_rank[cols]

    # densest-window approximation per tile over cold cols
    t0 = time.time()
    cold_t = tiles[~is_hot]
    cold_c = cols[~is_hot]
    order = np.argsort(cold_t * (m + RC) + cold_c, kind="stable")
    ct = cold_t[order]
    cc = cold_c[order]
    bnd = np.concatenate([[0], np.nonzero(np.diff(ct))[0] + 1, [ct.size]])
    lo_of = np.zeros(n_tiles, np.int64)
    from of_spmm_tpu.sparse.ranges import _best_window

    for k in range(bnd.size - 1):
        a, b = bnd[k], bnd[k + 1]
        u, cnt = np.unique(cc[a:b], return_counts=True)
        lo, _ = _best_window(u, cnt, m, RC)
        lo_of[ct[a]] = lo
    win_s = time.time() - t0

    lo_r = lo_of[tiles]
    in_range = (~is_hot) & (cols >= lo_r) & (cols < lo_r + RC)
    # per-(tile, range-block) edge counts -> thin-block demotion
    NB = RC // 128
    rb_key = tiles * NB + (cols - lo_r) // 128
    rb_key = rb_key[in_range]
    uniq_rb, rb_cnt = np.unique(rb_key, return_counts=True)
    dense_ok = np.zeros(uniq_rb.size, bool)
    dense_ok = rb_cnt >= min_block
    keep_blk = dict(zip(uniq_rb[dense_ok], rb_cnt[dense_ok]))
    # map back: edge kept iff its (tile, blk) is dense
    pos = np.searchsorted(uniq_rb, tiles * NB + (cols - lo_r) // 128)
    pos = np.clip(pos, 0, uniq_rb.size - 1)
    edge_rb_dense = np.zeros(cols.size, bool)
    sel = in_range.copy()
    edge_rb_dense[sel] = dense_ok[pos[sel]]
    in_range &= edge_rb_dense

    is_scat = (~is_hot) & ~in_range
    # scattered distinct (dedup-span, col) pairs: sp tiles share one
    # staged scattered list (the round-4 super-tile transport dedup)
    scat_by_sp = {}
    for sp in (1, 4, 16):
        key = (tiles[is_scat] // sp) * m + cols[is_scat]
        scat_by_sp[sp] = np.unique(key).size
    scat_raw = scat_by_sp[1]
    # dense (tile, blk) group count (range blocks kept)
    n_dense_pairs = int(dense_ok.sum())
    # hot groups: distinct (tile, hot 128-block) pairs
    hot_pos = np.full(m, -1, np.int64)
    hot_pos[hot_ids] = np.arange(len(hot_ids))
    hkey = tiles[is_hot] * (len(hot_ids) // 128 + 1) + hot_pos[cols[is_hot]] // 128
    n_hot_pairs = np.unique(hkey).size if hkey.size else 0
    # scattered groups: per tile ceil(distinct/128)
    st = tiles[is_scat] * m + cols[is_scat]
    su = np.unique(st)
    s_tiles = su // m
    per_tile = np.bincount(s_tiles.astype(np.int64), minlength=n_tiles)
    n_scat_groups = int(np.sum(-(-per_tile // 128)))

    rscale = R / 128.0
    n_groups = n_dense_pairs + n_hot_pairs + n_scat_groups
    group_us = (GROUP_US_BASE
                + (DECODE_US + MATMUL_US) * rscale)
    compute_ms = n_groups * group_us * 1e-3
    take_ms = scat_raw * TAKE_NS * 1e-6
    dma_ms = (scat_raw * 512 / HBM_GBS / 1e6
              + (scat_raw / 1024 + n_tiles * 2) * DMA_US * 1e-3)
    mask_gb = n_groups * (R * 128 / 8) / 2**30
    est_ms = take_ms + max(compute_ms, dma_ms)
    sp_s = " ".join(f"sp{sp}={v/1e6:.2f}M" for sp, v in scat_by_sp.items())
    log(f"R={R:4d} RC={RC:6d} mb={min_block:3d} | "
        f"scat[{sp_s}] pairs(d/h/s)="
        f"{n_dense_pairs/1e6:5.2f}/{n_hot_pairs/1e6:5.2f}/"
        f"{n_scat_groups/1e6:5.2f}M | take={take_ms:6.1f} "
        f"comp={compute_ms:6.1f} dma={dma_ms:5.1f} -> est={est_ms:6.1f} ms"
        f"  masks={mask_gb:5.2f}GB (win {win_s:.0f}s)")
    return est_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="products-small")
    args = ap.parse_args()

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.sparse.fused import choose_hot

    csr, cfg = load_graph(args.graph, symmetrize=True)
    csr = normalized_adjacency(csr)
    n, m = csr.shape
    log(f"[{args.graph}] n={n:,} nnz={csr.nnz:,}")

    R = 128
    for hb, mr in ((16384, 32), (16384, 4), (32768, 2), (65536, 1)):
        t0 = time.time()
        hot = choose_hot(csr, R, hb, mr)
        log(f"hot R={R} budget={hb} min_run={mr}: {len(hot)} cols "
            f"({time.time()-t0:.0f}s)")
        for RC in (12288, 24576):
            for mb in (16, 32):
                sweep_one(args.graph, csr, hot, R, RC, mb, m)


if __name__ == "__main__":
    main()
