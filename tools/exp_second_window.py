"""How much scattered mass would extra range windows capture? (r5)

Per tile: cold cols -> greedy best windows W1..W4 (RC-contiguous),
with the min_block=24 per-128-block density rule applied inside each
window (blocks below it stay scattered, as the plan does).
"""
import sys

import numpy as np

from of_spmm_tpu.data.graphs import load_graph
from of_spmm_tpu.models.gcn import normalized_adjacency
from of_spmm_tpu.sparse.fused import choose_hot
from of_spmm_tpu.sparse.ranges import _best_window

name = sys.argv[1] if len(sys.argv) > 1 else "products-small"
RC = int(sys.argv[2]) if len(sys.argv) > 2 else 24576
MIN_BLOCK = 24
R = 128
csr, _ = load_graph(name, symmetrize=True)
csr = normalized_adjacency(csr)
n, m = csr.shape
indptr = np.asarray(csr.indptr, np.int64)
cols = np.asarray(csr.cols, np.int64)
n_tiles = -(-n // R)
hot = choose_hot(csr, R, 16384 if n_tiles >= 8192 else 4096, 4)
hot_rank = np.full(m, -1, np.int64)
hot_rank[hot] = np.arange(hot.shape[0])

tot = np.zeros(5, np.int64)   # [0]=total cold edges; [k]=window-k capture
scat = 0
for t in range(n_tiles):
    r0, r1 = t * R, min((t + 1) * R, n)
    c = cols[indptr[r0]:indptr[r1]]
    c = c[hot_rank[c] < 0]
    u, cnt = np.unique(c, return_counts=True)
    tot[0] += cnt.sum()
    left = np.ones(u.shape[0], bool)      # not yet claimed by a window
    captured = np.zeros(u.shape[0], bool)  # served by a dense block
    for k in range(1, 5):
        if not left.any():
            break
        lo, _mass = _best_window(u[left], cnt[left], m, RC)
        inw = left & (u >= lo) & (u < lo + RC)
        if inw.any():
            rblk = (u[inw] - lo) // 128
            per_blk = np.bincount(rblk, weights=cnt[inw],
                                  minlength=RC // 128)
            dense = per_blk >= MIN_BLOCK
            sel = np.zeros(u.shape[0], bool)
            sel[np.nonzero(inw)[0]] = dense[rblk]
            tot[k] += int(cnt[sel].sum())
            captured |= sel
        left &= ~inw  # whole span claimed; sparse blocks stay scattered
    scat += int((~captured).sum())

print(f"{name} RC={RC}: cold_edges={tot[0]:,}")
cum = 0
for k in range(1, 5):
    cum += tot[k]
    print(f"  window {k}: edges={tot[k]:,}  cum_frac={cum/max(tot[0],1):.3f}")
print(f"  scattered unique rows after 4 windows: {scat:,}")
