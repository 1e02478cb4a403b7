"""Measure intra-band scattered-column sharing (round-5 experiment).

For bands of B consecutive 128-row output tiles, compare
sum_t |scat_cols(t)| (what the r4 plan stages) against
|union over band| (what a band-shared window would stage).
Proxy classification: a column is "scattered" if it is not hot
(top-touch) and not in the tile's best contiguous RC window.
"""
import sys
import time

import numpy as np

from of_spmm_tpu.data.graphs import load_graph
from of_spmm_tpu.models.gcn import normalized_adjacency
from of_spmm_tpu.sparse.fused import choose_hot
from of_spmm_tpu.sparse.ranges import _best_window

name = sys.argv[1] if len(sys.argv) > 1 else "products-small"
R, RC = 128, 24576
t0 = time.time()
csr, _ = load_graph(name, symmetrize=True)
csr = normalized_adjacency(csr)
n, m = csr.shape
print(f"{name}: n={n} nnz={csr.nnz} ({time.time()-t0:.1f}s)", flush=True)
indptr = np.asarray(csr.indptr, np.int64)
cols = np.asarray(csr.cols, np.int64)
n_tiles = -(-n // R)
hot_budget = 16384 if n_tiles >= 8192 else 4096
hot = choose_hot(csr, R, hot_budget, 4)
hot_rank = np.full(m, -1, np.int64)
hot_rank[hot] = np.arange(hot.shape[0])

scat_sets = []
cur_lo = -1
n_scat_r4 = 0
for t in range(n_tiles):
    r0, r1 = t * R, min((t + 1) * R, n)
    c = cols[indptr[r0]:indptr[r1]]
    uniq = np.unique(c)
    cold = uniq[hot_rank[uniq] < 0]
    cnt = np.ones_like(cold)
    best_lo, best_mass = _best_window(cold, cnt, m, RC)
    if cur_lo >= 0:
        cur_mass = int(((cold >= cur_lo) & (cold < cur_lo + RC)).sum())
    else:
        cur_mass = -1
    if cur_mass < 0.9 * best_mass:
        cur_lo = best_lo
    scat = cold[(cold < cur_lo) | (cold >= cur_lo + RC)]
    scat_sets.append(scat)
    n_scat_r4 += scat.shape[0]

print(f"r4-style scattered rows (unpadded): {n_scat_r4:,}", flush=True)
for B in (2, 4, 8, 16, 32):
    tot = 0
    for b0 in range(0, n_tiles, B):
        u = np.unique(np.concatenate(scat_sets[b0:b0 + B]))
        tot += u.shape[0]
    print(f"B={B:3d}: union rows={tot:,}  sharing={n_scat_r4 / max(tot,1):.2f}x",
          flush=True)
