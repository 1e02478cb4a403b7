"""Host-side panel-plan statistics to drive the r5 kernel redesign.

No chip needed. Reports, per graph:
  - scattered-column run-length distribution (consecutive X rows):
    fraction of scattered rows coverable by fixed-size Q-row direct DMAs
    issued in-kernel (VERDICT r5 item 1's in-kernel row DMA lever);
  - group-slot occupancy: real vs zero-padded slots (the skip-empty
    predication lever) and the intra-group edge density;
  - step-count drivers: compute-need vs next-tile staging quota.

    python tools/plan_stats.py --graph products-small
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="products-small")
    ap.add_argument("--key", default="v1")
    ap.add_argument("--opcache", action="store_true",
                    help="load the bench.py op cache entry (full-size "
                         "plans) instead of the ablation plan cache")
    args = ap.parse_args()

    import numpy as np

    from of_spmm_tpu.data.cache import cached
    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.sparse.panels import _L, SCQ, TQ, build_panels_plan

    csr, cfg = load_graph(args.graph, symmetrize=True)
    csr = normalized_adjacency(csr)
    if args.opcache:
        from of_spmm_tpu.sparse.fused import _BIG_T_NNZ, DEFAULT_T
        from of_spmm_tpu.sparse.panels import (
            _BIG_T_PANELS, DEFAULT_HOT_BUDGET as PHB,
            DEFAULT_HOT_MIN_RUN as PMR, DEFAULT_MIN_BLOCK as PMB,
            DEFAULT_RANGE_CAP as PRC)
        from of_spmm_tpu.data.graphs import NAMED_CONFIGS

        nnz_est = NAMED_CONFIGS[args.graph].n_edges
        FT = _BIG_T_PANELS if nnz_est >= _BIG_T_NNZ else DEFAULT_T
        ly = f"|ly-panels-T{FT}-hot{PHB}.{PMR}-rc{PRC}-mb{PMB}-v4"
        op = cached("op", f"{args.graph}|sym|gcn-norm|auto-ladder|v4{ly}",
                    lambda: (_ for _ in ()).throw(
                        RuntimeError("op cache miss — run bench first")))
        plan = op[0].binned
    else:
        plan = cached("panelsplan", f"{args.graph}|ablate|{args.key}",
                      lambda: build_panels_plan(csr))
    nnz = csr.nnz

    tot_slots = 0
    real_slots = 0
    edges = 0
    steps = 0
    comp_steps_needed = 0
    scat_rows = 0
    run_cover = {2: 0, 4: 0, 8: 0, 16: 0}
    n_runs_ge = {2: 0, 4: 0, 8: 0, 16: 0}
    G = plan.T // _L
    for seg in plan.segments:
        cnts = np.asarray(seg.mask_counts)
        tot_slots += cnts.shape[0]
        real_slots += int((cnts > 0).sum())
        edges += int(cnts.sum())
        steps += seg.n_steps
        # per-step real group count
        per_step = (cnts.reshape(-1, G) > 0).sum(axis=1)
        comp_steps_needed += int(np.ceil(per_step.sum() / G))
        # scattered run lengths PER TILE on SORTED columns (the plan
        # shuffles window positions for the XLA gather; a direct-DMA
        # layout would classify runs before shuffling). Per-piece extents
        # recovered from the tile-first control words, in segment order.
        st = np.asarray(seg.stage_take).astype(np.int64)
        scat_rows += st.shape[0]
        ctrl = np.asarray(seg.ctrl)
        exts = ctrl[ctrl[:, 0, 15] == 1, 0, 14]
        base = 0
        for ext in exts:
            cols = np.sort(st[base:base + ext])
            base += int(ext)
            if cols.shape[0] < 2:
                continue
            brk = np.flatnonzero(np.diff(cols) != 1)
            run_lens = np.diff(np.concatenate([[-1], brk,
                                               [cols.shape[0] - 1]]))
            for q in run_cover:
                sel = run_lens >= q
                n_runs_ge[q] += int(sel.sum())
                # fixed Q-chunks: floor(len/q)*q rows covered
                run_cover[q] += int(((run_lens[sel] // q) * q).sum())

    per_step_cnt = np.concatenate(
        [np.asarray(s.mask_counts).reshape(-1, G) for s in plan.segments])
    occ = (per_step_cnt > 0).sum(axis=1)
    print(f"graph={args.graph} nnz={nnz:,} T={plan.T} G={G}")
    print(f"slots: total={tot_slots:,} real={real_slots:,} "
          f"({real_slots/tot_slots:.3f}); edges={edges:,} "
          f"edges/real_slot={edges/max(real_slots,1):.1f} "
          f"pad_eff_slots={edges/(tot_slots*_L):.3f} "
          f"pad_eff_real={edges/(real_slots*_L):.3f}")
    print(f"steps={steps:,} (compute-need {comp_steps_needed:,}); "
          f"scattered rows={scat_rows:,} ({scat_rows/max(nnz,1)*100:.1f}% "
          f"of nnz)")
    hist = np.bincount(np.minimum(occ, G), minlength=G + 1)
    print("per-step real-group-count histogram (binned):")
    for lo in range(0, G + 1, max(G // 8, 1)):
        hi = min(lo + max(G // 8, 1), G + 1)
        print(f"  [{lo:3d},{hi:3d}): {hist[lo:hi].sum():,}")
    for q in sorted(run_cover):
        print(f"runs>= {q:2d}: {n_runs_ge[q]:,} runs, Q={q} chunk cover "
              f"{run_cover[q]:,} rows ({run_cover[q]/max(scat_rows,1):.3f} "
              f"of scattered)")

    # --- hot-budget headroom: which cols dominate the take? -------------
    # Count each column's occurrences across all take tables (touches);
    # promoting the top-K to hot removes those rows from the XLA take at
    # ~512B VMEM each. TQ padding repeats the last real col per tile —
    # approximate (over-counts those cols by <= 1 per tile).
    allt = np.concatenate([np.asarray(s.stage_take).astype(np.int64)
                           for s in plan.segments])
    cnt = np.bincount(allt, minlength=plan.shape[1])
    order = np.argsort(cnt)[::-1]
    cum = np.cumsum(cnt[order])
    print(f"current hot={plan.n_hot} RC={plan.RC} S_buf={plan.S_buf}")
    for k in (4096, 16384, 32768, 49152, 65536, 131072):
        if k <= cum.shape[0]:
            print(f"  promote top {k:7,d} take-cols -> removes "
                  f"{cum[k-1]:,} rows ({cum[k-1]/max(scat_rows,1):.3f} "
                  f"of take; +{k*512/2**20:.0f} MB VMEM)")
    # edges by window region (blk id: hot | range | scattered)
    H_blocks = plan.n_hot // _L
    RCB = plan.RC // _L
    e_hot = e_rng = e_scat = 0
    for seg in plan.segments:
        cnts = np.asarray(seg.mask_counts).astype(np.int64)
        blks = np.asarray(seg.blk).reshape(-1)
        e_hot += int(cnts[blks < H_blocks].sum())
        sel = (blks >= H_blocks) & (blks < H_blocks + RCB)
        e_rng += int(cnts[sel].sum())
        e_scat += int(cnts[blks >= H_blocks + RCB].sum())
    tot = max(e_hot + e_rng + e_scat, 1)
    print(f"edges by region: hot {e_hot:,} ({e_hot/tot:.3f})  range "
          f"{e_rng:,} ({e_rng/tot:.3f})  scattered {e_scat:,} "
          f"({e_scat/tot:.3f})")


if __name__ == "__main__":
    main()
