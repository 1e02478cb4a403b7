"""Host-only sweep of panel-plan knobs vs scattered-row count.

Take cost is ~4.4 ns/scattered row (PROFILE_r04) and compute ~54
ns/group slot: this prints both counts per (min_block, range_cap, hot)
so the knob choice is a two-term cost model, no chip needed.

    python tools/plan_knob_sweep.py --graph products-small
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="products-small")
    ap.add_argument("--take-ns", type=float, default=4.4)
    ap.add_argument("--slot-ns", type=float, default=54.0)
    args = ap.parse_args()

    from of_spmm_tpu.data.graphs import load_graph
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.sparse.panels import build_panels_plan

    csr, cfg = load_graph(args.graph, symmetrize=True)
    csr = normalized_adjacency(csr)

    cases = [
        dict(),                                   # shipped defaults
        dict(min_block=16),
        dict(min_block=12),
        dict(min_block=8),
        dict(range_cap=32768),
        dict(min_block=12, range_cap=32768),
        dict(hot_budget=32768),
        dict(min_block=12, hot_budget=32768),
    ]
    for kw in cases:
        t0 = time.time()
        try:
            p = build_panels_plan(csr, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{kw}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        model_ms = (p.n_scattered * args.take_ns
                    + p.n_groups * args.slot_ns) / 1e6
        print(f"{kw or 'defaults'}: scattered={p.n_scattered/1e6:.2f}M "
              f"groups={p.n_groups/1e6:.3f}M ranges={p.n_ranges} "
              f"S_buf={p.S_buf} model={model_ms:.1f}ms "
              f"({time.time()-t0:.0f}s build)", flush=True)


if __name__ == "__main__":
    main()
