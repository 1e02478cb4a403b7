"""Panel-engine SpMM plan: dense adjacency-mask groups + linear staging.

The round-4 engine, superseding sparse/ranges.py for rank-1-factorable
values (the framework's normalized adjacencies). Two r3 findings drive
the redesign (PROFILE_r04.md):

1. **Every multi-hot group was already one (tile, 128-col-block) pair**
   (lanes within a group share one window block). So the lane
   indirection is pure overhead: the group's bitmask can index OUTPUT
   ROWS directly — ``mask[w, r] = 1`` iff edge (tile row r <- window row
   w) — and the gather matmul's result IS the tile contribution. The
   scatter one-hot matmul, the hi/lo recombine+re-split, and the lrow
   stream all disappear; per group the kernel runs one decode + one
   128x128x256 MXU matmul + one accumulate.
2. **The r3 engine was take-phase-bound, not compute-bound** (the r3
   take-only ablation was DCE'd by XLA; re-measured in
   tools/microbench_take_order.py: XLA row gather ~7.5 ns/row f32).
   The tier-major run-aligned staged table (and its ~2M 32-row chunk
   DMAs per SpMM) is replaced by a LINEAR table: the XLA phase gathers
   each tile's scattered rows f32 in exactly the order the window
   consumes them (measured within 5% of the tiered take), so the kernel
   stages each tile with a few large contiguous block DMAs and splits
   hi|lo on the VPU (~0.1 ns/row).

Unchanged from r3: VMEM-resident hot hubs; contiguous X range windows
block-DMA'd from HBM with cross-tile persistence; per-tile scattered
remainder; thin range blocks demoted to the packed scattered space.

Reference semantics: gather x segment-sum
(oneflow/user/ops/gather_op.cpp:51-82,
oneflow/user/kernels/unsorted_segment_sum_kernel_util.cu:52-151).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from of_spmm_tpu.sparse.formats import CSR
from of_spmm_tpu.sparse.fused import (
    _L, _BIG_T_NNZ, DEFAULT_T, choose_hot, coalesce_duplicates,
    factor_rank1)
from of_spmm_tpu.sparse.ranges import _best_window, RMAX_CAP

DEFAULT_R = 128
DEFAULT_RANGE_CAP = 24576   # rows per range window (x2 parity x512B bf16
#                             window + x512B f32 stage = 50 MB VMEM)
DEFAULT_S_CAP = 8192        # scattered rows per tile piece (per parity)
DEFAULT_SEG_STEPS = 16384
DEFAULT_RQ = 1024           # rows per range-copy DMA (512 KB)
DEFAULT_HOT_BUDGET = None   # adaptive (see below); pass an int to force
DEFAULT_HOT_MIN_RUN = 4     # keep hot blocks while lanes/tile/blk >= this
_HOT_BIG = 16384            # hot rows for graphs with many tiles
_HOT_SMALL = 4096           # and for few-tile graphs
_HOT_TILES = 8192           # tile-count threshold. A hot block costs one
#                             ~88 ns group per TOUCHING TILE, a scattered
#                             column ~6.4 ns per referencing tile, so the
#                             residency breakeven scales with tile count:
#                             measured full ogbn-products (19.1K tiles)
#                             prefers 16384 hot cols (282 vs 293 ms at
#                             4096) while products-small (1.9K tiles)
#                             prefers 4096 (24.5 vs 43.8 ms at 16384)
DEFAULT_MIN_BLOCK = 24      # demote range blocks with fewer edges per
#                             tile to the scattered path: a dense-mask
#                             group slot costs ~46-54 ns regardless of
#                             occupancy; scattered rows ~5 ns of serial
#                             XLA take (min_block=12 measured a wash:
#                             277.9 vs 275.7 ms on full products)
SCQ = 1024                  # big scattered-copy chunk (rows)
TQ = 128                    # tail chunk + table/window alignment (rows)
BMAX = 4                    # big chunks per step (static unroll)
TMAX = 7                    # tail chunks per step (= SCQ/TQ - 1)
DMAX = 32                   # direct-row copies per step (static unroll
#                             bound): single X rows the KERNEL fetches
#                             itself on the scalar core's idle issue
#                             slots (~18 ns/row) instead of the serial
#                             XLA take (~4.4 ns/row but un-overlapped).
#                             MEASURED NEGATIVE (PROFILE_r05): Mosaic
#                             schedules the kernel body as one scalar
#                             instruction stream, so issue cost is
#                             ADDITIVE, not hidden (quota 64: +3.3 ms
#                             exposed on products-small for 0.8 ms of
#                             take saved; quota 24: +2.7 for 0.8). The
#                             machinery stays for schedule experiments;
#                             the default disables it
DEFAULT_DIRECT_QUOTA = 0
_KEEP_FRAC = 0.90
_BIG_T_PANELS = 8192  # per-step grid overhead is ~0.55-0.95 us
#                       (measured); the dense-mask group loop is
#                       unrolled-compile-safe with no dependent chains,
#                       so big graphs cut their step count with larger
#                       G (full products: 283.0 ms at T=4096, 275.7 at
#                       T=8192; T=16384's padded mask slots no longer
#                       fit the HBM plan budget)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PanelSegment:
    """One pallas_call worth of steps."""

    ctrl: np.ndarray      # (steps, 1, 16) int32 per-step control words:
    #  [0] compute tile id (block index into segment output; -1 = none)
    #  [1] real (non-padded) group count this step PLUS ONE (0 = legacy
    #      plan without the field: run every slot). Padded group slots
    #      sit at the tail of each tile's group list, so the kernel
    #      skips whole _SUB-group sub-blocks past the count (tail-step
    #      padding is 18-27% of slots at products scale)
    #  [2] scattered copy src base row (into this segment's table)
    #  [3] scattered big-chunk count this step (SCQ rows each)
    #  [4] range-copy count this step (RQ-row chunks)
    #  [5] scattered copy dst base row (parity*S_buf + progress)
    #  [6] prev-step big-chunk count (wait)
    #  [7] scattered tail-chunk count this step (TQ rows each)
    #  [8] prev-step tail-chunk count (wait)
    #  [9] zero-output flag (first step of first piece of a tile)
    #  [10] first-step-of-range flag (split range f32 -> window)
    #  [11] range read parity base (= parity*RC)
    #  [12] prev-step range-copy count (wait)
    #  [13] scattered parity base for compute+split (= parity*S_buf)
    #  [14] scattered split extent rows (tile-first step)
    #  [15] first-step-of-tile flag
    #  [16] direct-row copy count this step (single-row DMAs from X)
    #  [17] prev-step direct-row count (wait)
    #  [18] direct-row dst base (absolute row into the scat scratch)
    rcopy: np.ndarray     # (steps, 2, RMAX) int32 [src X row | dst row]
    dsrc: np.ndarray      # (steps, 1, DMAX) int32 direct-copy X rows
    blk: np.ndarray       # (steps, 1, G) int32 window block per group
    tile_of: np.ndarray   # (steps,) int32 out block index (prefetch)
    # adjacency bitmasks, (steps*G, 4, 128) int32: bit (w%32) of word
    # (w//32), column r = window row w contributes to tile row r. Plans
    # are BUILT with the compact per-edge form below (16 bits/edge vs
    # ~165 bits/edge dense at products scale — a ~13x smaller transfer to
    # a tunneled chip) and expanded by ensure_masks (numpy on host,
    # one scatter-add jit on device at placement).
    masks: Optional[np.ndarray] = None
    mask_edges: Optional[np.ndarray] = None   # (E,) uint16 = (w<<8)|r,
    #                                           group-major order
    mask_counts: Optional[np.ndarray] = None  # (steps*G,) int32 edges
    #                                           per group slot
    stage_take: Optional[np.ndarray] = None  # (S_take,) int32 global col
    #                       ids, tile-consumption order, TQ-padded/tile
    stage_scale: Optional[np.ndarray] = None  # (S_take,) f32 per-row
    #                       scale applied at table build (general-valued
    #                       per-edge plans; None = unscaled/rank-1)
    n_steps: int = 0
    n_tiles: int = 0

    def tree_flatten(self):
        return ((self.ctrl, self.rcopy, self.dsrc, self.masks, self.blk,
                 self.tile_of, self.stage_take, self.mask_edges,
                 self.mask_counts, self.stage_scale),
                (self.n_steps, self.n_tiles))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (ctrl, rcopy, dsrc, masks, blk, tile_of, stage_take, mask_edges,
         mask_counts, stage_scale) = children
        n_steps, n_tiles = aux
        return cls(ctrl=ctrl, rcopy=rcopy, dsrc=dsrc, masks=masks,
                   blk=blk, tile_of=tile_of, stage_take=stage_take,
                   mask_edges=mask_edges, mask_counts=mask_counts,
                   stage_scale=stage_scale,
                   n_steps=n_steps, n_tiles=n_tiles)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PanelPlan:
    segments: Tuple[PanelSegment, ...]
    hot_ids: np.ndarray
    row_scale: np.ndarray      # rank-1 factors (panels require rank-1)
    col_scale: np.ndarray
    shape: Tuple[int, int]
    R: int
    T: int
    RC: int
    S_buf: int
    RMAX: int
    RQ: int
    n_ranges: int
    n_range_rows: int
    n_scattered: int           # total take rows (padded)
    n_groups: int
    n_direct: int = 0          # rows the kernel fetches from X itself

    def tree_flatten(self):
        children = (self.segments, self.hot_ids, self.row_scale,
                    self.col_scale)
        aux = (self.shape, self.R, self.T, self.RC, self.S_buf,
               self.RMAX, self.RQ, self.n_ranges, self.n_range_rows,
               self.n_scattered, self.n_groups, self.n_direct)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        segments, hot_ids, row_scale, col_scale = children
        (shape, R, T, RC, S_buf, RMAX, RQ, n_ranges, n_range_rows,
         n_scattered, n_groups, n_direct) = aux
        return cls(segments=tuple(segments), hot_ids=hot_ids,
                   row_scale=row_scale, col_scale=col_scale, shape=shape,
                   R=R, T=T, RC=RC, S_buf=S_buf, RMAX=RMAX, RQ=RQ,
                   n_ranges=n_ranges, n_range_rows=n_range_rows,
                   n_scattered=n_scattered, n_groups=n_groups,
                   n_direct=n_direct)

    @property
    def n_hot(self) -> int:
        return int(self.hot_ids.shape[0])

    @property
    def rank1(self) -> bool:
        return True

    @property
    def multihot(self) -> bool:
        return True

    @property
    def n_lanes(self) -> int:  # bench-surface compat: lanes = group slots
        return self.n_groups * _L

    def padding_efficiency(self, true_nnz: int) -> float:
        return float(true_nnz) / max(self.n_lanes, 1)


def plan_memory_report(plan: PanelPlan, d: int = 128,
                       hbm_limit: Optional[int] = None) -> dict:
    """Peak-HBM model (cf. sparse/fused.py plan_memory_report; reference
    precedent: compile-time memory planning,
    oneflow/core/job/compiler.cpp:107). Segments are barrier-serialized;
    the per-segment f32 take table (512B/row) dominates transients."""
    from of_spmm_tpu.sparse.fused import (
        _BUDGET_FRACTION, _TABLE_HEADROOM, _nbytes, device_hbm_bytes)

    hbm = hbm_limit or device_hbm_bytes()
    n, m = plan.shape
    plan_b = _nbytes(plan.hot_ids) + _nbytes(plan.row_scale) + \
        _nbytes(plan.col_scale)
    max_table = 0
    for seg in plan.segments:
        for leaf in (seg.ctrl, seg.rcopy, seg.dsrc, seg.blk, seg.tile_of,
                     seg.stage_take, seg.stage_scale):
            if leaf is not None:
                plan_b += _nbytes(leaf)
        # dense masks dominate resident plan bytes whether or not they
        # have been expanded yet (2 KB per group slot)
        n_slots = (int(seg.masks.shape[0]) if seg.masks is not None
                   else int(seg.mask_counts.shape[0]))
        plan_b += n_slots * 4 * _L * 4
        if seg.stage_take is not None:
            max_table = max(max_table, int(seg.stage_take.shape[0]) * 512)
    x_b = m * d * 4 + m * _L * 4
    out_rows = sum(seg.n_tiles * plan.R for seg in plan.segments)
    out_b = 2 * out_rows * _L * 4
    hot_b = plan.n_hot * 512
    peak = plan_b + x_b + out_b + hot_b + int(_TABLE_HEADROOM * max_table)
    budget = int(_BUDGET_FRACTION * hbm)
    return {
        "plan_bytes": plan_b, "x_bytes": x_b, "out_bytes": out_b,
        "hot_bytes": hot_b, "max_table_bytes": max_table,
        "peak_bytes": peak, "hbm_bytes": hbm, "budget_bytes": budget,
        "fits": peak <= budget,
    }


def _dense_groups(win_pos: np.ndarray, rows: np.ndarray):
    """Compact dense-mask groups for one tile piece: (edges (E,) uint16 =
    (w << 8) | r in group-major order, counts (n_g,) int32, blk_of
    (n_g,) int32). One group per distinct 128-row window block; window
    row w selects into tile row r."""
    if win_pos.shape[0] == 0:
        return (np.zeros(0, np.uint16), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    blk = win_pos // _L
    bit = win_pos - blk * _L
    u_blk, inv = np.unique(blk, return_inverse=True)
    n_g = u_blk.shape[0]
    order = np.argsort(inv, kind="stable")
    edges = ((bit[order] << 8) | rows[order]).astype(np.uint16)
    counts = np.bincount(inv, minlength=n_g).astype(np.int32)
    return edges, counts, u_blk.astype(np.int32)


def _expand_masks_np(edges: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(n_slots, 4, 128) int32 bitmasks from compact edges (host).

    Distinct (row, col) edges map to distinct bits, so a carry-free
    bincount sum builds the words."""
    n_slots = counts.shape[0]
    if n_slots == 0:
        return np.zeros((0, 4, _L), np.int32)
    gid = np.repeat(np.arange(n_slots, dtype=np.int64),
                    counts.astype(np.int64))
    e = edges.astype(np.int64)
    w = e >> 8
    r = e & 255
    flat = gid * (4 * _L) + (w >> 5) * _L + r
    buf = np.bincount(flat, weights=(1 << (w & 31)).astype(np.float64),
                      minlength=n_slots * 4 * _L)
    return (buf.astype(np.int64).astype(np.uint32).view(np.int32)
            .reshape(n_slots, 4, _L))


@jax.jit
def _expand_masks_dev(edges: jax.Array, counts: jax.Array) -> jax.Array:
    """Device-side mask expansion: one scatter-add over distinct bits."""
    import jax.numpy as jnp

    n_slots = counts.shape[0]
    gid = jnp.repeat(jnp.arange(n_slots, dtype=jnp.int32), counts,
                     total_repeat_length=edges.shape[0])
    e = edges.astype(jnp.int32)
    w = e >> 8
    r = e & 255
    flat = gid * (4 * _L) + (w >> 5) * _L + r
    val = (jnp.uint32(1) << (w & 31).astype(jnp.uint32))
    buf = jnp.zeros(n_slots * 4 * _L, jnp.uint32).at[flat].add(val)
    return jax.lax.bitcast_convert_type(buf, jnp.int32).reshape(
        n_slots, 4, _L)


def ensure_masks(plan: "PanelPlan", device: bool = False) -> "PanelPlan":
    """Expand compact mask edges into the kernel's dense bitmasks.

    ``device=True`` transfers the compact form and expands with one
    scatter-add jit (placement path: ~13x less tunnel traffic than the
    dense masks); otherwise numpy (sim / interpret / stacking)."""
    if all(seg.masks is not None for seg in plan.segments):
        return plan
    segs = []
    for seg in plan.segments:
        if seg.masks is not None:
            segs.append(seg)
            continue
        if device:
            masks = _expand_masks_dev(jax.numpy.asarray(seg.mask_edges),
                                      jax.numpy.asarray(seg.mask_counts))
        else:
            masks = _expand_masks_np(np.asarray(seg.mask_edges),
                                     np.asarray(seg.mask_counts))
        segs.append(dataclasses.replace(seg, masks=masks,
                                        mask_edges=None,
                                        mask_counts=None))
    return dataclasses.replace(plan, segments=tuple(segs))


def default_panels_t(nnz: int, n_rows: int) -> int:
    """Adaptive lanes-per-step T for the panel engine.

    Big graphs (>= 8M nnz) take T=8192: the group loop has no dependent
    chains, so large G cuts the ~0.95 us/step grid overhead (full
    products 283.0 -> 275.7 ms vs T=4096). MID-sized graphs with MANY
    tiles (arxiv: 1.2M nnz over 1323 tiles) take T=2048 — grid overhead
    scales with tile count while padding scales with tiles x G, and the
    measured optimum moves up once tiles >= ~1K (arxiv 5.32 -> 5.06 ms
    vs T=1024). Few-tile small graphs (reddit-small: 182 tiles) keep
    T=1024 (measured best, r4).
    """
    n_tiles = max(-(-n_rows // _L), 1)
    if nnz >= _BIG_T_NNZ:
        return _BIG_T_PANELS
    if n_tiles >= 1024:
        return 2048
    return DEFAULT_T


def build_panels_plan(
    csr: CSR,
    R: int = DEFAULT_R,
    T: Optional[int] = None,
    hot_budget: Optional[int] = DEFAULT_HOT_BUDGET,
    hot_min_run: int = DEFAULT_HOT_MIN_RUN,
    seg_steps: int = DEFAULT_SEG_STEPS,
    range_cap: int = DEFAULT_RANGE_CAP,
    s_cap: int = DEFAULT_S_CAP,
    rq: int = DEFAULT_RQ,
    min_block: int = DEFAULT_MIN_BLOCK,
    seg_stage_cap: int = 4_000_000,
    factors=None,
    s_buf_force: Optional[int] = None,
    direct_quota: int = DEFAULT_DIRECT_QUOTA,
    per_edge: bool = False,
) -> PanelPlan:
    """Host-side panel plan build (numpy + native pass-1). Values must
    factor rank-1 (vals[e] = r[row[e]] * c[col[e]]); raises ValueError
    otherwise — or pass ``per_edge=True`` for the general-valued mode.

    ``per_edge`` (r5, VERDICT r4 item 6 — general-valued SpMM): every
    edge gets its own staged window row, pre-scaled by its value in the
    XLA table build (``table[e] = vals[e] * x[cols[e]]``,
    PanelSegment.stage_scale), and one mask bit. No hot table, no range
    windows (shared window rows cannot carry per-edge values), no rank-1
    requirement — arbitrary values (weighted graphs, learned edge
    weights) run the flagship kernel unchanged at take-bound speed
    (~nnz x ~4.4 ns/row of XLA gather) instead of the ranges fallback.
    Reference parity target: gather x segment-sum with arbitrary
    ``vals`` (oneflow/user/ops/unsorted_segment_sum_op.cpp:21-131).

    ``factors=(r, c)``: trust the caller's rank-1 factorization instead
    of re-detecting (distributed shards slice a globally-normalized
    matrix whose LOCAL degrees no longer match the values —
    parallel/partition.py passes the global factors remapped into the
    local index space). ``s_buf_force``: pad the scattered buffer to a
    caller-chosen size (>= the computed one) so plans built per shard
    share static kernel parameters (SPMD stacking).

    ``direct_quota``: rows per step the KERNEL fetches from X itself
    (single-row DMAs issued on the scalar core's idle slots, hidden
    behind the mask-group matmuls) instead of through the serial XLA
    take — the one un-overlapped phase (PROFILE_r04 section 3). Each
    tile's last positions become the direct region, sized to the
    previous tile's step count so the per-step issue load stays under
    the quota. 0 disables."""
    if R != _L:
        raise ValueError("panel engine requires R=128 (dense masks index "
                         "output rows as mask columns)")
    if T is None:
        from of_spmm_tpu.utils.config import FLAGS

        T = int(FLAGS.get("OFS_FUSED_T")) or default_panels_t(
            csr.nnz, csr.shape[0])
    n, m = csr.shape
    G = T // _L
    direct_quota = min(max(int(direct_quota), 0), DMAX)
    n_tiles = max(-(-n // R), 1)
    if per_edge:
        hot_budget = 0          # shared window rows can't carry values
        min_block = 1 << 30     # ranges off: everything stages per edge
        direct_quota = 0
    if hot_budget is None:
        hot_budget = _HOT_BIG if n_tiles >= _HOT_TILES else _HOT_SMALL

    # rank-1 detection runs on the RAW edge list: every copy of a
    # duplicated (row, col) carries r_i*c_j there, while the coalesced
    # SUM (k*r_i*c_j) does not factor. Duplicates then stage k copies of
    # the column in the scattered region — one mask bit each — which
    # reproduces the sum exactly (a bit has no multiplicity; cf.
    # sparse/fused.py coalesce_duplicates, which instead gives up rank-1).
    if per_edge:
        row_scale = np.ones(n, np.float32)
        col_scale = np.ones(m, np.float32)
    else:
        if factors is None:
            factors = factor_rank1(csr)
        if factors is None:
            factors = factor_rank1(coalesce_duplicates(csr))
            if factors is not None:
                csr = coalesce_duplicates(csr)
        if factors is None:
            raise ValueError(
                "panel engine requires rank-1-factorable values; pass "
                "per_edge=True for the general-valued mode")
        row_scale, col_scale = factors
        row_scale = np.asarray(row_scale)[:n]
        col_scale = np.asarray(col_scale)[:m]

    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols_all = np.asarray(csr.cols, dtype=np.int64)
    vals_all = (np.asarray(csr.vals, dtype=np.float32) if per_edge
                else None)
    # split duplicates out of the structure (first copy stays)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    dup = np.zeros(rows_all.shape[0], bool)
    if not per_edge:  # per-edge staging carries duplicates natively
        key = rows_all * (m + 1) + cols_all
        if key.shape[0] and not bool(np.all(key[1:] >= key[:-1])):
            order0 = np.argsort(key, kind="stable")
        else:
            order0 = None
        ks = key if order0 is None else key[order0]
        if key.shape[0]:
            dup_s = np.concatenate([[False], ks[1:] == ks[:-1]])
            if order0 is None:
                dup = dup_s
            else:
                dup[order0] = dup_s
    extra_rows = rows_all[dup]
    extra_cols = cols_all[dup]
    if extra_rows.shape[0]:
        keep = ~dup
        counts = np.bincount(rows_all[keep], minlength=n)
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=indptr[1:])
        cols_all = cols_all[keep]
    # per-tile extra lists (row-local)
    extra_tile = extra_rows // R
    extra_order = np.argsort(extra_tile, kind="stable")
    extra_tile = extra_tile[extra_order]
    extra_rows = extra_rows[extra_order]
    extra_cols = extra_cols[extra_order]
    extra_ptr = np.searchsorted(extra_tile, np.arange(n_tiles + 1))

    RC = min(range_cap, max(m // _L * _L, _L))
    RQ = rq if RC % rq == 0 else _L
    n_rq = RC // RQ

    from of_spmm_tpu import native

    nat = None if per_edge else native.expansion_pass1(
        indptr, cols_all, np.zeros(cols_all.shape[0], np.float32), R)
    touch = (np.bincount(nat[3][:nat[4][-1]].astype(np.int64), minlength=m)
             if nat is not None else None)
    hot_ids = choose_hot(csr, R, hot_budget, hot_min_run, touch=touch)
    H = hot_ids.shape[0]
    hot_rank = np.full(m, -1, dtype=np.int64)
    hot_rank[hot_ids] = np.arange(H, dtype=np.int64)

    # --- per-tile pass: classify cols, pick/keep ranges, build masks -----
    shuffle_rng = np.random.default_rng(0)
    tiles_meta = []    # (take_cols, edges, counts, blk_of, direct_cols)
    out_of = []
    first_piece = []
    range_of = []
    range_lo = []
    n_scattered = 0
    n_direct = 0
    n_groups = 0
    cur_range = -1
    if per_edge:
        range_lo.append(0)  # one degenerate RC-row range, never consulted
        cur_range = 0
    prev_est = 1   # compute-step estimate of the previously emitted
    #                piece: the issue window for this tile's directs
    starts = indptr[np.minimum(np.arange(n_tiles + 1) * R, n)]
    for t in range(n_tiles):
        r0, r1 = t * R, min((t + 1) * R, n)
        v_scat = None
        if per_edge:
            lo_e, hi_e = indptr[r0], indptr[r1]
            c = cols_all[lo_e:hi_e]
            v_scat = vals_all[lo_e:hi_e]
            r = np.repeat(np.arange(r1 - r0, dtype=np.int64),
                          np.diff(indptr[r0:r1 + 1]))
        elif nat is not None:
            lane_inv, lane_row, _lv, uniq_all, uniq_ptr = nat
            lo_e, hi_e = starts[t], starts[t + 1]
            uniq_t = uniq_all[uniq_ptr[t]:uniq_ptr[t + 1]].astype(np.int64)
            inv_t = lane_inv[lo_e:hi_e].astype(np.int64)
            c = uniq_t[inv_t]
            r = lane_row[lo_e:hi_e].astype(np.int64)
            cnt_t = np.bincount(inv_t, minlength=uniq_t.shape[0])
        else:
            lo_e, hi_e = indptr[r0], indptr[r1]
            c = cols_all[lo_e:hi_e]
            r = np.repeat(np.arange(r1 - r0, dtype=np.int64),
                          np.diff(indptr[r0:r1 + 1]))
            uniq_t, inv_small = np.unique(c, return_inverse=True)
            cnt_t = np.bincount(inv_small, minlength=uniq_t.shape[0])
        if per_edge:
            # everything scattered, one position per EDGE (values ride
            # the stage_scale table); no hot / range classification
            is_hot = np.zeros(c.shape[0], bool)
            scat_u = c
            scat_inv = np.arange(c.shape[0], dtype=np.int64)
            n_u = c.shape[0]
            hr = np.full(c.shape[0], -1, dtype=np.int64)
            in_range = np.zeros(c.shape[0], bool)
            is_scat = np.ones(c.shape[0], bool)
            lo_r = 0
        else:
            hr = hot_rank[c]
            is_hot = hr >= 0
            cold_mask_u = hot_rank[uniq_t] < 0
            cold_u = uniq_t[cold_mask_u]
            cold_cnt = cnt_t[cold_mask_u]

            # range choice with persistence (sparse/ranges.py)
            best_lo, best_mass = _best_window(cold_u, cold_cnt, m, RC)
            if cur_range >= 0:
                clo = range_lo[cur_range]
                a = np.searchsorted(cold_u, clo, side="left")
                b = np.searchsorted(cold_u, clo + RC, side="left")
                cur_mass = int(cold_cnt[a:b].sum())
            else:
                cur_mass = -1
            if cur_range < 0 or cur_mass < _KEEP_FRAC * best_mass:
                range_lo.append(best_lo)
                cur_range = len(range_lo) - 1
            lo_r = range_lo[cur_range]

            in_range = (~is_hot) & (c >= lo_r) & (c < lo_r + RC)
            if min_block > 1 and np.any(in_range):
                rblk = (c[in_range] - lo_r) // _L
                per_blk = np.bincount(rblk, minlength=RC // _L)
                dense_blk = per_blk >= min_block
                keep = np.zeros(c.shape[0], bool)
                keep[in_range] = dense_blk[rblk]
                in_range = keep
            is_scat = (~is_hot) & ~in_range
            c_scat = c[is_scat]
            scat_u, scat_inv = np.unique(c_scat, return_inverse=True)
            n_u = scat_u.shape[0]
        # duplicate-edge extra copies ride the scattered path (one mask
        # bit per copy — see the dedup block above)
        ex_lo, ex_hi = int(extra_ptr[t]), int(extra_ptr[t + 1])
        n_ex = ex_hi - ex_lo
        # SHUFFLE the tile's scattered window positions: sorted (banded)
        # gather indices run ~2x slower through XLA's TPU gather than
        # spread-out ones (measured 10.0 vs 5.5 ns/row — consecutive
        # rows serialize on HBM locality). The window layout is
        # plan-chosen and the masks encode positions, so a per-tile
        # permutation de-bands the take for free; block copies move the
        # whole region regardless of internal order.
        perm = shuffle_rng.permutation(n_u + n_ex).astype(np.int64)
        n_pos = n_u + n_ex
        n_pieces = max(1, -(-max(n_pos, 1) // s_cap))

        # direct region: the tile's LAST D positions bypass the XLA
        # take (single-piece tiles only; the issue window is the
        # previous piece's compute steps). The table part pads to TQ so
        # the pad gap [n_table, P) sits between table and directs.
        # (32-row table padding was tried and REVERTED: the XLA gather
        # runs ~40 ms SLOWER on full products with 32-aligned tile
        # slices than with 128-aligned repeat-padded ones, despite 1M
        # fewer rows — PROFILE_r05.)
        if n_pieces == 1 and direct_quota > 0:
            D = int(min(n_pos, direct_quota * prev_est))
        else:
            D = 0
        n_table = n_pos - D
        P = -(-n_table // TQ) * TQ
        shift = P - n_table
        adj = np.where(perm >= n_table, perm + shift, perm) if shift \
            else perm

        win_pos = np.empty(c.shape[0], dtype=np.int64)
        win_pos[is_hot] = hr[is_hot]
        win_pos[in_range] = H + (c[in_range] - lo_r)
        win_pos[is_scat] = H + RC + adj[scat_inv]
        if n_ex:
            win_pos = np.concatenate(
                [win_pos,
                 H + RC + adj[n_u + np.arange(n_ex, dtype=np.int64)]])
            r = np.concatenate([r, extra_rows[ex_lo:ex_hi] - r0])

        # position -> column map (the table/window order is the
        # shuffled position order, BEFORE the pad-gap shift)
        col_at_pos = np.empty(n_pos, dtype=np.int64)
        col_at_pos[perm] = np.concatenate(
            [scat_u, extra_cols[ex_lo:ex_hi]]) if n_ex else scat_u
        val_at_pos = None
        if v_scat is not None:
            val_at_pos = np.empty(n_pos, dtype=np.float32)
            val_at_pos[perm] = v_scat
        direct_cols = col_at_pos[n_table:n_pos].astype(np.int32)

        # scattered overflow: split into virtual pieces; pieces > 0 carry
        # only the scattered tail (hot+range stay in piece 0)
        for piece in range(n_pieces):
            if n_pieces == 1:
                sel = slice(None)
                wp_p, rr_p = win_pos, r
            else:
                lo_pos = H + RC + piece * s_cap
                hi_pos = H + RC + (piece + 1) * s_cap
                if piece == 0:
                    sel = win_pos < hi_pos
                else:
                    sel = (win_pos >= lo_pos) & (win_pos < hi_pos)
                wp_p = win_pos[sel].copy()
                wp_p[wp_p >= H + RC] -= piece * s_cap
                rr_p = r[sel]
            edg, cnts, bo = _dense_groups(wp_p, rr_p)
            lo_tc = piece * s_cap
            hi_tc = min((piece + 1) * s_cap, n_table)
            take_cols = col_at_pos[lo_tc:hi_tc]
            tv = None if val_at_pos is None else val_at_pos[lo_tc:hi_tc]
            pad = -take_cols.shape[0] % TQ
            if pad:
                fill = take_cols[-1] if take_cols.shape[0] else 0
                take_cols = np.concatenate(
                    [take_cols, np.full(pad, fill, np.int64)])
                if tv is not None:  # pad rows scale to exact zero
                    tv = np.concatenate([tv, np.zeros(pad, np.float32)])
            dc = direct_cols if piece == n_pieces - 1 else \
                np.zeros(0, np.int32)
            tiles_meta.append((take_cols.astype(np.int32), edg, cnts, bo,
                               dc, tv))
            out_of.append(t)
            first_piece.append(piece == 0)
            range_of.append(cur_range)
            n_scattered += take_cols.shape[0]
            n_direct += dc.shape[0]
            n_groups += cnts.shape[0]
            prev_est = max(-(-cnts.shape[0] // G), 1)

    n_meta = len(tiles_meta)

    def staged_of(t):
        return tiles_meta[t][0].shape[0]

    # --- steps per tile: compute groups AND next tile's staging quota ----
    stage_quota = BMAX * SCQ  # rows stageable per step
    steps_of = []
    for t in range(n_meta):
        need_c = max(-(-tiles_meta[t][2].shape[0] // G), 1)
        nxt = staged_of(t + 1) if t + 1 < n_meta else 0
        need_s = -(-nxt // stage_quota)
        nxt_d = tiles_meta[t + 1][4].shape[0] if t + 1 < n_meta else 0
        need_d = -(-nxt_d // max(direct_quota, 1))
        steps_of.append(max(need_c, need_s, need_d, 1))
    # pad each tile's group arrays to steps*G
    for t in range(n_meta):
        take, edg, cnts, bo, dc, tv = tiles_meta[t]
        want_g = steps_of[t] * G
        pad_g = want_g - cnts.shape[0]
        if pad_g > 0:
            cnts = np.concatenate([cnts, np.zeros(pad_g, np.int32)])
            bo = np.concatenate([bo, np.zeros(pad_g, np.int32)])
            tiles_meta[t] = (take, edg, cnts, bo, dc, tv)
            n_groups += pad_g
    S_buf = max(max((staged_of(t) + tiles_meta[t][4].shape[0]
                     for t in range(n_meta)), default=TQ), TQ)
    # align to the kernel's hi/lo split chunk so chunked splits never
    # cross into the other parity's region (cf. sparse/fused.py S_buf)
    S_buf += -S_buf % 2048 if S_buf > 2048 else -S_buf % TQ
    if s_buf_force is not None:
        if s_buf_force < S_buf:
            raise ValueError(f"s_buf_force={s_buf_force} < computed "
                             f"S_buf={S_buf}")
        S_buf = int(s_buf_force)

    # --- segment layout (cut at tile boundaries on steps or table cap) ---
    seg_lists = []
    seg_start = 0
    while seg_start < n_meta:
        seg_tiles = [seg_start]
        total = steps_of[seg_start] * 2
        stage_sum = staged_of(seg_start)
        while seg_tiles[-1] + 1 < n_meta:
            nxt = seg_tiles[-1] + 1
            fits = (total + steps_of[nxt] <= seg_steps
                    and stage_sum + staged_of(nxt) <= seg_stage_cap)
            if not fits and first_piece[nxt]:
                break
            seg_tiles.append(nxt)
            total += steps_of[nxt]
            stage_sum += staged_of(nxt)
        seg_lists.append(seg_tiles)
        seg_start = seg_tiles[-1] + 1

    # RMAX from the ACTUAL emission spans: within each segment, range
    # rid's copies spread over the PREVIOUS range's local step span minus
    # one (fill_range); a range split across segments gets a prologue in
    # the next segment, which sizes itself from RMAX — so only the
    # within-segment spans constrain it. (A plan-global span estimate
    # under-sized RMAX once cap cuts landed inside ranges.)
    RMAX = 1
    for seg_tiles in seg_lists:
        spans = []  # per in-segment range run: total steps
        for t in seg_tiles:
            if spans and range_of[t] == spans[-1][0]:
                spans[-1][1] += steps_of[t]
            else:
                spans.append([range_of[t], steps_of[t]])
        for k in range(len(spans) - 1):
            span = max(spans[k][1] - 1, 1)
            RMAX = max(RMAX, -(-n_rq // span))
    RMAX = min(max(RMAX, 1), max(RMAX_CAP, n_rq))

    segments = [
        _emit_segment(tiles_meta, seg_tiles, steps_of, out_of,
                      first_piece, range_of, range_lo, R, G, S_buf, RMAX,
                      RQ, RC, m, direct_quota)
        for seg_tiles in seg_lists
    ]

    plan = PanelPlan(
        segments=tuple(segments),
        hot_ids=hot_ids.astype(np.int32),
        row_scale=row_scale.astype(np.float32),
        col_scale=col_scale.astype(np.float32),
        shape=csr.shape,
        R=R, T=T, RC=int(RC), S_buf=int(S_buf), RMAX=int(RMAX),
        RQ=int(RQ), n_ranges=len(range_lo),
        n_range_rows=len(range_lo) * int(RC),
        n_scattered=int(n_scattered), n_groups=int(n_groups),
        n_direct=int(n_direct),
    )
    rep = plan_memory_report(plan)
    if not rep["fits"]:
        from of_spmm_tpu.utils.errors import CapacityError

        raise CapacityError(
            f"panel plan cannot fit device HBM: peak "
            f"{rep['peak_bytes'] / 2**30:.2f} GiB > budget "
            f"{rep['budget_bytes'] / 2**30:.2f} GiB; reduce seg_steps / "
            f"seg_stage_cap or use layout='ranges'.")
    return plan


def _emit_segment(tiles_meta, seg_tiles, steps_of, out_of, first_piece,
                  range_of, range_lo, R, G, S_buf, RMAX, RQ, RC,
                  m, direct_quota):  # noqa: C901
    """Lay out one segment's step stream.

    Prologue stages tile 0's scattered rows AND range 0's copies; per
    tile, compute steps co-stage the NEXT tile's scattered rows (parity
    ping-pong, one-step-behind waits) and issue the NEXT tile's
    direct-row copies (single X rows, DMAX/step); each range's steps
    carry the NEXT range's copies (minus the last step)."""
    # table: per-tile-piece padded col lists in consumption order
    table_base = {}
    base = 0
    take_list = []
    scale_list = []
    any_scale = any(tiles_meta[t][5] is not None for t in seg_tiles)
    for j, t in enumerate(seg_tiles):
        table_base[j] = base
        take_list.append(tiles_meta[t][0])
        if any_scale:
            tv = tiles_meta[t][5]
            scale_list.append(
                tv if tv is not None
                else np.ones(tiles_meta[t][0].shape[0], np.float32))
        base += tiles_meta[t][0].shape[0]
    stage_take = (np.concatenate(take_list).astype(np.int32)
                  if base else np.zeros(0, np.int32))
    stage_scale = (np.concatenate(scale_list).astype(np.float32)
                   if any_scale and base else
                   (np.zeros(0, np.float32) if any_scale else None))
    # the kernel's semaphore wait proxies reference table rows [0, SCQ);
    # keep the table at least that tall (pads gather row 0 — valid data)
    if stage_take.shape[0] < SCQ:
        pad_n = SCQ - stage_take.shape[0]
        stage_take = np.concatenate(
            [stage_take, np.zeros(pad_n, np.int32)])
        if stage_scale is not None:
            stage_scale = np.concatenate(
                [stage_scale, np.zeros(pad_n, np.float32)])

    first = seg_tiles[0]
    n_rq = RC // RQ
    d_first = tiles_meta[seg_tiles[0]][4].shape[0]
    prologue = max(steps_of[first], -(-n_rq // RMAX) + 1,
                   -(-staged_of_meta(tiles_meta, first) // (BMAX * SCQ)),
                   -(-d_first // max(direct_quota, 1)))
    n_steps = prologue + sum(steps_of[t] for t in seg_tiles)

    ctrl = np.zeros((n_steps, 1, 24), np.int32)
    rcopy = np.zeros((n_steps, 2, RMAX), np.int32)
    dsrc = np.zeros((n_steps, 1, DMAX), np.int32)
    mask_counts = np.zeros(n_steps * G, np.int32)
    mask_edges_list = []
    blk = np.zeros((n_steps, 1, G), np.int32)
    tile_of = np.zeros(n_steps, np.int32)

    def fill_scattered(j, step_lo, step_hi, parity):
        rows = tiles_meta[seg_tiles[j]][0].shape[0]
        if not rows:
            return
        src0 = table_base[j]
        nsteps = step_hi - step_lo
        n_big = rows // SCQ
        n_tail = (rows - n_big * SCQ) // TQ   # <= TMAX by construction
        per_big = -(-n_big // nsteps) if n_big else 0
        pos = 0  # rows staged
        bdone = 0
        tdone = False
        for s in range(step_lo, step_hi):
            b = max(min(per_big, n_big - bdone), 0)
            tl = 0
            if bdone + b == n_big and not tdone:
                tl = n_tail
                tdone = True
            ctrl[s, 0, 2] = src0 + pos
            ctrl[s, 0, 5] = parity * S_buf + pos
            ctrl[s, 0, 3] = b
            ctrl[s, 0, 7] = tl
            pos += b * SCQ + tl * TQ
            bdone += b
        assert pos == rows, (pos, rows, n_big, n_tail, nsteps)

    def fill_direct(j, step_lo, step_hi, parity):
        dc = tiles_meta[seg_tiles[j]][4]
        nd = dc.shape[0]
        if not nd:
            return
        base = parity * S_buf + tiles_meta[seg_tiles[j]][0].shape[0]
        nsteps = step_hi - step_lo
        per = -(-nd // nsteps)
        assert per <= DMAX, (per, nd, nsteps)
        pos = 0
        for s in range(step_lo, step_hi):
            k = max(min(per, nd - pos), 0)
            ctrl[s, 0, 16] = k
            ctrl[s, 0, 18] = base + pos
            if k:
                dsrc[s, 0, :k] = dc[pos:pos + k]
            pos += k
        assert pos == nd, (pos, nd, nsteps)

    def fill_range(rid, step_lo, step_hi, parity):
        lo = range_lo[rid]
        nsteps = max(step_hi - step_lo, 1)
        per = -(-n_rq // nsteps)
        pos = 0
        for s in range(step_lo, step_hi):
            cnt = max(min(per, n_rq - pos), 0)
            if cnt:
                src = lo + np.arange(pos, pos + cnt) * RQ
                src = np.minimum(src, max(m - RQ, 0))
                rcopy[s, 0, :cnt] = src
                rcopy[s, 1, :cnt] = (parity * RC
                                     + np.arange(pos, pos + cnt) * RQ)
            ctrl[s, 0, 4] = cnt
            pos += cnt

    # prologue: no compute
    ctrl[:prologue, 0, 0] = -1
    fill_scattered(0, 0, prologue, 0)
    fill_direct(0, 0, prologue, 0)
    fill_range(range_of[first], 0, prologue - 1, 0)

    seg_ranges = []
    for j, t in enumerate(seg_tiles):
        if not seg_ranges or range_of[t] != seg_ranges[-1][0]:
            seg_ranges.append([range_of[t], j, j])
        else:
            seg_ranges[-1][2] = j
    rpar_of = {rid: k % 2 for k, (rid, _, _) in enumerate(seg_ranges)}

    out_base = out_of[seg_tiles[0]]
    step = prologue
    step_at = []
    for j, t in enumerate(seg_tiles):
        step_at.append(step)
        ns = steps_of[t]
        take, edg, cnts, bo, dc, _tv = tiles_meta[t]
        rid = range_of[t]
        ctrl[step:step + ns, 0, 0] = out_of[t] - out_base
        n_real = int((cnts > 0).sum())
        ctrl[step:step + ns, 0, 1] = 1 + np.clip(
            n_real - np.arange(ns) * G, 0, G)
        ctrl[step, 0, 15] = 1
        ctrl[step, 0, 9] = 1 if first_piece[t] else 0
        ctrl[step, 0, 14] = take.shape[0] + dc.shape[0]
        ctrl[step:step + ns, 0, 13] = (j % 2) * S_buf
        ctrl[step:step + ns, 0, 11] = rpar_of[rid] * RC
        tile_of[step:step + ns] = out_of[t] - out_base
        mask_counts[step * G:(step + ns) * G] = cnts
        mask_edges_list.append(edg)
        blk[step:step + ns, 0, :] = bo.reshape(ns, G)
        if j + 1 < len(seg_tiles):
            fill_scattered(j + 1, step, step + ns, (j + 1) % 2)
            fill_direct(j + 1, step, step + ns, (j + 1) % 2)
        step += ns

    for k, (rid, j_lo, j_hi) in enumerate(seg_ranges):
        ctrl[step_at[j_lo], 0, 10] = 1
        if k + 1 < len(seg_ranges):
            nxt_rid = seg_ranges[k + 1][0]
            lo_s = step_at[j_lo]
            hi_s = step_at[j_hi] + steps_of[seg_tiles[j_hi]]
            fill_range(nxt_rid, lo_s, max(hi_s - 1, lo_s + 1),
                       rpar_of[nxt_rid])

    ctrl[1:, 0, 6] = ctrl[:-1, 0, 3]
    ctrl[1:, 0, 8] = ctrl[:-1, 0, 7]
    ctrl[1:, 0, 12] = ctrl[:-1, 0, 4]
    ctrl[1:, 0, 17] = ctrl[:-1, 0, 16]

    return PanelSegment(
        ctrl=ctrl,
        rcopy=rcopy,
        dsrc=dsrc,
        masks=None,
        mask_edges=(np.concatenate(mask_edges_list)
                    if mask_edges_list else np.zeros(0, np.uint16)),
        mask_counts=mask_counts,
        blk=blk,
        tile_of=tile_of,
        stage_take=stage_take,
        stage_scale=stage_scale,
        n_steps=n_steps,
        n_tiles=out_of[seg_tiles[-1]] - out_base + 1,
    )


def staged_of_meta(tiles_meta, t):
    return tiles_meta[t][0].shape[0]
