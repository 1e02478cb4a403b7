"""Fused-engine plan: per-tile staging schedule + hot-column cache.

The round-2 SpMM engine (ops/pallas/fused.py) runs staging row-DMAs and
one-hot MXU compute inside ONE Pallas kernel: while tile t's lanes are
gathered/scattered on the MXU, the DMA engines pull tile t+1's unique cold
columns from X in HBM into a double-buffered VMEM staging area. This plan
precomputes, host-side:

- the HOT TABLE: the columns referenced by the most tiles, kept
  VMEM-resident for the whole call (power-law hubs never re-staged) —
  chosen block-by-block (128 cols) while the expected lanes-per-tile-block
  stays dense enough to fill one-hot lane groups;
- per tile: the sorted unique COLD columns (the staging list) and the
  lane groups: 128 lanes sharing one 128-row window of [hot | staged],
  each lane carrying (window-local index, tile-local output row);
- the per-step control stream: staging chunk base/count, compute-tile id,
  buffer parities, first/last-step flags — so the kernel is a pure
  interpreter of static arrays (variable steps per tile, variable staged
  rows per tile).

Cost model on the measured v5e rates (tools/proto_fused.py,
tools/microbench_gather2.py): staged-row DMA ~346 Mrows/s on the DMA
engines, one-hot hi/lo gather 2109 Mrows/s + 128-wide packed scatter on
the MXU; the staging runs concurrently with compute, so
  time ~= max(staged_rows / dma_rate, lanes / mxu_rate)
versus round 1's serialized XLA-take staging + HBM round-trip.

Reference semantics unchanged: gather x segment-sum
(oneflow/user/ops/gather_op.cpp:51-82,
oneflow/user/kernels/unsorted_segment_sum_kernel_util.cu:52-151).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_spmm_tpu.sparse.formats import CSR
from of_spmm_tpu.utils.errors import CapacityError

_L = 128
DEFAULT_R = 128          # output rows per tile: the (R, T) scatter one-hot
#                          costs R*256 MACs per lane, so R=128 (the MXU
#                          minimum) wins on big graphs — measured 946 ms vs
#                          ~1.2 s at R=512 on ogbn-products (r2 session)
DEFAULT_T = 1024         # lanes per step (G = T/128 groups)
DEFAULT_HOT_BUDGET = 16384   # max hot rows (x 512B hi|lo = 8 MB VMEM)
DEFAULT_HOT_MIN_RUN = 32     # keep hot blocks while lanes/tile/block >= this
DEFAULT_SEG_STEPS = 8192     # steps per pallas_call segment (SMEM prefetch;
                             # also bounds the staged-table working set in
                             # chunks mode — 14 segments on ogbn-products)
DMAX_CAP = 640               # max staging DMAs per step (static unroll bound)
S_CAP = 32768                # max staged rows per (virtual) tile: bounds the
#                              f32 staging scratch (2*S_CAP*512B = 32 MB) and
#                              the hi/lo split extent; hub tiles split into
#                              virtual tiles revisiting the same output block


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedSegment:
    """One pallas_call worth of steps (contiguous tiles)."""

    ctrl: jnp.ndarray     # (steps, 1, 16) int32 per-step control words:
    #  [0] compute tile id (block index into this segment's output; -1 none)
    #  [1] first-step-of-tile flag (zero output + split staged hi/lo)
    #  [2] staging dst base row = parity*S_buf + chunk base (2-D stage)
    #  [3] staging count (rows to DMA this step; 0 = none)
    #  [4] (spare)
    #  [5] split source base row = read-parity*S_buf
    #  [6] prev-step staging count (rows to wait)
    #  [7] prev-step dst base row
    #  [8] staged rows of the tile being computed (split extent)
    #  [9] zero-output flag (first step of the first virtual tile only)
    scols: jnp.ndarray    # rows mode: (steps, 8, DMAX/8) int32 X rows to
    #                        stage; chunks mode: (steps, 2, CMAX) int32
    #                        [src_blk | dst_blk] 128-row block copies from
    #                        the tier-major staged table (dst parity folded)
    lidx: jnp.ndarray     # (steps*G, 128) int32 window-local gather idx,
    #                        OR multi-hot masks (steps*G, 4, 128) int32
    #                        (bit j of word w, lane l = select window row
    #                        32w+j for lane l) when plan.multihot
    lrow: jnp.ndarray     # (steps*G, 128) int32 tile-local output row (R=pad)
    blk: jnp.ndarray      # (steps, 1, G) int32 window block (hot-table-
    #                        relative; >= H/128 means staged buffer)
    tile_of: jnp.ndarray  # (steps,) int32 out block index (scalar prefetch)
    val_hi: Optional[jnp.ndarray]  # (steps*G, 128) bf16 or None (rank-1)
    val_lo: Optional[jnp.ndarray]
    # chunks mode: tier-local take indices for the XLA staging phase
    # (128-padded per run) + python tier boundaries
    stage_take: Optional[jnp.ndarray] = None        # (S_table,) int32
    stage_tier_ptr: Optional[tuple] = None          # (n_tiers+1,) python
    n_steps: int = 0
    n_tiles: int = 0

    def tree_flatten(self):
        return ((self.ctrl, self.scols, self.lidx, self.lrow, self.blk,
                 self.tile_of, self.val_hi, self.val_lo, self.stage_take),
                (self.stage_tier_ptr, self.n_steps, self.n_tiles))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (ctrl, scols, lidx, lrow, blk, tile_of, val_hi, val_lo,
         stage_take) = children
        stage_tier_ptr, n_steps, n_tiles = aux
        return cls(ctrl=ctrl, scols=scols, lidx=lidx, lrow=lrow, blk=blk,
                   tile_of=tile_of, val_hi=val_hi, val_lo=val_lo,
                   stage_take=stage_take, stage_tier_ptr=stage_tier_ptr,
                   n_steps=n_steps, n_tiles=n_tiles)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FusedPlan:
    segments: Tuple[FusedSegment, ...]
    hot_ids: jnp.ndarray          # (H,) int32 global col ids of the hot table
    row_scale: Optional[jnp.ndarray]  # (n_rows,) f32 rank-1 row factor
    col_scale: Optional[jnp.ndarray]  # (n_cols,) f32 rank-1 col factor
    shape: Tuple[int, int]
    R: int
    T: int
    multihot: bool                # lanes are (row, block) pairs with bitmasks
    staging: str                  # "rows" (in-kernel row DMAs from X) or
    #                               "chunks" (XLA tier-major staged table +
    #                               128-row block DMAs)
    stage_tier: int               # tier size for the chunks-mode XLA takes
    S_buf: int                    # staging buffer rows (per parity)
    DMAX: int                     # max staging rows per step
    n_staged: int                 # total cold staged rows (DMA volume)
    n_lanes: int                  # total lanes incl. padding
    window: bool = False          # steps are dst-window-homogeneous: the
    #                               scatter one-hot is (128, T), not (R, T)
    cq: int = 32                  # chunk quantum (rows per staging DMA +
    #                               run alignment) in chunks mode

    def __getattr__(self, name):
        # plans pickled before the ``window``/``cq`` fields existed
        if name == "window":
            return False
        if name == "cq":
            return 32
        raise AttributeError(name)

    def tree_flatten(self):
        children = (self.segments, self.hot_ids, self.row_scale,
                    self.col_scale)
        aux = (self.shape, self.R, self.T, self.multihot, self.staging,
               self.stage_tier, self.S_buf, self.DMAX, self.n_staged,
               self.n_lanes, self.window, self.cq)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        segments, hot_ids, row_scale, col_scale = children
        (shape, R, T, multihot, staging, stage_tier, S_buf, DMAX,
         n_staged, n_lanes, window, cq) = aux
        return cls(segments=tuple(segments), hot_ids=hot_ids,
                   row_scale=row_scale, col_scale=col_scale, shape=shape,
                   R=R, T=T, multihot=multihot, staging=staging,
                   stage_tier=stage_tier, S_buf=S_buf, DMAX=DMAX,
                   n_staged=n_staged, n_lanes=n_lanes, window=window,
                   cq=cq)

    @property
    def n_hot(self) -> int:
        return int(self.hot_ids.shape[0])

    @property
    def rank1(self) -> bool:
        return self.row_scale is not None

    def padding_efficiency(self, true_nnz: int) -> float:
        return float(true_nnz) / max(self.n_lanes, 1)


def place_plan(plan: FusedPlan) -> FusedPlan:
    """Commit every plan leaf to the default device in one transfer."""
    return jax.device_put(plan)


# Per-chip HBM for the plan-time memory budget. The reference's compiler
# plans register/memory reuse explicitly at Plan build
# (oneflow/core/job/compiler.cpp:107 IntraJobMemSharingUtil, plan memory
# log at core/framework/nn_graph.cpp:302); the TPU analog is this
# host-side liveness model: with segments serialized by an optimization
# barrier, peak HBM = plan arrays + X + outputs + ~1.5x the largest
# per-segment staged table (1.5: XLA may overlap freeing table k with
# allocating k+1's smaller pieces).
_DEFAULT_HBM = 16 << 30       # v5e / v5 lite: 16 GB
_TABLE_HEADROOM = 1.5
_BUDGET_FRACTION = 0.80       # leave room for XLA temps + fragmentation


def device_hbm_bytes() -> int:
    """Detected per-chip HBM bytes (OFS_HBM_BYTES overrides; CPU hosts
    building plans for a TPU target get the v5e default)."""
    from of_spmm_tpu.utils.config import FLAGS

    flag = int(FLAGS.get("OFS_HBM_BYTES"))
    if flag:
        return flag
    try:
        dev = jax.devices()[0]
        if dev.platform != "cpu":
            stats = dev.memory_stats() or {}
            lim = int(stats.get("bytes_limit", 0))
            if lim:
                return lim
    except Exception:
        pass
    return _DEFAULT_HBM


def _nbytes(a) -> int:
    return 0 if a is None else int(np.asarray(a).size) * a.dtype.itemsize


def plan_memory_report(plan: FusedPlan, d: int = 128,
                       hbm_limit: Optional[int] = None) -> dict:
    """Exact peak-HBM model for executing ``plan`` on a ``d``-wide X.

    Components (bytes): the device-resident plan arrays, X (input + the
    f32 128-wide slab), the hot table, 2x the output (segment pieces +
    the final concat), and — chunks mode — ``_TABLE_HEADROOM`` x the
    largest per-segment staged table (segments are serialized by an
    optimization barrier, so tables don't stack). ``fits`` compares
    against ``_BUDGET_FRACTION`` of the HBM limit."""
    hbm = hbm_limit or device_hbm_bytes()
    n, m = plan.shape
    plan_b = _nbytes(plan.hot_ids) + _nbytes(plan.row_scale) + \
        _nbytes(plan.col_scale)
    max_table = 0
    for seg in plan.segments:
        for leaf in (seg.ctrl, seg.scols, seg.lidx, seg.lrow, seg.blk,
                     seg.tile_of, seg.val_hi, seg.val_lo, seg.stage_take):
            plan_b += _nbytes(leaf)
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


def _lane_groups_multihot(win_pos, rows, R):
    """One lane per (output row, 128-row window block): win_pos-sorted
    entries dedup to lanes carrying 128-bit selection masks, so a row's
    repeats within a block ride ONE gather matmul row (the one-hot row
    becomes the row's binary pattern in the block — still an exact
    selection-sum for rank-1-folded values). Returns
    (masks (n_grp,4,128) int32, lrow (n_grp,128), blk_of (n_grp,))."""
    m = win_pos.shape[0]
    if m == 0:
        return (np.zeros((0, 4, _L), np.int32),
                np.zeros((0, _L), np.int32), np.zeros((0,), np.int32))
    blk = win_pos // _L
    bit = win_pos - blk * _L
    # lane key = (block, row); entries sorted by block already (win_pos
    # sorted); sort within block by row to group pairs
    key = blk * np.int64(2 ** 32) + rows
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    bit_s = bit[order]
    boundary = np.empty(m, dtype=bool)
    boundary[0] = True
    boundary[1:] = key_s[1:] != key_s[:-1]
    lane_of = np.cumsum(boundary) - 1
    n_lanes = int(lane_of[-1]) + 1
    lane_blk = blk[order][boundary]
    lane_row = rows[order][boundary]
    words = np.zeros((n_lanes, 4), np.uint32)
    np.bitwise_or.at(
        words, (lane_of, bit_s // 32),
        (np.uint32(1) << (bit_s % 32).astype(np.uint32)))
    # group lanes per block into 128-lane groups (pad: mask 0, row R)
    bnd = np.nonzero(np.diff(lane_blk))[0] + 1
    starts = np.concatenate([[0], bnd])
    ends = np.concatenate([bnd, [n_lanes]])
    lens = ends - starts
    plens = -(-lens // _L) * _L
    out_off = np.zeros(lens.shape[0] + 1, dtype=np.int64)
    np.cumsum(plens, out=out_off[1:])
    total = int(out_off[-1])
    runid = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    dst = out_off[runid] + (np.arange(n_lanes, dtype=np.int64)
                            - starts[runid])
    masks = np.zeros((total, 4), np.uint32)
    lrow = np.full(total, R, dtype=np.int32)
    masks[dst] = words
    lrow[dst] = lane_row.astype(np.int32)
    blk_of = np.repeat(lane_blk[starts].astype(np.int32), plens // _L)
    # (n_grp, 4, 128): word-major, lanes along the lane dim
    masks = masks.reshape(-1, _L, 4).transpose(0, 2, 1).astype(np.int32)
    return masks, lrow.reshape(-1, _L), blk_of


def _lane_groups(win_pos, rows, vals, R):
    """Cut (sorted win_pos) lanes at 128-row window boundaries; pad runs to
    full 128-lane groups. Returns (lidx, lrow, val, blk_of) per group."""
    m = win_pos.shape[0]
    if m == 0:
        return (np.zeros((0, _L), np.int32), np.zeros((0, _L), np.int32),
                np.zeros((0, _L), np.float32), np.zeros((0,), np.int32))
    blk = win_pos // _L
    bnd = np.nonzero(np.diff(blk))[0] + 1
    starts = np.concatenate([[0], bnd])
    ends = np.concatenate([bnd, [m]])
    lens = ends - starts
    plens = -(-lens // _L) * _L
    out_off = np.zeros(lens.shape[0] + 1, dtype=np.int64)
    np.cumsum(plens, out=out_off[1:])
    total = int(out_off[-1])
    runid = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    dst = out_off[runid] + (np.arange(m, dtype=np.int64) - starts[runid])

    lidx = np.zeros(total, dtype=np.int32)
    lrow = np.full(total, R, dtype=np.int32)  # R = padding sentinel
    val = np.zeros(total, dtype=np.float32)
    lidx[dst] = (win_pos - blk * _L).astype(np.int32)
    lrow[dst] = rows.astype(np.int32)
    if vals is not None:
        val[dst] = vals
    blk_of = np.repeat(blk[starts].astype(np.int32), plens // _L)
    return (lidx.reshape(-1, _L), lrow.reshape(-1, _L),
            val.reshape(-1, _L), blk_of)


def _build_groups(wp_p, rr_p, vv_p, use_rank1, R, G, window):
    """Lane groups for one (virtual) tile, padded to a G multiple.

    ``window=False``: groups in source-block order; dst rows span the
    whole R-row tile (scatter one-hot is (R, T)).
    ``window=True``: lanes are partitioned by DESTINATION 128-row window
    first (dw = row // 128) and each partition is padded to a G multiple,
    so every step's G groups share one dst window — the scatter one-hot
    shrinks to (128, T), a 4x MAC cut at R=512. Returns a 5th per-group
    array ``dwg`` (dst window of the group; 0 when window=False)."""
    parts = []
    if window:
        dwp = rr_p // _L
        splits = [(dw, dwp == dw) for dw in range(-(-R // _L))]
    else:
        splits = [(0, slice(None))]
    for dw, sel in splits:
        if window and not np.any(sel):
            continue
        rloc = (rr_p[sel] - dw * _L) if window else rr_p
        sent = _L if window else R
        if use_rank1:
            li, lr, bo = _lane_groups_multihot(wp_p[sel], rloc, sent)
            lv = np.zeros((li.shape[0], _L), np.float32)
        else:
            li, lr, lv, bo = _lane_groups(wp_p[sel], rloc,
                                          vv_p[sel] if vv_p is not None
                                          else None, sent)
        pad_g = -li.shape[0] % G
        if pad_g:
            li = np.concatenate(
                [li, np.zeros((pad_g,) + li.shape[1:], np.int32)])
            lr = np.concatenate([lr, np.full((pad_g, _L), sent, np.int32)])
            lv = np.concatenate([lv, np.zeros((pad_g, _L), np.float32)])
            bo = np.concatenate([bo, np.zeros(pad_g, np.int32)])
        parts.append((li, lr, lv, bo,
                      np.full(li.shape[0], dw, np.int32)))
    if not parts or sum(p[0].shape[0] for p in parts) == 0:
        shp = (G, 4, _L) if use_rank1 else (G, _L)
        return (np.zeros(shp, np.int32),
                np.full((G, _L), _L if window else R, np.int32),
                np.zeros((G, _L), np.float32), np.zeros(G, np.int32),
                np.zeros(G, np.int32))
    return tuple(np.concatenate([p[k] for p in parts]) for k in range(5))


_CQ = 32  # default chunk quantum: run alignment + copy granularity (bf16
#           tile height x2; thin cold runs would pad ~2x at 128 on
#           power-law graphs, ~15% at 32). Fat-tile plans can raise it
#           (cq=128 quarters the scalar-core DMA issue count) together
#           with a larger stage_tier to keep run-alignment padding low.


def _aligned_cold_positions(uniq: np.ndarray, stage_tier: int,
                            cq: int = _CQ) -> np.ndarray:
    """Positions of sorted cold columns in the tile's RUN-ALIGNED staged
    space: each per-tier run starts on a cq-row boundary (chunks mode —
    the staged table and the copy destinations stay block-aligned)."""
    if uniq.shape[0] == 0:
        return np.zeros(0, np.int64)
    tiers = uniq // stage_tier
    bnd = np.nonzero(np.diff(tiers))[0] + 1
    starts = np.concatenate([[0], bnd])
    lens = np.diff(np.concatenate([starts, [uniq.shape[0]]]))
    alens = -(-lens // cq) * cq
    base = np.zeros(lens.shape[0] + 1, np.int64)
    np.cumsum(alens, out=base[1:])
    runid = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    return base[runid] + (np.arange(uniq.shape[0], dtype=np.int64)
                          - starts[runid])


def _piece_take_entries(uniq: np.ndarray, stage_tier: int,
                        lo: int, hi: int, cq: int = _CQ):
    """Take entries for aligned-space rows [lo, hi) of a tile: per
    cq-block tier ids (n_blocks,) and tier-LOCAL indices (n_blocks*cq,)
    (run pads repeat the run's first index)."""
    if uniq.shape[0] == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    tiers = uniq // stage_tier
    bnd = np.nonzero(np.diff(tiers))[0] + 1
    starts = np.concatenate([[0], bnd])
    lens = np.diff(np.concatenate([starts, [uniq.shape[0]]]))
    alens = -(-lens // cq) * cq
    base = np.zeros(lens.shape[0] + 1, np.int64)
    np.cumsum(alens, out=base[1:])
    total = int(base[-1])
    runid = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    dst = base[runid] + (np.arange(uniq.shape[0], dtype=np.int64)
                         - starts[runid])
    local = (uniq - tiers * stage_tier).astype(np.int32)
    # fill the aligned space: pads repeat the run head
    head = local[starts]
    filled = np.repeat(head, alens)
    filled[dst] = local
    tier_of_row = np.repeat(tiers[starts], alens)
    lo_c, hi_c = lo, min(hi, total)
    if lo_c >= hi_c:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    take_idx = filled[lo_c:hi_c]
    take_tier = tier_of_row[lo_c:hi_c:cq]  # per-block (runs are aligned)
    # pad the piece to a 128-row multiple (repeat the first block) so the
    # kernel's 128-row one-hot windows never read unwritten scratch
    pad_rows = -take_idx.shape[0] % _L
    if pad_rows:
        nb = pad_rows // cq
        take_idx = np.concatenate([take_idx, np.tile(take_idx[:cq], nb)])
        take_tier = np.concatenate(
            [take_tier, np.repeat(take_tier[:1], nb)])
    return take_tier.astype(np.int64), take_idx


def choose_hot(csr: CSR, R: int, hot_budget: int, min_run: int,
               touch: Optional[np.ndarray] = None) -> np.ndarray:
    """Pick hot columns: sort by tile-touch count, keep 128-blocks while the
    average lanes-per-tile-per-block stays >= min_run (dense one-hot runs).

    Returns global col ids (hot rank order). The tile-touch count (how many
    R-row tiles reference the column) is exactly the staging volume the
    column would otherwise cost; pass it precomputed (e.g. a bincount of
    the native pass-1 per-tile unique lists) to skip the 10^8-key unique.
    """
    n, m = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols = np.asarray(csr.cols, dtype=np.int64)
    n_tiles = max(-(-n // R), 1)
    if touch is None:
        # tile-touch count per column: unique (tile, col) pairs
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        tiles = rows // R
        key = tiles * m + cols
        uniq_key = np.unique(key)
        touch = np.bincount((uniq_key % m).astype(np.int64), minlength=m)
    # in-reference count per column (lanes a hot block would serve)
    refs = np.bincount(cols, minlength=m)
    order = np.argsort(-touch, kind="stable")
    max_hot = min(hot_budget, m) // _L * _L
    if max_hot == 0:
        return np.zeros(0, np.int64)
    cand = order[:max_hot]
    # keep whole 128-blocks while expected lanes/tile/block >= min_run
    keep = 0
    for b in range(max_hot // _L):
        blk_refs = refs[cand[b * _L:(b + 1) * _L]].sum()
        if blk_refs / n_tiles < min_run:
            break
        keep = b + 1
    # SORT the kept set by node id: on cluster-contiguous orderings,
    # hubs of the same community then share a hot 128-block, so a tile
    # referencing them touches ONE (tile, hot-block) group instead of
    # one per rank-ordered block (rank order interleaves communities —
    # measured 0.74M thin hot groups on ogbn-products at 16K hot cols)
    return np.sort(cand[: keep * _L])


def coalesce_duplicates(csr: CSR) -> CSR:
    """Merge duplicate (row, col) entries by summing values.

    Duplicates cannot ride the multi-hot bitmask lanes (a bit has no
    multiplicity — bitwise_or silently drops the second copy). The summed
    value then no longer factors as r_i*c_j, so rank-1 folding turns
    itself off and explicit-value lanes carry the merged weight."""
    n, m = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols_all = np.asarray(csr.cols, dtype=np.int64)
    vals_all = np.asarray(csr.vals, dtype=np.float32)
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    key = rows_all * m + cols_all
    if key.shape[0] and bool(np.all(key[1:] >= key[:-1])):
        vals_s, ks = vals_all, key  # row-sorted cols: no sort needed
    elif key.shape[0]:
        order = np.argsort(key, kind="stable")
        ks = key[order]
        vals_s = vals_all[order]
    else:
        vals_s, ks = vals_all, key
    if not (ks.shape[0] and int((ks[1:] == ks[:-1]).sum())):
        return csr
    keep = np.concatenate([[True], ks[1:] != ks[:-1]])
    seg_id = np.cumsum(keep) - 1
    vals_c = np.zeros(int(seg_id[-1]) + 1, np.float32)
    np.add.at(vals_c, seg_id, vals_s)
    ku = ks[keep]
    rows_u = ku // m
    cols_u = ku - rows_u * m
    indptr2 = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows_u, minlength=n), out=indptr2[1:])
    return CSR(indptr=indptr2, cols=cols_u.astype(np.int32),
               vals=vals_c, shape=csr.shape)


def factor_rank1(csr: CSR, rtol: float = 1e-6):
    """vals[e] = r[row[e]] * c[col[e]] detection — shared with expansion2
    (the framework's normalized adjacencies are exactly this form)."""
    from of_spmm_tpu.sparse.expansion2 import factor_rank1 as _f

    return _f(csr, rtol=rtol)


_BIG_T = 1024            # lanes/step for big graphs (T=None adaptive pick).
#                          MEASURED r3: T=4096 LOSES on ogbn-products
#                          (1046 ms vs 965 at T=1024) — the G>8 rolled
#                          group loop (fori + dynamic per-group stream
#                          reads; static unroll never finishes Mosaic
#                          compile) costs ~2x per lane, eating the 4x
#                          per-step-floor amortization plus 22% G-multiple
#                          lane padding. Big-T stays opt-in via OFS_FUSED_T
#                          until the rolled-loop cost is fixed.
_BIG_T_NNZ = 8_000_000


def build_fused_plan(
    csr: CSR,
    R: int = DEFAULT_R,
    T: Optional[int] = None,
    hot_budget: int = DEFAULT_HOT_BUDGET,
    hot_min_run: int = DEFAULT_HOT_MIN_RUN,
    seg_steps: int = DEFAULT_SEG_STEPS,
    rank1: Optional[bool] = None,
    dma_wave: int = 64,
    s_cap: int = S_CAP,
    staging: str = "chunks",
    stage_tier: int = 32768,
    window: bool = False,
    cq: int = _CQ,
    hbm_limit: Optional[int] = None,
) -> FusedPlan:
    """Host-side fused-engine plan build (numpy; native fast path TBD).

    ``staging="rows"``: the kernel row-DMAs each staged column straight
    from X (per-row scalar-core cost). ``staging="chunks"``: an XLA phase
    gathers the staged rows per 32K-row tier (the measured take fast
    path) into a tier-major packed hi/lo table, and the kernel copies
    128-row BLOCKS from it — two orders of magnitude fewer scalar DMA
    ops, at the price of one serialized take pass per segment."""
    if staging not in ("rows", "chunks"):
        raise ValueError(f"staging must be rows|chunks, got {staging!r}")
    if T is None:
        from of_spmm_tpu.utils.config import FLAGS

        T = int(FLAGS.get("OFS_FUSED_T")) or (
            _BIG_T if csr.nnz >= _BIG_T_NNZ else DEFAULT_T)
    n, m = csr.shape
    G = T // _L
    n_tiles = max(-(-n // R), 1)

    csr = coalesce_duplicates(csr)
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols_all = np.asarray(csr.cols, dtype=np.int64)
    vals_all = np.asarray(csr.vals, dtype=np.float32)

    factors = factor_rank1(csr) if rank1 in (None, True) else None
    if rank1 is True and factors is None:
        raise ValueError("rank1=True but values do not factor as r_i*c_j")
    use_rank1 = factors is not None
    row_scale = col_scale = None
    if use_rank1:
        row_scale, col_scale = factors

    # per-tile column sort + unique runs in the native planner when
    # available (csrc/planner.cpp expansion_pass1, OpenMP over tiles);
    # numpy per-tile fallback otherwise. Runs BEFORE hot selection so the
    # tile-touch counts come from its unique lists (no 10^8-key unique).
    from of_spmm_tpu import native

    nat = native.expansion_pass1(indptr, cols_all,
                                 vals_all.astype(np.float32), R)
    touch = (np.bincount(nat[3][:nat[4][-1]].astype(np.int64), minlength=m)
             if nat is not None else None)
    hot_ids = choose_hot(csr, R, hot_budget, hot_min_run, touch=touch)
    H = hot_ids.shape[0]
    hot_rank = np.full(m, -1, dtype=np.int64)
    hot_rank[hot_ids] = np.arange(H, dtype=np.int64)
    n_hot_blocks = H // _L

    tiles_meta = []   # (stage_cols, lidx, lrow, val, blk_of) per VIRTUAL tile
    out_of = []       # output block (real tile) per meta entry
    first_piece = []  # True on the first virtual tile of each output block
    n_staged = 0
    n_lanes = 0
    starts = indptr[np.minimum(np.arange(n_tiles + 1) * R, n)]
    for t in range(n_tiles):
        r0, r1 = t * R, min((t + 1) * R, n)
        if nat is not None:
            lane_inv, lane_row, lane_val, uniq_all, uniq_ptr = nat
            lo, hi = starts[t], starts[t + 1]
            uniq_t = uniq_all[uniq_ptr[t]:uniq_ptr[t + 1]].astype(np.int64)
            inv_t = lane_inv[lo:hi].astype(np.int64)
            r = lane_row[lo:hi].astype(np.int64)
            v = None if use_rank1 else lane_val[lo:hi]
            hr_u = hot_rank[uniq_t]
            cold_mask = hr_u < 0
            uniq = uniq_t[cold_mask]
            # window position per unique entry: hot rank or H + cold pos
            if staging == "chunks":
                cpos = _aligned_cold_positions(uniq, stage_tier, cq)
                upos = np.full(uniq_t.shape[0], 0, np.int64)
                upos[cold_mask] = H + cpos
                upos[~cold_mask] = hr_u[~cold_mask]
            else:
                cold_pos = np.cumsum(cold_mask) - 1
                upos = np.where(cold_mask, H + cold_pos, hr_u)
            win_pos = upos[inv_t]
            order = np.argsort(win_pos, kind="stable")
        else:
            lo, hi = indptr[r0], indptr[r1]
            c = cols_all[lo:hi]
            v = None if use_rank1 else vals_all[lo:hi]
            r = np.repeat(np.arange(r1 - r0, dtype=np.int64),
                          np.diff(indptr[r0:r1 + 1]))
            hr = hot_rank[c]
            is_hot = hr >= 0
            # window position: hot lanes index the hot table head; cold
            # lanes index [H + staged_pos] in the unified window space
            c_cold = c[~is_hot]
            uniq, inv = np.unique(c_cold, return_inverse=True)
            win_pos = np.empty(c.shape[0], dtype=np.int64)
            win_pos[is_hot] = hr[is_hot]
            if staging == "chunks":
                cpos = _aligned_cold_positions(uniq, stage_tier, cq)
                win_pos[~is_hot] = H + cpos[inv]
            else:
                win_pos[~is_hot] = H + inv
            order = np.argsort(win_pos, kind="stable")
        wp = win_pos[order]
        rr = r[order]
        vv = None if use_rank1 else v[order]
        # split hub tiles whose staged list exceeds S_CAP into virtual
        # tiles (same output block, separate staging rounds): cut the
        # cold lanes at S_CAP staged boundaries (lanes are win_pos-sorted,
        # so each piece's lanes are contiguous)
        n_pieces = max(1, -(-max(uniq.shape[0], 1) // s_cap))
        for piece in range(n_pieces):
            if n_pieces == 1:
                wp_p, rr_p, vv_p, uniq_p = wp, rr, vv, uniq
            else:
                lo_pos = H + piece * s_cap
                hi_pos = H + (piece + 1) * s_cap
                if piece == 0:
                    sel = wp < hi_pos  # includes all hot lanes
                else:
                    sel = (wp >= lo_pos) & (wp < hi_pos)
                wp_p = wp[sel].copy()
                wp_p[wp_p >= H] -= piece * s_cap
                rr_p = rr[sel]
                vv_p = None if use_rank1 else vv[sel]
                uniq_p = uniq[piece * s_cap:(piece + 1) * s_cap]
            li, lr, lv, bo, dwg = _build_groups(
                wp_p, rr_p, vv_p, use_rank1, R, G, window)
            if staging == "chunks":
                # staged entries live in the run-ALIGNED space: emit the
                # padded tier-local take indices for this piece instead
                # of raw column ids (pads repeat the run head — valid
                # data, never selected by the one-hot masks)
                take_t, take_idx = _piece_take_entries(
                    uniq, stage_tier, piece * s_cap, (piece + 1) * s_cap,
                    cq)
                uniq_p = (take_t, take_idx)  # per-128-block tier + idx
                staged_rows = take_idx.shape[0]
            else:
                # pad the staged list to a 128 multiple (col 0 repeats)
                # so every one-hot window row is freshly DMA'd —
                # unwritten scratch rows are never read (NaN x 0 is NaN)
                pad_s = -uniq_p.shape[0] % _L
                if pad_s:
                    uniq_p = np.concatenate(
                        [uniq_p, np.zeros(pad_s, uniq_p.dtype)])
                staged_rows = uniq_p.shape[0]
            tiles_meta.append((uniq_p, li, lr, lv, bo, dwg))
            out_of.append(t)
            first_piece.append(piece == 0)
            n_staged += staged_rows
            n_lanes += li.shape[0] * _L

    # --- staging buffer size + per-step DMA quota -------------------------
    # steps per tile: enough compute steps for the lanes AND enough to
    # stage the NEXT tile under the static-unroll cap (power-law tiles
    # with few lanes but a heavy successor get padded idle steps)
    n_meta = len(tiles_meta)

    def staged_of(t):
        u = tiles_meta[t][0]
        return u[1].shape[0] if isinstance(u, tuple) else u.shape[0]

    # chunks mode moves cq rows per DMA: budget in DMA ops. The cap
    # scales with T (r2 addendum: a fixed 32-chunk/step budget kept
    # big-T steps staging-bound, padding lanes ~4x — the per-step DMA
    # budget must grow with the per-step lane budget for steps to stay
    # compute-sized).
    dma_quantum = cq if staging == "chunks" else 1
    dma_cap = (32 * max(T // 1024, 1)) if staging == "chunks" else DMAX_CAP
    steps_of = []
    for t in range(n_meta):
        need_c = max(tiles_meta[t][1].shape[0] // G, 1)
        nxt = staged_of(t + 1) if t + 1 < n_meta else 0
        need_s = -(-(nxt // dma_quantum) // dma_cap)
        steps_of.append(max(need_c, need_s, 1))
    # pad lane arrays of tiles whose step count grew
    for t in range(n_meta):
        uniq, li, lr, lv, bo, dwg = tiles_meta[t]
        want_g = steps_of[t] * G
        pad_g = want_g - li.shape[0]
        if pad_g > 0:
            sent = _L if window else R
            li = np.concatenate(
                [li, np.zeros((pad_g,) + li.shape[1:], np.int32)])
            lr = np.concatenate([lr, np.full((pad_g, _L), sent, np.int32)])
            lv = np.concatenate([lv, np.zeros((pad_g, _L), np.float32)])
            bo = np.concatenate([bo, np.zeros(pad_g, np.int32)])
            dwg = np.concatenate([dwg, np.zeros(pad_g, np.int32)])
            tiles_meta[t] = (uniq, li, lr, lv, bo, dwg)
            n_lanes += pad_g * _L
    S_buf = max(max(staged_of(t) for t in range(n_meta)), _L)
    assert S_buf <= s_cap + _L, (S_buf, s_cap)
    S_buf += -S_buf % 2048 if S_buf > 2048 else -S_buf % _L
    # (2048 = the kernel's hi/lo split chunk; keep chunks in bounds)
    # DMAX: tile t+1's staged rows spread over tile t's steps (tile 0 over
    # a prologue sized like its own step count)
    DMAX = dma_wave if staging == "rows" else 1
    for t in range(n_meta):
        # a tile is staged over the PREVIOUS tile's steps, except when it
        # opens a segment (its own prologue, length steps_of[t]) — any
        # tile can open a segment, so budget with the minimum of both
        budget_steps = min(steps_of[t - 1], steps_of[t]) if t \
            else steps_of[0]
        need = -(-(staged_of(t) // dma_quantum) // budget_steps)
        if staging == "rows":
            need += -need % dma_wave  # per-step counts round to waves
        DMAX = max(DMAX, need)
    if staging == "rows":
        DMAX += -DMAX % dma_wave

    # --- per-segment staged-table cap from the HBM budget ----------------
    # Plan-time memory planning (the reference does this in its compiler:
    # oneflow/core/job/compiler.cpp:107): with segments serialized at run
    # time, peak HBM ~= fixed costs (plan arrays + X + outputs + hot) +
    # _TABLE_HEADROOM x the largest per-segment staged table. Cap the
    # table so the peak fits, instead of discovering the overflow as an
    # XLA allocation failure mid-benchmark (the round-2 failure mode).
    stage_cap_rows = None
    if staging == "chunks":
        hbm = hbm_limit or device_hbm_bytes()
        n_groups = n_lanes // _L
        fixed = (
            n_groups * ((4 * _L * 4) if use_rank1 else (_L * 4))  # lidx
            + n_groups * _L * 4                                   # lrow
            + (0 if use_rank1 else n_groups * _L * 4)             # val hi/lo
            + sum(steps_of) * 4 * (16 + 2 * DMAX + G + 1)  # ctrl/scols/...
            + n_staged * 4                                        # take idx
            + m * _L * 4 * 2                                      # x + slab
            + 2 * n_tiles * R * _L * 4                            # outputs
            + H * 512                                             # hot
        )
        avail = int(_BUDGET_FRACTION * hbm) - fixed
        stage_cap_rows = int(avail / (512 * _TABLE_HEADROOM))
        # output-tile piece groups cannot be cut mid-group: the cap can
        # never be effective below the largest single group's staged rows
        group_rows = {}
        for t in range(n_meta):
            key = out_of[t]
            group_rows[key] = group_rows.get(key, 0) + staged_of(t)
        min_cap = max(group_rows.values(), default=_L)
        stage_cap_rows = max(stage_cap_rows, min_cap)

    # --- emit segments (cut only at real-tile boundaries) -----------------
    def emit_all(cap):
        segments = []
        seg_start = 0
        while seg_start < n_meta:
            seg_tiles = [seg_start]
            total = steps_of[seg_start] * 2  # prologue + t0
            stage_sum = staged_of(seg_start)
            while seg_tiles[-1] + 1 < n_meta:
                nxt = seg_tiles[-1] + 1
                fits_next = (
                    total + steps_of[nxt] <= seg_steps
                    and (cap is None
                         or stage_sum + staged_of(nxt) <= cap))
                if not (fits_next or not first_piece[nxt]):
                    break
                seg_tiles.append(nxt)
                total += steps_of[nxt]
                stage_sum += staged_of(nxt)
            segments.append(
                _emit_segment(tiles_meta, seg_tiles, steps_of, out_of,
                              first_piece, R, T, G, S_buf, DMAX, use_rank1,
                              staging=staging, stage_tier=stage_tier,
                              window=window, cq=cq))
            seg_start = seg_tiles[-1] + 1
        return segments

    # leaves stay NUMPY (lazy device transfer; a remotely-tunneled chip
    # would otherwise round-trip every array at build time — see
    # sparse/formats.py). Use place_plan() to commit to the device once.
    def mk_plan(segments):
        return FusedPlan(
            segments=tuple(segments),
            hot_ids=hot_ids.astype(np.int32),
            row_scale=(row_scale.astype(np.float32) if use_rank1 else None),
            col_scale=(col_scale.astype(np.float32) if use_rank1 else None),
            shape=csr.shape,
            R=R, T=T, multihot=use_rank1, staging=staging,
            stage_tier=stage_tier, S_buf=int(S_buf), DMAX=int(DMAX),
            n_staged=int(n_staged), n_lanes=int(n_lanes), window=window,
            cq=cq,
        )

    plan = mk_plan(emit_all(stage_cap_rows))
    if staging != "chunks":
        return plan
    # validate against the exact model; splitting adds per-segment
    # prologue steps the pre-estimate can't see, so shrink the cap by the
    # measured overshoot and re-emit (cheap) until it fits or the cap
    # hits the largest un-cuttable tile group — then reject loudly
    # instead of OOMing at run time (the round-2 failure).
    for _ in range(4):
        rep = plan_memory_report(plan, d=_L, hbm_limit=hbm_limit)
        if rep["fits"]:
            return plan
        table_budget = rep["budget_bytes"] - (
            rep["peak_bytes"] - int(_TABLE_HEADROOM * rep["max_table_bytes"]))
        new_cap = int(table_budget / (512 * _TABLE_HEADROOM))
        if new_cap >= stage_cap_rows:
            new_cap = stage_cap_rows // 2
        if table_budget <= 0 or new_cap < min_cap:
            break
        stage_cap_rows = new_cap
        plan = mk_plan(emit_all(stage_cap_rows))
    rep = plan_memory_report(plan, d=_L, hbm_limit=hbm_limit)
    if rep["fits"]:
        return plan
    comp = ", ".join(
        f"{k[:-6]}={rep[k] / 2**30:.2f}GiB"
        for k in ("plan_bytes", "x_bytes", "out_bytes",
                  "hot_bytes", "max_table_bytes"))
    raise CapacityError(
        f"fused plan cannot fit device HBM: peak "
        f"{rep['peak_bytes'] / 2**30:.2f} GiB > budget "
        f"{rep['budget_bytes'] / 2**30:.2f} GiB "
        f"({_BUDGET_FRACTION:.0%} of {rep['hbm_bytes'] / 2**30:.1f}"
        f" GiB HBM); components: {comp}. Reduce R/T, raise "
        f"hot_budget, or use staging='rows' / layout='tiered'.")


def _emit_segment(tiles_meta, seg_tiles, steps_of, out_of, first_piece,
                  R, T, G, S_buf, DMAX, rank1,
                  staging="rows", stage_tier=32768,
                  window=False, cq=_CQ):  # noqa: C901
    multihot = rank1
    chunks = staging == "chunks"
    S_blocks = S_buf // cq if chunks else S_buf // _L

    if chunks:
        # tier-major take table: per tier, per segment tile, its blocks;
        # src_of[j] maps tile j's local block -> table block
        n_tiers_tot = 0
        for t in seg_tiles:
            tt = tiles_meta[t][0][0]
            if tt.shape[0]:
                n_tiers_tot = max(n_tiers_tot, int(tt.max()) + 1)
        per_tier_idx = [[] for _ in range(n_tiers_tot)]
        per_tier_src = {}
        for j, t in enumerate(seg_tiles):
            take_tier, take_idx = tiles_meta[t][0]
            src_map = np.zeros(take_tier.shape[0], np.int64)
            per_tier_src[j] = src_map
            for b in range(take_tier.shape[0]):
                per_tier_idx[int(take_tier[b])].append(
                    (j, b, take_idx[b * cq:(b + 1) * cq]))
        table_blk = 0
        tier_ptr = [0]
        take_list = []
        for tier in range(n_tiers_tot):
            for (j, b, idx) in per_tier_idx[tier]:
                per_tier_src[j][b] = table_blk
                take_list.append(idx)
                table_blk += 1
            tier_ptr.append(table_blk * cq)
        stage_take = (np.concatenate(take_list).astype(np.int32)
                      if take_list else np.zeros(0, np.int32))
        stage_tier_ptr = tuple(tier_ptr)
    """Lay out one segment's step stream: a prologue staging the first
    tile, then per tile: compute steps that also stage the NEXT tile."""
    first = seg_tiles[0]
    prologue = steps_of[first]
    n_steps = prologue + sum(steps_of[t] for t in seg_tiles)

    ctrl = np.zeros((n_steps, 1, 16), np.int32)
    scols = (np.zeros((n_steps, 2, DMAX), np.int32) if chunks
             else np.zeros((n_steps, DMAX), np.int32))
    lidx = (np.zeros((n_steps * G, 4, _L), np.int32) if multihot
            else np.zeros((n_steps * G, _L), np.int32))
    lrow = np.full((n_steps * G, _L), R, np.int32)
    blk = np.zeros((n_steps, 1, G), np.int32)
    tile_of = np.zeros(n_steps, np.int32)
    lval = None if rank1 else np.zeros((n_steps * G, _L), np.float32)

    def fill_staging(tile, step_lo, step_hi, parity):
        if chunks:
            # spread the tile's 128-row block copies over the window
            j = seg_tiles.index(tile)
            src = per_tier_src[j]
            n_blk = src.shape[0]
            nsteps = step_hi - step_lo
            per = -(-n_blk // nsteps) if n_blk else 0
            pos = 0
            for s in range(step_lo, step_hi):
                cnt = max(min(per, n_blk - pos), 0)
                if cnt:
                    scols[s, 0, :cnt] = src[pos:pos + cnt]
                    scols[s, 1, :cnt] = (parity * S_blocks
                                         + np.arange(pos, pos + cnt))
                ctrl[s, 0, 3] = cnt
                pos += cnt
            return
        # per-step counts are rounded to DMA-wave multiples (64) so the
        # kernel predicates per WAVE, not per DMA (scalar-core cost);
        # chunk tails re-copy the chunk's first rows (harmless rewrites)
        stage_cols = tiles_meta[tile][0]
        nsteps = step_hi - step_lo
        per = -(-stage_cols.shape[0] // nsteps) if stage_cols.shape[0] else 0
        per += -per % 64
        pos = 0
        for s in range(step_lo, step_hi):
            cnt = min(per, stage_cols.shape[0] - pos)
            cnt = max(cnt, 0)
            pad = -cnt % 64
            if cnt:
                scols[s, :cnt] = stage_cols[pos:pos + cnt]
                if pad:
                    scols[s, cnt:cnt + pad] = stage_cols[pos:pos + pad]
            ctrl[s, 0, 2] = parity * S_buf + pos
            ctrl[s, 0, 3] = cnt + pad
            pos += cnt

    # prologue: stage first tile into parity 0; no compute
    ctrl[:prologue, 0, 0] = -1
    fill_staging(first, 0, prologue, 0)

    out_base = out_of[seg_tiles[0]]
    step = prologue
    for j, t in enumerate(seg_tiles):
        ns = steps_of[t]
        uniq, li, lr, lv, bo, dwg = tiles_meta[t]
        ctrl[step:step + ns, 0, 0] = out_of[t] - out_base
        ctrl[step, 0, 1] = 1  # first step of a (virtual) tile: split
        ctrl[step, 0, 9] = 1 if first_piece[t] else 0  # zero output
        ctrl[step, 0, 8] = (0 if chunks else uniq.shape[0])
        ctrl[step:step + ns, 0, 5] = (j % 2) * S_buf
        if window:
            # dst window of each step's G groups (dw-homogeneous by
            # construction in _build_groups)
            ctrl[step:step + ns, 0, 10] = dwg.reshape(ns, G)[:, 0]
        tile_of[step:step + ns] = out_of[t] - out_base
        lidx[step * G:(step + ns) * G] = li
        lrow[step * G:(step + ns) * G] = lr
        blk[step:step + ns, 0, :] = bo.reshape(ns, G)
        if not rank1:
            lval[step * G:(step + ns) * G] = lv
        if j + 1 < len(seg_tiles):
            fill_staging(seg_tiles[j + 1], step, step + ns, (j + 1) % 2)
        step += ns

    # prev-step staging info (for the one-behind DMA waits)
    ctrl[1:, 0, 6] = ctrl[:-1, 0, 3]
    ctrl[1:, 0, 7] = ctrl[:-1, 0, 2]

    if rank1:
        val_hi = val_lo = None
    else:
        val_hi = np.asarray(jnp.asarray(lval).astype(jnp.bfloat16))
        val_lo = np.asarray(
            jnp.asarray(lval - val_hi.astype(np.float32)
                        ).astype(jnp.bfloat16))

    if chunks:
        return FusedSegment(
            ctrl=ctrl,
            scols=scols,
            lidx=lidx,
            lrow=lrow,
            blk=blk,
            tile_of=tile_of,
            val_hi=val_hi,
            val_lo=val_lo,
            stage_take=stage_take,
            stage_tier_ptr=stage_tier_ptr,
            n_steps=n_steps,
            n_tiles=out_of[seg_tiles[-1]] - out_base + 1,
        )
    return FusedSegment(
        ctrl=ctrl,
        scols=scols.reshape(n_steps, 8, DMAX // 8),
        lidx=lidx,
        lrow=lrow,
        blk=blk,
        tile_of=tile_of,
        val_hi=val_hi,
        val_lo=val_lo,
        n_steps=n_steps,
        n_tiles=out_of[seg_tiles[-1]] - out_base + 1,
    )
