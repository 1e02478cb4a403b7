"""Expansion plan: the MXU one-hot SpMM layout for large graphs.

The fourth SpMM engine (after XLA-binned, XLA-tiered, DMA-binned), built
from on-chip measurements (tools/microbench_gather2.py) on the attached
v5 chip:

- per-row DMA gather:        ~85 Mrows/s   (issue-bound)
- XLA take, <=32768 tables:  ~275-550 Mrows/s
- XLA take, multi-megarow:    ~68 Mrows/s
- MXU one-hot window gather+scatter (this plan's kernel): ~340 Mrows/s
  measured end-to-end at TILE=4096/CW=256/R=512 with fp32-parity hi/lo
  bf16 splits — and it composes with a fast staging path.

Structure (all plan-time, host-side numpy):

1. Rows are tiled into tiles of R rows (output-stationary: each tile's
   result accumulates in VMEM, written once — no finish permutation).
2. Per tile, nonzeros are sorted by column and deduplicated: each tile
   gathers its UNIQUE columns once (measured dedup on ogbn-products:
   2.8x at R=512 .. 4.3x at R=2048) into a staged feature table.
3. Tiles are batched into GROUPS so one group's staged table (hi/lo bf16
   pairs of the f32 features) fits a bounded HBM budget; the staging
   buffer of group g dies when group g's kernel completes (XLA liveness),
   so peak memory is one group's staging, not the whole graph's.
4. Within a group the staging is TIER-MAJOR: unique columns are grouped
   by 32768-column tier so staging is one fast-path `jnp.take` per tier
   (the fast-table regime) — no write permutation; within a tile, staged
   indices are still strictly increasing, so
5. lanes (nonzeros) are blocked into steps of TILE lanes whose staged
   indices fit a CW-row window of the group's staging table (greedy cut);
   the kernel one-hot-gathers each step's lanes from its window on the
   MXU (indices become a (CW, TILE) 0/1 bf16 matrix; the adjacency VALUES
   are folded into the one-hot, hi/lo split for fp32 parity), then
   one-hot SCATTERS the weighted contributions into the tile's (R, d)
   output accumulator.

Reference semantics: still gather x segment-sum
(oneflow/user/ops/gather_op.cpp, unsorted_segment_sum_op.cpp); the MXU
one-hot pair is the TPU answer to CUDA's per-edge atomics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_spmm_tpu.sparse.formats import CSR

DEFAULT_R = 512          # output rows per tile (VMEM accumulator R x d)
DEFAULT_TILE = 1024      # lanes per kernel step (~CW x dedup keeps pad low)
DEFAULT_CW = 512         # staging window rows per step (multiple of 128)
STAGE_TIER = 32768       # staging gather fast-path table size
DEFAULT_STAGE_BUDGET = 4 * 1024 * 1024  # staged rows per group (hi/lo ~2GB)
_BLK = 128               # window block granularity


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ExpansionGroup:
    """One group of row tiles: its staging lists, lanes and step tables."""

    # staging: per-tier LOCAL column ids, concatenated tier-major
    stage_idx: jnp.ndarray        # (U_g,) int32 — col - tier*stage_tier
    stage_tier_ptr: Tuple[int, ...]  # (n_tiers+1,) python ints (static)

    # lanes, blocked into steps of TILE: (nsteps*TILE/128, 128)-shaped
    win_lidx: jnp.ndarray         # int32, window-local staged idx in [0, CW)
    lrow: jnp.ndarray             # int32, row within tile in [0, R)
    val_hi: jnp.ndarray           # bf16
    val_lo: jnp.ndarray           # bf16

    # per step (scalar-prefetch): the nblk independent 128-row staging
    # block indices forming the step's window; tile id LOCAL to the group
    base_blk: jnp.ndarray         # (nsteps * CW/128,) int32
    tile_of: jnp.ndarray          # (nsteps,) int32

    n_steps: int
    n_tiles: int

    def tree_flatten(self):
        children = (self.stage_idx, self.win_lidx, self.lrow, self.val_hi,
                    self.val_lo, self.base_blk, self.tile_of)
        aux = (self.stage_tier_ptr, self.n_steps, self.n_tiles)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (stage_idx, win_lidx, lrow, val_hi, val_lo, base_blk,
         tile_of) = children
        stage_tier_ptr, n_steps, n_tiles = aux
        return cls(stage_idx=stage_idx, stage_tier_ptr=stage_tier_ptr,
                   win_lidx=win_lidx, lrow=lrow, val_hi=val_hi,
                   val_lo=val_lo, base_blk=base_blk, tile_of=tile_of,
                   n_steps=n_steps, n_tiles=n_tiles)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ExpansionPlan:
    """Device arrays for the one-hot expansion SpMM (one direction)."""

    groups: Tuple[ExpansionGroup, ...]
    shape: Tuple[int, int]        # logical (n_rows, n_cols)
    R: int
    TILE: int
    CW: int
    stage_tier: int = STAGE_TIER

    def tree_flatten(self):
        return (self.groups,), (self.shape, self.R, self.TILE, self.CW,
                                self.stage_tier)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (groups,) = children
        shape, R, TILE, CW, stage_tier = aux
        return cls(groups=tuple(groups), shape=shape, R=R, TILE=TILE,
                   CW=CW, stage_tier=stage_tier)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def n_steps(self) -> int:
        return sum(g.n_steps for g in self.groups)

    @property
    def n_tiles(self) -> int:
        return sum(g.n_tiles for g in self.groups)

    @property
    def n_staged(self) -> int:
        return sum(int(g.stage_idx.shape[0]) for g in self.groups)

    def padding_efficiency(self, true_nnz: int) -> float:
        lanes = self.n_steps * self.TILE
        return float(true_nnz) / lanes if lanes else 1.0


def _build_group(tiles, tile_data, n_tiers, stage_tier, R, TILE, CW):
    """Assemble one group's arrays from its tiles' (uniq, inv, rows, vals)."""
    n_tl = len(tiles)
    seg_len = np.zeros((n_tiers, n_tl), dtype=np.int64)
    for j, t in enumerate(tiles):
        uniq = tile_data[t][0]
        seg_len[:, j] = np.bincount(uniq // stage_tier, minlength=n_tiers)
    # each (tier, tile) staging run padded to _BLK alignment: a window
    # block then belongs to exactly one run, so a step's nblk independent
    # blocks pack lanes across run boundaries with no straddle waste
    # (measured pad_eff 0.51 -> ~0.85 on ogbn-products; the price is
    # ~+35% staged rows of never-referenced padding).
    seg_pad = -(-seg_len // _BLK) * _BLK
    flat = seg_pad.reshape(-1)
    run_off = np.zeros(flat.shape[0] + 1, dtype=np.int64)
    np.cumsum(flat, out=run_off[1:])
    run_off = run_off[:-1].reshape(n_tiers, n_tl)
    tier_ptr = [0] + list(np.cumsum(seg_pad.sum(axis=1)))
    U = int(tier_ptr[-1])

    nblk = CW // _BLK
    stage_idx = np.zeros(U, dtype=np.int32)
    steps_base, steps_tile = [], []
    lanes_lidx, lanes_row, lanes_val = [], [], []
    for j, t in enumerate(tiles):
        uniq, inv, r, v = tile_data[t]
        tiers = uniq // stage_tier
        within = np.arange(uniq.shape[0], dtype=np.int64)
        tier_first = np.searchsorted(tiers, np.arange(n_tiers), side="left")
        local_rank = within - tier_first[tiers]
        gpos = run_off[tiers, j] + local_rank
        stage_idx[gpos] = (uniq - tiers * stage_tier).astype(np.int32)
        gidx = gpos[inv]  # per lane, non-decreasing within each tier run
        mlanes = gidx.shape[0]
        # The step window is nblk ARBITRARY 128-row staging blocks (each an
        # independent scalar-prefetched block index), so steps pack lanes
        # straight across tier-run boundaries where the tile's global
        # staged positions jump (other tiles' segments interleave).
        # Walk block-runs, not lanes: boundaries where the lane's staging
        # block changes.
        lane_blk = gidx // _BLK
        bnd = np.nonzero(np.diff(lane_blk))[0] + 1
        run_starts = np.concatenate([[0], bnd, [mlanes]])
        nruns = run_starts.shape[0] - 1
        ri = 0
        i = 0
        while i < mlanes:
            blocks = []
            k = i
            rj = ri
            while rj < nruns and k < i + TILE and len(blocks) <= nblk:
                b = int(lane_blk[run_starts[rj]])
                if b not in blocks:
                    if len(blocks) == nblk:
                        break
                    blocks.append(b)
                run_end = int(run_starts[rj + 1])
                if run_end - i > TILE:  # run longer than remaining lanes
                    k = i + TILE
                    break
                k = run_end
                rj += 1
            # local window index per lane: 128*pos(block) + offset
            blk_arr = np.asarray(blocks, dtype=np.int64)
            seg_blk = lane_blk[i:k]
            pos = np.searchsorted(blk_arr, seg_blk)  # blocks ascend per tile
            li = (pos * _BLK + (gidx[i:k] - seg_blk * _BLK)).astype(np.int32)
            pad = TILE - (k - i)
            lanes_lidx.append(np.pad(li, (0, pad)))
            lanes_row.append(np.pad(r[i:k].astype(np.int32), (0, pad)))
            lanes_val.append(np.pad(v[i:k], (0, pad)))  # pad val = 0
            blocks += [blocks[-1]] * (nblk - len(blocks))
            steps_base.append(blocks)
            steps_tile.append(j)
            i = k
            ri = rj

    n_steps = len(steps_base)
    win_lidx = np.concatenate(lanes_lidx).reshape(-1, 128)
    lrow = np.concatenate(lanes_row).reshape(-1, 128)
    val = np.concatenate(lanes_val)
    val_hi = np.asarray(val.astype(jnp.bfloat16))
    val_lo = np.asarray(
        (val - val_hi.astype(np.float32)).astype(jnp.bfloat16))

    # pad staging so every window [base_blk*128, +CW) stays in bounds
    stage_pad = -U % _BLK + CW
    stage_idx = np.pad(stage_idx, (0, stage_pad))
    tier_ptr = tuple(int(x) for x in tier_ptr[:-1]) + (U + stage_pad,)

    return ExpansionGroup(
        stage_idx=stage_idx,
        stage_tier_ptr=tier_ptr,
        win_lidx=win_lidx,
        lrow=lrow,
        val_hi=val_hi.reshape(-1, 128),
        val_lo=val_lo.reshape(-1, 128),
        base_blk=np.asarray(steps_base, dtype=np.int32).reshape(-1),
        tile_of=np.asarray(steps_tile, dtype=np.int32),
        n_steps=n_steps,
        n_tiles=n_tl,
    )


def build_expansion_plan(
    csr: CSR,
    R: int = DEFAULT_R,
    TILE: int = DEFAULT_TILE,
    CW: int = DEFAULT_CW,
    stage_tier: int = STAGE_TIER,
    stage_budget: int = DEFAULT_STAGE_BUDGET,
) -> ExpansionPlan:
    """Host-side plan build (numpy). See module docstring for the layout."""
    if CW % _BLK:
        raise ValueError(f"CW must be a multiple of {_BLK}, got {CW}")
    if TILE % 128:
        raise ValueError(f"TILE must be a multiple of 128, got {TILE}")
    n, m = csr.shape
    indptr = np.asarray(csr.indptr).astype(np.int64)
    cols_all = np.asarray(csr.cols).astype(np.int64)
    vals_all = np.asarray(csr.vals).astype(np.float32)
    n_tiles = max(-(-n // R), 1)
    n_tiers = max(-(-m // stage_tier), 1)

    # ---- pass 1: per tile, column-sorted lanes + unique columns ----------
    # native (OpenMP) per-tile sort+dedup when the toolchain is present
    # (~20x over the numpy loop at 10^8 nnz); numpy fallback otherwise.
    from of_spmm_tpu import native

    tile_data = []
    starts = indptr[np.minimum(np.arange(n_tiles + 1) * R, n)]
    nat = native.expansion_pass1(indptr, cols_all, vals_all, R)
    if nat is not None:
        lane_inv, lane_row, lane_val, uniq_cols, uniq_ptr = nat
        for t in range(n_tiles):
            lo, hi = starts[t], starts[t + 1]
            tile_data.append((
                uniq_cols[uniq_ptr[t]:uniq_ptr[t + 1]].astype(np.int64),
                lane_inv[lo:hi].astype(np.int64),
                lane_row[lo:hi].astype(np.int64),
                lane_val[lo:hi],
            ))
    else:
        for t in range(n_tiles):
            lo, hi = starts[t], starts[t + 1]
            c = cols_all[lo:hi]
            v = vals_all[lo:hi]
            r = np.repeat(
                np.arange(min(R, n - t * R), dtype=np.int64),
                np.diff(indptr[t * R:min((t + 1) * R, n) + 1]),
            )
            order = np.argsort(c, kind="stable")
            c, v, r = c[order], v[order], r[order]
            uniq, inv = np.unique(c, return_inverse=True)
            tile_data.append((uniq, inv, r, v))

    # ---- group tiles under the staging budget ----------------------------
    groups = []
    cur = []
    cur_u = 0
    for t in range(n_tiles):
        u = tile_data[t][0].shape[0]
        if cur and cur_u + u > stage_budget:
            groups.append(cur)
            cur, cur_u = [], 0
        cur.append(t)
        cur_u += u
    if cur:
        groups.append(cur)

    built = tuple(
        _build_group(g, tile_data, n_tiers, stage_tier, R, TILE, CW)
        for g in groups
    )
    return ExpansionPlan(groups=built, shape=csr.shape, R=R, TILE=TILE,
                         CW=CW, stage_tier=stage_tier)
