"""Expansion plan v2: single-block lane groups for the MXU one-hot SpMM.

Evolution of sparse/expansion.py driven by its measured cost profile on
the attached v5 chip (~8 us/step at TILE=1024/CW=512/R=512 ~= 33% MXU):
the v1 kernel's one-hots span the full CW-row window, so every lane pays
gather MACs proportional to CW (one (TILE,128)x(128,D) matmul per window
block, lanes outside the block contributing zero rows) plus two value-fold
VPU multiplies over (CW,TILE) arrays that rival the MXU time.

v2 restructures the plan so the kernel does strictly less work per lane:

1. **Single-block lane groups.** Lanes (column-sorted within a row tile,
   so their staged positions ascend) are cut at 128-row staging-block
   boundaries and each run padded to 128-lane groups; every group carries
   ONE scalar-prefetched block index. The gather one-hot shrinks from
   (CW, TILE) to (128, 128) per group — gather MACs drop CW/128 = 4x.
2. **Unpadded staging.** v1 padded every (tile, tier) staging run to
   128-row alignment (+35% staged rows) so window blocks never straddled
   runs. v2's per-group block index makes straddling harmless (lanes
   select only their own rows), so staging is dense: the staged table is
   exactly the tiles' unique columns, tier-major for fast-path takes.
3. **Values out of the inner loop.** The one-hots are pure 0/1, making
   the gather matmuls EXACT row selections (a one-hot row has a single 1,
   so no accumulation error and no hi/lo cross terms):
   - rank-1 values (a_ij = r_i * c_j, e.g. every degree-normalized
     adjacency): c folds into the staged rows at staging time and r into
     the output tile — the kernel sees no values at all (2 gather + 2
     scatter matmuls per group-set in fp32-parity mode);
   - general values fold into the scatter one-hot (roh * v_hi/lo — 3
     scatter matmuls in parity mode), still off the gather path.

Padding lanes carry row sentinel R (their scatter one-hot column is all
zero), so they contribute nothing regardless of what they gather.

Reference semantics unchanged: gather x segment-sum
(oneflow/user/ops/gather_op.cpp:51-82,
oneflow/user/kernels/unsorted_segment_sum_kernel_util.cu:52-151) with
reduction locality created at plan time instead of CUDA atomics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_spmm_tpu.sparse.formats import CSR

DEFAULT_R = 512      # output rows per tile
DEFAULT_G = 8        # lane groups (of 128 lanes) per kernel step
STAGE_TIER = 32768   # staging gather fast-path table size
DEFAULT_STAGE_BUDGET = 4 * 1024 * 1024  # staged rows per group of tiles
_L = 128             # lanes per group == staging block rows


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Expansion2Group:
    """One group of row tiles: dense staging + single-block lane groups."""

    stage_idx: jnp.ndarray           # (U,) int32, tier-local column ids
    stage_tier_ptr: Tuple[int, ...]  # python ints (static)
    stage_scale: Optional[jnp.ndarray]  # (U,) f32 col scale (rank-1) or None

    lidx: jnp.ndarray    # (n_grp, 128) int32, block-local staged idx
    lrow: jnp.ndarray    # (n_grp, 128) int32, row within tile; R = padding
    val_hi: Optional[jnp.ndarray]  # (n_grp, 128) bf16 or None (rank-1)
    val_lo: Optional[jnp.ndarray]

    blk_of: jnp.ndarray  # (n_grp,) int32 staging block index per group
    tile_of: jnp.ndarray  # (n_steps,) int32 tile per step (n_grp = steps*G)

    n_steps: int
    n_tiles: int

    def tree_flatten(self):
        children = (self.stage_idx, self.stage_scale, self.lidx, self.lrow,
                    self.val_hi, self.val_lo, self.blk_of, self.tile_of)
        aux = (self.stage_tier_ptr, self.n_steps, self.n_tiles)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (stage_idx, stage_scale, lidx, lrow, val_hi, val_lo, blk_of,
         tile_of) = children
        stage_tier_ptr, n_steps, n_tiles = aux
        return cls(stage_idx=stage_idx, stage_tier_ptr=stage_tier_ptr,
                   stage_scale=stage_scale, lidx=lidx, lrow=lrow,
                   val_hi=val_hi, val_lo=val_lo, blk_of=blk_of,
                   tile_of=tile_of, n_steps=n_steps, n_tiles=n_tiles)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Expansion2Plan:
    groups: Tuple[Expansion2Group, ...]
    row_scale: Optional[jnp.ndarray]  # (n_rows,) f32 (rank-1) or None
    shape: Tuple[int, int]
    R: int
    G: int
    stage_tier: int = STAGE_TIER

    def tree_flatten(self):
        return (self.groups, self.row_scale), (
            self.shape, self.R, self.G, self.stage_tier)

    @classmethod
    def tree_unflatten(cls, aux, children):
        groups, row_scale = children
        shape, R, G, stage_tier = aux
        return cls(groups=tuple(groups), row_scale=row_scale, shape=shape,
                   R=R, G=G, stage_tier=stage_tier)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def rank1(self) -> bool:
        return self.row_scale is not None

    @property
    def n_steps(self) -> int:
        return sum(g.n_steps for g in self.groups)

    @property
    def n_staged(self) -> int:
        return sum(int(g.stage_idx.shape[0]) for g in self.groups)

    def padding_efficiency(self, true_nnz: int) -> float:
        lanes = self.n_steps * self.G * _L
        return float(true_nnz) / lanes if lanes else 1.0


def factor_rank1(csr: CSR, rtol: float = 1e-6):
    """Try to factor vals[e] = r[row[e]] * c[col[e]] (degree-normalized
    adjacencies are exactly this form). Returns (r, c) float64 numpy
    arrays or None.

    Method: take c from any one row's values assuming r=vals[first]/...;
    instead, use the first nonzero of each column reachable from row 0's
    scaling and verify globally. To stay robust without graph traversal,
    test the special cases that cover the framework's normalizations:
    c_j = f(deg_j) with r_i = g(deg_i): sym (f=g=deg^-1/2), row (r=deg^-1,
    c=1), col (r=1, c=deg^-1), unweighted (r=c=1).
    """
    n, m = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    cols = np.asarray(csr.cols, dtype=np.int64)
    vals = np.asarray(csr.vals, dtype=np.float64)
    if vals.size == 0:
        return np.ones(n), np.ones(m)
    deg_out = np.diff(indptr).astype(np.float64)
    deg_in = np.bincount(cols, minlength=m).astype(np.float64)
    with np.errstate(divide="ignore"):
        inv_out = np.where(deg_out > 0, 1.0 / deg_out, 0.0)
        inv_in = np.where(deg_in > 0, 1.0 / deg_in, 0.0)
        rs_out = np.where(deg_out > 0, deg_out ** -0.5, 0.0)
        rs_in = np.where(deg_in > 0, deg_in ** -0.5, 0.0)
    candidates = [
        (np.ones(n), np.ones(m)),                # unweighted
        (rs_out, rs_in),                         # sym normalized
        (inv_out, np.ones(m)),                   # row normalized
        (np.ones(n), inv_in),                    # col normalized
    ]
    if n == m:
        # GCN normalization on a DIRECTED square graph applies the same
        # row-degree-based D^-1/2 on both sides (models/gcn.py
        # normalized_adjacency) — c_j = rowdeg_j^-1/2, not coldeg; the
        # TRANSPOSE of that matrix factors with col degrees on both sides
        candidates.append((rs_out, rs_out))
        candidates.append((inv_out, inv_out))
        candidates.append((rs_in, rs_in))
        candidates.append((inv_in, inv_in))
    # screen candidates on a small random edge sample, then verify the
    # survivor on a capped subsample (a 4M-edge verification bounds the
    # chance of a false rank-1 classification far below the parity
    # tolerance while avoiding repeated 10^8-element float passes)
    nnz = vals.shape[0]
    rng0 = np.random.default_rng(0)

    def row_of(idx):
        return np.searchsorted(indptr, idx, side="right") - 1

    if nnz > 1 << 20:
        sample = rng0.integers(0, nnz, 1 << 16)
        rs, cs, vs = row_of(sample), cols[sample], vals[sample]
    else:
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        rs, cs, vs = rows, cols, vals
    for r, c in candidates:
        if not np.allclose(r[rs] * c[cs], vs, rtol=rtol, atol=0):
            continue
        if nnz > rs.shape[0]:
            ver = rng0.integers(0, nnz, min(nnz, 1 << 22))
            if not np.allclose(r[row_of(ver)] * c[cols[ver]], vals[ver],
                               rtol=rtol, atol=0):
                continue
        return r, c
    return None


def _lane_groups_for_tile(gidx, rows, vals, R):
    """Cut a tile's (sorted-gidx) lanes at 128-row block boundaries and
    pad every run to 128-lane groups. Returns per-group arrays."""
    m = gidx.shape[0]
    if m == 0:
        return (np.zeros((0, _L), np.int32), np.zeros((0, _L), np.int32),
                np.zeros((0, _L), np.float32), np.zeros((0,), np.int32))
    blk = gidx // _L
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
    lidx[dst] = (gidx - blk * _L).astype(np.int32)
    lrow[dst] = rows.astype(np.int32)
    if vals is not None:
        val[dst] = vals
    blk_of = np.repeat(blk[starts].astype(np.int32), plens // _L)
    return (lidx.reshape(-1, _L), lrow.reshape(-1, _L),
            val.reshape(-1, _L), blk_of)


def _build_group(tiles, tile_data, n_tiers, stage_tier, R, G, rank1,
                 col_scale):
    n_tl = len(tiles)
    # dense tier-major staging offsets: run_off[tier, tile]
    seg_len = np.zeros((n_tiers, n_tl), dtype=np.int64)
    for j, t in enumerate(tiles):
        uniq = tile_data[t][0]
        seg_len[:, j] = np.bincount(uniq // stage_tier, minlength=n_tiers)
    flat = seg_len.reshape(-1)
    run_off = np.zeros(flat.shape[0] + 1, dtype=np.int64)
    np.cumsum(flat, out=run_off[1:])
    tier_ptr = [0] + list(np.cumsum(seg_len.sum(axis=1)))
    U = int(tier_ptr[-1])
    run_off = run_off[:-1].reshape(n_tiers, n_tl)

    stage_idx = np.zeros(U, dtype=np.int32)
    scale = np.ones(U, dtype=np.float32) if rank1 else None
    g_lidx, g_lrow, g_val, g_blk, steps_tile = [], [], [], [], []
    for j, t in enumerate(tiles):
        uniq, inv, r, v = tile_data[t]
        tiers = uniq // stage_tier
        within = np.arange(uniq.shape[0], dtype=np.int64)
        tier_first = np.searchsorted(tiers, np.arange(n_tiers), side="left")
        local_rank = within - tier_first[tiers]
        gpos = run_off[tiers, j] + local_rank
        stage_idx[gpos] = (uniq - tiers * stage_tier).astype(np.int32)
        if rank1:
            scale[gpos] = col_scale[uniq]
        gidx = gpos[inv]
        li, lr, lv, bo = _lane_groups_for_tile(
            gidx, r, None if rank1 else v, R)
        # pad the tile's groups to a multiple of G (whole steps)
        n_grp = li.shape[0]
        pad_g = G if n_grp == 0 else (-n_grp % G)  # empty tile: one pad
        # step so the kernel still zero-initializes its output block
        if pad_g:
            li = np.concatenate([li, np.zeros((pad_g, _L), np.int32)])
            lr = np.concatenate([lr, np.full((pad_g, _L), R, np.int32)])
            lv = np.concatenate([lv, np.zeros((pad_g, _L), np.float32)])
            bo = np.concatenate([bo, np.zeros(pad_g, np.int32)])
        g_lidx.append(li)
        g_lrow.append(lr)
        g_val.append(lv)
        g_blk.append(bo)
        steps_tile += [j] * ((n_grp + pad_g) // G)

    lidx = np.concatenate(g_lidx)
    lrow = np.concatenate(g_lrow)
    blk_of = np.concatenate(g_blk)
    n_steps = len(steps_tile)
    if rank1:
        val_hi = val_lo = None
    else:
        val = np.concatenate(g_val)
        val_hi = np.asarray(val.astype(jnp.bfloat16))
        val_lo = np.asarray(
            (val - val_hi.astype(np.float32)).astype(jnp.bfloat16))

    # pad staging so block [blk*128, blk*128+128) stays in bounds
    stage_pad = (-U) % _L + _L
    stage_idx = np.pad(stage_idx, (0, stage_pad))
    if rank1:
        scale = np.pad(scale, (0, stage_pad))
    tier_ptr = tuple(int(x) for x in tier_ptr[:-1]) + (U + stage_pad,)

    return Expansion2Group(
        stage_idx=stage_idx, stage_tier_ptr=tier_ptr, stage_scale=scale,
        lidx=lidx, lrow=lrow, val_hi=val_hi, val_lo=val_lo,
        blk_of=blk_of, tile_of=np.asarray(steps_tile, dtype=np.int32),
        n_steps=n_steps, n_tiles=n_tl)


def build_expansion2_plan(
    csr: CSR,
    R: int = DEFAULT_R,
    G: int = DEFAULT_G,
    stage_tier: int = STAGE_TIER,
    stage_budget: int = DEFAULT_STAGE_BUDGET,
    rank1: Optional[bool] = None,
) -> Expansion2Plan:
    """Host-side v2 plan build. ``rank1``: None = auto-detect."""
    n, m = csr.shape
    indptr = np.asarray(csr.indptr).astype(np.int64)
    cols_all = np.asarray(csr.cols).astype(np.int64)
    vals_all = np.asarray(csr.vals).astype(np.float32)
    n_tiles = max(-(-n // R), 1)
    n_tiers = max(-(-m // stage_tier), 1)

    factors = factor_rank1(csr) if rank1 in (None, True) else None
    if rank1 is True and factors is None:
        raise ValueError("rank1=True but values do not factor as r_i*c_j")
    use_rank1 = factors is not None
    row_scale = col_scale = None
    if use_rank1:
        row_scale, col_scale = factors

    # pass 1: per tile column-sorted lanes + unique columns (native fast
    # path shared with v1; see sparse/expansion.py)
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

    groups = []
    cur, cur_u = [], 0
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
        _build_group(g, tile_data, n_tiers, stage_tier, R, G, use_rank1,
                     col_scale)
        for g in groups
    )
    return Expansion2Plan(
        groups=built,
        row_scale=(row_scale.astype(np.float32) if use_rank1 else None),
        shape=csr.shape, R=R, G=G, stage_tier=stage_tier)
