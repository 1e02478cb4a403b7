"""Row-binned padded-ELL format — the load-balanced kernel-facing layout.

The reference sidesteps load balance with per-edge CUDA atomics
(oneflow/user/kernels/unsorted_segment_sum_kernel_util.cu:52-71). TPUs have
no atomics, so load balance is achieved structurally at plan time:

- rows are binned by nnz into buckets with widths from a fixed power-of-two
  ladder, each row padded (with val=0 entries, mirroring the reference's
  bounds-check-to-zero read) up to the bucket width;
- rows wider than the max ladder width are *split* into several ELL rows
  whose partial results are scatter-added — this bounds the per-tile work
  and makes power-law degree skew (Reddit/ogbn) tractable;
- each bucket's row count is padded to a multiple of 8 (the f32 sublane
  count) with zero-value dummy rows so tiles map cleanly onto 8x128 lanes;
- the ladder is fixed, so jit recompilation is bounded to a small set of
  (width, padded-rows) shapes (SURVEY.md §7 hard part 5).

All binning runs host-side in numpy at plan time; the resulting arrays are
static-shape device buffers that flow through jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_spmm_tpu.sparse.formats import CSR

# Power-of-two bucket-width ladder. Width-0 rows are dropped entirely
# (they contribute nothing; output rows default to zero).
DEFAULT_LADDER: Tuple[int, ...] = (4, 8, 16, 32, 64, 128, 256)
SUBLANES = 8  # f32 sublane count; bucket row counts padded to this.


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EllBucket:
    """One padded-ELL bucket: R rows of exactly K (padded) nonzeros."""

    row_ids: jnp.ndarray  # (R,) int32 — output row each ELL row adds into
    cols: jnp.ndarray  # (R, K) int32 — padded with 0 (val 0 masks it)
    vals: jnp.ndarray  # (R, K) float — padding entries are exactly 0

    def tree_flatten(self):
        return (self.row_ids, self.cols, self.vals), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        row_ids, cols, vals = children
        return cls(row_ids=row_ids, cols=cols, vals=vals)

    @property
    def width(self) -> int:
        return int(self.cols.shape[1])

    @property
    def n_ell_rows(self) -> int:
        return int(self.cols.shape[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BinnedEll:
    """A CSR matrix re-laid-out as a tuple of padded-ELL buckets."""

    buckets: Tuple[EllBucket, ...]
    shape: Tuple[int, int]  # static logical (n_rows, n_cols)
    has_split_rows: bool  # static: True if any row was split across ELL rows

    def tree_flatten(self):
        return (self.buckets,), (self.shape, self.has_split_rows)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (buckets,) = children
        shape, has_split_rows = aux
        return cls(buckets=tuple(buckets), shape=shape, has_split_rows=has_split_rows)

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    @property
    def n_cols(self) -> int:
        return self.shape[1]

    @property
    def nnz_padded(self) -> int:
        return sum(b.n_ell_rows * b.width for b in self.buckets)

    def padding_efficiency(self, true_nnz: int) -> float:
        """Fraction of padded slots holding real nonzeros (1.0 = no waste)."""
        p = self.nnz_padded
        return float(true_nnz) / p if p else 1.0


def _pick_width(deg: int, ladder: Sequence[int]) -> int:
    for w in ladder:
        if deg <= w:
            return w
    return ladder[-1]


def bin_rows(
    csr: CSR,
    ladder: Sequence[int] = DEFAULT_LADDER,
    sublanes: int = SUBLANES,
) -> BinnedEll:
    """Bin CSR rows by degree into padded-ELL buckets (host-side, plan time).

    Rows with degree > max(ladder) are split into ceil(deg / max_width)
    ELL rows sharing the same output row id; their partial sums are
    combined by scatter-add in the compute path.
    """
    ladder = tuple(sorted(set(int(w) for w in ladder)))
    if not ladder:
        raise ValueError("ladder must be non-empty")
    max_w = ladder[-1]

    indptr = np.asarray(csr.indptr).astype(np.int64)
    cols = np.asarray(csr.cols)
    vals = np.asarray(csr.vals)
    degs = np.diff(indptr)
    n_rows = csr.shape[0]

    # 1) Chunkify every row into pieces of length <= max_w (fully vectorized).
    n_chunks_per_row = -(-degs // max_w)  # ceil; 0 for empty rows
    has_split = bool((n_chunks_per_row > 1).any())
    chunk_row = np.repeat(np.arange(n_rows, dtype=np.int64), n_chunks_per_row)
    total_chunks = chunk_row.shape[0]
    if total_chunks == 0:
        return BinnedEll(buckets=(), shape=csr.shape, has_split_rows=False)
    # index of each chunk within its row: arange reset at row boundaries
    row_first_chunk = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_chunks_per_row, out=row_first_chunk[1:])
    chunk_in_row = np.arange(total_chunks, dtype=np.int64) - np.repeat(
        row_first_chunk[:-1], n_chunks_per_row
    )
    chunk_start = indptr[chunk_row] + chunk_in_row * max_w
    chunk_len = np.minimum(max_w, degs[chunk_row] - chunk_in_row * max_w)

    # 2) Assign each chunk to the smallest ladder width that fits it.
    ladder_arr = np.asarray(ladder, dtype=np.int64)
    width_idx = np.searchsorted(ladder_arr, chunk_len, side="left")

    buckets = []
    for wi, w in enumerate(ladder):
        sel = np.nonzero(width_idx == wi)[0]
        n = sel.shape[0]
        if n == 0:
            continue
        starts = chunk_start[sel]
        lens = chunk_len[sel]
        rids = chunk_row[sel]
        n_pad = -n % sublanes
        total = n + n_pad
        b_rows = np.zeros(total, dtype=np.int32)
        b_rows[:n] = rids
        b_cols = np.zeros((total, w), dtype=np.int32)
        b_vals = np.zeros((total, w), dtype=vals.dtype)
        # Flat scatter: chunk c occupies dest (c, 0:lens[c]) from
        # src starts[c] : starts[c]+lens[c].
        total_len = int(lens.sum())
        dst_row = np.repeat(np.arange(n, dtype=np.int64), lens)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=cum[1:])
        intra = np.arange(total_len, dtype=np.int64) - np.repeat(cum[:-1], lens)
        src = np.repeat(starts, lens) + intra
        b_cols[dst_row, intra] = cols[src]
        b_vals[dst_row, intra] = vals[src]
        # dummy padding rows keep row_id 0 with all-zero vals: harmless
        # under scatter-add accumulation.
        buckets.append(
            EllBucket(
                row_ids=jnp.asarray(b_rows),
                cols=jnp.asarray(b_cols),
                vals=jnp.asarray(b_vals),
            )
        )

    return BinnedEll(buckets=tuple(buckets), shape=csr.shape, has_split_rows=has_split)
