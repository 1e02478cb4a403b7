"""1-D row partition of a sparse matrix with a precomputed halo-exchange plan.

TPU-native re-expression of the reference's distributed sparse aggregation:

- the per-rank row ranges the reference derives from SBP slice views
  (oneflow/core/job/nd_sbp_util.cpp:98-106,
  oneflow/user/kernels/unsorted_segment_sum_kernel.cpp:59-75) become an
  explicit plan built host-side at partition time;
- the ragged id-shuffle exchange the reference runs with per-rank
  ncclSend/ncclRecv count+data rounds
  (oneflow/user/kernels/data_shuffle_kernel.cu:41-130) becomes a *static*
  padded all-to-all: per-pair halo index lists are computed once, padded to
  a uniform width H, and executed as one ``jax.lax.all_to_all`` inside
  ``shard_map`` — static shapes, so XLA compiles one program and can
  overlap the collective with local compute.

Plan construction: shard p owns A rows [p*rps, (p+1)*rps) and X rows
[p*cps, (p+1)*cps). The columns A_p references outside p's own X range are
halo rows; need[p][q] lists them per owner q. Column indices of A_p are
remapped at plan time into the concatenated local index space
[own X (cps) | halo buffer (S*H)], so the kernel runs unmodified on
[x_local ; halo] with no runtime index translation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from of_spmm_tpu.sparse.binned import DEFAULT_LADDER, SUBLANES, BinnedEll, EllBucket, bin_rows
from of_spmm_tpu.sparse.formats import CSR


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class StackedBucket:
    """An EllBucket stacked across shards (leading dim = n_shards)."""

    row_ids: jnp.ndarray  # (S, R)
    cols: jnp.ndarray  # (S, R, K) — remapped into [0, cps + S*H)
    vals: jnp.ndarray  # (S, R, K)

    def tree_flatten(self):
        return (self.row_ids, self.cols, self.vals), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def width(self) -> int:
        return int(self.cols.shape[2])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RowPartitionPlan:
    """Static halo-exchange plan for Y = A @ X row-partitioned over S shards.

    Built with ``split_boundary=True``, the per-shard ELL rows are divided
    into INTERIOR rows (every nonzero hits shard-local X) and BOUNDARY rows
    (at least one halo reference): ``buckets`` is then empty and
    ``interior_buckets``/``boundary_buckets`` carry the work. dist_spmm
    computes interior rows while the halo all_to_all is in flight (XLA
    schedules the collective asynchronously when no data dependency forces
    serialization), and interior gathers index the smaller local-only
    table — the overlap the reference gets from its actor dataflow."""

    buckets: Tuple[StackedBucket, ...]
    send_idx: jnp.ndarray  # (S, S, H) int32: p sends own-local X rows
    #                         send_idx[p, q] to shard q (padding -> row 0)
    shape: Tuple[int, int]  # global logical A shape
    n_shards: int
    rows_per_shard: int  # output rows per shard (padded)
    cols_per_shard: int  # X rows per shard (padded)
    halo_size: int  # H
    interior_buckets: Optional[Tuple[StackedBucket, ...]] = None
    boundary_buckets: Optional[Tuple[StackedBucket, ...]] = None
    # hub replication (degree-aware halo bound): the K highest in-degree
    # columns are excluded from the pairwise halo need-lists and instead
    # broadcast once per call (one small all_gather) — on power-law graphs
    # a single hub-heavy pair otherwise inflates every shard's padded H
    # toward an all_gather. hub_local_idx[p, k] = p-local X row of the
    # k-th hub slot owned by p (padded with 0); hub_perm maps the gathered
    # (S, Kmax) slab to hub-rank order.
    hub_local_idx: Optional[jnp.ndarray] = None   # (S, Kmax) int32
    hub_perm: Optional[jnp.ndarray] = None        # (K,) int32 into S*Kmax
    # transposed local matrices (cps + S*H + K, rps), binned+stacked: the
    # backward of the local SpMM (dXcat = A_local^T @ dY) for the Pallas
    # impl's custom_vjp — the distributed face of the reference's
    # gather<->segment-sum autograd pairing (gradient_funcs/gather.cpp).
    transpose_buckets: Optional[Tuple[StackedBucket, ...]] = None

    def tree_flatten(self):
        children = (self.buckets, self.send_idx, self.interior_buckets,
                    self.boundary_buckets, self.hub_local_idx,
                    self.hub_perm, self.transpose_buckets)
        aux = (self.shape, self.n_shards, self.rows_per_shard,
               self.cols_per_shard, self.halo_size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (buckets, send_idx, interior, boundary, hub_idx, hub_perm,
         transpose) = children
        shape, s, rps, cps, h = aux
        return cls(buckets=tuple(buckets), send_idx=send_idx, shape=shape,
                   n_shards=s, rows_per_shard=rps, cols_per_shard=cps,
                   halo_size=h,
                   interior_buckets=None if interior is None else tuple(interior),
                   boundary_buckets=None if boundary is None else tuple(boundary),
                   hub_local_idx=hub_idx, hub_perm=hub_perm,
                   transpose_buckets=None if transpose is None else tuple(transpose))

    @property
    def split(self) -> bool:
        return self.interior_buckets is not None

    @property
    def n_hubs(self) -> int:
        return 0 if self.hub_perm is None else int(self.hub_perm.shape[0])

    @property
    def halo_fraction(self) -> float:
        """Exchanged rows / owned rows — comms pressure indicator."""
        return self.n_shards * self.halo_size / max(1, self.cols_per_shard)

    def comm_stats(self, d: int = 128, bytes_per: int = 4) -> dict:
        """Per-shard exchanged bytes: padded halo + hub broadcast vs the
        all_gather baseline (BASELINE.md halo-vs-allgather accounting)."""
        S = self.n_shards
        halo = S * self.halo_size * d * bytes_per
        kmax = 0 if self.hub_local_idx is None else int(
            self.hub_local_idx.shape[1])
        hub = S * kmax * d * bytes_per
        allg = S * self.cols_per_shard * d * bytes_per
        return {"halo_bytes": halo, "hub_bytes": hub,
                "all_gather_bytes": allg,
                "saving": 1.0 - (halo + hub) / max(allg, 1)}


def partition_rows(
    csr: CSR,
    n_shards: int,
    ladder="auto",
    split_boundary: bool = False,
    with_transpose: bool = True,
    replicate_hubs: int = 0,
) -> RowPartitionPlan:
    """Build the plan (host-side, once per graph x shard count).

    With ladder="auto" one global width ladder is chosen from the full
    graph's degree histogram so every shard bins with the same widths
    (SPMD requires identical bucket shapes across shards).

    ``replicate_hubs=K``: the K highest in-degree columns are broadcast
    once per call instead of riding the pairwise halo — bounds the padded
    H on power-law graphs (the reference's id-shuffle dedups hot keys in
    its GPU hash table for the same reason, data_shuffle_kernel.cu:41-130).
    """
    from of_spmm_tpu.sparse.binned import optimal_ladder

    if isinstance(ladder, str):
        if ladder != "auto":
            raise ValueError(f"ladder must be a sequence or 'auto', got {ladder!r}")
        ladder = optimal_ladder(csr)
    n, m = csr.shape
    S = n_shards
    rps = _cdiv(n, S)
    cps = _cdiv(m, S)

    indptr = np.asarray(csr.indptr).astype(np.int64)
    cols = np.asarray(csr.cols).astype(np.int64)
    vals = np.asarray(csr.vals)

    # --- hub selection ----------------------------------------------------
    K = min(replicate_hubs, m)
    hub_rank = np.full(m, -1, dtype=np.int64)
    hub_ids = np.zeros(0, np.int64)
    hub_local_idx = None
    hub_perm = None
    if K:
        indeg = np.bincount(cols, minlength=m)
        hub_ids = np.argsort(-indeg, kind="stable")[:K]
        hub_rank[hub_ids] = np.arange(K, dtype=np.int64)
        owner_h = hub_ids // cps
        kmax = max(int(np.bincount(owner_h, minlength=S).max()), 1)
        hub_local_idx = np.zeros((S, kmax), np.int32)
        hub_perm = np.zeros(K, np.int32)
        slot_of = np.zeros(S, np.int64)
        for r, c in enumerate(hub_ids):
            p = int(owner_h[r])
            k = int(slot_of[p])
            hub_local_idx[p, k] = c - p * cps
            hub_perm[r] = p * kmax + k
            slot_of[p] += 1

    # --- per-shard halo needs -------------------------------------------
    # need[p][q]: sorted unique global cols owned by q (!=p) referenced by A_p
    need = [[np.zeros(0, np.int64) for _ in range(S)] for _ in range(S)]
    shard_slices = []
    for p in range(S):
        r0, r1 = p * rps, min((p + 1) * rps, n)
        lo, hi = indptr[r0], indptr[r1]
        shard_slices.append((r0, r1, lo, hi))
        c = cols[lo:hi]
        uniq = np.unique(c)
        if K:
            uniq = uniq[hub_rank[uniq] < 0]  # hubs ride the broadcast
        owner = uniq // cps
        for q in range(S):
            if q == p:
                continue
            need[p][q] = uniq[owner == q]

    H = max((need[p][q].shape[0] for p in range(S) for q in range(S)), default=0)
    H = max(H, 1)
    H += -H % SUBLANES  # align halo buffer rows

    # --- send plan: p sends need[q][p] (as p-local indices) to q ---------
    send_idx = np.zeros((S, S, H), dtype=np.int32)
    for p in range(S):
        for q in range(S):
            if q == p:
                continue
            idx = need[q][p] - p * cps  # p-local X row indices
            send_idx[p, q, : idx.shape[0]] = idx

    # --- per-shard local CSR with remapped cols, then bin ----------------
    per_shard_binned = []
    per_shard_t_binned = []
    for p in range(S):
        r0, r1, lo, hi = shard_slices[p]
        c = cols[lo:hi]
        v = vals[lo:hi]
        local_indptr = (indptr[r0 : r1 + 1] - lo).astype(np.int64)
        # remap: own cols -> c - p*cps ; halo col from owner q at position j
        # in need[p][q] -> cps + q*H + j
        owner = c // cps
        remapped = np.empty_like(c)
        is_hub = hub_rank[c] >= 0 if K else np.zeros(c.shape[0], bool)
        own = np.logical_and(owner == p, ~is_hub)
        remapped[own] = c[own] - p * cps
        if K:
            remapped[is_hub] = cps + S * H + hub_rank[c[is_hub]]
        for q in range(S):
            if q == p:
                continue
            sel = np.logical_and(owner == q, ~is_hub)
            if not sel.any():
                continue
            pos = np.searchsorted(need[p][q], c[sel])
            remapped[sel] = cps + q * H + pos
        # pad local rows to rps
        pad_rows = rps - (r1 - r0)
        if pad_rows:
            local_indptr = np.concatenate(
                [local_indptr, np.full(pad_rows, local_indptr[-1], np.int64)]
            )
        if with_transpose:
            # A_local^T (cps + S*H, rps): the local backward operator
            local_rows = np.repeat(
                np.arange(rps, dtype=np.int64), np.diff(local_indptr))
            order = np.argsort(remapped, kind="stable")
            t_cols = remapped[order]
            t_counts = np.bincount(t_cols, minlength=cps + S * H + K)
            t_indptr = np.zeros(cps + S * H + K + 1, np.int64)
            np.cumsum(t_counts, out=t_indptr[1:])
            t_csr = CSR.from_arrays(
                t_indptr.astype(np.int64),
                local_rows[order].astype(np.int32),
                v[order],
                (cps + S * H + K, rps),
            )
            per_shard_t_binned.append(bin_rows(t_csr, ladder=ladder))
        if split_boundary:
            # a row is BOUNDARY iff any of its nnz references halo
            # (remapped col >= cps); interior rows gather only local X.
            is_halo = (remapped >= cps).astype(np.int64)
            cum = np.zeros(remapped.shape[0] + 1, np.int64)
            np.cumsum(is_halo, out=cum[1:])
            row_halo = (cum[local_indptr[1:]] - cum[local_indptr[:-1]]) > 0

            def masked_csr(keep_rows: np.ndarray) -> CSR:
                keep_nnz = np.repeat(keep_rows, np.diff(local_indptr))
                counts = np.diff(local_indptr) * keep_rows
                ip = np.zeros(local_indptr.shape[0], np.int64)
                np.cumsum(counts, out=ip[1:])
                return CSR.from_arrays(
                    ip.astype(np.int32),
                    remapped[keep_nnz].astype(np.int32),
                    v[keep_nnz],
                    (rps, cps + S * H + K),
                )

            per_shard_binned.append(
                (bin_rows(masked_csr(~row_halo), ladder=ladder),
                 bin_rows(masked_csr(row_halo), ladder=ladder))
            )
        else:
            local_csr = CSR.from_arrays(
                local_indptr.astype(np.int32),
                remapped.astype(np.int32),
                v,
                (rps, cps + S * H + K),
            )
            per_shard_binned.append(bin_rows(local_csr, ladder=ladder))

    t_buckets = (
        _stack_binned(per_shard_t_binned, ladder) if with_transpose else None
    )
    if split_boundary:
        interior = _stack_binned([a for a, _ in per_shard_binned], ladder)
        boundary = _stack_binned([b for _, b in per_shard_binned], ladder)
        return RowPartitionPlan(
            buckets=(),
            send_idx=jnp.asarray(send_idx),
            shape=csr.shape,
            n_shards=S,
            rows_per_shard=rps,
            cols_per_shard=cps,
            halo_size=H,
            interior_buckets=interior,
            boundary_buckets=boundary,
            hub_local_idx=None if not K else jnp.asarray(hub_local_idx),
            hub_perm=None if not K else jnp.asarray(hub_perm),
            transpose_buckets=t_buckets,
        )
    buckets = _stack_binned(per_shard_binned, ladder)
    return RowPartitionPlan(
        buckets=buckets,
        send_idx=jnp.asarray(send_idx),
        shape=csr.shape,
        n_shards=S,
        rows_per_shard=rps,
        cols_per_shard=cps,
        halo_size=H,
        hub_local_idx=None if not K else jnp.asarray(hub_local_idx),
        hub_perm=None if not K else jnp.asarray(hub_perm),
        transpose_buckets=t_buckets,
    )


def _stack_binned(
    per_shard: Sequence[BinnedEll], ladder: Sequence[int]
) -> Tuple[StackedBucket, ...]:
    """Stack per-shard BinnedElls into uniform (S, R, K) arrays.

    SPMD requires identical shapes on every shard, so each width bucket is
    padded to the max row count over shards (padding rows: row_id 0,
    vals 0 — harmless under scatter-add).
    """
    S = len(per_shard)
    widths = sorted(
        {b.width for sh in per_shard for b in sh.buckets}
    )
    out = []
    for w in widths:
        per = []
        for sh in per_shard:
            found = None
            for b in sh.buckets:
                if b.width == w:
                    found = b
            per.append(found)
        rmax = max((b.n_ell_rows if b is not None else 0) for b in per)
        rmax += -rmax % SUBLANES
        if rmax == 0:
            continue
        rids = np.zeros((S, rmax), np.int32)
        cols = np.zeros((S, rmax, w), np.int32)
        vals = np.zeros((S, rmax, w), np.float32)
        for s, b in enumerate(per):
            if b is None:
                continue
            r = b.n_ell_rows
            b_rids = np.asarray(b.row_ids)
            rids[s, :r] = b_rids
            # keep row_ids ascending through the cross-shard padding too
            if r:
                rids[s, r:] = b_rids[-1]
            cols[s, :r] = np.asarray(b.cols)
            vals[s, :r] = np.asarray(b.vals)
        out.append(
            StackedBucket(
                row_ids=jnp.asarray(rids),
                cols=jnp.asarray(cols),
                vals=jnp.asarray(vals),
            )
        )
    return tuple(out)
