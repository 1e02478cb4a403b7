"""Fused-engine plan build + numpy step simulator vs the dense oracle.

The simulator (sparse/fused_sim.py) replays the exact kernel schedule
(staging DMAs, parity buffers, hi/lo splits, one-hot windows), so these
tests pin the PLAN's correctness independently of the Pallas kernel."""

import numpy as np
import pytest

from of_spmm_tpu.sparse.formats import CSR
from of_spmm_tpu.sparse.fused import build_fused_plan, choose_hot
from of_spmm_tpu.sparse.fused_sim import simulate

RTOL, ATOL = 1e-4, 1e-5


def _graph(n, m, density, seed=0, rank1=False, skew=False):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, m)) < density).astype(np.float32)
    if skew:
        # a few hub columns referenced by most rows (power-law-ish)
        hubs = rng.choice(m, size=max(m // 50, 1), replace=False)
        dense[:, hubs] = (rng.random((n, hubs.shape[0])) < 0.6).astype(
            np.float32)
    if rank1:
        r = rng.random(n).astype(np.float32) + 0.5
        c = rng.random(m).astype(np.float32) + 0.5
        dense = dense * r[:, None] * c[None, :]
    else:
        dense = dense * rng.random((n, m)).astype(np.float32)
    return dense, CSR.from_dense(dense)


@pytest.mark.parametrize("rank1", [False, True])
@pytest.mark.parametrize("n,R,T", [(700, 128, 256), (1500, 256, 512)])
def test_fused_sim_matches_dense(rank1, n, R, T):
    dense, csr = _graph(n, n, 0.02, rank1=rank1, seed=3)
    plan = build_fused_plan(csr, R=R, T=T, hot_budget=256, hot_min_run=1)
    x = np.random.default_rng(1).standard_normal((n, 16)).astype(np.float32)
    got = simulate(plan, x)
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_sim_with_hot_cache_skewed():
    dense, csr = _graph(900, 900, 0.01, skew=True, rank1=True, seed=7)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=512, hot_min_run=2)
    assert plan.n_hot > 0, "skewed graph should produce a hot table"
    x = np.random.default_rng(2).standard_normal((900, 8)).astype(np.float32)
    got = simulate(plan, x)
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_plan_multi_segment():
    dense, csr = _graph(1024, 1024, 0.02, rank1=True, seed=5)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=0,
                            seg_steps=8)  # force several segments
    assert len(plan.segments) > 1
    x = np.random.default_rng(4).standard_normal((1024, 8)).astype(
        np.float32)
    got = simulate(plan, x)
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_plan_hbm_budget_splits_and_rejects():
    """Plan-time memory planning (VERDICT r2 item 1): a tight HBM limit
    must cut segments so the largest staged table fits the budget model
    (sparse/fused.py plan_memory_report), and an impossible limit must
    raise CapacityError instead of OOMing at run time (the reference
    plans memory at compile time: oneflow/core/job/compiler.cpp:107)."""
    from of_spmm_tpu.sparse.fused import plan_memory_report
    from of_spmm_tpu.utils.errors import CapacityError

    dense, csr = _graph(1500, 1500, 0.03, rank1=True, seed=9)
    big = build_fused_plan(csr, R=128, T=256, hot_budget=0, s_cap=256,
                           hbm_limit=1 << 40)
    rep = plan_memory_report(big, d=128, hbm_limit=1 << 40)
    assert rep["fits"]
    fixed = rep["peak_bytes"] - int(1.5 * rep["max_table_bytes"])
    # limit sized so the per-segment staged table must shrink ~3x
    cap_bytes = int(1.5 * rep["max_table_bytes"] / 3)
    tight_limit = int((fixed + cap_bytes) / 0.80) + 1
    tight = build_fused_plan(csr, R=128, T=256, hot_budget=0, s_cap=256,
                             hbm_limit=tight_limit)
    assert len(tight.segments) > len(big.segments)
    rep_t = plan_memory_report(tight, d=128, hbm_limit=tight_limit)
    assert rep_t["fits"]
    assert rep_t["max_table_bytes"] < rep["max_table_bytes"]
    # numerics unchanged by the re-segmentation
    x = np.random.default_rng(6).standard_normal((1500, 8)).astype(
        np.float32)
    np.testing.assert_allclose(
        simulate(tight, x), dense @ x, rtol=RTOL,
        atol=ATOL * np.abs(dense @ x).max() + ATOL)
    # an impossible budget (below the fixed plan-array cost) rejects
    with pytest.raises(CapacityError, match="cannot fit"):
        build_fused_plan(csr, R=128, T=256, hot_budget=0, s_cap=256,
                         hbm_limit=int(fixed * 0.5))


def test_hot_cache_cuts_staging():
    dense, csr = _graph(1200, 1200, 0.008, skew=True, rank1=True, seed=9)
    cold = build_fused_plan(csr, R=128, T=256, hot_budget=0)
    hot = build_fused_plan(csr, R=128, T=256, hot_budget=1024,
                           hot_min_run=2)
    assert hot.n_staged < cold.n_staged, (hot.n_staged, cold.n_staged)


def test_choose_hot_picks_top_touch_sorted():
    """choose_hot keeps the most-touched columns and returns them sorted
    by node id (community hubs then share hot blocks on clustered
    orderings — r4 contract; the SELECTION is still by touch count)."""
    dense, csr = _graph(600, 600, 0.01, skew=True, seed=11)
    ids = choose_hot(csr, R=128, hot_budget=256, min_run=1)
    if ids.shape[0] >= 128:
        assert np.all(np.diff(ids) > 0)  # sorted, unique
        cols = np.asarray(csr.cols)
        rows = np.repeat(np.arange(600), np.diff(np.asarray(csr.indptr)))
        touch = np.zeros(600)
        for t in range(5):
            sel = (rows // 128) == t
            touch += np.isin(np.arange(600), cols[sel])
        out = np.setdiff1d(np.arange(600), ids)
        # the selected set is more touched than the rest
        assert touch[ids].mean() >= touch[out].mean()


# --- the Pallas kernel (interpret mode on CPU) -------------------------------


@pytest.mark.parametrize("rank1", [True, False])
def test_fused_kernel_matches_dense(rank1):
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    dense, csr = _graph(700, 700, 0.02, rank1=rank1, seed=13)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=256, hot_min_run=1)
    x = np.random.default_rng(5).standard_normal((700, 16)).astype(
        np.float32)
    got = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_kernel_wide_features_and_segments():
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    dense, csr = _graph(512, 512, 0.03, rank1=True, seed=17, skew=True)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=256,
                            hot_min_run=1, seg_steps=8)
    assert len(plan.segments) > 1
    x = np.random.default_rng(6).standard_normal((512, 200)).astype(
        np.float32)  # > 128 features -> two slabs
    got = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


# --- device SpGEMM (VERDICT r1 item 4) ---------------------------------------


def test_spgemm_device_matches_host():
    import jax.numpy as jnp  # noqa: F401

    from of_spmm_tpu.ops.autograd import spgemm_device
    from of_spmm_tpu.ops.reference import spgemm as spgemm_host

    rng = np.random.default_rng(0)
    a = CSR.from_dense((rng.random((60, 50)) < 0.1).astype(np.float32)
                       * rng.random((60, 50)).astype(np.float32))
    b = CSR.from_dense((rng.random((50, 70)) < 0.1).astype(np.float32)
                       * rng.random((50, 70)).astype(np.float32))
    c_dev, plan = spgemm_device(a, b)
    c_host = spgemm_host(a, b)
    np.testing.assert_array_equal(np.asarray(c_dev.cols),
                                  np.asarray(c_host.cols))
    np.testing.assert_allclose(np.asarray(c_dev.vals),
                               np.asarray(c_host.vals), rtol=1e-5)
    # plan reuse with fresh values (training-loop case)
    a2 = CSR(indptr=a.indptr, cols=a.cols,
             vals=np.asarray(a.vals) * 2.0, shape=a.shape)
    c2, _ = spgemm_device(a2, b, plan)
    np.testing.assert_allclose(np.asarray(c2.vals),
                               2 * np.asarray(c_dev.vals), rtol=1e-5)


def test_spgemm_device_empty():
    from of_spmm_tpu.ops.autograd import spgemm_device

    a = CSR.from_dense(np.zeros((4, 5), np.float32))
    b = CSR.from_dense(np.zeros((5, 6), np.float32))
    c, plan = spgemm_device(a, b)
    assert c.nnz == 0 and plan.out_nnz == 0


def test_fused_operator_spmm_and_grad():
    """layout=\"fused\" through the operator API: forward + transpose-plan
    backward via the existing custom_vjp pairing."""
    import jax
    import jax.numpy as jnp

    from of_spmm_tpu.ops.autograd import make_operator, spmm

    dense, csr = _graph(600, 600, 0.02, rank1=True, seed=21)
    op = make_operator(csr, layout="fused", place=False)
    x = np.random.default_rng(7).standard_normal((600, 16)).astype(
        np.float32)
    w = np.random.default_rng(8).standard_normal((600, 16)).astype(
        np.float32)
    y = spmm(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=RTOL,
                               atol=ATOL * np.abs(dense @ x).max() + ATOL)
    g = jax.grad(lambda xx: jnp.sum(spmm(op, xx) * w))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), dense.T @ w, rtol=RTOL,
                               atol=ATOL * np.abs(dense.T @ w).max() + ATOL)


def test_fused_hub_tile_splitting():
    """Hub tiles whose staged list exceeds the cap split into virtual
    tiles that revisit the same output block (bounds the VMEM staging
    scratch on power-law graphs)."""
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    rng = np.random.default_rng(23)
    n = 512
    dense = (rng.random((n, n)) < 0.02).astype(np.float32)
    dense[:128, :] = (rng.random((128, n)) < 0.6).astype(np.float32)  # hub rows
    csr = CSR.from_dense(dense)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=0, s_cap=256)
    assert plan.S_buf <= 256 + 128
    n_meta = sum(
        int((np.asarray(seg.ctrl)[:, 0, 1] == 1).sum())
        for seg in plan.segments)
    assert n_meta > -(-n // 128)  # more virtual tiles than output blocks
    x = rng.standard_normal((n, 8)).astype(np.float32)
    got_sim = simulate(plan, x)
    got_k = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    want = dense @ x
    np.testing.assert_allclose(got_sim, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
    np.testing.assert_allclose(got_k, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_gcn_train_step():
    """End-to-end: a GCN training step over the fused-engine operator
    (forward + transpose-plan backward through the model loss)."""
    import jax
    import jax.numpy as jnp

    from of_spmm_tpu.models import GCN
    from of_spmm_tpu.models.gcn import normalized_adjacency
    from of_spmm_tpu.ops.autograd import make_operator

    rng = np.random.default_rng(31)
    n, d, c = 400, 16, 4
    dense = (rng.random((n, n)) < 0.02).astype(np.float32)
    np.fill_diagonal(dense, 0)
    csr = normalized_adjacency(CSR.from_dense(dense))
    op = make_operator(csr, layout="fused", place=False)
    model = GCN(feature_dims=(d, 8, c))
    params = model.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    loss, grads = jax.value_and_grad(model.loss_fn)(params, op, x, y)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("rank1", [True, False])
def test_fused_chunks_staging(rank1):
    """staging="chunks": XLA tier-major staged table + 128-row block
    copies — sim and kernel must both match the dense oracle."""
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    dense, csr = _graph(900, 900, 0.02, rank1=rank1, seed=41, skew=True)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=256,
                            hot_min_run=1, staging="chunks",
                            stage_tier=256)
    assert plan.staging == "chunks"
    x = np.random.default_rng(9).standard_normal((900, 16)).astype(
        np.float32)
    want = dense @ x
    got_sim = simulate(plan, x)
    np.testing.assert_allclose(got_sim, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
    got_k = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    np.testing.assert_allclose(got_k, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_chunks_with_virtual_tiles():
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    rng = np.random.default_rng(43)
    n = 512
    dense = (rng.random((n, n)) < 0.02).astype(np.float32)
    dense[:128, :] = (rng.random((128, n)) < 0.5).astype(np.float32)
    csr = CSR.from_dense(dense)
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=0,
                            staging="chunks", stage_tier=128, s_cap=256)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    want = dense @ x
    np.testing.assert_allclose(simulate(plan, x), want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
    got_k = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    np.testing.assert_allclose(got_k, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_fused_duplicate_edges_coalesce():
    """Duplicate (row, col) entries must be coalesced by the plan build:
    a multi-hot bitmask bit has no multiplicity, so an un-coalesced
    duplicate would silently drop one copy (found as a 0.15 rel error on
    self-loop rows of a graph normalized twice)."""
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    rng = np.random.default_rng(11)
    n = 260
    rows, cols = [], []
    for i in range(n):
        nb = rng.choice(n, size=4, replace=False)
        rows += [i] * 4 + [i, i]          # two duplicate self-loops
        cols += nb.tolist() + [i, i]
    rows, cols = np.asarray(rows), np.asarray(cols)
    order = np.argsort(rows * n + cols, kind="stable")
    rows, cols = rows[order], cols[order]
    vals = np.ones(rows.shape[0], np.float32)  # would factor "unweighted"
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    csr = CSR(indptr=indptr, cols=cols.astype(np.int32), vals=vals,
              shape=(n, n))
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), 1.0)    # duplicates SUM in the oracle
    x = np.random.default_rng(5).standard_normal((n, 8)).astype(np.float32)
    want = dense @ x
    plan = build_fused_plan(csr, R=128, T=256, hot_budget=0,
                            staging="chunks", stage_tier=128)
    assert not plan.multihot  # coalesced value 2.0 no longer factors
    np.testing.assert_allclose(simulate(plan, x), want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
    got = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


@pytest.mark.parametrize("unweighted", [False, True])
def test_fused_window_mode(unweighted):
    """window=True: every step's lanes share one 128-row dst window (the
    scatter one-hot is (128, T)); sim + kernel must match the oracle,
    including hub-split virtual tiles (s_cap) and multi-hot lanes."""
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.fused import spmm_fused

    rng = np.random.default_rng(17)
    n = 1024
    dense = (rng.random((n, n)) < 0.03).astype(np.float32)
    dense[:, :24] = (rng.random((n, 24)) < 0.7).astype(np.float32)  # hubs
    if not unweighted:
        dense = dense * rng.random((n, n)).astype(np.float32)
    csr = CSR.from_dense(dense)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    want = dense @ x
    plan = build_fused_plan(csr, R=256, T=512, hot_budget=128,
                            hot_min_run=1, staging="chunks",
                            stage_tier=256, s_cap=512, window=True)
    assert plan.window
    assert plan.multihot == unweighted  # vals==1 factor as rank-1
    # every compute step is dst-window-homogeneous by construction
    for seg in plan.segments:
        ctrl = np.asarray(seg.ctrl)
        assert ctrl[:, 0, 10].max() < plan.R // 128
    np.testing.assert_allclose(simulate(plan, x), want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
    got = np.asarray(spmm_fused(plan, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


def test_spgemm_padded_matches_host():
    """Bucket-padded numeric plan (VERDICT r3 item 5): gathers from the
    small value tables + reshape-sum, no device scatter."""
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.ops.autograd import (spgemm_numeric_padded,
                                          spgemm_symbolic_padded)
    from of_spmm_tpu.ops.reference import spgemm as spgemm_host
    from of_spmm_tpu.sparse.formats import CSR

    rng = np.random.default_rng(5)
    da = (rng.random((200, 160)) < 0.08) * rng.standard_normal((200, 160))
    db = (rng.random((160, 180)) < 0.08) * rng.standard_normal((160, 180))
    a = CSR.from_dense(da.astype(np.float32))
    b = CSR.from_dense(db.astype(np.float32))
    plan = spgemm_symbolic_padded(a, b, max_width=8)  # exercise splits
    vals = np.asarray(spgemm_numeric_padded(
        plan.buckets, jnp.asarray(np.asarray(a.vals)),
        jnp.asarray(np.asarray(b.vals))))
    got = np.zeros(a.shape[0] * b.shape[1], np.float64)
    np.add.at(got, plan.rows.astype(np.int64) * b.shape[1] + plan.cols,
              vals.astype(np.float64))
    want = (da @ db).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max() + 1e-6)
    # products count preserved (no silent drops)
    c_host = spgemm_host(a, b)
    assert plan.rows.shape[0] >= c_host.nnz


def test_spgemm_products_matches_host():
    """Product-form numeric (r5, VERDICT r4 item 5): COO-with-dups
    values in product order — A side one permutation gather, B side ELL
    row gathers — merge equals the dense product."""
    import jax.numpy as jnp
    import numpy as np

    from of_spmm_tpu.ops.autograd import (spgemm_numeric_products,
                                          spgemm_symbolic_products)
    from of_spmm_tpu.sparse.formats import CSR

    rng = np.random.default_rng(9)
    da = (rng.random((150, 170)) < 0.09) * rng.standard_normal((150, 170))
    db = (rng.random((170, 140)) < 0.07) * rng.standard_normal((170, 140))
    a = CSR.from_dense(da.astype(np.float32))
    b = CSR.from_dense(db.astype(np.float32))
    plan = spgemm_symbolic_products(a, b, ladder=(1, 2, 4, 8, 16, 32))
    vals = np.asarray(spgemm_numeric_products(
        plan, jnp.asarray(np.asarray(a.vals)),
        jnp.asarray(np.asarray(b.vals))))
    assert vals.shape[0] == plan.n_out == plan.rows.shape[0]
    got = np.zeros(a.shape[0] * b.shape[1], np.float64)
    np.add.at(got, plan.rows.astype(np.int64) * b.shape[1] + plan.cols,
              vals.astype(np.float64))
    want = (da @ db).ravel()
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max() + 1e-6)


def test_spgemm_products_empty_and_ladder_cap():
    import numpy as np
    import pytest

    from of_spmm_tpu.ops.autograd import spgemm_symbolic_products
    from of_spmm_tpu.sparse.formats import CSR

    z = CSR.from_dense(np.zeros((8, 8), np.float32))
    plan = spgemm_symbolic_products(z, z)
    assert plan.n_out == 0 and plan.n_products == 0
    # rows wider than the ladder cap split into partial slabs (r5 —
    # the r4 behavior raised ValueError)
    d = CSR.from_dense(np.ones((4, 4), np.float32))
    plan = spgemm_symbolic_products(d, d, ladder=(1, 2))
    assert plan.n_products == 4 * 4 * 4
    import jax.numpy as jnp

    from of_spmm_tpu.ops.autograd import spgemm_numeric_products

    ones = jnp.ones(16, jnp.float32)
    vals = np.asarray(spgemm_numeric_products(plan, ones, ones))
    out = np.zeros((4, 4), np.float32)
    np.add.at(out, (plan.rows, plan.cols), vals)
    np.testing.assert_allclose(out, np.full((4, 4), 4.0), rtol=1e-6)


def test_spgemm_products_big_rows():
    """Product-form symbolic splits B rows wider than the ladder cap
    into wmax-wide partial slabs (arxiv-class power-law degree; r5)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from of_spmm_tpu.ops.autograd import (spgemm_numeric_products,
                                          spgemm_symbolic_products)
    from of_spmm_tpu.sparse.formats import CSR

    rng = np.random.default_rng(11)
    n = 400
    dense = rng.random((n, n)) < 0.01
    dense[7, :] |= rng.random(n) < 0.9   # degree ~360 > cap 64
    A = sp.csr_matrix(dense.astype(np.float32))
    A.data[:] = rng.standard_normal(A.nnz).astype(np.float32)
    csr = CSR.from_arrays(A.indptr.astype(np.int64),
                          A.indices.astype(np.int32), A.data, (n, n))
    plan = spgemm_symbolic_products(csr, csr, ladder=(1, 4, 16, 64))
    vals = spgemm_numeric_products(plan, jnp.asarray(A.data),
                                   jnp.asarray(A.data))
    C = sp.coo_matrix((np.asarray(vals), (plan.rows, plan.cols)),
                      shape=(n, n)).toarray()
    Cref = (A @ A).toarray()
    assert np.abs(C - Cref).max() <= 1e-5 * max(np.abs(Cref).max(), 1)
