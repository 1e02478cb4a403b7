"""Locality reordering (sparse/reorder.py): BFS relabel recovers band
structure a random id shuffle destroys, and the ranges engine stays exact
through the operator's to_internal/from_internal boundary."""

import numpy as np
import pytest

from of_spmm_tpu.sparse.formats import COO, CSR
from of_spmm_tpu.sparse.reorder import (
    bfs_order, locality_stats, reorder_locality)

RTOL, ATOL = 1e-4, 1e-5


def _clustered_graph(n=1024, n_comm=16, p_in=0.15, p_out=0.002, seed=0,
                     shuffle=True):
    """Stochastic block model with strong communities, ids shuffled."""
    rng = np.random.default_rng(seed)
    comm = np.sort(rng.integers(0, n_comm, n))
    dense = (rng.random((n, n)) < p_out).astype(np.float32)
    same = comm[:, None] == comm[None, :]
    dense[same] = (rng.random(int(same.sum())) < p_in).astype(np.float32)
    np.fill_diagonal(dense, 0)
    dense *= rng.random((n, n)).astype(np.float32)
    if shuffle:
        perm = rng.permutation(n)
        dense = dense[perm][:, perm]
    return dense, CSR.from_dense(dense)


def test_bfs_order_is_permutation():
    _, csr = _clustered_graph(seed=1)
    order = bfs_order(csr)
    assert np.array_equal(np.sort(order), np.arange(csr.shape[0]))


def test_reorder_recovers_band_coverage():
    """A shuffled SBM has poor band coverage; label-propagation relabel
    (the default) restores nearly all of the unshuffled layout's coverage
    — the ranges-engine win. BFS is kept as a cheaper fallback and must
    at least not hurt."""
    dense_c, csr_c = _clustered_graph(seed=2, shuffle=False)
    dense_s, csr_s = _clustered_graph(seed=2, shuffle=True)
    w = 128
    cov_clustered = locality_stats(csr_c, R=64, window=w)["band_coverage"]
    cov_shuffled = locality_stats(csr_s, R=64, window=w)["band_coverage"]
    re_csr, _, _ = reorder_locality(csr_s)  # lp default
    cov_reordered = locality_stats(re_csr, R=64, window=w)["band_coverage"]
    assert cov_shuffled < 0.7 * cov_clustered, (cov_shuffled, cov_clustered)
    assert cov_reordered > 0.9 * cov_clustered, (cov_reordered,
                                                 cov_clustered)
    bfs_csr, _, _ = reorder_locality(csr_s, method="bfs")
    cov_bfs = locality_stats(bfs_csr, R=64, window=w)["band_coverage"]
    assert cov_bfs >= cov_shuffled * 0.95


def test_reorder_preserves_spmm_semantics():
    dense, csr = _clustered_graph(seed=3)
    re_csr, ofn, nfo = reorder_locality(csr)
    x = np.random.default_rng(4).standard_normal(
        (csr.shape[0], 8)).astype(np.float32)
    # P A P^T (P x) = P (A x)
    y_int = np.zeros_like(x)
    rows = np.repeat(np.arange(csr.shape[0]),
                     np.diff(np.asarray(re_csr.indptr)))
    np.add.at(y_int, rows,
              np.asarray(re_csr.vals)[:, None]
              * x[ofn][np.asarray(re_csr.cols)])
    np.testing.assert_allclose(y_int[nfo], dense @ x, rtol=RTOL,
                               atol=ATOL * np.abs(dense @ x).max() + ATOL)


@pytest.mark.parametrize("layout", ["ranges", "fused"])
def test_operator_with_reorder_matches_dense(layout):
    import jax
    import jax.numpy as jnp

    from of_spmm_tpu.ops.autograd import make_operator, spmm

    dense, csr = _clustered_graph(n=640, seed=5)
    op = make_operator(csr, layout=layout, place=False, reorder="bfs")
    assert op.relabeled
    x = np.random.default_rng(6).standard_normal((640, 8)).astype(
        np.float32)
    w = np.random.default_rng(7).standard_normal((640, 8)).astype(
        np.float32)
    y = spmm(op, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=RTOL,
                               atol=ATOL * np.abs(dense @ x).max() + ATOL)
    g = jax.grad(lambda xx: jnp.sum(spmm(op, xx) * w))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), dense.T @ w, rtol=RTOL,
                               atol=ATOL * np.abs(dense.T @ w).max() + ATOL)


def test_reorder_rejects_rectangular():
    rng = np.random.default_rng(8)
    csr = CSR.from_dense((rng.random((10, 20)) < 0.3).astype(np.float32))
    with pytest.raises(ValueError, match="square"):
        reorder_locality(csr)
