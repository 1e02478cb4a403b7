"""Expansion v2 (single-block lane groups) vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from of_spmm_tpu.sparse.expansion2 import (
    build_expansion2_plan,
    factor_rank1,
)
from of_spmm_tpu.sparse.formats import CSR


def _rand_csr(n, m, density, seed=0, rank1=False):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, m)) < density).astype(np.float32)
    if rank1:
        # sym-normalized pattern: vals = deg_out^-1/2 * deg_in^-1/2
        dr = dense.sum(1)
        dc = dense.sum(0)
        with np.errstate(divide="ignore", invalid="ignore"):
            sr = np.where(dr > 0, dr ** -0.5, 0.0)
            sc = np.where(dc > 0, dc ** -0.5, 0.0)
        dense = dense * sr[:, None] * sc[None, :]
    else:
        dense *= rng.standard_normal((n, m)).astype(np.float32)
    return CSR.from_dense(dense.astype(np.float32)), dense.astype(np.float32)


def test_factor_rank1_detects_normalizations():
    csr, _ = _rand_csr(80, 80, 0.1, rank1=True)
    assert factor_rank1(csr) is not None
    csr2, _ = _rand_csr(80, 80, 0.1, rank1=False)
    assert factor_rank1(csr2) is None
    # unweighted pattern is rank-1 with unit factors
    rng = np.random.default_rng(3)
    pat = (rng.random((50, 60)) < 0.1).astype(np.float32)
    assert factor_rank1(CSR.from_dense(pat)) is not None


@pytest.mark.parametrize("n,m,density", [(300, 257, 0.05), (64, 2000, 0.01)])
@pytest.mark.parametrize("rank1", [False, True])
def test_expansion2_matches_dense(n, m, density, rank1):
    csr, dense = _rand_csr(n, m, density, rank1=rank1)
    plan = build_expansion2_plan(csr, R=64, G=2, stage_tier=512)
    assert plan.rank1 == rank1
    from of_spmm_tpu.ops.pallas.expansion2 import spmm_expansion2

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (m, 128)).astype(np.float32))
    got = np.asarray(spmm_expansion2(plan, x, interpret=True))
    want = dense @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-4)


def test_expansion2_bf16_fast_mode():
    csr, dense = _rand_csr(128, 300, 0.05, rank1=True)
    plan = build_expansion2_plan(csr, R=64, G=2, stage_tier=512)
    from of_spmm_tpu.ops.pallas.expansion2 import spmm_expansion2

    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (300, 64)).astype(np.float32))
    got = np.asarray(
        spmm_expansion2(plan, x.astype(jnp.bfloat16), interpret=True)
    ).astype(np.float32)
    want = dense @ np.asarray(x)
    # bf16-level numerics: absolute error scales with term magnitudes
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)


def test_expansion2_empty_rows_and_uneven_tiles():
    # rows with no nonzeros and a final partial tile
    rng = np.random.default_rng(4)
    dense = np.zeros((70, 90), np.float32)
    mask = rng.random((70, 90)) < 0.04
    mask[10:20] = False       # empty rows
    dense[mask] = rng.standard_normal(int(mask.sum())).astype(np.float32)
    csr = CSR.from_dense(dense)
    plan = build_expansion2_plan(csr, R=32, G=2, stage_tier=128)
    from of_spmm_tpu.ops.pallas.expansion2 import spmm_expansion2

    x = jnp.asarray(rng.standard_normal((90, 32)).astype(np.float32))
    got = np.asarray(spmm_expansion2(plan, x, interpret=True))
    np.testing.assert_allclose(got, dense @ np.asarray(x),
                               rtol=2e-4, atol=5e-4)


def test_expansion2_multi_group_budget():
    csr, dense = _rand_csr(256, 128, 0.06, seed=5)
    plan = build_expansion2_plan(csr, R=32, G=2, stage_tier=128,
                                 stage_budget=256)
    assert len(plan.groups) > 1
    from of_spmm_tpu.ops.pallas.expansion2 import spmm_expansion2

    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (128, 64)).astype(np.float32))
    got = np.asarray(spmm_expansion2(plan, x, interpret=True))
    np.testing.assert_allclose(got, dense @ np.asarray(x),
                               rtol=2e-4, atol=5e-4)
