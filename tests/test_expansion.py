"""One-hot expansion SpMM engine vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from of_spmm_tpu.ops.autograd import make_operator, spmm
from of_spmm_tpu.ops import reference as ref
from of_spmm_tpu.sparse.expansion import build_expansion_plan
from of_spmm_tpu.sparse.formats import CSR


def _rand_csr(n, m, density, seed=0, symmetric=False):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, m)) < density).astype(np.float32)
    dense *= rng.standard_normal((n, m)).astype(np.float32)
    if symmetric:
        dense = dense + dense.T
    return CSR.from_dense(dense), dense


@pytest.mark.parametrize("n,m,density", [(300, 257, 0.05), (64, 2000, 0.01)])
def test_expansion_matches_dense(n, m, density):
    csr, dense = _rand_csr(n, m, density)
    plan = build_expansion_plan(csr, R=64, TILE=256, CW=128, stage_tier=512)
    from of_spmm_tpu.ops.pallas.expansion import spmm_expansion

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (m, 128)).astype(np.float32))
    got = np.asarray(spmm_expansion(plan, x, interpret=True))
    want = dense @ np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-4)


def test_expansion_operator_fwd_bwd_symmetric():
    csr, dense = _rand_csr(128, 128, 0.08, symmetric=True)
    op = make_operator(csr, layout="expansion", place=False)
    assert op.transpose_aliased
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (128, 64)).astype(np.float32))

    y = spmm(op, x)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x),
                               rtol=2e-4, atol=5e-4)

    def loss(x):
        return jnp.sum(spmm(op, x) ** 2)

    g = jax.grad(loss)(x)
    want_g = 2 * dense.T @ (dense @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), want_g, rtol=5e-4, atol=2e-3)


def test_expansion_operator_asymmetric_transpose():
    csr, dense = _rand_csr(96, 200, 0.05)
    op = make_operator(csr, layout="expansion", place=False)
    assert not op.transpose_aliased
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (200, 32)).astype(np.float32))
    g = jnp.asarray(np.random.default_rng(4).standard_normal(
        (96, 32)).astype(np.float32))

    y, vjp = jax.vjp(lambda x: spmm(op, x), x)
    (dx,) = vjp(g)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x),
                               rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dx), dense.T @ np.asarray(g),
                               rtol=2e-4, atol=5e-4)


def test_expansion_plan_stats():
    csr, _ = _rand_csr(256, 256, 0.05, symmetric=True)
    plan = build_expansion_plan(csr, R=64, TILE=128, CW=128, stage_tier=128)
    assert plan.n_steps > 0
    assert 0 < plan.padding_efficiency(csr.nnz) <= 1.0
    assert plan.n_staged > 0


def test_expansion_multigroup_matches_dense():
    csr, dense = _rand_csr(256, 300, 0.06, seed=9)
    # tiny stage budget forces multiple groups
    plan = build_expansion_plan(csr, R=32, TILE=128, CW=128, stage_tier=128,
                                stage_budget=64)
    assert len(plan.groups) > 2
    from of_spmm_tpu.ops.pallas.expansion import spmm_expansion
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (300, 64)).astype(np.float32))
    got = np.asarray(spmm_expansion(plan, x, interpret=True))
    np.testing.assert_allclose(got, dense @ np.asarray(x),
                               rtol=2e-4, atol=5e-4)


def test_expansion_bf16_fast_mode():
    import jax.numpy as jnp

    csr, dense = _rand_csr(128, 128, 0.08, symmetric=True)
    plan = build_expansion_plan(csr, R=64, TILE=128, CW=128, stage_tier=512)
    from of_spmm_tpu.ops.pallas.expansion import spmm_expansion

    x = np.random.default_rng(7).standard_normal((128, 64)).astype(np.float32)
    got = np.asarray(spmm_expansion(
        plan, jnp.asarray(x).astype(jnp.bfloat16), interpret=True)
    ).astype(np.float32)
    want = dense @ x
    # bf16 inputs: expect bf16-level accuracy, not fp32 parity
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * max(scale, 1.0)
