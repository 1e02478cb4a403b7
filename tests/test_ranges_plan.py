"""Ranges-engine plan build + numpy step simulator vs the dense oracle.

The simulator (sparse/ranges_sim.py) replays the exact kernel schedule
(range block copies, scattered row DMAs, parity buffers, hi/lo splits,
multi-hot windows), so these tests pin the PLAN's correctness
independently of the Pallas kernel — the fused-engine test strategy
(tests/test_fused_plan.py)."""

import numpy as np
import pytest

from of_spmm_tpu.sparse.formats import CSR
from of_spmm_tpu.sparse.ranges import build_ranges_plan
from of_spmm_tpu.sparse.ranges_sim import simulate

RTOL, ATOL = 1e-4, 1e-5


def _graph(n, m, density, seed=0, rank1=False, skew=False, banded=0.0):
    rng = np.random.default_rng(seed)
    dense = (rng.random((n, m)) < density).astype(np.float32)
    if banded:
        # community-style locality: extra mass near the diagonal band
        for i in range(n):
            lo = max(0, (i * m // n) - 64)
            band = rng.random(min(128, m - lo)) < banded
            dense[i, lo:lo + band.shape[0]] += band
        dense = (dense > 0).astype(np.float32)
    if skew:
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


def _check(plan, dense, d=8, seed=1):
    x = np.random.default_rng(seed).standard_normal(
        (dense.shape[1], d)).astype(np.float32)
    got = simulate(plan, x)
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)


@pytest.mark.parametrize("rank1", [False, True])
def test_ranges_sim_single_range(rank1):
    """Whole matrix fits one range window: no scattered, no hot."""
    dense, csr = _graph(768, 768, 0.02, rank1=rank1, seed=3)
    plan = build_ranges_plan(csr, T=256, hot_budget=0)
    assert plan.n_ranges == 1
    assert plan.n_scattered == 0
    _check(plan, dense)


@pytest.mark.parametrize("rank1", [False, True])
def test_ranges_sim_switching_and_scattered(rank1):
    """Small range window on a banded graph: ranges must switch as tiles
    advance, and off-band columns ride the scattered path."""
    dense, csr = _graph(1024, 1024, 0.004, rank1=rank1, seed=5,
                        banded=0.3)
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256)
    assert plan.n_ranges > 2
    assert plan.n_scattered > 0
    _check(plan, dense)


def test_ranges_sim_hot_and_skew():
    dense, csr = _graph(900, 900, 0.01, skew=True, rank1=True, seed=7,
                        banded=0.2)
    plan = build_ranges_plan(csr, T=256, hot_budget=512, hot_min_run=2,
                             range_cap=256)
    assert plan.n_hot > 0
    _check(plan, dense)


def test_ranges_multi_segment():
    dense, csr = _graph(1024, 1024, 0.01, rank1=True, seed=9, banded=0.3)
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256,
                             seg_steps=8)
    assert len(plan.segments) > 1
    _check(plan, dense)


def test_ranges_scattered_overflow_pieces():
    """Scattered unique count beyond s_cap splits into virtual tiles."""
    dense, csr = _graph(512, 2048, 0.15, rank1=True, seed=11)
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256,
                             s_cap=256)
    # at least one output tile must have been split
    n_meta = sum(seg.n_steps for seg in plan.segments)
    assert plan.n_scattered > 256
    _check(plan, dense)


def test_ranges_duplicate_edges_coalesce():
    rng = np.random.default_rng(13)
    n = 400
    rows = rng.integers(0, n, 4000)
    cols = rng.integers(0, n, 4000)
    vals = rng.random(4000).astype(np.float32)
    from of_spmm_tpu.sparse.formats import COO

    csr = CSR.from_coo(COO.from_arrays(
        rows.astype(np.int32), cols.astype(np.int32), vals, (n, n)))
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256)
    _check(plan, dense)


def test_ranges_short_lived_ranges():
    """Every tile opens a new short range (weakly clustered graph):
    RMAX must be sized for fill_range's span-1 copy schedule (ADVICE r3
    — ceil(n_rq/prev_steps) overflowed the rcopy rows and plan build
    died with a broadcast ValueError)."""
    n = 512
    dense = np.zeros((n, n), np.float32)
    rng = np.random.default_rng(17)
    for t in range(n // 128):
        # each 128-row tile's mass sits in its own distinct column band
        lo = (t * 131) % (n - 128)
        blk = (rng.random((128, 128)) < 0.5).astype(np.float32)
        dense[t * 128:(t + 1) * 128, lo:lo + 128] += blk
    dense = (dense > 0).astype(np.float32)
    csr = CSR.from_dense(dense)
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256,
                             rq=128)
    assert plan.n_ranges >= 3
    _check(plan, dense)


def test_ranges_seg_stage_cap_cuts_inside_range():
    """One long-lived range with heavy scattered volume: the per-segment
    stage cap must cut segments at tile boundaries even when no new
    range opens (ADVICE r3 — otherwise one segment's take table grows
    unboundedly and recreates the round-2 OOM)."""
    dense, csr = _graph(1024, 4096, 0.06, rank1=True, seed=23)
    # range covers the first 256 cols for every tile (never switches);
    # the rest is scattered
    dense[:, :256] = 1.0
    csr = CSR.from_dense(dense)
    cap = 2048
    plan = build_ranges_plan(csr, T=256, hot_budget=0, range_cap=256,
                             seg_steps=4096, seg_stage_cap=cap)
    assert plan.n_ranges == 1
    assert len(plan.segments) > 1  # cap forced cuts inside the range
    for seg in plan.segments:
        if seg.stage_take is not None:
            # one tile's staged rows may exceed the cap on its own (a
            # tile cannot be cut); every MULTI-tile segment honours it
            if seg.n_tiles > 1:
                assert seg.stage_take.shape[0] <= cap + 8192
    _check(plan, dense)


def test_ranges_plan_memory_report():
    """The headline engine's HBM model: small plans fit a 16 GB budget,
    components are accounted, and a tiny limit reports not-fits."""
    from of_spmm_tpu.sparse.ranges import plan_memory_report

    dense, csr = _graph(1024, 1024, 0.01, rank1=True, seed=31, banded=0.3)
    plan = build_ranges_plan(csr, T=256, hot_budget=256, hot_min_run=1,
                             range_cap=256)
    rep = plan_memory_report(plan, d=128, hbm_limit=16 << 30)
    assert rep["fits"]
    assert rep["peak_bytes"] >= (rep["plan_bytes"] + rep["x_bytes"]
                                 + rep["out_bytes"])
    tiny = plan_memory_report(plan, d=128, hbm_limit=1 << 20)
    assert not tiny["fits"]


def test_ranges_operator_spmm_and_grad():
    """layout=\"ranges\" through the operator API: forward + transpose-plan
    backward via the existing custom_vjp pairing
    (oneflow/core/autograd/gradient_funcs/gather.cpp:62-73)."""
    import jax
    import jax.numpy as jnp

    from of_spmm_tpu.ops.autograd import make_operator, spmm

    dense, csr = _graph(600, 600, 0.02, rank1=True, seed=21, banded=0.2)
    op = make_operator(csr, layout="ranges", place=False)
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


@pytest.mark.parametrize("rank1", [False, True])
def test_ranges_kernel_matches_dense(rank1):
    """Interpret-mode Pallas kernel vs dense (wide features + segments)."""
    import jax.numpy as jnp

    from of_spmm_tpu.ops.pallas.ranges import spmm_ranges

    dense, csr = _graph(640, 640, 0.01, rank1=rank1, seed=15, banded=0.3)
    plan = build_ranges_plan(csr, T=256, hot_budget=256, hot_min_run=1,
                             range_cap=256, seg_steps=16)
    assert len(plan.segments) > 1 and plan.n_ranges > 1
    x = np.random.default_rng(2).standard_normal((640, 160)).astype(
        np.float32)
    got = np.asarray(spmm_ranges(plan, jnp.asarray(x)))
    want = dense @ x
    np.testing.assert_allclose(got, want, rtol=RTOL,
                               atol=ATOL * np.abs(want).max() + ATOL)
