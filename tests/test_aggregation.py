"""Aggregation coarsening: multigrid for arbitrary (non 2^k-1) sizes."""

import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import poisson_system, tridiagonal_system
from conjugategradient_tpu.precond import build_hierarchy, mgcg_solve, transfer, v_cycle
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@pytest.mark.parametrize("shape", [(16,), (10, 7), (8, 6, 5)])
def test_agg_device_transfers_match_scipy(shape):
    rng = np.random.default_rng(0)
    n = int(np.prod(shape))
    P = transfer.prolong_agg_matrix(shape)
    nc = P.shape[1]
    e = rng.standard_normal(nc)
    r = rng.standard_normal(n)
    import jax.numpy as jnp

    got_p = np.asarray(
        transfer.prolong_agg_grid(jnp.asarray(e).reshape(transfer.agg_coarse_shape(shape)), shape)
    ).reshape(-1)
    np.testing.assert_allclose(got_p, P @ e, rtol=1e-12)
    got_r = np.asarray(transfer.restrict_agg_grid(jnp.asarray(r).reshape(shape))).reshape(-1)
    want_r = (P.T * (0.5 ** len(shape))) @ r
    np.testing.assert_allclose(got_r, want_r, rtol=1e-12)


def test_power_of_two_tridiagonal_mgcg():
    """The reference's exact n=2^14 tridiagonal: plain CG needs ~n iterations;
    aggregation MGCG collapses it to a handful."""
    n = 16384
    sys_ = tridiagonal_system(n)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=8 * n)
    mg, h = mgcg_solve(sys_.A, sys_.b, (n,), policy=pol)
    # (+1, 2, +1): the near-null space is the ALTERNATING vector, so auto
    # must keep the geometric (hyb/fw) transfers off on the FINE level
    # (forced hyb measured 1541 its at n=4096 vs 4 with gating); the
    # weighted-agg Galerkin flips the coarse operator Laplacian-like, so
    # deeper levels may legitimately re-enable hyb
    assert h.levels[0].transfer == "agg"
    assert bool(mg.converged)
    assert int(mg.iterations) <= 60
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(mg.x))
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-7


def test_even_grid_2d_mgcg():
    grid = (64, 48)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2")
    mg, h = mgcg_solve(sys_.A, sys_.b, grid, policy=pol)
    assert len(h.levels) >= 1
    assert bool(mg.converged)
    assert int(mg.iterations) <= 40
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(mg.x))
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-7


def test_even_grid_2d_mgcg_dia_layout():
    """layout='dia' with agg levels on a multi-dimensional even grid: the agg
    rg/pg closures must flatten around the grid-shaped transfer operators
    (regression: broadcast error when flat DIA op/inv_diag/W met grid-shaped
    r — ADVICE round 1)."""
    grid = (16, 12)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2")
    h = build_hierarchy(sys_.A, grid, smoother="jacobi", layout="dia", max_coarse=8)
    mg, h = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, layout="dia", hierarchy=h)
    assert any(lvl.transfer == "agg" for lvl in h.levels)
    assert bool(mg.converged)
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(mg.x))
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-7


def test_mixed_fw_then_agg_levels():
    """Odd fine grid coarsens with full weighting until an even size appears,
    then aggregation continues — the hierarchy mixes transfer kinds."""
    grid = (21, 21)  # 21 -> 10 (fw), then hyb/agg on the even tail
    sys_ = poisson_system(grid)
    h = build_hierarchy(sys_.A, grid, smoother="jacobi", max_coarse=8)
    kinds = [lvl.transfer for lvl in h.levels]
    assert kinds[0] == "fw"
    assert len(set(kinds)) >= 2  # mixes transfer kinds
    # symmetric (PCG-valid) even with mixed transfers
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    r = rng.standard_normal(sys_.n)
    s = rng.standard_normal(sys_.n)
    Mr = np.asarray(v_cycle(h, jnp.asarray(r)))
    Ms = np.asarray(v_cycle(h, jnp.asarray(s)))
    np.testing.assert_allclose(Mr @ s, r @ Ms, rtol=1e-9)


@pytest.mark.parametrize("shape", [(16,), (32, 24), (10, 64)])
def test_hybrid_device_transfers_match_scipy(shape):
    """Device cc/fw hybrid transfers == the scipy Kronecker P (and R=P^T/2^d)
    used for the Galerkin product — exact transposes keep the V-cycle SPD."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = int(np.prod(shape))
    P = transfer.prolong_hybrid_matrix(shape)
    nc = P.shape[1]
    e = rng.standard_normal(nc)
    r = rng.standard_normal(n)
    cshape = transfer.hybrid_coarse_shape(shape)
    got_p = np.asarray(
        transfer.prolong_hybrid_grid(jnp.asarray(e).reshape(cshape), shape)
    ).reshape(-1)
    np.testing.assert_allclose(got_p, P @ e, rtol=1e-12)
    got_r = np.asarray(transfer.restrict_hybrid_grid(jnp.asarray(r).reshape(shape))).reshape(-1)
    want_r = (P.T * (0.5 ** len(shape))) @ r
    np.testing.assert_allclose(got_r, want_r, rtol=1e-12)


def test_hybrid_vcycle_symmetric_and_fewer_iterations():
    """Hyb on an even Poisson grid: the V-cycle stays symmetric (PCG-valid)
    and beats plain aggregation on iteration count — its reason to exist."""
    import jax.numpy as jnp

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=200)
    its = {}
    for kind in ("hyb", "agg"):
        h = build_hierarchy(sys_.A, grid, transfer_kind=kind)
        if kind == "hyb":
            assert h.levels[0].transfer == "hyb"
            rng = np.random.default_rng(3)
            r = rng.standard_normal(sys_.n)
            s = rng.standard_normal(sys_.n)
            Mr = np.asarray(v_cycle(h, jnp.asarray(r)))
            Ms = np.asarray(v_cycle(h, jnp.asarray(s)))
            np.testing.assert_allclose(Mr @ s, r @ Ms, rtol=1e-9)
        mg, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, hierarchy=h)
        assert bool(mg.converged)
        its[kind] = int(mg.iterations)
    assert its["hyb"] < its["agg"], its


def test_agg_galerkin_preserves_spd():
    from conjugategradient_tpu.core import formats
    from conjugategradient_tpu.precond import galerkin_coarse

    A = tridiagonal_system(16).A
    Ac = galerkin_coarse(A, (16,), kind="agg")
    D = np.asarray(formats.dia_to_dense(Ac).data)
    np.testing.assert_allclose(D, D.T, atol=1e-14)
    assert np.linalg.eigvalsh(D).min() > 0
