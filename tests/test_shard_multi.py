"""Explicit shard_map multi-RHS MGCG (STATUS r2 gap 5): block CG over row
shards with one halo exchange and one (k,)-vector psum per iteration."""

import re

import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import poisson_system
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.parallel.shard_multi import (
    make_shard_multi_mgcg,
    shard_multi_mgcg_solve,
)
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rhs(n, k, seed=0):
    return np.random.default_rng(seed).standard_normal((n, k))


def _true_rels(sys_, res, B):
    X = np.asarray(res.x, np.float64)
    return [
        np.linalg.norm(B[:, j] - oracle.spmv(sys_.A, X[:, j])) / np.linalg.norm(B[:, j])
        for j in range(B.shape[1])
    ]


def test_shard_multi_matches_single_device_block_cg():
    """Same hierarchy through the sharded block CG and the single-device
    cg_solve_multi: same Krylov path per column (iterations agree, x matches)."""
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.multi import as_multi_preconditioner, cg_solve_multi

    grid = (64, 64)
    sys_ = poisson_system(grid)
    k = 4
    B = _rhs(sys_.n, k, seed=1)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=300)
    h = build_hierarchy(sys_.A, grid, smoother="chebyshev", transfer_kind="agg", layout="stencil")

    res = shard_multi_mgcg_solve(
        sys_, B, grid, mesh=make_mesh(8), policy=pol, hierarchy=h
    )
    assert bool(np.asarray(res.converged).all())
    assert max(_true_rels(sys_, res, B)) < 1e-8

    ref = cg_solve_multi(h.levels[0].A, B, policy=pol, M=as_multi_preconditioner(h))
    assert bool(np.asarray(ref.converged).all())
    its, ref_its = np.asarray(res.iterations), np.asarray(ref.iterations)
    assert (np.abs(its - ref_its) <= 1).all(), (its, ref_its)
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64), np.asarray(ref.x, np.float64), rtol=1e-6, atol=1e-9
    )


@pytest.mark.parametrize("num", [1, 2, 4, 8])
def test_shard_multi_shard_count_invariance(num):
    grid = (64, 32)
    sys_ = poisson_system(grid)
    B = _rhs(sys_.n, 3, seed=2)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=300)
    res = shard_multi_mgcg_solve(sys_, B, grid, mesh=make_mesh(num), policy=pol)
    assert bool(np.asarray(res.converged).all())
    assert max(_true_rels(sys_, res, B)) < 1e-8
    # even grid -> auto hierarchy picks hyb; the multi-RHS win must survive
    assert int(np.asarray(res.iterations).max()) <= 10


def test_shard_multi_hybrid_transfers_match_gspmd_math():
    """Hyb cc/fw transfers with a trailing column axis: the sharded block CG
    on the auto (hyb) hierarchy reproduces the single-device block CG."""
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.multi import as_multi_preconditioner, cg_solve_multi

    grid = (64, 64)
    sys_ = poisson_system(grid)
    B = _rhs(sys_.n, 3, seed=3)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=300)
    h = build_hierarchy(sys_.A, grid, smoother="chebyshev", layout="stencil")
    assert h.levels[0].transfer == "hyb"
    res = shard_multi_mgcg_solve(sys_, B, grid, mesh=make_mesh(8), policy=pol, hierarchy=h)
    assert bool(np.asarray(res.converged).all())
    assert max(_true_rels(sys_, res, B)) < 1e-8
    ref = cg_solve_multi(h.levels[0].A, B, policy=pol, M=as_multi_preconditioner(h))
    assert (np.abs(np.asarray(res.iterations) - np.asarray(ref.iterations)) <= 1).all()
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64), np.asarray(ref.x, np.float64), rtol=1e-6, atol=1e-9
    )


def test_shard_multi_3d():
    grid = (32, 16, 16)
    sys_ = poisson_system(grid)
    B = _rhs(sys_.n, 2, seed=4)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=300)
    res = shard_multi_mgcg_solve(sys_, B, grid, mesh=make_mesh(8), policy=pol)
    assert bool(np.asarray(res.converged).all())
    assert max(_true_rels(sys_, res, B)) < 1e-7


def test_shard_multi_mixed_convergence_freezes_columns():
    """Early-converged columns freeze under the masked updates: a column with
    rhs = its own solution direction converges first and stays intact."""
    grid = (64, 32)
    sys_ = poisson_system(grid)
    rng = np.random.default_rng(5)
    easy = oracle.spmv(sys_.A, np.ones(sys_.n))  # solution is the constant
    B = np.stack([easy, rng.standard_normal(sys_.n)], axis=1)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=300)
    res = shard_multi_mgcg_solve(sys_, B, grid, mesh=make_mesh(8), policy=pol)
    assert bool(np.asarray(res.converged).all())
    its = np.asarray(res.iterations)
    assert its[0] <= its[1]
    assert max(_true_rels(sys_, res, B)) < 1e-9


def test_shard_multi_nonconvergence_flags_per_column():
    grid = (64, 32)
    sys_ = poisson_system(grid)
    B = _rhs(sys_.n, 2, seed=6)
    res = shard_multi_mgcg_solve(
        sys_, B, grid, mesh=make_mesh(4),
        policy=ConvergencePolicy(tol=1e-30, max_iteration=3),
    )
    assert not bool(np.asarray(res.converged).any())
    np.testing.assert_array_equal(np.asarray(res.iterations), [3, 3])


COLLECTIVES = ("all-reduce", "collective-permute", "all-gather", "all-to-all", "reduce-scatter")


def test_shard_multi_collective_count_independent_of_k():
    """The design claim: halo slabs carry all k columns and the k partial
    dots ride one psum, so the compiled collective schedule does not grow
    with the RHS count."""
    grid = (64, 64)
    sys_ = poisson_system(grid)
    mesh = make_mesh(8)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=100)

    def counts(k):
        B = _rhs(sys_.n, k, seed=7)
        solve, _ = make_shard_multi_mgcg(sys_, B, grid, mesh, pol)
        hlo = solve.jitted.lower(*solve.lower_args).compile().as_text()
        return {c: len(re.findall(rf"\b{c}(?:-start)?\(", hlo)) for c in COLLECTIVES}

    c2, c8 = counts(2), counts(8)
    assert c2 == c8, (c2, c8)
    assert c2["all-reduce"] >= 1 and c2["collective-permute"] >= 1


def test_shard_multi_rejects_bad_shapes():
    grid = (16, 16)
    sys_ = poisson_system(grid)
    with pytest.raises(ValueError):
        make_shard_multi_mgcg(sys_, _rhs(100, 2), grid, make_mesh(4))


def test_sharded_flat_dia_multi_rhs():
    """Block CG for a flat banded matrix over 8 shards: per-column solutions
    match the oracle; iteration counts match the single-device block solve."""
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.parallel.shard_multi import sharded_cg_multi_solve
    from conjugategradient_tpu.solvers.multi import cg_solve_multi

    sys_ = banded_sin_system(1024, 16)
    rng = np.random.default_rng(3)
    B = rng.standard_normal((sys_.n, 3))
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    res = sharded_cg_multi_solve(sys_.A, B, policy=pol, mesh=make_mesh(8))
    assert bool(np.asarray(res.converged).all())
    for j in range(3):
        r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j], np.float64))
        assert np.linalg.norm(r) / np.linalg.norm(B[:, j]) < 1e-9
    import jax.numpy as jnp

    ref = cg_solve_multi(sys_.A.device_put(), jnp.asarray(B), policy=pol)
    np.testing.assert_array_equal(np.asarray(res.iterations), np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), rtol=1e-8, atol=1e-10)


def test_sharded_flat_multi_rhs_linf():
    """The pmax path: per-column L-inf convergence over the mesh."""
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.parallel.shard_multi import sharded_cg_multi_solve

    sys_ = banded_sin_system(512, 8)
    rng = np.random.default_rng(4)
    B = rng.standard_normal((sys_.n, 2))
    pol = ConvergencePolicy(tol=1e-8, norm="linf", max_iteration=2000)
    res = sharded_cg_multi_solve(sys_.A, B, policy=pol, mesh=make_mesh(4))
    assert bool(np.asarray(res.converged).all())
    for j in range(2):
        r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j], np.float64))
        assert np.max(np.abs(r)) < 1e-7
