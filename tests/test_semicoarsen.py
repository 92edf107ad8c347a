"""Auto-semicoarsening for anisotropic operators.

The measured failure this fixes: fully-coarsened MGCG on 127x127
anisotropic diffusion climbs 6 / 15 / 47 / 130 iterations as the
cross-axis coefficient drops 1 / 0.1 / 0.01 / 0.001 (the point smoother
leaves error smooth only along the strong axis).  Coarsening only axes
within ``semi_theta`` of the strongest coupling restores O(1) iterations;
isotropic operators select every axis and take the ordinary path
unchanged (full-suite invariance is the regression guard for that).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil
from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel(x, x_true):
    return np.linalg.norm(
        np.asarray(x, np.float64).ravel() - x_true
    ) / np.linalg.norm(x_true)


@pytest.mark.parametrize("ay", [0.01, 0.001])
def test_semicoarsening_restores_iteration_counts(ay):
    grid = (63, 63)
    sys_ = generators.anisotropic_diffusion_system(grid, (ay, 1.0))
    A_st = dia_to_stencil(sys_.A, grid).device_put()
    b = jnp.asarray(sys_.b).reshape(grid)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=500)

    h_full = build_hierarchy(sys_.A, grid, semicoarsen=False)
    full = cg_solve(A_st, b, policy=pol, M=as_preconditioner(h_full))
    h_semi = build_hierarchy(sys_.A, grid)
    assert any(l.transfer.startswith("semi") for l in h_semi.levels)
    semi = cg_solve(A_st, b, policy=pol, M=as_preconditioner(h_semi))

    assert bool(semi.converged)
    assert int(semi.iterations) <= 10
    assert int(semi.iterations) * 3 < int(full.iterations)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(semi.x, x_true) < 1e-6


def test_semicoarsening_coarsens_the_strong_axis():
    """(ay, ax) = (1e-3, 1): axis 1 (x) is strong — only it coarsens, and
    the grid shapes show it."""
    grid = (63, 63)
    sys_ = generators.anisotropic_diffusion_system(grid, (1e-3, 1.0))
    h = build_hierarchy(sys_.A, grid, max_coarse=120)
    assert h.levels[0].transfer == "semi01"
    assert h.levels[1].grid == (63, 31)


def test_isotropic_unchanged():
    """Equal couplings must select every axis: ordinary fw levels, same
    hierarchy as semicoarsen=False bitwise."""
    sys_ = generators.poisson_system((31, 31))
    h1 = build_hierarchy(sys_.A, (31, 31))
    h2 = build_hierarchy(sys_.A, (31, 31), semicoarsen=False)
    assert [l.transfer for l in h1.levels] == [l.transfer for l in h2.levels]
    assert all(not l.transfer.startswith("semi") for l in h1.levels)
    for a, b_ in zip(h1.levels, h2.levels):
        np.testing.assert_array_equal(np.asarray(a.A.data), np.asarray(b_.A.data))


def test_even_grid_semicoarsening_cc_axis():
    """Even extents semicoarsen through the cell-centered per-axis
    operators (same parity dispatch as hybrid transfers)."""
    grid = (64, 64)
    sys_ = generators.anisotropic_diffusion_system(grid, (0.001, 1.0))
    h = build_hierarchy(sys_.A, grid, smoother="jacobi")
    assert h.levels[0].transfer == "semi01"
    assert h.levels[1].grid == (64, 32)
    A_st = dia_to_stencil(sys_.A, grid).device_put()
    res = cg_solve(
        A_st, jnp.asarray(sys_.b).reshape(grid),
        policy=ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=200),
        M=as_preconditioner(h),
    )
    assert bool(res.converged)
    assert int(res.iterations) <= 12
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(res.x, x_true) < 1e-6


def test_facade_and_3d():
    """3-D with one weak axis; facade mgcg picks it up automatically."""
    grid = (17, 17, 17)
    sys_ = generators.anisotropic_diffusion_system(grid, (1.0, 1.0, 1e-3))
    res = solve(
        sys_.A, sys_.b, method="mgcg", grid=grid, tol=1e-9, norm="rel_l2",
    )
    assert bool(res.converged)
    assert int(res.iterations) <= 12
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(res.x, x_true) < 1e-6


def test_gspmd_mgcg_with_semicoarsened_hierarchy():
    """GSPMD carries semicoarsened levels (the partitioner derives the
    partial-axis transfer collectives)."""
    from conjugategradient_tpu.parallel.gspmd import gspmd_mgcg_solve
    from conjugategradient_tpu.parallel.mesh import make_mesh

    grid = (32, 32)
    sys_ = generators.anisotropic_diffusion_system(grid, (0.001, 1.0))
    res = gspmd_mgcg_solve(
        sys_, grid, mesh=make_mesh(8),
        policy=ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=200),
        smoother="jacobi",
    )
    assert bool(res.converged)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(res.x, x_true) < 1e-6


def test_shard_mgcg_semicoarsened_axis0_unmasked():
    """Explicit shard_map MGCG carries semicoarsened levels whenever the
    sharded leading axis is NOT among the coarsened axes (its transfer is
    the identity — shard-local); iteration parity with single-device."""
    import jax.numpy as jnp

    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_mgcg import shard_mgcg_solve
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.cg import cg_solve

    grid = (64, 64)
    # strong axis LAST: semicoarsening coarsens axis 1 only -> axis 0 shards
    sys_ = generators.anisotropic_diffusion_system(grid, (0.001, 1.0))
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=500)
    h = build_hierarchy(sys_.A, grid, layout="stencil")
    assert all(l.transfer == "semi01" for l in h.levels)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, hierarchy=h)
    assert bool(res.converged)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(res.x, x_true) < 1e-8
    r1 = cg_solve(sys_.A.device_put(), jnp.asarray(sys_.b), None, pol,
                  M=as_preconditioner(h))
    assert int(res.iterations) == int(r1.iterations)


def test_shard_mgcg_semicoarsened_axis0_masked_refuses():
    """Levels that coarsen axis 0 cannot shard on axis 0 — the error tells
    the user to reorder axes or use GSPMD."""
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_mgcg import shard_mgcg_solve

    big = generators.anisotropic_diffusion_system((64, 64), (1.0, 0.001))
    with pytest.raises(ValueError, match="reorder axes"):
        shard_mgcg_solve(
            big, (64, 64), mesh=make_mesh(8),
            policy=ConvergencePolicy(tol=1e-8, norm="rel_l2"),
        )
