"""GSPMD multigrid-preconditioned nonsymmetric solves (mg_* + mesh=).

The distributed form of mg_bicgstab / mg_gmres / mg_fgmres: V-cycle +
Krylov loop partitioned as ONE GSPMD program (``parallel.gspmd.
make_gspmd_mg_nonsym``).  Validation: same trajectory as the single-device
solver (XLA reduction order shifts a few ulps) and the fp64 direct solve.
Rediscretized coarse operators ride through — the convection-dominated
case this path exists for.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil
from conjugategradient_tpu.parallel.gspmd import gspmd_mg_nonsym_solve
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel(x, x_true):
    return np.linalg.norm(
        np.asarray(x, np.float64).ravel() - x_true
    ) / np.linalg.norm(x_true)


@pytest.fixture(scope="module")
def convdiff():
    grid = (31, 31)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return grid, sys_, x_true


def test_matches_single_device_bicgstab(convdiff):
    grid, sys_, x_true = convdiff
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2")
    cb = generators.convection_diffusion_coarse_operator(eps=0.05)
    h = build_hierarchy(sys_.A, grid, smoother="jacobi", coarse_operator=cb)
    A_st = dia_to_stencil(sys_.A, grid).device_put()
    single = bicgstab_solve(
        A_st, jnp.asarray(sys_.b).reshape(grid), policy=pol,
        M=as_preconditioner(h),
    )
    res = gspmd_mg_nonsym_solve(
        sys_.A, sys_.b, grid, mesh=make_mesh(8), policy=pol,
        method="bicgstab", coarse_operator=cb,
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-7
    assert abs(int(res.iterations) - int(single.iterations)) <= 2


@pytest.mark.parametrize("method", ["gmres", "fgmres"])
def test_gspmd_mg_gmres_variants(convdiff, method):
    grid, sys_, x_true = convdiff
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=2000)
    cb = generators.convection_diffusion_coarse_operator(eps=0.05)
    res = gspmd_mg_nonsym_solve(
        sys_.A, sys_.b, grid, mesh=make_mesh(8), policy=pol,
        method=method, coarse_operator=cb, restart=20,
    )
    assert bool(res.converged), method
    assert int(res.iterations) <= 40, method
    assert _rel(res.x, x_true) < 1e-7, method


def test_facade_mg_bicgstab_with_mesh(convdiff):
    grid, sys_, x_true = convdiff
    res = solve(
        sys_.A, sys_.b, method="mg_bicgstab", grid=grid, mesh=make_mesh(8),
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.05),
        tol=1e-9, norm="rel_l2",
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-7


def test_2d_mesh_partition(convdiff):
    """Block partition over a 2-D mesh (both grid axes sharded)."""
    import jax
    from jax.sharding import Mesh

    grid, sys_, x_true = convdiff
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    res = gspmd_mg_nonsym_solve(
        sys_.A, sys_.b, grid, mesh=mesh, policy=ConvergencePolicy(
            tol=1e-9, norm="rel_l2"
        ), method="bicgstab", axes=("x", "y"),
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.05),
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-7


def test_unknown_method_rejected(convdiff):
    grid, sys_, _ = convdiff
    with pytest.raises(ValueError, match="unknown method"):
        gspmd_mg_nonsym_solve(
            sys_.A, sys_.b, grid, mesh=make_mesh(8), method="minres"
        )
