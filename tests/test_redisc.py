"""Rediscretized coarse operators (``build_hierarchy(coarse_operator=)``).

Covers the convection-dominated multigrid fix: Galerkin coarsening of the
upwind transport operator is unstable past cell Peclet ~1 (mg_* solves
diverge from 127x127 up — reproduced here at the smallest failing size),
while per-level upwind rediscretization converges grid-independently.

The calibration test is the regression anchor for the documented per-level
factors (diffusion 1/4, convection 1/2 under the fw transfer convention):
if ``precond/transfer.py`` ever changes its fw scaling, the rediscretized
operator would silently mis-scale — the low-frequency action comparison
below catches that.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil
from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
from conjugategradient_tpu.precond.multigrid import galerkin_coarse
from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel(x, x_true):
    return np.linalg.norm(
        np.asarray(x, np.float64).ravel() - x_true
    ) / np.linalg.norm(x_true)


@pytest.mark.parametrize("grid", [(31,), (15, 15), (11, 11, 11)])
def test_calibration_matches_galerkin_low_frequency(grid):
    """The rediscretized coarse operator must act like the Galerkin product
    on SMOOTH fields (same low-frequency symbol) in 1/2/3-D — this pins the
    0.5 * A(eps/2, v) scaling rule to the fw transfer convention."""
    eps = 0.7
    vel = "recirculating" if len(grid) >= 2 else (0.4,) * len(grid)
    if len(grid) == 1:
        A = generators.convection_diffusion_matrix  # 1-D has no builder;
        # use the diffusion-only limit via poisson1d + the documented factor
        Af = generators.poisson1d_matrix(grid[0])
        Ag = galerkin_coarse(Af, grid, "fw")
        cg = ((grid[0] - 1) // 2,)
        # rediscretized pure diffusion: 0.25 * unit Poisson on the coarse grid
        Ar_data = 0.25 * np.asarray(generators.poisson1d_matrix(cg[0]).data)
        Ar = generators.poisson1d_matrix(cg[0])
        Ar = type(Ar)(Ar_data, Ar.offsets, Ar.shape)
    else:
        Af = generators.convection_diffusion_matrix(grid, eps=eps, velocity=vel)
        Ag = galerkin_coarse(Af, grid, "fw")
        cb = generators.convection_diffusion_coarse_operator(eps=eps, velocity=vel)
        cg = tuple((g - 1) // 2 for g in grid)
        Ar = cb(1, cg)
    # smooth field on the coarse grid (one half-wave per axis)
    axes = [np.sin(np.pi * (np.arange(1, m + 1)) / (m + 1)) for m in cg]
    u = axes[0]
    for a in axes[1:]:
        u = np.multiply.outer(u, a)
    u = u.ravel()
    yg = oracle.spmv(Ag, u)
    yr = oracle.spmv(Ar, u)
    # interior-only comparison: the two stencils treat the Dirichlet ring
    # differently (9-point vs 5-point), which is a high-frequency effect
    mask = np.ones(cg, dtype=bool)
    for d in range(len(cg)):
        sl = [slice(None)] * len(cg)
        sl[d] = 0
        mask[tuple(sl)] = False
        sl[d] = -1
        mask[tuple(sl)] = False
    m = mask.ravel()
    num = np.linalg.norm((yg - yr)[m])
    den = np.linalg.norm(yg[m])
    assert num / den < 0.25, (num / den, yg[m][:4], yr[m][:4])


def test_redisc_fixes_127_divergence():
    """127x127 eps=0.05 is the smallest size where Galerkin-coarsened
    mg_bicgstab fails (chebyshev smoother); rediscretization converges in
    ~a dozen iterations on the same operator."""
    grid = (127, 127)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    A_st = dia_to_stencil(sys_.A, grid).device_put()
    b = jnp.asarray(sys_.b).reshape(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=60)
    h_gal = build_hierarchy(sys_.A, grid)
    res_gal = bicgstab_solve(A_st, b, policy=pol, M=as_preconditioner(h_gal))
    assert not bool(res_gal.converged)  # the documented failure

    cb = generators.convection_diffusion_coarse_operator(eps=0.05)
    h_red = build_hierarchy(sys_.A, grid, coarse_operator=cb)
    res_red = bicgstab_solve(A_st, b, policy=pol, M=as_preconditioner(h_red))
    assert bool(res_red.converged)
    assert int(res_red.iterations) <= 25
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    # rel_l2 1e-8 on this operator's kappa leaves ~4e-7 in the solution
    assert _rel(res_red.x, x_true) < 2e-6


def test_facade_coarse_operator_passthrough():
    grid = (63, 63)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = solve(
        sys_.A, sys_.b, method="mg_bicgstab", grid=grid,
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.05),
        tol=1e-9, norm="rel_l2",
    )
    assert bool(res.converged)
    assert int(res.iterations) <= 20
    assert _rel(res.x, x_true) < 1e-7


def test_redisc_with_mg_gmres_and_fgmres():
    """The hook flows through every mg_-prefixed nonsym method."""
    grid = (63, 63)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    cb = generators.convection_diffusion_coarse_operator(eps=0.05)
    for method in ("mg_gmres", "mg_fgmres"):
        res = solve(
            sys_.A, sys_.b, method=method, grid=grid, coarse_operator=cb,
            tol=1e-9, norm="rel_l2", restart=20,
        )
        assert bool(res.converged), method
        assert _rel(res.x, x_true) < 1e-7, method


def test_redisc_cell_centered_even_grid():
    """Even (2^k) grids: the hybrid cc transfers carry the SAME calibrated
    scaling (measured identical per-level factors) — and even grids divide
    device meshes, so this is the genuinely-sharded convection-MG path."""
    grid = (128, 128)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    A_st = dia_to_stencil(sys_.A, grid).device_put()
    b = jnp.asarray(sys_.b).reshape(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=60)
    cb = generators.convection_diffusion_coarse_operator(eps=0.05)
    h = build_hierarchy(sys_.A, grid, smoother="jacobi", coarse_operator=cb)
    assert all(l.transfer == "hyb" for l in h.levels)
    res = bicgstab_solve(A_st, b, policy=pol, M=as_preconditioner(h))
    assert bool(res.converged)
    assert int(res.iterations) <= 25
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert _rel(res.x, x_true) < 2e-6


def test_gspmd_mg_nonsym_sharded_even_grid():
    """128 divides the 8-mesh: every level of the distributed
    mg_bicgstab program is actually partitioned (fine spec asserts) and
    the solve matches the fp64 direct solution."""
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.parallel.gspmd import make_gspmd_mg_nonsym
    from conjugategradient_tpu.parallel.mesh import make_mesh

    grid = (128, 128)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    mesh = make_mesh(8)
    solve_fn, (b_dev, x0_dev) = make_gspmd_mg_nonsym(
        sys_.A, sys_.b, grid, mesh,
        ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=300),
        method="bicgstab",
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.05),
    )
    # the fine right-hand side really is row-sharded, not replicated
    assert b_dev.sharding.spec == P("x", None)
    res = solve_fn(b_dev, x0_dev)
    assert bool(res.converged)
    assert int(res.iterations) <= 25
    assert _rel(res.x, x_true) < 2e-6


def test_coarse_operator_rejects_bad_transfer_kind():
    sys_ = generators.convection_diffusion_system((15, 15), eps=0.5)
    cb = generators.convection_diffusion_coarse_operator(eps=0.5)
    with pytest.raises(ValueError, match="no fixed calibration"):
        build_hierarchy(sys_.A, (15, 15), coarse_operator=cb, transfer_kind="agg")


def test_coarse_operator_shape_mismatch_raises():
    sys_ = generators.poisson_system((15, 15))
    bad = lambda level, g: generators.poisson2d_matrix(3, 3)
    with pytest.raises(ValueError, match="coarse_operator returned"):
        build_hierarchy(sys_.A, (15, 15), coarse_operator=bad, max_coarse=8)


def test_coarse_operator_refuses_silent_densify():
    """Review finding: when the near-null probe forces aggregation at the
    first level, rediscretized coarsening must RAISE (the old behavior
    silently np.linalg.inv'd the full operator — O(n^2) memory)."""
    sys_A = generators.tridiagonal_matrix(8192)  # (+1, 2, +1): alternating
    cb = lambda level, g: generators.tridiagonal_matrix(g[0])
    with pytest.raises(ValueError, match="rediscretized coarsening stopped"):
        build_hierarchy(sys_A, (8192,), coarse_operator=cb)


@pytest.mark.parametrize("grid", [(63, 63), (31, 31, 31)])
def test_poisson_coarse_operator_matches_galerkin_iterations(grid):
    """The Poisson rediscretization hook (bench fast path: setup in
    generator time, every level a const stencil) must converge in the same
    iteration count as the Galerkin hierarchy on its home workload."""
    sys_ = generators.poisson_system(grid)
    x_true = oracle.cg(sys_.A, sys_.b, tol=1e-12, norm="rel_l2").x
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=200)
    its = {}
    for tag, kw in {
        "galerkin": {},
        "redisc": dict(coarse_operator=generators.poisson_coarse_operator()),
    }.items():
        h = build_hierarchy(sys_.A, grid, smoother="chebyshev", pre=3, post=3, **kw)
        from conjugategradient_tpu.solvers.cg import cg_solve

        res = cg_solve(
            h.levels[0].A,
            jnp.asarray(sys_.b).reshape(grid),
            policy=pol,
            M=as_preconditioner(h),
        )
        assert bool(res.converged)
        assert _rel(res.x, x_true) < 1e-7
        its[tag] = int(res.iterations)
    assert its["redisc"] <= its["galerkin"] + 1


def test_poisson_coarse_operator_levels_are_const_stencils():
    """Every rediscretized Poisson level must const-detect (zero matrix
    bytes per SpMV) and carry the analytic Gershgorin Chebyshev bounds."""
    from conjugategradient_tpu.core.formats import ConstStencilMatrix

    sys_ = generators.poisson_system((31, 31, 31))
    h = build_hierarchy(
        sys_.A,
        (31, 31, 31),
        smoother="chebyshev",
        coarse_operator=generators.poisson_coarse_operator(),
    )
    for lvl in h.levels:
        assert isinstance(lvl.A, ConstStencilMatrix)
        assert lvl.cheb_bounds == (0.5, 2.0)
