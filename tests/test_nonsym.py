"""Nonsymmetric solver family: BiCGStab + restarted GMRES.

Differential strategy (SURVEY.md §4): every solve validates against the
dense fp64 direct solution (``oracle.direct_solve`` — the R prototype's
ground truth, ``R/CG.R:34``), on workloads the reference never had
(convection-diffusion, the nonsymmetric |sin| band).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
from conjugategradient_tpu.solvers.gmres import gmres_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel_err(A, x, x_true):
    return np.linalg.norm(np.asarray(x, np.float64).ravel() - x_true) / np.linalg.norm(
        x_true
    )


@pytest.fixture(scope="module")
def convdiff():
    sys_ = generators.convection_diffusion_system((24, 24), eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


@pytest.fixture(scope="module")
def nonsym_band():
    sys_ = generators.nonsymmetric_banded_system(512, 16)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


def test_generator_is_nonsymmetric(convdiff):
    from conjugategradient_tpu.core import formats

    A = formats.dia_to_dense(convdiff[0].A).data
    assert np.abs(A - A.T).max() > 0.1


def test_bicgstab_convdiff(convdiff):
    sys_, x_true = convdiff
    res = bicgstab_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2"),
    )
    assert bool(res.converged)
    assert _rel_err(sys_.A, res.x, x_true) < 1e-8


def test_gmres_convdiff(convdiff):
    # scipy's gmres(restart=30) needs ~2100 inner iterations for rtol 1e-10
    # on this operator — restarted-GMRES stagnation is real; budget for it
    sys_, x_true = convdiff
    res = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000),
        restart=30,
    )
    assert bool(res.converged)
    assert int(res.iterations) < 4000
    # rel_l2 1e-10 on this kappa leaves ~1e-8 in the solution (scipy's
    # gmres lands at 1.03e-8 on the identical run)
    assert _rel_err(sys_.A, res.x, x_true) < 3e-8


def test_gmres_restart_smaller_than_needed(nonsym_band):
    """A short restart cycle must still converge (via restarts), just with
    more total iterations than a long one."""
    sys_, x_true = nonsym_band
    A_dev, b_dev = sys_.A.device_put(), jnp.asarray(sys_.b)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=5000)
    short = gmres_solve(A_dev, b_dev, policy=pol, restart=8)
    long = gmres_solve(A_dev, b_dev, policy=pol, restart=64)
    assert bool(short.converged) and bool(long.converged)
    assert _rel_err(sys_.A, short.x, x_true) < 1e-7
    assert int(short.iterations) >= int(long.iterations)


def test_gmres_early_convergence_inside_cycle(nonsym_band):
    """Convergence mid-cycle: frozen Arnoldi steps must not pollute the
    correction (the masked-column triangular solve)."""
    sys_, x_true = nonsym_band
    res = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2"), restart=100,
    )
    assert bool(res.converged)
    assert int(res.iterations) < 100  # converged mid-cycle
    assert _rel_err(sys_.A, res.x, x_true) < 1e-8


def test_bicgstab_band_with_x0(nonsym_band):
    sys_, x_true = nonsym_band
    x0 = jnp.asarray(np.linspace(0, 1, sys_.n))
    res = bicgstab_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), x0,
        policy=ConvergencePolicy(tol=1e-11, norm="l2"),
    )
    assert bool(res.converged)
    assert _rel_err(sys_.A, res.x, x_true) < 1e-9


def test_jacobi_preconditioning_helps(convdiff):
    """Jacobi right-preconditioning must cut GMRES iterations on the
    convection-dominated operator (diag carries the upwind |v| weights)."""
    sys_, x_true = convdiff
    pol = dict(tol=1e-9, norm="rel_l2", max_iteration=5000)
    plain = solve(sys_.A, sys_.b, method="gmres", restart=20, **pol)
    prec = solve(sys_.A, sys_.b, method="jacobi_gmres", restart=20, **pol)
    assert bool(plain.converged) and bool(prec.converged)
    assert _rel_err(sys_.A, prec.x, x_true) < 1e-7
    assert int(prec.iterations) <= int(plain.iterations)


def test_facade_methods(convdiff):
    sys_, x_true = convdiff
    for method in ("bicgstab", "jacobi_bicgstab", "gmres"):
        res = solve(
            sys_.A, sys_.b, method=method, tol=1e-10, norm="rel_l2",
            max_iteration=5000,
        )
        assert bool(res.converged), method
        assert _rel_err(sys_.A, res.x, x_true) < 3e-8, method


def test_central_scheme_high_peclet():
    """Central differencing past cell-Peclet 2: not diagonally dominant,
    indefinite-ish symmetric part — the GMRES stress case.  eps=0.1 is
    cell-Peclet 10; scipy's gmres(60) takes 1695 inner iterations here
    (eps=0.02 takes 11k — beyond a unit test's budget)."""
    sys_ = generators.convection_diffusion_system(
        (20, 20), eps=0.1, scheme="central"
    )
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000),
        restart=60,
    )
    assert bool(res.converged)
    assert _rel_err(sys_.A, res.x, x_true) < 1e-7


def test_bicgstab_traced_history(nonsym_band):
    """Traced variant: same endpoint as the while_loop driver, monotone-ish
    recorded history, frozen tail after convergence."""
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve_traced

    sys_, x_true = nonsym_band
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    loop = bicgstab_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    traced, history = bicgstab_solve_traced(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, num_steps=120
    )
    assert bool(traced.converged)
    assert int(traced.iterations) == int(loop.iterations)
    assert _rel_err(sys_.A, traced.x, x_true) < 1e-8
    h = np.asarray(history)
    it = int(traced.iterations)
    assert h[it - 1] < 1e-10  # converged entry recorded
    np.testing.assert_allclose(h[it:], h[it - 1], rtol=0)  # frozen tail
    # history feeds the structured residual log
    from conjugategradient_tpu.utils.reslog import records_from_history

    recs = records_from_history(h, iterations=it)
    assert len(recs) == it


def test_mg_preconditioned_nonsym():
    """The MGCG hierarchy as a right preconditioner for BiCGStab/GMRES:
    convection-diffusion smooth error modes are still multigrid's job
    (measured: 694 -> 7 BiCGStab its at eps=0.1 on 63x63)."""
    grid = (48, 48)
    sys_ = generators.convection_diffusion_system(grid, eps=0.1)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = dict(tol=1e-9, norm="rel_l2", max_iteration=20000, grid=grid)
    plain = solve(sys_.A, sys_.b, method="bicgstab", **{**pol, "grid": None})
    for method in ("mg_bicgstab", "mg_gmres"):
        res = solve(sys_.A, sys_.b, method=method, **pol)
        assert bool(res.converged), method
        assert _rel_err(sys_.A, res.x, x_true) < 1e-7, method
        assert int(res.iterations) * 10 < int(plain.iterations), method


def test_cg_breaks_on_nonsymmetric(convdiff):
    """Negative control: CG's recurrence assumes symmetry; on the
    convection operator it must NOT reach the true solution at the accuracy
    the nonsymmetric solvers do (documents why this family exists)."""
    sys_, x_true = convdiff
    res = solve(
        sys_.A, sys_.b, method="cg", tol=1e-10, norm="rel_l2", max_iteration=600,
    )
    assert _rel_err(sys_.A, res.x, x_true) > 1e-8


def test_symmetric_case_matches_cg():
    """On an SPD system all three Krylov methods agree with the oracle."""
    sys_ = generators.banded_sin_system(256, 8)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    for fn, kw in (
        (bicgstab_solve, {}),
        (gmres_solve, {"restart": 40}),
    ):
        res = fn(
            sys_.A.device_put(), jnp.asarray(sys_.b), jnp.asarray(sys_.x0),
            policy=ConvergencePolicy(tol=1e-11, norm="rel_l2"), **kw,
        )
        assert bool(res.converged)
        assert _rel_err(sys_.A, res.x, x_true) < 1e-9


def test_max_iteration_flag(convdiff):
    sys_, _ = convdiff
    res = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-12, norm="l2", max_iteration=5),
        restart=4,
    )
    assert not bool(res.converged)
    assert int(res.iterations) <= 5 + 4  # at most one overshooting cycle


def test_min_iteration(nonsym_band):
    sys_, _ = nonsym_band
    res = bicgstab_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-8, norm="rel_l2", min_iteration=40),
    )
    assert int(res.iterations) >= 40
    assert bool(res.converged)


def test_grid_shaped_rhs(convdiff):
    """Shape-agnostic contract: a grid-native (stencil) operator with
    grid-shaped b solves like the flat DIA path."""
    from conjugategradient_tpu.core.formats import dia_to_stencil

    sys_, x_true = convdiff
    A_st = dia_to_stencil(sys_.A, (24, 24))
    b_grid = jnp.asarray(sys_.b).reshape(24, 24)
    for fn in (
        lambda A, b: bicgstab_solve(A, b, policy=ConvergencePolicy(tol=1e-10, norm="rel_l2")),
        lambda A, b: gmres_solve(
            A, b,
            policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000),
            restart=30,
        ),
    ):
        res = fn(A_st.device_put(), b_grid)
        assert res.x.shape == (24, 24)
        assert bool(res.converged)
        assert _rel_err(sys_.A, np.asarray(res.x).ravel(), x_true) < 3e-8


def test_fp32_accuracy(convdiff):
    sys_, x_true = convdiff
    A32 = sys_.A.device_put(dtype=jnp.float32)
    b32 = jnp.asarray(sys_.b, jnp.float32)
    for fn, kw in ((bicgstab_solve, {}), (gmres_solve, {"restart": 40})):
        res = fn(
            A32, b32,
            policy=ConvergencePolicy(tol=1e-5, norm="rel_l2", max_iteration=4000),
            **kw,
        )
        assert bool(res.converged)
        assert _rel_err(sys_.A, res.x, x_true) < 3e-3


def test_fuzz_random_nonsymmetric_band():
    """Seeded fuzz: random diagonally-dominant nonsymmetric DIA systems;
    every family member must reach the direct solution."""
    from conjugategradient_tpu.core.formats import DiaMatrix
    from conjugategradient_tpu.solvers.cgnr import cgnr_solve

    rng = np.random.default_rng(42)
    for case in range(6):
        n = int(rng.integers(60, 200))
        h = int(rng.integers(1, 5))
        offsets = tuple(range(-h, h + 1))
        data = rng.standard_normal((len(offsets), n))
        i = np.arange(n)
        diag_k = offsets.index(0)
        for k, off in enumerate(offsets):
            valid = (i + off >= 0) & (i + off < n)
            data[k] = np.where(valid, data[k], 0.0)
        data[diag_k] = np.abs(data).sum(axis=0) + 1.0  # row dominance
        A = DiaMatrix(data, offsets, (n, n))
        b = rng.standard_normal(n)
        x_true = oracle.direct_solve(A, b)
        pol = ConvergencePolicy(tol=1e-11, norm="rel_l2", max_iteration=5000)
        for fn, kw in (
            (bicgstab_solve, {}),
            (gmres_solve, {"restart": 25}),
            (cgnr_solve, {}),
        ):
            res = fn(A.device_put(), jnp.asarray(b), policy=pol, **kw)
            assert bool(res.converged), (case, fn.__name__)
            err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
            assert err < 1e-8, (case, fn.__name__, err)


def test_gmres_zero_residual_min_iteration_nan_free():
    """Zero-residual start + min_iteration: the forced-active Arnoldi steps
    write an identity diagonal (not zero) into R — x stays finite and zero
    (review finding: NaN via 0/0 in the triangular solve)."""
    sys_ = generators.banded_sin_system(64, 8)
    res = gmres_solve(
        sys_.A.device_put(), jnp.zeros(64),
        policy=ConvergencePolicy(tol=1e-10, norm="l2", min_iteration=1),
        restart=8,
    )
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    assert np.abs(x).max() == 0.0
    assert bool(res.converged)


def test_mesh_with_unsupported_prefix_raises(convdiff):
    """Unsupported method+mesh combinations must refuse loudly, not
    silently degrade (review finding).  amg_ + mesh= is no longer one of
    them: it routes to the distributed carrier (parallel.shard_amg,
    test_shard_amg) — assert the routing works rather than refuses."""
    from conjugategradient_tpu.parallel.mesh import make_mesh

    sys_, _ = convdiff
    mesh = make_mesh(4)
    res = solve(
        sys_.A, sys_.b, method="amg_bicgstab", mesh=mesh,
        tol=1e-8, norm="rel_l2",
    )
    assert bool(res.converged)
    with pytest.raises(ValueError, match="not supported"):
        solve(
            sys_.A, sys_.b, method="mg_minres", grid=(24, 24), mesh=mesh,
            tol=1e-6, norm="rel_l2",
        )


def test_3d_convection_diffusion():
    """3-D transport family: rows form matches the full builder, and the
    whole nonsym ladder (bicgstab / mg_bicgstab) solves it."""
    grid = (10, 12, 8)
    sys_ = generators.convection_diffusion_system(grid, eps=0.1)
    n = sys_.A.n
    assert n == 960
    # rows slab parity
    offs, data = generators.convection_diffusion3d_rows(grid, 100, 500, eps=0.1)
    assert offs == sys_.A.offsets
    np.testing.assert_allclose(data, np.asarray(sys_.A.data)[:, 100:500], atol=0)
    # genuinely nonsymmetric, solvable
    from conjugategradient_tpu.core.formats import is_symmetric

    assert not is_symmetric(sys_.A, tol=1e-10)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = solve(sys_.A, sys_.b, method="bicgstab", tol=1e-10, norm="rel_l2")
    assert bool(res.converged)
    assert _rel_err(sys_.A, res.x, x_true) < 1e-7
    mg = solve(
        sys_.A, sys_.b, method="mg_bicgstab", grid=grid, tol=1e-10,
        norm="rel_l2",
    )
    assert bool(mg.converged)
    assert _rel_err(sys_.A, mg.x, x_true) < 1e-7
    assert int(mg.iterations) < int(res.iterations)


def test_gmres_traced_history(nonsym_band):
    """Per-cycle residual history: monotone non-increasing records, frozen
    tail after convergence, endpoint validates against the direct solve."""
    from conjugategradient_tpu.solvers.gmres import gmres_solve_traced

    sys_, x_true = nonsym_band
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    res, hist, its = gmres_solve_traced(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol,
        restart=20, num_cycles=16,
    )
    assert bool(res.converged)
    assert _rel_err(sys_.A, res.x, x_true) < 1e-8
    h = np.asarray(hist)
    assert np.all(np.diff(h) <= 1e-12)  # per-cycle GMRES residual is monotone
    k = int(np.searchsorted(-h, -1e-10))  # first cycle under tol
    np.testing.assert_allclose(h[k:], h[-1], rtol=0)  # frozen tail
    assert np.asarray(its)[-1] == int(res.iterations)
