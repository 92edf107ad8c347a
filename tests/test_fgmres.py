"""Flexible GMRES (FGMRES): nonlinear / iteration-varying preconditioners.

The reference is plain-CG-only; FGMRES extends the GMRES member of the
nonsymmetric family (see ``solvers/gmres.py`` header) to the inner-outer
Krylov composition class — a fixed-budget inner solve as the right
preconditioner, which the linear-M ``gmres_solve`` excludes by design
(its correction re-applies M once: correct only when M is linear).

Validation strategy as everywhere (SURVEY.md §4): dense fp64 direct solve
as ground truth; the linear-M case is differential against ``gmres_solve``
itself (identical Arnoldi trajectory in exact arithmetic).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.solvers.gmres import (
    fgmres_solve,
    gmres_solve,
    inner_solve_preconditioner,
)
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel(x, x_true):
    return np.linalg.norm(
        np.asarray(x, np.float64).ravel() - x_true
    ) / np.linalg.norm(x_true)


@pytest.fixture(scope="module")
def convdiff():
    sys_ = generators.convection_diffusion_system((24, 24), eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


def test_fgmres_unpreconditioned_matches_gmres(convdiff):
    """With M=None the Z basis IS V[:m]: same trajectory as gmres_solve."""
    sys_, x_true = convdiff
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=4000)
    g = gmres_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, restart=30)
    f = fgmres_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, restart=30)
    assert bool(f.converged)
    assert int(f.iterations) == int(g.iterations)
    np.testing.assert_allclose(np.asarray(f.x), np.asarray(g.x), rtol=1e-10)


def test_fgmres_linear_M_matches_gmres(convdiff):
    """A LINEAR M (point Jacobi) must give the same iterate sequence as the
    memory-saving gmres form — the two differ only in where M is applied."""
    sys_, x_true = convdiff
    from conjugategradient_tpu.core.formats import matrix_diagonal

    inv = jnp.asarray(1.0 / matrix_diagonal(sys_.A))
    M = lambda r: inv * r
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=4000)
    g = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, M=M, restart=30
    )
    f = fgmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, M=M, restart=30
    )
    assert bool(f.converged) and bool(g.converged)
    assert int(f.iterations) == int(g.iterations)
    assert _rel(f.x, x_true) < 1e-7


def test_fgmres_inner_bicgstab(convdiff):
    """The capability GMRES lacks: a fixed-budget inner BiCGStab solve as
    the preconditioner.  Outer iteration count collapses vs plain GMRES and
    the solution still validates against the direct solve."""
    sys_, x_true = convdiff
    A_dev = sys_.A.device_put()
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=4000)
    plain = gmres_solve(A_dev, jnp.asarray(sys_.b), policy=pol, restart=30)
    M = inner_solve_preconditioner(A_dev, method="bicgstab", iterations=12)
    f = fgmres_solve(
        A_dev, jnp.asarray(sys_.b), policy=pol, M=M, restart=30
    )
    assert bool(f.converged)
    assert _rel(f.x, x_true) < 1e-7
    # 12 BiCGStab steps per outer vector: the outer count must collapse
    assert int(f.iterations) * 5 < int(plain.iterations)


def test_fgmres_inner_cg_on_spd():
    """SPD composition: inner CG under outer FGMRES (a classic smoother
    study setup)."""
    sys_ = generators.poisson_system((31, 31))
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    A_dev = sys_.A.device_put()
    M = inner_solve_preconditioner(A_dev, method="cg", iterations=16)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    f = fgmres_solve(A_dev, jnp.asarray(sys_.b), policy=pol, M=M, restart=20)
    assert bool(f.converged)
    assert _rel(f.x, x_true) < 1e-8


def test_fgmres_grid_shaped_rhs_stencil():
    """Grid-shaped right-hand sides on the stencil fast path (the
    shape-handling contract shared with gmres_solve)."""
    from conjugategradient_tpu.core.formats import dia_to_stencil

    sys_ = generators.poisson_system((31, 31))
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    A_st = dia_to_stencil(sys_.A, (31, 31)).device_put()
    M = inner_solve_preconditioner(A_st, method="cg", iterations=16)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    f = fgmres_solve(
        A_st, jnp.asarray(sys_.b).reshape(31, 31), policy=pol, M=M, restart=20
    )
    assert bool(f.converged)
    assert f.x.shape == (31, 31)
    assert _rel(f.x, x_true) < 1e-8


def test_inner_chebyshev_preconditioner(convdiff):
    """Chebyshev inner on the SPD Poisson operator via the facade path."""
    sys_ = generators.poisson_system((31, 31))
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = solve(
        sys_.A, sys_.b, method="fgmres", inner="chebyshev",
        inner_iterations=10, tol=1e-9, norm="rel_l2", restart=20,
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-7


def test_facade_fgmres_inner_and_mg_composition(convdiff):
    """`mg_fgmres` + inner= : the V-cycle preconditions the inner BiCGStab,
    FGMRES sees the composed nonlinear map.  Few outer iterations."""
    sys_, x_true = convdiff
    res = solve(
        sys_.A, sys_.b, method="mg_fgmres", grid=(24, 24),
        inner="bicgstab", inner_iterations=4,
        tol=1e-9, norm="rel_l2", restart=20,
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-7
    assert int(res.iterations) <= 20


def test_inner_solve_preconditioner_rejects_unknown():
    sys_ = generators.poisson_system((7, 7))
    with pytest.raises(ValueError, match="unknown inner method"):
        inner_solve_preconditioner(sys_.A.device_put(), method="sor")


def test_sharded_fgmres_matches_single_device(convdiff):
    """Row-sharded FGMRES (Z sharded like V) with a shard-local Jacobi M:
    same trajectory as the single-device flexible solve."""
    from conjugategradient_tpu.core.formats import matrix_diagonal
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import sharded_nonsym_solve

    sys_, x_true = convdiff
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=4000)
    inv = jnp.asarray(1.0 / matrix_diagonal(sys_.A))
    single = fgmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol,
        M=lambda r: inv * r, restart=30,
    )
    mesh = make_mesh(8)
    shard = sharded_nonsym_solve(
        sys_.A, sys_.b, policy=pol, method="fgmres", restart=30, mesh=mesh,
        M_local=lambda r, aux: aux * r, M_aux=1.0 / matrix_diagonal(sys_.A),
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-6
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2


def test_sharded_fgmres_nonlinear_shard_local_M():
    """A NONLINEAR shard-local M (sign-dependent scaling — cheap stand-in
    for a fixed-budget local solve) still converges under sharded FGMRES
    and validates; this input is outside sharded GMRES's contract."""
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import sharded_nonsym_solve

    sys_ = generators.nonsymmetric_banded_system(512, 8)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000)

    def M_local(r, aux):
        return aux * r * (1.0 + 0.5 * jnp.tanh(r))

    shard = sharded_nonsym_solve(
        sys_.A, sys_.b, policy=pol, method="fgmres", restart=30,
        mesh=make_mesh(8), M_local=M_local,
        M_aux=np.ones(sys_.n),
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-7


def test_facade_fgmres_mesh_inner_rejected(convdiff):
    from conjugategradient_tpu.parallel.mesh import make_mesh

    sys_, _ = convdiff
    with pytest.raises(ValueError, match="fgmres with mesh="):
        solve(
            sys_.A, sys_.b, method="fgmres", inner="bicgstab",
            mesh=make_mesh(8), tol=1e-8,
        )


def test_inner_chebyshev_refuses_M(convdiff):
    """Review finding: the chebyshev inner silently DROPPED M (the V-cycle
    in mg_fgmres+inner='chebyshev') — must refuse loudly."""
    sys_, _ = convdiff
    with pytest.raises(ValueError, match="takes no M"):
        inner_solve_preconditioner(
            sys_.A.device_put(), method="chebyshev", M=lambda r: r
        )
