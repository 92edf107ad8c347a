"""MINRES on symmetric indefinite systems (Helmholtz workload)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats, generators, oracle
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.minres import minres_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@pytest.fixture(scope="module")
def helmholtz():
    # 1-D Laplacian eigenvalues: 4 sin^2(pi j / 2(n+1)); shift=0.05 sits
    # above the ~7 smallest -> genuinely indefinite
    sys_ = generators.helmholtz_system((256,), shift=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


def test_operator_is_indefinite(helmholtz):
    lam = np.linalg.eigvalsh(np.asarray(formats.dia_to_dense(helmholtz[0].A).data))
    assert lam[0] < 0 < lam[-1]


def test_minres_solves_indefinite(helmholtz):
    sys_, x_true = helmholtz
    res = minres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000),
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-7


def test_minres_monotone_where_cg_oscillates(helmholtz):
    """On the indefinite operator CG's residual history oscillates wildly
    (its quadratic forms are sign-indefinite; fp64 still limps to the
    answer at n steps here, but with excursions orders of magnitude above
    the start) while MINRES is monotone non-increasing by construction."""
    from conjugategradient_tpu.solvers.cg import cg_solve_traced

    sys_, _ = helmholtz
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=1000)
    _cg_res, cg_hist = cg_solve_traced(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, num_steps=256
    )
    cg_h = np.asarray(cg_hist)
    assert cg_h.max() > 10.0  # rel residual starts at 1; CG spikes way past it
    res = minres_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    assert bool(res.converged)


def test_spd_case_matches_cg():
    sys_ = generators.banded_sin_system(256, 8)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-11, norm="rel_l2")
    res = minres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), jnp.asarray(sys_.x0), policy=pol
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-9


def test_preconditioned_spd():
    """SPD M (Jacobi on an SPD system) cuts iterations; solution validates."""
    sys_ = generators.banded_sin_system(1024, 16)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    A_dev, b_dev = sys_.A.device_put(), jnp.asarray(sys_.b)
    plain = minres_solve(A_dev, b_dev, policy=pol)
    inv = jnp.asarray(1.0 / formats.matrix_diagonal(sys_.A))
    prec = minres_solve(A_dev, b_dev, policy=pol, M=lambda r: inv * r)
    assert bool(prec.converged)
    assert int(prec.iterations) <= int(plain.iterations)
    err = np.linalg.norm(np.asarray(prec.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8


def test_facade_and_2d(helmholtz):
    sys2 = generators.helmholtz_system((24, 24), shift=0.08)
    x_true = oracle.direct_solve(sys2.A, sys2.b)
    res = solve(
        sys2.A, sys2.b, method="minres", tol=1e-10, norm="rel_l2",
        max_iteration=4000,
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-7


def test_exact_x0_and_max_iteration(helmholtz):
    sys_, x_true = helmholtz
    # absolute norm: rel_l2 is degenerate at an exact guess (rr0 ~ 0),
    # for MINRES exactly as for every other solver here
    res = minres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), jnp.asarray(x_true),
        policy=ConvergencePolicy(tol=1e-8, norm="l2"),
    )
    assert bool(res.converged)
    assert int(res.iterations) == 0
    capped = minres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-14, norm="l2", max_iteration=7),
    )
    assert int(capped.iterations) == 7
    assert not bool(capped.converged)


def test_breakdown_exit_before_min_iteration_converges(helmholtz):
    """Exact-breakdown exit (beta1 = 0, e.g. b = 0) before min_iteration is
    exact convergence, not failure (review finding); a noisy near-exact x0
    (beta1 ~ 1e-13 > 0) instead iterates NaN-free to min_iteration and
    also converges."""
    sys_, x_true = helmholtz
    zero = minres_solve(
        sys_.A.device_put(), jnp.zeros(sys_.n),
        policy=ConvergencePolicy(tol=1e-8, norm="l2", min_iteration=5),
    )
    assert bool(zero.converged)
    assert int(zero.iterations) == 0
    near = minres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), jnp.asarray(x_true),
        policy=ConvergencePolicy(tol=1e-8, norm="l2", min_iteration=5),
    )
    assert bool(near.converged)
    assert float(near.residual) < 1e-10
