"""Device-resident CG vs the numpy oracle and direct solves — the core
differential-testing discipline of the reference (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import (
    banded_sin_system,
    poisson_system,
    tridiagonal_system,
)
from conjugategradient_tpu.solvers.cg import cg_solve, cg_solve_traced
from conjugategradient_tpu.solvers.policy import ConvergencePolicy, NotConvergedError


def _solve(system, policy, **kw):
    A = system.A.device_put()
    return jax.jit(lambda b, x0: cg_solve(A, b, x0, policy, **kw))(
        jnp.asarray(system.b), jnp.asarray(system.x0)
    )


@pytest.mark.parametrize("norm", ["l2", "linf", "rel_l2"])
def test_cg_matches_direct_solve(norm):
    sys_ = banded_sin_system(80, 8)
    res = _solve(sys_, ConvergencePolicy(tol=1e-10, norm=norm, max_iteration=2000))
    assert bool(res.converged)
    x_direct = oracle.direct_solve(sys_.A, sys_.b)
    np.testing.assert_allclose(np.asarray(res.x), x_direct, rtol=1e-6, atol=1e-8)


def test_cg_matches_oracle_iteration_count():
    """Same recurrence, same policy -> same trajectory (fp64, modest tol)."""
    sys_ = tridiagonal_system(64)
    res = _solve(sys_, ConvergencePolicy(tol=1e-8, max_iteration=200))
    ref = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-8, max_iteration=200)
    assert abs(int(res.iterations) - ref.iterations) <= 1
    np.testing.assert_allclose(np.asarray(res.x), ref.x, rtol=1e-8, atol=1e-10)


def test_cg_min_iteration_enforced():
    sys_ = tridiagonal_system(32)
    r1 = _solve(sys_, ConvergencePolicy(tol=1e-8, max_iteration=500))
    forced = int(r1.iterations) + 5
    r2 = _solve(sys_, ConvergencePolicy(tol=1e-8, min_iteration=forced, max_iteration=500))
    assert int(r2.iterations) >= forced
    assert bool(r2.converged)


def test_cg_max_iteration_flags_divergence():
    sys_ = banded_sin_system(64, 8)
    res = _solve(sys_, ConvergencePolicy(tol=1e-15, max_iteration=3))
    assert not bool(res.converged)
    assert int(res.iterations) == 3
    with pytest.raises(NotConvergedError):
        res.raise_if_diverged()


def test_cg_exact_initial_guess_is_nan_free():
    sys_ = tridiagonal_system(16)
    x_exact = oracle.direct_solve(sys_.A, sys_.b)
    A = sys_.A.device_put()
    res = cg_solve(
        A,
        jnp.asarray(sys_.b),
        jnp.asarray(x_exact),
        ConvergencePolicy(tol=1e-8, min_iteration=3, max_iteration=50),
    )
    assert np.all(np.isfinite(np.asarray(res.x)))
    np.testing.assert_allclose(np.asarray(res.x), x_exact, rtol=1e-10)


@pytest.mark.parametrize("fmt", ["csr", "ell", "dense"])
def test_cg_all_formats(fmt):
    sys_ = banded_sin_system(48, 6)
    if fmt == "csr":
        A = formats.dia_to_csr(sys_.A).device_put()
    elif fmt == "ell":
        A = formats.csr_to_ell(formats.dia_to_csr(sys_.A)).device_put()
    else:
        A = formats.dia_to_dense(sys_.A).device_put()
    res = jax.jit(lambda b, x0: cg_solve(A, b, x0, ConvergencePolicy(tol=1e-10, max_iteration=1000)))(
        jnp.asarray(sys_.b), jnp.asarray(sys_.x0)
    )
    np.testing.assert_allclose(
        np.asarray(res.x), oracle.direct_solve(sys_.A, sys_.b), rtol=1e-6, atol=1e-8
    )


def test_cg_callable_operator():
    """Matrix-free operators work (the multigrid path depends on this)."""
    sys_ = poisson_system((10, 10))
    A = sys_.A.device_put()
    from conjugategradient_tpu.ops.spmv import spmv_dia

    res = cg_solve(lambda v: spmv_dia(A, v), jnp.asarray(sys_.b), policy=ConvergencePolicy(tol=1e-10, max_iteration=500))
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), oracle.direct_solve(sys_.A, sys_.b), rtol=1e-6, atol=1e-8
    )


def test_cg_traced_history_monotone_tail():
    sys_ = poisson_system((12, 12))
    A = sys_.A.device_put()
    res, hist = jax.jit(
        lambda b: cg_solve_traced(A, b, policy=ConvergencePolicy(tol=1e-10, max_iteration=400), num_steps=400)
    )(jnp.asarray(sys_.b))
    hist = np.asarray(hist)
    assert bool(res.converged)
    it = int(res.iterations)
    # after convergence the recorded residual freezes
    assert np.allclose(hist[it:], hist[it])
    assert hist[it] < 1e-10
    # the CG residual history reaches the same count as the untraced solver
    res2 = cg_solve(A, jnp.asarray(sys_.b), policy=ConvergencePolicy(tol=1e-10, max_iteration=400))
    assert int(res2.iterations) == it


def test_cg_fp32_with_precise_dot():
    """fp32 storage + compensated dots still reaches a tight tolerance."""
    sys_ = poisson_system((16, 16))
    A = sys_.A.device_put(dtype=jnp.float32)
    b = jnp.asarray(sys_.b, dtype=jnp.float32)
    res = jax.jit(
        lambda b: cg_solve(A, b, policy=ConvergencePolicy(tol=2e-5, norm="rel_l2", max_iteration=2000), precise_dot=True)
    )(b)
    assert bool(res.converged)
    x64 = oracle.direct_solve(sys_.A, sys_.b)
    rel = np.linalg.norm(np.asarray(res.x, dtype=np.float64) - x64) / np.linalg.norm(x64)
    assert rel < 1e-3


def test_cg_finite_termination_property():
    """CG converges in <= n iterations in exact arithmetic (Krylov theory);
    in fp64 with a modest tolerance the bound holds with a tiny slack.
    Property-tested over random SPD systems (SURVEY.md SS4 implication)."""
    rng = np.random.default_rng(11)
    for trial in range(5):
        n = int(rng.integers(8, 40))
        B = rng.standard_normal((n, n))
        A = formats.DenseMatrix(B @ B.T + n * np.eye(n))
        b = rng.standard_normal(n)
        res = cg_solve(
            A.device_put(), jnp.asarray(b),
            policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2 * n),
        )
        assert bool(res.converged)
        assert int(res.iterations) <= n + 2


def test_cg_krylov_exactness_few_distinct_eigenvalues():
    """With k distinct eigenvalues CG converges in k iterations — the sharp
    version of the finite-termination property."""
    rng = np.random.default_rng(12)
    n, k = 63, 3  # n divisible by k
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.repeat([1.0, 4.0, 9.0], n // k)
    A = formats.DenseMatrix(Q @ np.diag(eigs) @ Q.T)
    b = rng.standard_normal(n)
    res = cg_solve(
        A.device_put(), jnp.asarray(b),
        policy=ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=n),
    )
    assert bool(res.converged)
    assert int(res.iterations) <= k + 1


def test_spectrum_from_cg_unpreconditioned():
    """The CG-is-Lanczos identity: Ritz values from a traced solve's own
    (alpha, beta) scalars recover the extremal eigenvalues of A."""
    from conjugategradient_tpu.solvers.eigen import spectrum_from_cg

    rng = np.random.default_rng(5)
    n = 48
    B = rng.standard_normal((n, n))
    A = formats.DenseMatrix(B @ B.T + n * np.eye(n))
    b = rng.standard_normal(n)
    res, _hist, (alphas, betas) = cg_solve_traced(
        A.device_put(),
        jnp.asarray(b),
        policy=ConvergencePolicy(tol=1e-12, norm="rel_l2", max_iteration=3 * n),
        num_steps=3 * n,
        with_coefficients=True,
    )
    assert bool(res.converged)
    lam_min, lam_max, kappa = spectrum_from_cg(alphas, betas, int(res.iterations))
    w = np.linalg.eigvalsh(np.asarray(A.data))
    # Ritz values sit inside the true spectrum and converge to its ends
    assert w[0] * 0.999 <= lam_min <= lam_max <= w[-1] * 1.001
    np.testing.assert_allclose(lam_max, w[-1], rtol=1e-4)
    np.testing.assert_allclose(lam_min, w[0], rtol=1e-2)
    assert 0.95 * (w[-1] / w[0]) <= kappa <= 1.001 * (w[-1] / w[0])


def test_spectrum_from_cg_measures_the_preconditioned_operator():
    """With Jacobi M the recovered spectrum is spec(M^-1 A), not spec(A) —
    i.e. the probe measures what the preconditioner actually achieved."""
    from conjugategradient_tpu.solvers.eigen import spectrum_from_cg

    rng = np.random.default_rng(6)
    n = 40
    B = rng.standard_normal((n, n))
    dense = B @ B.T + n * np.diag(1.0 + 9.0 * rng.random(n))  # wild diagonal
    A = formats.DenseMatrix(dense)
    d = np.diag(dense)
    inv_d = jnp.asarray(1.0 / d)
    b = rng.standard_normal(n)
    res, _hist, (alphas, betas) = cg_solve_traced(
        A.device_put(),
        jnp.asarray(b),
        policy=ConvergencePolicy(tol=1e-12, norm="rel_l2", max_iteration=3 * n),
        num_steps=3 * n,
        M=lambda r: inv_d * r,
        with_coefficients=True,
    )
    assert bool(res.converged)
    lam_min, lam_max, kappa = spectrum_from_cg(alphas, betas, int(res.iterations))
    # spec(M^-1 A) == spec(D^-1/2 A D^-1/2)
    S = dense / np.sqrt(np.outer(d, d))
    w = np.linalg.eigvalsh(S)
    np.testing.assert_allclose(lam_max, w[-1], rtol=1e-3)
    np.testing.assert_allclose(lam_min, w[0], rtol=5e-2)
    assert kappa < np.linalg.eigvalsh(dense)[-1] / np.linalg.eigvalsh(dense)[0]


def test_resolve_max_clamps_to_int32():
    """703^3 regression: device iteration carries are int32; max_iteration=8n
    overflowed the jnp.int32 cast at 347M rows.  resolve_max must clamp."""
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    assert ConvergencePolicy(max_iteration=2**33).resolve_max(10) == 2**31 - 1
    assert ConvergencePolicy().resolve_max(2**33) == 2**31 - 1
    assert ConvergencePolicy(max_iteration=500).resolve_max(10) == 500
    assert ConvergencePolicy().resolve_max(10) == 10
