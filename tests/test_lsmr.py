"""LSMR least squares (``solvers/lsmr.py``): differential tests vs
``scipy.sparse.linalg.lsmr`` on over/underdetermined systems, damping,
square nonsymmetric parity, warm starts, and facade routing."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.io import from_scipy
from conjugategradient_tpu.solvers.lsmr import lsmr_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy

POL = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000)


def _overdetermined(m=500, n=200, seed=0):
    S = sp.random(m, n, density=0.05, random_state=seed, format="csr")
    S = (S + sp.vstack([sp.eye(n), sp.csr_matrix((m - n, n))])).tocsr()
    b = np.random.default_rng(seed).standard_normal(m)
    return S, b


def test_lsmr_overdetermined_matches_scipy():
    S, b = _overdetermined()
    res = lsmr_solve(from_scipy(S), jnp.asarray(b), policy=POL)
    assert bool(res.converged)
    x_ref = spla.lsmr(S, b, atol=1e-14, btol=1e-14)[0]
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-8
    # least-squares optimality: ||A^T r|| tiny even though ||r|| is not
    r = b - S @ np.asarray(res.x)
    assert np.linalg.norm(S.T @ r) < 1e-8 * np.linalg.norm(S.T @ b)
    assert np.linalg.norm(r) > 1.0  # genuinely inconsistent


def test_lsmr_underdetermined_matches_scipy():
    m, n = 200, 500
    S = sp.random(m, n, density=0.05, random_state=1, format="csr")
    S = (S + sp.hstack([sp.eye(m), sp.csr_matrix((m, n - m))])).tocsr()
    b = np.random.default_rng(1).standard_normal(m)
    res = lsmr_solve(from_scipy(S), jnp.asarray(b), policy=POL)
    assert bool(res.converged)
    x_ref = spla.lsmr(S, b, atol=1e-14, btol=1e-14)[0]
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-8


def test_lsmr_damped_matches_scipy():
    S, b = _overdetermined(seed=2)
    res = lsmr_solve(from_scipy(S), jnp.asarray(b), policy=POL, damp=0.5)
    x_ref = spla.lsmr(S, b, damp=0.5, atol=1e-14, btol=1e-14)[0]
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-8


def test_lsmr_square_nonsymmetric():
    sys_ = generators.nonsymmetric_banded_system(1024, 8)
    res = lsmr_solve(sys_.A, jnp.asarray(np.asarray(sys_.b)), policy=POL)
    assert bool(res.converged)
    x_ref = oracle.direct_solve(sys_.A, sys_.b)
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-8


def test_lsmr_warm_start_and_facade():
    S, b = _overdetermined(seed=3)
    x_ref = spla.lsmr(S, b, atol=1e-14, btol=1e-14)[0]
    res = lsmr_solve(
        from_scipy(S), jnp.asarray(b), x0=jnp.asarray(x_ref), policy=POL
    )
    rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-9  # warm start lands on (and refines around) the optimum
    resf = solve(from_scipy(S), b, method="lsmr", tol=1e-10, norm="rel_l2")
    relf = np.linalg.norm(np.asarray(resf.x) - x_ref) / np.linalg.norm(x_ref)
    assert relf < 1e-8


def test_lsmr_refuses_linf():
    S, b = _overdetermined(seed=4)
    with pytest.raises(ValueError, match="monitors"):
        lsmr_solve(
            from_scipy(S), jnp.asarray(b),
            policy=ConvergencePolicy(tol=1e-6, norm="linf"),
        )


def test_lsmr_damped_residual_is_damped_optimality():
    """Review regression: with damp>0 the returned residual must be the
    DAMPED problem's optimality residual ||A^T r - damp^2 x|| (which the
    loop drives to tol), not the undamped ||A^T r|| (which stays O(1))."""
    S, b = _overdetermined(seed=5)
    res = lsmr_solve(from_scipy(S), jnp.asarray(b), policy=POL, damp=0.5)
    assert bool(res.converged)
    assert float(res.residual) < POL.tol * 10  # consistent with converged
    x = np.asarray(res.x)
    opt = S.T @ (b - S @ x) - 0.25 * x
    assert np.linalg.norm(opt) < 1e-8 * np.linalg.norm(S.T @ b)
