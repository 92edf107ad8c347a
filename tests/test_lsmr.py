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


# ---------------------------------------------------------------------------
# distributed twin (round 4): sharded LSMR over the virtual mesh
# ---------------------------------------------------------------------------


def _square_banded_inconsistent(n=512, seed=3):
    """Square nonsymmetric banded system with a rank deficiency (one zero
    row) and an inconsistent b: ||r|| stays O(1) while ||A^T r|| -> 0 — the
    genuine least-squares regime."""
    A = generators.nonsymmetric_banded_matrix(n, band=6)
    data = np.asarray(A.data).copy()
    for k, off in enumerate(A.offsets):
        lo = max(0, -off)
        if lo <= 7 < n:
            data[k, 7] = 0.0  # zero out row 7 entirely
    from conjugategradient_tpu.core.formats import DiaMatrix

    Az = DiaMatrix(data, A.offsets, A.shape)
    b = np.random.default_rng(seed).standard_normal(n)
    return Az, b


def test_sharded_lsmr_shard_count_invariance():
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import sharded_lsmr_solve

    Az, b = _square_banded_inconsistent()
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000)
    ref = lsmr_solve(Az, jnp.asarray(b), policy=pol)
    assert bool(ref.converged)
    for num in (1, 2, 4, 8):
        res = sharded_lsmr_solve(Az, b, policy=pol, mesh=make_mesh(num))
        assert bool(res.converged), num
        rel = np.linalg.norm(np.asarray(res.x) - np.asarray(ref.x)) / np.linalg.norm(
            np.asarray(ref.x)
        )
        assert rel < 1e-7, (num, rel)
    # genuinely inconsistent: residual is O(1) but optimality holds
    S = None
    r = b - oracle.spmv(Az, np.asarray(res.x, np.float64))
    assert np.linalg.norm(r) > 0.1
    At_r = oracle.spmv(
        __import__("conjugategradient_tpu.core.formats", fromlist=["transpose"]).transpose(Az),
        r,
    )
    assert np.linalg.norm(At_r) < 1e-6


def test_sharded_lsmr_facade_and_damp():
    from conjugategradient_tpu.parallel.mesh import make_mesh

    Az, b = _square_banded_inconsistent(n=256, seed=5)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000)
    ref = lsmr_solve(Az, jnp.asarray(b), policy=pol, damp=0.3)
    res = solve(Az, b, method="lsmr", tol=1e-10, norm="rel_l2",
                max_iteration=4000, mesh=make_mesh(4), damp=0.3)
    assert bool(res.converged)
    rel = np.linalg.norm(np.asarray(res.x) - np.asarray(ref.x)) / np.linalg.norm(
        np.asarray(ref.x)
    )
    assert rel < 1e-7
    with pytest.raises(TypeError, match="square-banded DiaMatrix"):
        S, bb = _overdetermined(100, 40)
        solve(from_scipy(S), bb, method="lsmr", mesh=make_mesh(2))
