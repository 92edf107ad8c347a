"""Krylov-Schur Arnoldi eigensolver vs dense numpy.linalg.eig (fp64 oracle),
the same differential strategy as test_lobpcg — but on NONSYMMETRIC operators
with genuinely complex spectra, which no symmetric solver in the stack can
touch."""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, generators
from conjugategradient_tpu.solvers.arnoldi import arnoldi_eigs

GRID = (16, 16)
CD = generators.convection_diffusion_matrix(GRID, eps=0.1)
CD_DENSE = np.asarray(formats.dia_to_dense(CD).data, np.float64)
CD_EV = np.linalg.eigvals(CD_DENSE)


def _sorted(v):
    return np.sort_complex(np.asarray(v))


def test_lm_matches_dense():
    r = arnoldi_eigs(CD, k=6, which="LM", tol=1e-10)
    assert r.converged
    ref = CD_EV[np.argsort(-np.abs(CD_EV))[:6]]
    # conjugate-pair ties make per-index comparison fragile; compare sets
    assert np.max(np.abs(_sorted(r.values) - _sorted(ref))) < 1e-7
    # complex spectrum actually exercised
    assert np.any(np.abs(r.values.imag) > 1e-6)
    # residual estimates are TRUE residuals (free from the recurrence)
    for i in range(6):
        x, lam = r.vectors[:, i], r.values[i]
        true = np.linalg.norm(CD_DENSE @ x - lam * x)
        assert true < 1e-8
        assert abs(true - r.residuals[i]) < 1e-9


def test_sr_leftmost():
    r = arnoldi_eigs(CD, k=4, which="SR", tol=1e-9, m=40)
    assert r.converged
    ref = CD_EV[np.argsort(CD_EV.real)[:4]]
    assert np.max(np.abs(_sorted(r.values) - _sorted(ref))) < 1e-7


def test_shift_invert_nearest_sigma():
    r = arnoldi_eigs(CD, k=4, sigma=0.0, tol=1e-8, m=24)
    assert r.converged
    ref = CD_EV[np.argsort(np.abs(CD_EV))[:4]]
    assert np.max(np.abs(_sorted(r.values) - _sorted(ref))) < 1e-8
    # shift-invert converges in far fewer operator applications than LM-style
    # outer restarts would need for these interior/smallest modes
    assert r.restarts <= 3


def test_symmetric_sanity_real_spectrum():
    # non-square grid: the square Laplacian has multiplicity-2 eigenvalues,
    # and single-vector Krylov spaces contain exactly ONE vector per
    # eigenspace (documented limitation; use solvers.lobpcg for clusters)
    A = generators.poisson_system((12, 13)).A
    Ad = np.asarray(formats.dia_to_dense(A).data, np.float64)
    ev = np.sort(np.linalg.eigvalsh(Ad))
    r = arnoldi_eigs(A, k=3, which="LM", tol=1e-10)
    assert r.converged
    assert np.max(np.abs(r.values.imag)) < 1e-9
    assert np.max(np.abs(np.sort(r.values.real) - ev[-3:])) < 1e-8


def test_callable_operator_and_csr():
    csr = formats.dia_to_csr(CD)
    r_csr = arnoldi_eigs(csr, k=3, which="LM", tol=1e-9)
    assert r_csr.converged

    import jax.numpy as jnp

    Ad = jnp.asarray(CD_DENSE)
    op = lambda v: Ad @ v
    r_op = arnoldi_eigs(op, k=3, which="LM", tol=1e-9, n=CD.n)
    assert r_op.converged
    assert np.max(np.abs(_sorted(r_csr.values) - _sorted(r_op.values))) < 1e-7


def test_validation_errors():
    with pytest.raises(ValueError, match="pass n="):
        arnoldi_eigs(lambda v: v, k=2)
    with pytest.raises(ValueError, match="must be <"):
        arnoldi_eigs(generators.poisson_system((3,)).A, k=3)
    with pytest.raises(ValueError, match="unknown which"):
        arnoldi_eigs(CD, k=2, which="XX")


def test_lucky_breakdown_identity_no_spurious_zeros():
    """ADVICE r3: wn == 0 (invariant subspace) used to be absorbed by
    _safe_div, leaving zero basis rows whose spurious zero eigenvalues rank
    FIRST under which="SM" with resid=0.  The identity matrix breaks down at
    the very first step; the solver must deflate-restart and return exact
    unit eigenvalues for BOTH selections."""
    n = 50
    data = np.ones((1, n))
    I = formats.DiaMatrix(data, (0,), (n, n))
    for which in ("LM", "SM"):
        r = arnoldi_eigs(I, k=3, which=which, tol=1e-10)
        assert r.converged
        assert np.max(np.abs(r.values - 1.0)) < 1e-12, (which, r.values)
        assert np.max(r.residuals) < 1e-10


def test_shift_invert_inner_converged_flag():
    """ADVICE r3: shift-invert must surface inner BiCGStab convergence —
    with a starved inner iteration budget the flag goes False (and with the
    default budget it stays True)."""
    r_ok = arnoldi_eigs(CD, k=2, sigma=0.05, tol=1e-8)
    assert r_ok.inner_converged
    r_starved = arnoldi_eigs(CD, k=2, sigma=0.05, tol=1e-8, inner_max_iteration=2)
    assert not r_starved.inner_converged


def test_shift_invert_residuals_are_true_residuals():
    """ADVICE r3: under sigma the reported residuals are now the directly
    recomputed ||A x - lambda x||_2, not a first-order back-transform."""
    r = arnoldi_eigs(CD, k=3, sigma=0.1, tol=1e-9)
    assert r.converged
    for i in range(3):
        x = r.vectors[:, i]
        true = np.linalg.norm(CD_DENSE @ x - r.values[i] * x)
        assert abs(r.residuals[i] - true) <= 1e-9 + 1e-6 * true


def test_repeated_calls_reuse_jitted_expand():
    """ADVICE r3: the jitted expansion must be cached at module scope (and
    take the matrix as a pytree ARGUMENT, not a closure constant) so
    repeated solves skip retracing."""
    from conjugategradient_tpu.solvers import arnoldi as _arn

    _arn._EXPAND_CACHE.clear()
    r1 = arnoldi_eigs(CD, k=2, tol=1e-8)
    n_after_first = len(_arn._EXPAND_CACHE)
    CD2 = generators.convection_diffusion_matrix(GRID, eps=0.2)
    r2 = arnoldi_eigs(CD2, k=2, tol=1e-8)
    assert r1.converged and r2.converged
    # same operator structure => same cached expansions, no new entries
    assert len(_arn._EXPAND_CACHE) == n_after_first


# ---------------------------------------------------------------------------
# facade (eigs) + distributed twin
# ---------------------------------------------------------------------------


def test_eigs_facade_auto_routes_nonsym_to_arnoldi():
    from conjugategradient_tpu import eigs

    r = eigs(CD, k=3, which="LM", tol=1e-9)
    assert r.converged
    key = np.argsort(-np.abs(CD_EV))
    ref = np.sort_complex(CD_EV[key[:3]])
    assert np.max(np.abs(_sorted(r.values) - ref)) < 1e-7


def test_eigs_facade_auto_routes_symmetric_to_lobpcg():
    """Square Laplacian spectra have multiplicity 2 — the block solver must
    take the symmetric route (single-vector Krylov finds one vector per
    eigenspace, documented limitation)."""
    from conjugategradient_tpu import eigs

    A = generators.poisson_system((12, 12)).A
    Ad = np.asarray(formats.dia_to_dense(A).data, np.float64)
    ev = np.sort(np.linalg.eigvalsh(Ad))
    r = eigs(A, k=4, which="SM", tol=1e-9, dtype=np.float64, max_iterations=400)
    assert r.converged
    assert np.max(np.abs(r.values.imag)) == 0.0
    assert np.max(np.abs(np.sort(r.values.real) - ev[:4])) < 1e-6


def test_eigs_facade_sigma_and_method_force():
    from conjugategradient_tpu import eigs

    r = eigs(CD, k=2, sigma=0.1, tol=1e-9)
    key = np.argsort(np.abs(CD_EV - 0.1))
    ref = np.sort_complex(CD_EV[key[:2]])
    assert np.max(np.abs(_sorted(r.values) - ref)) < 1e-7
    # force arnoldi on a symmetric operator: still correct
    A = generators.poisson_system((12, 13)).A
    r2 = eigs(A, k=2, which="LM", method="arnoldi", tol=1e-9)
    assert r2.converged


def test_gspmd_arnoldi_matches_single_device():
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.solvers.arnoldi import gspmd_arnoldi_eigs

    r1 = arnoldi_eigs(CD, k=3, which="LM", tol=1e-9)
    r8 = gspmd_arnoldi_eigs(CD, k=3, mesh=make_mesh(8), which="LM", tol=1e-9)
    assert r8.converged
    assert np.max(np.abs(_sorted(r1.values) - _sorted(r8.values))) < 1e-7
