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
