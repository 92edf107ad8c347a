"""LOBPCG block eigensolver: differential validation vs dense fp64 eigh.

Extends the reference's eigen-analysis axis (the embedded Jacobi solver,
``SparseMatrix.cs:234-372``) to the large-sparse regime it cannot reach.
"""

import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu.core import formats, generators
from conjugategradient_tpu.solvers.lobpcg import lobpcg


def _dense_eigs(A):
    return np.linalg.eigvalsh(np.asarray(formats.dia_to_dense(A).data, np.float64))


def test_smallest_poisson1d():
    """1-D Laplacian eigenvalues are known in closed form."""
    n, k = 128, 4
    A = generators.poisson1d_matrix(n)
    res = lobpcg(A, k, tol=1e-10, max_iterations=400, dtype=jnp.float64)
    exact = 4.0 * np.sin(np.pi * np.arange(1, k + 1) / (2 * (n + 1))) ** 2
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-8)


def test_smallest_banded_vs_dense():
    A = generators.banded_sin_matrix(256, 12)
    k = 6
    res = lobpcg(A, k, tol=1e-9, max_iterations=600, dtype=jnp.float64)
    exact = _dense_eigs(A)[:k]
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-6)


def test_largest_end():
    A = generators.banded_sin_matrix(200, 8)
    k = 3
    res = lobpcg(A, k, tol=1e-9, max_iterations=600, dtype=jnp.float64, largest=True)
    exact = _dense_eigs(A)[-k:]
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-6)


def test_eigenvectors_residual_and_orthonormal():
    from conjugategradient_tpu.core import oracle

    A = generators.poisson2d_matrix(24)
    res = lobpcg(A, 5, tol=1e-9, max_iterations=600, dtype=jnp.float64)
    X = np.asarray(res.eigenvectors, np.float64)
    lam = np.asarray(res.eigenvalues, np.float64)
    assert bool(res.converged)
    np.testing.assert_allclose(X.T @ X, np.eye(5), atol=1e-8)
    for j in range(5):
        r = oracle.spmv(A, X[:, j]) - lam[j] * X[:, j]
        assert np.linalg.norm(r) < 1e-7


def test_multigrid_preconditioning_cuts_iterations():
    """A V-cycle M turns LOBPCG into a multigrid eigensolver; on Poisson it
    must converge in far fewer iterations (the smallest modes are exactly
    the smooth ones multigrid handles)."""
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.multi import as_multi_preconditioner

    grid = (63, 63)
    A = generators.poisson2d_matrix(63)
    plain = lobpcg(A, 4, tol=1e-8, max_iterations=500, dtype=jnp.float64)
    h = build_hierarchy(A, grid)
    M = as_multi_preconditioner(h)
    prec = lobpcg(A, 4, M=M, tol=1e-8, max_iterations=500, dtype=jnp.float64)
    assert bool(prec.converged)
    exact = _dense_eigs(A)[:4]
    np.testing.assert_allclose(np.asarray(prec.eigenvalues), exact, rtol=1e-5)
    assert int(prec.iterations) * 3 <= max(int(plain.iterations), 60)


def test_outlier_modes_found():
    """On the deflation workload the k smallest eigenvalues are the planted
    outliers; LOBPCG (Jacobi-preconditioned — the outliers are diagonal-
    scaling artefacts) must find them."""
    sys_ = generators.outlier_system(1024, band=16, n_outliers=4, scale=1e-3)
    inv = 1.0 / formats.matrix_diagonal(sys_.A)
    M = lambda R: jnp.asarray(inv)[:, None] * R
    res = lobpcg(sys_.A, 4, M=M, tol=1e-7, max_iterations=500, dtype=jnp.float64)
    exact = _dense_eigs(sys_.A)[:4]
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-4)


def test_fp32_path():
    A = generators.poisson1d_matrix(256)
    res = lobpcg(A, 3, tol=1e-4, max_iterations=400, dtype=jnp.float32)
    exact = 4.0 * np.sin(np.pi * np.arange(1, 4) / (2 * 257)) ** 2
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-2)


def test_gspmd_distributed_matches_single_device():
    """Row-sharded LOBPCG over the 8-device mesh: same trajectory as the
    single-device solver up to reduction rounding."""
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.solvers.lobpcg import gspmd_lobpcg

    A = generators.banded_sin_matrix(512, 12)
    k = 4
    single = lobpcg(A, k, tol=1e-9, max_iterations=600, dtype=jnp.float64, seed=0)
    dist = gspmd_lobpcg(
        A, k, make_mesh(8), tol=1e-9, max_iterations=600, dtype=jnp.float64, seed=0
    )
    assert bool(dist.converged)
    exact = _dense_eigs(A)[:k]
    np.testing.assert_allclose(np.asarray(dist.eigenvalues), exact, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dist.eigenvalues), np.asarray(single.eigenvalues), rtol=1e-8
    )


def test_stencil_operator():
    """Grid-stencil containers work through the same block-operator hook."""
    A = generators.poisson2d_matrix(16)
    A_st = formats.dia_to_stencil(A, (16, 16))
    res = lobpcg(A_st, 3, tol=1e-9, max_iterations=500, dtype=jnp.float64)
    exact = _dense_eigs(A)[:3]
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), exact, rtol=1e-6)


# --- generalized eigenproblem (A x = lam B x) --------------------------------


def test_lobpcg_generalized_matches_dense_eigh():
    """B = tridiagonal mass matrix: generalized Ritz values match
    scipy.linalg.eigh(A, B), eigenvectors come back B-orthonormal."""
    import scipy.linalg as sla

    from conjugategradient_tpu.core.generators import tridiagonal_matrix

    A = generators.poisson2d_matrix(20, 20)
    n = A.n
    B = tridiagonal_matrix(n, diag=4.0 / 6.0, off=1.0 / 6.0)
    res = lobpcg(A, 4, B=B, tol=1e-8, dtype=jnp.float64, max_iterations=500)
    assert bool(res.converged)
    Ad = np.asarray(formats.dia_to_dense(A).data)
    Bd = np.asarray(formats.dia_to_dense(B).data)
    w = sla.eigh(Ad, Bd, eigvals_only=True)[:4]
    lam = np.asarray(res.eigenvalues)
    assert np.abs(lam - w).max() / w[0] < 1e-8
    X = np.asarray(res.eigenvectors)
    assert np.abs(X.T @ Bd @ X - np.eye(4)).max() < 1e-10


def test_lobpcg_generalized_with_multigrid_m():
    """V-cycle M (approximate A^-1) still accelerates the generalized
    problem — iteration count far below the unpreconditioned run."""
    import scipy.linalg as sla

    from conjugategradient_tpu.core.generators import poisson_system, tridiagonal_matrix
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.multi import as_multi_preconditioner

    grid = (31, 31)
    sys_ = poisson_system(grid)
    A = sys_.A
    B = tridiagonal_matrix(A.n, diag=4.0 / 6.0, off=1.0 / 6.0)
    h = build_hierarchy(A, grid, dtype=np.float64)

    def M(R):  # flat (n, k) -> grid cycle per column
        return as_multi_preconditioner(h)(R)

    res = lobpcg(A, 3, B=B, M=M, tol=1e-7, dtype=jnp.float64, max_iterations=200)
    res_plain = lobpcg(A, 3, B=B, tol=1e-7, dtype=jnp.float64, max_iterations=600)
    assert bool(res.converged)
    assert int(res.iterations) * 3 < int(res_plain.iterations)
    Ad = np.asarray(formats.dia_to_dense(A).data)
    Bd = np.asarray(formats.dia_to_dense(B).data)
    w = sla.eigh(Ad, Bd, eigvals_only=True)[:3]
    assert np.abs(np.asarray(res.eigenvalues) - w).max() / w[0] < 1e-6


def test_gspmd_lobpcg_generalized():
    """B rides the GSPMD wrapper too: sharded generalized eigensolve
    matches dense eigh(A, B)."""
    import scipy.linalg as sla

    from conjugategradient_tpu.core.generators import tridiagonal_matrix
    from conjugategradient_tpu.parallel import make_mesh
    from conjugategradient_tpu.solvers.lobpcg import gspmd_lobpcg

    A = generators.poisson2d_matrix(16, 16)
    B = tridiagonal_matrix(A.n, diag=4.0 / 6.0, off=1.0 / 6.0)
    res = gspmd_lobpcg(
        A, 3, make_mesh(8), B=B, tol=1e-8, dtype=jnp.float64,
        max_iterations=600,
    )
    assert bool(res.converged)
    Ad = np.asarray(formats.dia_to_dense(A).data)
    Bd = np.asarray(formats.dia_to_dense(B).data)
    w = sla.eigh(Ad, Bd, eigvals_only=True)[:3]
    assert np.abs(np.asarray(res.eigenvalues) - w).max() / w[0] < 1e-8
