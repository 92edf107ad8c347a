"""Generators + numpy oracle: validate against dense ground truth (the
reference's own methodology — R's direct solve, ``R/CG.R:34``)."""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import (
    banded_sin_system,
    poisson2d_matrix,
    poisson3d_matrix,
    poisson_system,
    tridiagonal_system,
)


def test_banded_sin_matches_reference_recipe():
    """Entry-by-entry check of the |sin(i+j)| generator against a literal
    transcription of the loop bounds in MgcgMain.cs:53-84."""
    n, band = 25, 6
    A = formats.dia_to_dense(banded_sin_system(n, band).A)
    expected = np.zeros((n, n))
    for i in range(n):
        for j in range(max(0, i - band // 2 + 1), min(n, i + band // 2)):
            if i != j:
                expected[i, j] = abs(np.sin(i + j))
                expected[i, i] += expected[i, j]
    np.testing.assert_allclose(np.asarray(A.data), expected, rtol=1e-15)


def test_banded_sin_symmetric_dd():
    A = np.asarray(formats.dia_to_dense(banded_sin_system(60, 10).A).data)
    np.testing.assert_allclose(A, A.T)
    offdiag = A - np.diag(np.diag(A))
    assert np.all(np.diag(A) >= np.abs(offdiag).sum(axis=1) - 1e-12)


def test_rhs_and_guess_recipes():
    sys_ = banded_sin_system(10, 6, b_kind="cos10", x0_kind="i/100")
    np.testing.assert_allclose(sys_.b, 10 * np.cos(np.arange(10.0)))
    np.testing.assert_allclose(sys_.x0, np.arange(10.0) / 100)
    sys2 = banded_sin_system(10, 6, b_kind="one_plus", x0_kind="zeros")
    np.testing.assert_allclose(sys2.b, 1 + 0.1 * np.arange(10.0))


def test_tridiagonal_structure():
    sys_ = tridiagonal_system(8)
    A = np.asarray(formats.dia_to_dense(sys_.A).data)
    expected = 2 * np.eye(8) + np.eye(8, k=1) + np.eye(8, k=-1)
    np.testing.assert_allclose(A, expected)
    np.testing.assert_allclose(sys_.b, 0.5 * np.arange(8.0) ** 2)


def test_poisson2d_structure():
    A = np.asarray(formats.dia_to_dense(poisson2d_matrix(3, 2)).data)
    # row 1 = grid point (y=0, x=1): neighbours 0, 2 (left/right) and 4 (up)
    assert A[1, 1] == 4 and A[1, 0] == -1 and A[1, 2] == -1 and A[1, 4] == -1
    # no wraparound coupling across the row seam: point 2 (x=2) -> point 3 (x=0)
    assert A[2, 3] == 0
    np.testing.assert_allclose(A, A.T)


def test_poisson3d_spd():
    A = np.asarray(formats.dia_to_dense(poisson3d_matrix(3)).data)
    np.testing.assert_allclose(A, A.T)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


@pytest.mark.parametrize("fmt", ["dia", "csr", "ell", "dense"])
def test_oracle_spmv_formats_agree(fmt):
    sys_ = banded_sin_system(50, 8)
    x = np.linspace(-1, 1, 50)
    y_ref = np.asarray(formats.dia_to_dense(sys_.A).data) @ x
    if fmt == "dia":
        A = sys_.A
    elif fmt == "csr":
        A = formats.dia_to_csr(sys_.A)
    elif fmt == "ell":
        A = formats.csr_to_ell(formats.dia_to_csr(sys_.A))
    else:
        A = formats.dia_to_dense(sys_.A)
    np.testing.assert_allclose(oracle.spmv(A, x), y_ref, rtol=1e-13)


def test_oracle_cg_vs_direct():
    sys_ = banded_sin_system(40, 6)
    res = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-12, norm="l2")
    x_direct = oracle.direct_solve(sys_.A, sys_.b)
    np.testing.assert_allclose(res.x, x_direct, rtol=1e-8)
    assert res.converged


def test_oracle_cg_min_iteration_forces_extra_sweeps():
    sys_ = tridiagonal_system(16)
    r1 = oracle.cg(sys_.A, sys_.b, tol=1e-10)
    r2 = oracle.cg(
        sys_.A, sys_.b, tol=1e-10, min_iteration=r1.iterations + 3, max_iteration=r1.iterations + 10
    )
    assert r2.iterations >= r1.iterations + 3


def test_oracle_cg_max_iteration_raises():
    sys_ = banded_sin_system(40, 6)
    with pytest.raises(oracle.NotConvergedError):
        oracle.cg(sys_.A, sys_.b, tol=1e-14, max_iteration=2)
    res = oracle.cg(sys_.A, sys_.b, tol=1e-14, max_iteration=2, raise_on_divergence=False)
    assert not res.converged and res.iterations == 2


@pytest.mark.parametrize("norm", ["l2", "linf", "rel_l2"])
def test_oracle_norm_conventions(norm):
    sys_ = poisson_system((12, 12))
    res = oracle.cg(sys_.A, sys_.b, tol=1e-9, norm=norm)
    assert res.converged
    r = sys_.b - oracle.spmv(sys_.A, res.x)
    if norm == "l2":
        assert np.linalg.norm(r) < 1e-9
    elif norm == "linf":
        assert np.max(np.abs(r)) < 1e-9
    else:
        assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-9


def test_rows_forms_match_full_builders():
    """Per-row-block recipes for the session-5 families reproduce the full
    builders slab-by-slab (the rung-5 assembly contract)."""
    from conjugategradient_tpu.core import generators as g

    A = g.convection_diffusion_matrix((12, 10), eps=0.07)
    for lo, hi in ((0, 40), (40, 97), (97, 120)):
        offs, data = g.convection_diffusion_rows((12, 10), lo, hi, eps=0.07)
        assert offs == A.offsets
        np.testing.assert_allclose(data, np.asarray(A.data)[:, lo:hi], atol=0)

    H = g.helmholtz_matrix((9, 11), shift=0.03)
    for lo, hi in ((0, 50), (50, 99)):
        offs, data = g.helmholtz_rows((9, 11), 0.03, lo, hi)
        assert offs == H.offsets
        np.testing.assert_allclose(data, np.asarray(H.data)[:, lo:hi], atol=0)

    # through the registry entry point
    offs, data, b, x0 = g.system_rows(
        "convection_diffusion", 10, 30, 120, grid=(12, 10), param=0.07
    )
    np.testing.assert_allclose(data, np.asarray(A.data)[:, 10:30], atol=0)
    offs, data, b, x0 = g.system_rows("helmholtz", 0, 99, 99, grid=(9, 11), param=0.03)
    np.testing.assert_allclose(data, np.asarray(H.data), atol=0)
