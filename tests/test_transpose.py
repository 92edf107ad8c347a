"""Operator transpose, symmetry diagnostic, CGNR."""

import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats, generators, oracle
from conjugategradient_tpu.core.formats import is_symmetric, transpose


def _dense(A):
    if isinstance(A, formats.DenseMatrix):
        return np.asarray(A.data)
    if isinstance(A, formats.DiaMatrix):
        return np.asarray(formats.dia_to_dense(A).data)
    return np.asarray(formats.csr_to_dense(formats._any_to_csr(A)).data)


@pytest.mark.parametrize(
    "make",
    [
        lambda: generators.convection_diffusion_matrix((12, 10), eps=0.1),
        lambda: generators.nonsymmetric_banded_matrix(64, 8),
        lambda: formats.dia_to_csr(generators.nonsymmetric_banded_matrix(48, 6)),
        lambda: formats.csr_to_ell(
            formats.dia_to_csr(generators.nonsymmetric_banded_matrix(40, 6))
        ),
        lambda: formats.dia_to_stencil(
            generators.convection_diffusion_matrix((8, 8), eps=0.2), (8, 8)
        ),
    ],
    ids=["dia-convdiff", "dia-band", "csr", "ell", "stencil"],
)
def test_transpose_matches_dense(make):
    A = make()
    At = transpose(A)
    assert type(At) is type(A)
    np.testing.assert_allclose(_dense(At), _dense(A).T, atol=1e-14)
    # spmv agrees too (the operator actually used)
    x = np.random.default_rng(0).standard_normal(A.shape[1])
    np.testing.assert_allclose(
        oracle.spmv(At, x), _dense(A).T @ x, atol=1e-10
    )


def test_transpose_const_stencil():
    A = generators.poisson2d_matrix(9)
    st = formats.dia_to_stencil(A, (9, 9))
    cst = formats.stencil_to_const(st)
    assert cst is not None
    Att = transpose(transpose(cst))
    x = np.random.default_rng(1).standard_normal(81)
    np.testing.assert_allclose(oracle.spmv(Att, x), oracle.spmv(cst, x), atol=1e-12)


def test_is_symmetric():
    assert is_symmetric(generators.banded_sin_matrix(64, 8), tol=1e-14)
    assert is_symmetric(generators.poisson2d_matrix(8))
    assert not is_symmetric(
        generators.convection_diffusion_matrix((8, 8), eps=0.1), tol=1e-10
    )


def test_cgnr_solves_nonsymmetric():
    sys_ = generators.convection_diffusion_system((16, 16), eps=0.2)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = solve(sys_.A, sys_.b, method="cgnr", tol=1e-10, norm="rel_l2")
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-6
    # reported residual is the TRUE one in the asked norm
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x, np.float64))
    rel = np.linalg.norm(r) / np.linalg.norm(sys_.b)
    np.testing.assert_allclose(float(res.residual), rel, rtol=1e-3)


def test_transpose_fuzz_random_dia():
    """Seeded fuzz: random sparse DIA offset sets / data; transpose matches
    the dense transpose and is an involution."""
    rng = np.random.default_rng(11)
    for _ in range(8):
        n = int(rng.integers(5, 40))
        n_off = int(rng.integers(1, min(2 * n - 1, 9)))
        offsets = tuple(
            sorted(rng.choice(np.arange(-(n - 1), n), size=n_off, replace=False))
        )
        data = rng.standard_normal((n_off, n))
        i = np.arange(n)
        for k, off in enumerate(offsets):
            data[k] = np.where((i + off >= 0) & (i + off < n), data[k], 0.0)
        A = formats.DiaMatrix(data, offsets, (n, n))
        At = transpose(A)
        np.testing.assert_allclose(_dense(At), _dense(A).T, atol=1e-14)
        Att = transpose(At)
        np.testing.assert_allclose(_dense(Att), _dense(A), atol=1e-14)
