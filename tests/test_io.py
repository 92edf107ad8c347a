"""Matrix Market IO + scipy interop round trips."""

import numpy as np

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats, generators, oracle
from conjugategradient_tpu.core.io import (
    from_scipy,
    load_matrix_market,
    load_vector_market,
    save_matrix_market,
    save_vector_market,
    to_scipy,
)


def test_scipy_roundtrip():
    A = generators.banded_sin_matrix(200, 12)
    sp = to_scipy(A)
    back = from_scipy(sp)
    x = np.random.default_rng(0).standard_normal(200)
    np.testing.assert_allclose(oracle.spmv(back, x), sp @ x, atol=1e-12)
    np.testing.assert_allclose(oracle.spmv(A, x), oracle.spmv(back, x), atol=1e-12)


def test_mtx_roundtrip_banded_auto_dia(tmp_path):
    A = generators.banded_sin_matrix(128, 8)
    p = tmp_path / "band.mtx"
    save_matrix_market(p, A)
    B = load_matrix_market(p)
    assert isinstance(B, formats.DiaMatrix)  # banded -> DIA fast path
    x = np.random.default_rng(1).standard_normal(128)
    np.testing.assert_allclose(oracle.spmv(B, x), oracle.spmv(A, x), atol=1e-12)


def test_mtx_irregular_lands_in_csr(tmp_path):
    import scipy.sparse as sp

    rng = np.random.default_rng(2)
    m = sp.random(100, 100, density=0.02, random_state=3, format="coo")
    m = m + m.T + sp.eye(100) * 5  # symmetric, diagonally shifted
    p = tmp_path / "rand.mtx"
    from scipy.io import mmwrite

    mmwrite(str(p), m)
    A = load_matrix_market(p)
    assert isinstance(A, formats.CsrMatrix)  # scattered diagonals -> CSR
    x = rng.standard_normal(100)
    np.testing.assert_allclose(oracle.spmv(A, x), m @ x, atol=1e-12)


def test_symmetric_storage_expanded(tmp_path):
    """Matrix Market symmetric storage (lower triangle only) must come back
    as the full operator."""
    import scipy.sparse as sp
    from scipy.io import mmwrite

    A = generators.banded_sin_matrix(64, 6)
    full = to_scipy(A)
    lower = sp.tril(full)
    p = tmp_path / "sym.mtx"
    mmwrite(str(p), lower.tocoo(), symmetry="symmetric")
    B = load_matrix_market(p)
    x = np.random.default_rng(4).standard_normal(64)
    np.testing.assert_allclose(oracle.spmv(B, x), full @ x, atol=1e-12)


def test_vector_roundtrip(tmp_path):
    b = np.random.default_rng(5).standard_normal(77)
    p = tmp_path / "b.mtx"
    save_vector_market(p, b)
    np.testing.assert_allclose(load_vector_market(p), b, atol=1e-14)


def test_end_to_end_loaded_solve(tmp_path):
    """Write a system out, read it back, solve through the facade, validate
    against the original's oracle solution — the user migration path."""
    sys_ = generators.banded_sin_system(512, 16)
    pa, pb = tmp_path / "A.mtx", tmp_path / "b.mtx"
    save_matrix_market(pa, sys_.A)
    save_vector_market(pb, sys_.b)
    A = load_matrix_market(pa)
    b = load_vector_market(pb)
    res = solve(A, b, method="cg", tol=1e-10, norm="rel_l2")
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8
