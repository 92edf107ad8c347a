"""Native C++ kit vs the numpy implementations (differential, like everything)."""

import numpy as np
import pytest

from conjugategradient_tpu import native
from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import banded_sin_matrix, banded_sin_system
from conjugategradient_tpu.core.partition import RowBlockPartition, halo_ranges_from_csr

pytestmark = pytest.mark.skipif(not native.available(), reason="native kit unavailable")


def test_native_coo_to_csr_matches_numpy():
    rng = np.random.default_rng(3)
    nnz, n = 300, 40
    coo = formats.CooMatrix(
        rng.normal(size=nnz),
        rng.integers(0, n, nnz).astype(np.int32),
        rng.integers(0, n, nnz).astype(np.int32),
        (n, n),
    )
    a = native.coo_to_csr(coo)
    b = formats.coo_to_csr(coo)
    np.testing.assert_allclose(
        np.asarray(formats.csr_to_dense(a).data), np.asarray(formats.csr_to_dense(b).data)
    )
    np.testing.assert_array_equal(np.asarray(a.indptr), np.asarray(b.indptr))


def test_native_spmv_matches_oracle():
    A = formats.dia_to_csr(banded_sin_matrix(120, 10))
    x = np.sin(np.arange(120.0))
    np.testing.assert_allclose(native.csr_spmv(A, x), oracle.spmv(A, x), rtol=1e-14)


def test_native_halo_ranges_match_numpy():
    A = formats.dia_to_csr(banded_sin_matrix(97, 12))
    part = RowBlockPartition.equal(97, 4)
    assert native.halo_ranges(A, part) == halo_ranges_from_csr(A, part)


def test_native_csr_to_dia_and_ell_match():
    dia0 = banded_sin_matrix(64, 8)
    csr = formats.dia_to_csr(dia0)
    dia_n = native.csr_to_dia(csr)
    dia_p = formats.csr_to_dia(csr)
    np.testing.assert_allclose(
        np.asarray(formats.dia_to_dense(dia_n).data),
        np.asarray(formats.dia_to_dense(dia_p).data),
    )
    ell_n = native.csr_to_ell(csr)
    ell_p = formats.csr_to_ell(csr)
    np.testing.assert_allclose(
        np.asarray(formats.csr_to_dense(formats.ell_to_csr(ell_n)).data),
        np.asarray(formats.csr_to_dense(formats.ell_to_csr(ell_p)).data),
    )
    np.testing.assert_array_equal(np.asarray(ell_n.cols)[:, 0], np.arange(64))


def test_native_banded_sin_generator_matches():
    a = native.banded_sin_dia(80, 10)
    b = banded_sin_system(80, 10).A
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data), rtol=1e-15)
    assert a.offsets == b.offsets


def test_native_cg_matches_numpy_oracle():
    import numpy as np

    from conjugategradient_tpu import native
    from conjugategradient_tpu.core import formats, oracle
    from conjugategradient_tpu.core.generators import banded_sin_system

    if not native.available():
        import pytest

        pytest.skip("native kit unavailable")
    sys_ = banded_sin_system(2048, 16)
    csr = formats.dia_to_csr(sys_.A)
    got = native.cg(csr, sys_.b, sys_.x0, tol=1e-8, norm="l2")
    ref = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-8, norm="l2")
    assert got.converged
    assert abs(got.iterations - ref.iterations) <= 2
    np.testing.assert_allclose(got.x, ref.x, rtol=1e-8, atol=1e-10)


def test_native_cg_nonconvergence_policy():
    import pytest

    from conjugategradient_tpu import native
    from conjugategradient_tpu.core import formats, oracle
    from conjugategradient_tpu.core.generators import tridiagonal_system

    if not native.available():
        pytest.skip("native kit unavailable")
    sys_ = tridiagonal_system(512)
    csr = formats.dia_to_csr(sys_.A)
    with pytest.raises(oracle.NotConvergedError):
        native.cg(csr, sys_.b, tol=1e-30, max_iteration=10)
    res = native.cg(csr, sys_.b, tol=1e-30, max_iteration=10, raise_on_divergence=False)
    assert not res.converged and res.iterations == 10


def test_native_cg_linf_and_rel_norms():
    import pytest

    from conjugategradient_tpu import native
    from conjugategradient_tpu.core import formats, oracle
    from conjugategradient_tpu.core.generators import banded_sin_system

    if not native.available():
        pytest.skip("native kit unavailable")
    sys_ = banded_sin_system(1024, 8)
    csr = formats.dia_to_csr(sys_.A)
    for norm in ("linf", "rel_l2"):
        got = native.cg(csr, sys_.b, sys_.x0, tol=1e-6, norm=norm)
        ref = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-6, norm=norm)
        assert got.converged
        assert got.iterations == ref.iterations


def test_native_cg_exact_x0_min_iter_no_nan():
    """x0 already solves the system while min_iteration forces loop entry:
    the alpha/beta divisions must be 0/0-guarded (ADVICE round 1) — the
    flagship workload runs min_iteration=200."""
    import pytest

    from conjugategradient_tpu import native
    from conjugategradient_tpu.core import formats, oracle
    from conjugategradient_tpu.core.generators import tridiagonal_system

    if not native.available():
        pytest.skip("native kit unavailable")
    sys_ = tridiagonal_system(256)
    x_exact = oracle.direct_solve(sys_.A, sys_.b)
    csr = formats.dia_to_csr(sys_.A)
    res = native.cg(csr, sys_.b, x_exact, tol=1e-10, norm="rel_l2", min_iteration=5)
    assert np.all(np.isfinite(res.x))
    r = sys_.b - oracle.spmv(sys_.A, res.x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-10


def test_native_aggregate_matches_python():
    """csrkit_aggregate is bit-identical to the Python three-pass greedy
    loop (same aggregate ids in the same order), so hierarchies built
    either way are the same objects.  Measured ~150x at n=261k."""
    import scipy.sparse as sp

    import conjugategradient_tpu.native as native
    from conjugategradient_tpu.precond import amg

    if not native.available():
        pytest.skip("native kit unavailable")
    rng = np.random.default_rng(0)
    # an irregular strength graph: random sparse + diagonal, symmetrized
    S = sp.random(400, 400, density=0.02, random_state=0, format="csr")
    S = (S + S.T + sp.eye(400)).tocsr()
    orig = native.aggregate
    try:
        agg_c, n_c = amg._aggregate(S)
        native.aggregate = lambda *a: None  # force the Python path
        agg_p, n_p = amg._aggregate(S)
    finally:
        native.aggregate = orig
    assert n_c == n_p
    np.testing.assert_array_equal(agg_c, agg_p)
