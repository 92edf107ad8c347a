"""BSR storage + SpMV/SpMM differential tests across every format."""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.formats import csr_to_bsr, bsr_to_csr, dia_to_csr
from conjugategradient_tpu.core.generators import banded_sin_matrix
from conjugategradient_tpu.ops.spmm import spmm, spmv_bsr
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _banded_csr(n=256, band=8):
    return dia_to_csr(banded_sin_matrix(n, band))


def test_bsr_roundtrip():
    csr = _banded_csr()
    bsr = csr_to_bsr(csr, (8, 8))
    back = bsr_to_csr(bsr)
    np.testing.assert_allclose(
        np.asarray(formats.csr_to_dense(back).data),
        np.asarray(formats.csr_to_dense(csr).data),
        rtol=1e-14,
    )


def test_bsr_requires_divisible_shape():
    csr = dia_to_csr(banded_sin_matrix(250, 8))
    with pytest.raises(ValueError):
        csr_to_bsr(csr, (8, 8))


@pytest.mark.parametrize("block", [(4, 4), (8, 8), (8, 16)])
def test_bsr_spmv_matches_oracle(block):
    csr = _banded_csr(n=256, band=16)
    bsr = csr_to_bsr(csr, block)
    x = np.random.default_rng(0).standard_normal(256)
    np.testing.assert_allclose(
        np.asarray(spmv_bsr(bsr.device_put(), x)), oracle.spmv(csr, x), rtol=1e-12
    )


def test_spmm_all_formats_match():
    rng = np.random.default_rng(1)
    A_dia = banded_sin_matrix(128, 8)
    A_csr = dia_to_csr(A_dia)
    A_ell = formats.csr_to_ell(A_csr)
    A_bsr = csr_to_bsr(A_csr, (4, 4))
    A_dense = formats.dia_to_dense(A_dia)
    B = rng.standard_normal((128, 5))
    want = np.asarray(A_dense.data) @ B
    for A in [A_dia, A_csr, A_ell, A_bsr, A_dense]:
        got = np.asarray(spmm(A.device_put(), B))
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12, err_msg=str(type(A)))


def test_spmm_rejects_vector():
    A = banded_sin_matrix(64, 4).device_put()
    with pytest.raises(ValueError):
        spmm(A, np.ones(64))


def test_cg_solves_through_bsr_operator():
    A_dia = banded_sin_matrix(256, 8)
    bsr = csr_to_bsr(dia_to_csr(A_dia), (8, 8)).device_put()
    b = 10.0 * np.cos(np.arange(256, dtype=np.float64))
    res = cg_solve(bsr, b, policy=ConvergencePolicy(tol=1e-8))
    assert bool(res.converged)
    ref = oracle.cg(A_dia, b, tol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), ref.x, rtol=1e-7, atol=1e-9)


def test_oracle_spmv_bsr():
    csr = _banded_csr(128, 8)
    bsr = csr_to_bsr(csr, (8, 8))
    x = np.linspace(0, 1, 128)
    np.testing.assert_allclose(oracle.spmv(bsr, x), oracle.spmv(csr, x), rtol=1e-13)
