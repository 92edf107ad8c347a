"""Pallas DIA SpMV kernels vs the numpy oracle (interpret mode on CPU).

The reference validates its handmade OpenCL SpMV only end-to-end through the
driver's element-wise solution check; here the kernels get direct differential
tests (interpret mode == compiled numerics for these ops)."""

import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import (
    banded_sin_matrix,
    poisson2d_matrix,
    tridiagonal_matrix,
)
from conjugategradient_tpu.ops.pallas_spmv import spmv_dia_pallas, spmv_dot_dia_pallas


@pytest.mark.parametrize(
    "make",
    [
        lambda: tridiagonal_matrix(1000),
        lambda: banded_sin_matrix(700, 16),
        lambda: poisson2d_matrix(37),  # n = 1369, offsets (-37,-1,0,1,37)
    ],
)
def test_pallas_dia_spmv_matches_oracle(make):
    A = make()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.n)
    y_ref = oracle.spmv(A, x)
    y = np.asarray(spmv_dia_pallas(A.device_put(), x, tile=256))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)


def test_pallas_dia_spmv_non_tile_multiple():
    A = banded_sin_matrix(333, 8)
    x = np.linspace(-1, 1, A.n)
    np.testing.assert_allclose(
        np.asarray(spmv_dia_pallas(A.device_put(), x, tile=128)),
        oracle.spmv(A, x),
        rtol=1e-12,
        atol=1e-12,
    )


def test_pallas_fused_spmv_dot():
    A = banded_sin_matrix(513, 12)
    rng = np.random.default_rng(1)
    p = rng.standard_normal(A.n)
    Ap_ref = oracle.spmv(A, p)
    y, pAp = spmv_dot_dia_pallas(A.device_put(), p, tile=128)
    np.testing.assert_allclose(np.asarray(y), Ap_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(pAp), float(p @ Ap_ref), rtol=1e-10)


def test_as_operator_pallas_path():
    from conjugategradient_tpu.ops.spmv import as_operator

    A = tridiagonal_matrix(400).device_put()
    x = np.arange(400, dtype=np.float64)
    op = as_operator(A, use_pallas=True)
    np.testing.assert_allclose(np.asarray(op(x)), oracle.spmv(A, x), rtol=1e-12)
