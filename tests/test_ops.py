"""Device ops (XLA paths) vs the numpy oracle, in fp64 and fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import banded_sin_system, poisson2d_matrix
from conjugategradient_tpu.ops import blas
from conjugategradient_tpu.ops import spmv as _s
from conjugategradient_tpu.ops.precision import kahan_dot, kahan_sum


@pytest.fixture(scope="module")
def system():
    return banded_sin_system(96, 10)


@pytest.mark.parametrize("fmt", ["dia", "csr", "ell", "dense", "coo"])
def test_spmv_matches_oracle(system, fmt):
    x = np.cos(np.arange(96.0))
    y_ref = oracle.spmv(system.A, x)
    if fmt == "dia":
        A = system.A.device_put()
    elif fmt == "csr":
        A = formats.dia_to_csr(system.A).device_put()
    elif fmt == "ell":
        A = formats.csr_to_ell(formats.dia_to_csr(system.A)).device_put()
    elif fmt == "coo":
        csr = formats.dia_to_csr(system.A)
        A = formats.CooMatrix(
            jnp.asarray(csr.data), jnp.asarray(csr.row_ids), jnp.asarray(csr.indices), csr.shape
        )
    else:
        A = formats.dia_to_dense(system.A).device_put()
    y = jax.jit(_s.spmv)(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13)


def test_spmv_dia_jit_poisson():
    A = poisson2d_matrix(16, 16).device_put()
    x = jnp.asarray(np.random.default_rng(0).normal(size=256))
    y = jax.jit(_s.spmv_dia)(A, x)
    np.testing.assert_allclose(np.asarray(y), oracle.spmv(poisson2d_matrix(16, 16), np.asarray(x)), rtol=1e-13)


def test_blas_ops():
    rng = np.random.default_rng(1)
    a, b = rng.normal(size=200), rng.normal(size=200)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_allclose(float(blas.dot(ja, jb)), a @ b, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(blas.axpy(2.5, ja, jb)), b + 2.5 * a)
    np.testing.assert_allclose(float(blas.max_abs(ja)), np.max(np.abs(a)))
    np.testing.assert_allclose(float(blas.norm_l2(ja)), np.linalg.norm(a), rtol=1e-13)


@pytest.mark.parametrize("norm,expected", [
    ("l2", lambda r: np.linalg.norm(r)),
    ("linf", lambda r: np.max(np.abs(r))),
    ("rel_l2", lambda r: np.linalg.norm(r) / 2.0),
])
def test_residual_norm_conventions(norm, expected):
    r = np.array([0.3, -1.2, 0.9])
    rr = float(r @ r)
    rr0 = 4.0
    got = float(blas.residual_norm(jnp.asarray(r), rr, rr0, norm))
    np.testing.assert_allclose(got, expected(r), rtol=1e-13)


def test_kahan_sum_beats_naive_fp32():
    """Compensated fp32 sum must track the fp64 truth far better than jnp.sum."""
    rng = np.random.default_rng(7)
    x = (rng.normal(size=200_000) * 1e4).astype(np.float32)
    truth = float(np.sum(x.astype(np.float64)))
    naive_err = abs(float(jnp.sum(jnp.asarray(x), dtype=jnp.float32)) - truth)
    kahan_err = abs(float(kahan_sum(jnp.asarray(x))) - truth)
    assert kahan_err <= max(naive_err, 1e-2)
    assert kahan_err < 1.0  # absolute sanity on ~1e9-magnitude partials


def test_kahan_dot_fp32_close_to_fp64():
    rng = np.random.default_rng(11)
    a = rng.normal(size=50_000).astype(np.float32)
    b = rng.normal(size=50_000).astype(np.float32)
    truth = float(a.astype(np.float64) @ b.astype(np.float64))
    got = float(kahan_dot(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - truth) / abs(truth) < 1e-5


def test_as_operator_accepts_callable():
    f = _s.as_operator(lambda v: 2 * v)
    np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2 * np.ones(4))
