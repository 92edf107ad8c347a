"""Extended-precision reductions: error-free dot2, Kahan sum, bf16 promotion.

The quantified claim behind the solver's fp32 path (SURVEY.md §7 hard part 4):
compensated dots recover enough accuracy for the reference's tolerances on
fp64-less cores.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conjugategradient_tpu.ops.precision import dd_dot, dot2, kahan_sum, promote_dot, two_prod


def _ill_conditioned_vectors(n, seed=0, scale=1e4):
    """Vectors whose dot suffers heavy cancellation (condition ~ scale^2)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal(n) * scale
    b = rng.standard_normal(n) / scale
    # append cancelling pairs to push the condition number up
    a = np.concatenate([a, a])
    b = np.concatenate([b, -b + rng.standard_normal(n) * 1e-6])
    return a.astype(np.float32), b.astype(np.float32)


def test_two_prod_is_error_free():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(1024).astype(np.float32))
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(p, np.float64) + np.asarray(e, np.float64), exact, rtol=1e-15)


def test_dot2_beats_naive_fp32():
    a32, b32 = _ill_conditioned_vectors(50_000)
    exact = float(np.dot(a32.astype(np.float64), b32.astype(np.float64)))
    naive = float(jnp.vdot(jnp.asarray(a32), jnp.asarray(b32)))
    comp = float(dot2(jnp.asarray(a32), jnp.asarray(b32)))
    dd = float(dd_dot(jnp.asarray(a32), jnp.asarray(b32)))
    err_naive = abs(naive - exact)
    err_comp = abs(comp - exact)
    err_dd = abs(dd - exact)
    assert err_comp < err_naive  # compensated products help
    assert err_dd < err_naive / 10  # double-float tree: order(s) better
    assert err_dd / max(abs(exact), 1e-30) < 1e-6


def test_dot2_matches_vdot_in_fp64():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal(4096))
    b = jnp.asarray(rng.standard_normal(4096))
    np.testing.assert_allclose(float(dot2(a, b)), float(jnp.vdot(a, b)), rtol=1e-14)


def test_dot2_grid_shaped():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    np.testing.assert_allclose(
        float(dot2(jnp.asarray(a), jnp.asarray(a))),
        float(np.sum(a.astype(np.float64) ** 2)),
        rtol=1e-6,
    )


def test_kahan_sum_exactness():
    # pathological: many tiny values around a large one
    x = np.concatenate([[1e8], np.full(100_000, 1e-3), [-1e8]]).astype(np.float64)
    got = float(kahan_sum(jnp.asarray(x)))
    assert got == pytest.approx(100.0, rel=1e-10)


def test_promote_dot_bf16_storage():
    rng = np.random.default_rng(4)
    a = rng.standard_normal(8192).astype(np.float32)
    b = rng.standard_normal(8192).astype(np.float32)
    a16 = jnp.asarray(a, jnp.bfloat16)
    b16 = jnp.asarray(b, jnp.bfloat16)
    exact = float(np.dot(np.asarray(a16, np.float64), np.asarray(b16, np.float64)))
    got = float(promote_dot(a16, b16, jnp.float32))
    assert abs(got - exact) / max(abs(exact), 1e-30) < 1e-4


def test_bf16_cg_converges_loose():
    """bf16 storage + fp32-accumulated dots solves to bf16-appropriate tol."""
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(1024, 8)
    A16 = sys_.A.device_put(dtype=jnp.bfloat16)
    b16 = jnp.asarray(sys_.b, jnp.bfloat16)
    res = cg_solve(A16, b16, policy=ConvergencePolicy(tol=3e-2, norm="rel_l2", max_iteration=4096))
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 0.05
