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


def test_pallas_cm_xla_twin_and_large_offsets():
    """The XLA column-major twin and the kernel agree with the oracle on
    offsets wider than one lane-segment (multi-column halo expansion)."""
    from conjugategradient_tpu.ops.pallas_spmv import spmv_dia_cm_xla

    A = poisson2d_matrix(101)  # offsets (-101,-1,0,1,101), segp = 128
    rng = np.random.default_rng(2)
    x = rng.standard_normal(A.n)
    ref = oracle.spmv(A, x)
    np.testing.assert_allclose(np.asarray(spmv_dia_cm_xla(A.device_put(), x)), ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(spmv_dia_pallas(A.device_put(), x)), ref, atol=1e-10)


def test_cm_operator_cg_end_to_end():
    """CG with column-major-resident Krylov state (make_cm_operator) solves
    the band family to the same answer as the flat path."""
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.ops.pallas_spmv import make_cm_operator
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(5000, 16)
    op, tc, fc = make_cm_operator(sys_.A.device_put())
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=5000)
    res = cg_solve(op, tc(np.asarray(sys_.b)), tc(np.asarray(sys_.x0)), pol)
    assert bool(res.converged)
    x = np.asarray(fc(res.x), np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-8


def test_refined_solve_pallas_inner():
    """refined_solve(use_pallas=True): CM Pallas inner CG reaches the fp64
    tolerance (interpret mode on CPU — numerics identical to compiled)."""
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.solvers.refine import refined_solve

    sys_ = banded_sin_system(8192, 32)
    res = refined_solve(sys_.A, sys_.b, sys_.x0, tol=1e-8, norm="l2",
                        inner_tol=1e-4, use_pallas=True)
    assert res.converged and res.residual < 1e-8


def test_pallas_ell_csr_entry_points():
    """SURVEY §7 layer 2 (N11): CSR/ELL through the Pallas kernel — the
    setup-time DIA relayout shares the roofline column-major kernel."""
    from conjugategradient_tpu.core.formats import csr_to_ell, dia_to_csr
    from conjugategradient_tpu.ops.pallas_spmv import (
        make_pallas_operator,
        spmv_csr_pallas,
        spmv_ell_pallas,
    )

    A = banded_sin_matrix(700, 16)
    csr = dia_to_csr(A)
    ell = csr_to_ell(csr)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(A.n)
    ref = oracle.spmv(A, x)
    np.testing.assert_allclose(np.asarray(spmv_csr_pallas(csr, x)), ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(spmv_ell_pallas(ell, x)), ref, atol=1e-10)
    op = make_pallas_operator(csr)
    np.testing.assert_allclose(np.asarray(op(x)), ref, atol=1e-10)


@pytest.mark.parametrize(
    "make, k",
    [
        (lambda: tridiagonal_matrix(1000), 3),
        (lambda: banded_sin_matrix(700, 16), 8),
        (lambda: poisson2d_matrix(37), 5),
    ],
)
def test_pallas_multi_rhs_spmm_matches_oracle(make, k):
    """One coefficient stream, k right-hand sides: every column must equal
    the single-RHS oracle."""
    from conjugategradient_tpu.ops.pallas_spmv import spmm_dia_pallas

    A = make()
    rng = np.random.default_rng(1)
    X = rng.standard_normal((A.n, k))
    Y = np.asarray(spmm_dia_pallas(A.device_put(), X))
    for j in range(k):
        np.testing.assert_allclose(Y[:, j], oracle.spmv(A, X[:, j]), rtol=1e-12, atol=1e-12)


def test_multi_rhs_cg_pallas_path():
    """cg_solve_multi(use_pallas=True) converges per column and matches the
    XLA-SpMM path."""
    import jax.numpy as jnp

    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.solvers.multi import cg_solve_multi
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(768, 12)
    rng = np.random.default_rng(2)
    B = jnp.asarray(rng.standard_normal((sys_.n, 4)))
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    res_p = cg_solve_multi(sys_.A.device_put(), B, policy=pol, use_pallas=True)
    res_x = cg_solve_multi(sys_.A.device_put(), B, policy=pol, use_pallas=False)
    assert bool(np.asarray(res_p.converged).all())
    np.testing.assert_allclose(np.asarray(res_p.x), np.asarray(res_x.x), rtol=1e-8, atol=1e-10)
    for j in range(4):
        r = np.asarray(B[:, j]) - oracle.spmv(sys_.A, np.asarray(res_p.x[:, j], np.float64))
        assert np.linalg.norm(r) / np.linalg.norm(np.asarray(B[:, j])) < 1e-9


def test_cm_plan_fuzz_random_offsets():
    """Random DIA sparsity patterns through both CM kernels (interpret):
    exercises group-window splits, the lmax boundary, the 0-offset group
    reordering, and the multi plan's fatter groups."""
    from conjugategradient_tpu.core.formats import DiaMatrix
    from conjugategradient_tpu.ops.pallas_spmv import spmm_dia_pallas, spmv_dia_pallas

    rng = np.random.default_rng(9)
    for trial in range(6):
        n = int(rng.integers(300, 3000))
        nd = int(rng.integers(1, 40))
        span = int(rng.integers(4, max(5, n // 2)))
        offs = rng.choice(np.arange(-span, span + 1), size=nd, replace=False)
        if trial % 2 == 0 and 0 not in offs:
            offs[0] = 0  # half the trials exercise the 0-offset reorder
        offs = np.sort(offs)
        data = rng.standard_normal((len(offs), n))
        # zero structurally-invalid entries (DIA convention)
        for k, off in enumerate(offs):
            if off < 0:
                data[k, : -off] = 0.0
            elif off > 0:
                data[k, n - off :] = 0.0
        A = DiaMatrix(data=data, offsets=tuple(int(o) for o in offs), shape=(n, n)).device_put()
        x = rng.standard_normal(n)
        y_ref = oracle.spmv(A, x)
        scale = max(np.abs(y_ref).max(), 1e-30)
        y1 = np.asarray(spmv_dia_pallas(A, x))
        assert np.abs(y1 - y_ref).max() / scale < 1e-10, (trial, n, offs)
        X = rng.standard_normal((n, 3))
        Y = np.asarray(spmm_dia_pallas(A, X))
        for j in range(3):
            yr = oracle.spmv(A, X[:, j])
            assert np.abs(Y[:, j] - yr).max() / max(np.abs(yr).max(), 1e-30) < 1e-10


def test_cm_kernel_bf16_streams_fp32_accumulate():
    """bf16 matrix (and/or x) streams at half HBM width; the kernel
    accumulates fp32, so the result carries ~bf16 input rounding only
    (not bf16 accumulation drift over 159 terms)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.ops.pallas_spmv import spmm_dia_pallas, spmv_dia_pallas

    A = banded_sin_matrix(4096, 64, dtype=np.float32)
    rng = np.random.default_rng(10)
    x = rng.standard_normal(4096).astype(np.float32)
    y_ref = oracle.spmv(A, x.astype(np.float64))
    scale = np.abs(y_ref).max()

    A16 = A.device_put(dtype=jnp.bfloat16)
    # bf16 matrix x fp32 vector: fp32 out, error ~ bf16 epsilon on the inputs
    y = np.asarray(spmv_dia_pallas(A16, jnp.asarray(x)))
    assert y.dtype == np.float32
    assert np.abs(y - y_ref).max() / scale < 2e-2
    # bf16 x bf16: fp32-accumulated internally, returned at the usual
    # promotion dtype (bf16) so Krylov carries stay stable
    y2 = np.asarray(spmv_dia_pallas(A16, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
    assert spmv_dia_pallas(A16, jnp.asarray(x, jnp.bfloat16)).dtype == jnp.bfloat16
    assert np.abs(y2 - y_ref).max() / scale < 3e-2
    # multi-RHS path, bf16 matrix
    X = rng.standard_normal((4096, 3)).astype(np.float32)
    Y = np.asarray(spmm_dia_pallas(A16, jnp.asarray(X)))
    assert Y.dtype == np.float32
    for j in range(3):
        yr = oracle.spmv(A, X[:, j].astype(np.float64))
        assert np.abs(Y[:, j] - yr).max() / np.abs(yr).max() < 2e-2


def test_cm_operator_bf16_carry_is_stable():
    """Regression (r2 review): a bf16 Krylov state through the CM operator
    must keep a stable while_loop carry — the operator returns the promotion
    dtype (bf16), accumulating fp32 only internally."""
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.ops.pallas_spmv import make_cm_operator
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(1024, 8, dtype=np.float64)
    A16 = sys_.A.device_put(dtype=jnp.bfloat16)
    op, to_cm_, from_cm_ = make_cm_operator(A16)
    b16 = to_cm_(jnp.asarray(sys_.b / np.abs(sys_.b).max(), jnp.bfloat16))
    res = jax.jit(
        lambda b: cg_solve(op, b, policy=ConvergencePolicy(tol=5e-2, norm="rel_l2", max_iteration=2000))
    )(b16)
    assert np.isfinite(np.asarray(from_cm_(res.x), np.float32)).all()
    assert bool(res.converged)
