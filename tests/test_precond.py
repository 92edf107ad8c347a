"""Multigrid / smoother / transfer tests.

Strategy (SURVEY.md §4 extended): differential vs scipy-assembled operators,
SPD/symmetry property checks on the V-cycle (required for PCG validity), and
end-to-end MGCG convergence with iteration counts that must beat plain CG.
"""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import (
    banded_sin_system,
    poisson1d_matrix,
    poisson2d_matrix,
    poisson_system,
    tridiagonal_system,
)
from conjugategradient_tpu.precond import (
    build_hierarchy,
    as_preconditioner,
    galerkin_coarse,
    jacobi_preconditioner,
    jacobi_smooth,
    chebyshev_smooth,
    mgcg_solve,
    transfer,
    v_cycle,
)
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


# --------------------------------------------------------------------------
# Transfers
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(15,), (9, 7), (5, 7, 9)])
def test_device_transfers_match_scipy_matrices(shape):
    rng = np.random.default_rng(0)
    n = int(np.prod(shape))
    P = transfer.prolong_matrix(shape)
    R = transfer.restrict_matrix(shape)
    e = rng.standard_normal(P.shape[1])
    r = rng.standard_normal(n)
    np.testing.assert_allclose(np.asarray(transfer.prolong(e, shape)), P @ e, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(transfer.restrict(r, shape)), R @ r, rtol=1e-12)


def test_restrict_is_scaled_transpose_of_prolong():
    shape = (9, 7)
    rng = np.random.default_rng(1)
    n = int(np.prod(shape))
    nc = int(np.prod(transfer.coarse_shape(shape)))
    u = rng.standard_normal(n)
    v = rng.standard_normal(nc)
    # <R u, v> == 2^-d <u, P v>
    lhs = np.asarray(transfer.restrict(u, shape)) @ v
    rhs = (0.5 ** len(shape)) * (u @ np.asarray(transfer.prolong(v, shape)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_coarse_shape_validation():
    with pytest.raises(ValueError):
        transfer.coarse_shape((8,))
    assert transfer.coarse_shape((15, 7)) == (7, 3)
    assert not transfer.can_coarsen((4, 7))


# --------------------------------------------------------------------------
# Galerkin coarse operators
# --------------------------------------------------------------------------


def test_galerkin_coarse_poisson1d_is_scaled_poisson():
    # Full-weighting Galerkin (R = P^T/2) on the 1-D Laplacian reproduces the
    # coarse Laplacian scaled by 1/4 (the h^2 of the doubled spacing).
    A = poisson1d_matrix(15)
    Ac = galerkin_coarse(A, (15,))
    expect = formats.dia_to_dense(poisson1d_matrix(7)).data * 0.25
    np.testing.assert_allclose(np.asarray(formats.dia_to_dense(Ac).data), expect, atol=1e-14)


def test_galerkin_coarse_symmetric():
    A = poisson2d_matrix(9)
    Ac = galerkin_coarse(A, (9, 9))
    D = np.asarray(formats.dia_to_dense(Ac).data)
    np.testing.assert_allclose(D, D.T, atol=1e-14)
    ev = np.linalg.eigvalsh(D)
    assert ev.min() > 0  # SPD preserved


# --------------------------------------------------------------------------
# Smoothers
# --------------------------------------------------------------------------


def test_jacobi_smoother_reduces_error():
    A = poisson1d_matrix(63)
    op = lambda v: oracle.spmv(A, v)
    inv_d = 1.0 / formats.dia_diagonal(A)
    rng = np.random.default_rng(2)
    x_true = rng.standard_normal(63)
    b = op(x_true)
    x = np.zeros(63)
    import jax.numpy as jnp

    x1 = jacobi_smooth(lambda v: jnp.asarray(op(np.asarray(v))), jnp.asarray(inv_d), jnp.asarray(b), jnp.asarray(x), 10)
    assert np.linalg.norm(np.asarray(x1) - x_true) < np.linalg.norm(x - x_true)


def test_chebyshev_beats_jacobi_on_worst_case_upper_spectrum():
    """Equal work (3 SpMVs): Chebyshev's *worst* damping factor over the
    smoothing interval must beat weighted Jacobi's worst (that uniformity is
    the whole point of polynomial smoothing)."""
    import jax.numpy as jnp

    n = 63
    A = poisson1d_matrix(n).device_put()
    from conjugategradient_tpu.ops.spmv import as_operator
    from conjugategradient_tpu.solvers import eigen

    op = as_operator(A)
    inv_d = jnp.asarray(1.0 / formats.dia_diagonal(A))
    lo, hi = eigen.scaled_spectrum_bounds(A)
    b = jnp.zeros(n)
    # eigenmodes of D^{-1}A = 1 - cos(k pi/(n+1)); scan those inside [lo, hi]
    i = np.arange(n)
    worst_c = worst_j = 0.0
    for k in range(1, n + 1):
        lam = 1.0 - np.cos(k * np.pi / (n + 1))
        if lam < lo:
            continue
        e0 = np.sin(np.pi * (i + 1) * k / (n + 1))
        e0 /= np.linalg.norm(e0)
        worst_j = max(worst_j, float(np.linalg.norm(np.asarray(jacobi_smooth(op, inv_d, b, jnp.asarray(e0), 3)))))
        worst_c = max(worst_c, float(np.linalg.norm(np.asarray(chebyshev_smooth(op, inv_d, b, jnp.asarray(e0), 3, hi, lo)))))
    assert worst_c < 0.15  # near the theoretical 1/T_3 bound
    assert worst_c < 0.5 * worst_j


# --------------------------------------------------------------------------
# V-cycle and MGCG
# --------------------------------------------------------------------------


def test_v_cycle_is_symmetric_operator():
    # <M r, s> == <r, M s> within roundoff — required for PCG validity.
    sys_ = poisson_system((31, 31))
    h = build_hierarchy(sys_.A, (31, 31), smoother="jacobi", max_coarse=64)
    rng = np.random.default_rng(3)
    r = rng.standard_normal(sys_.n)
    s = rng.standard_normal(sys_.n)
    import jax.numpy as jnp

    Mr = np.asarray(v_cycle(h, jnp.asarray(r)))
    Ms = np.asarray(v_cycle(h, jnp.asarray(s)))
    np.testing.assert_allclose(Mr @ s, r @ Ms, rtol=1e-10)


def test_v_cycle_is_positive_definite_sample():
    sys_ = poisson_system((31,))
    h = build_hierarchy(sys_.A, (31,), smoother="chebyshev", max_coarse=8)
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    for _ in range(5):
        r = rng.standard_normal(sys_.n)
        assert float(r @ np.asarray(v_cycle(h, jnp.asarray(r)))) > 0


@pytest.mark.parametrize("smoother", ["jacobi", "chebyshev"])
def test_mgcg_converges_and_beats_plain_cg_2d(smoother):
    grid = (63, 63)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="l2")
    plain = cg_solve(sys_.A.device_put(), np.asarray(sys_.b), policy=pol)
    mg, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, smoother=smoother)
    assert bool(mg.converged)
    x_ref = oracle.cg(sys_.A, sys_.b, tol=1e-8).x
    np.testing.assert_allclose(np.asarray(mg.x), x_ref, rtol=1e-6, atol=1e-8)
    # multigrid must cut iterations by at least 3x on Poisson
    assert int(mg.iterations) * 3 <= int(plain.iterations)


def test_mgcg_poisson3d():
    grid = (15, 15, 15)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8)
    mg, h = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, max_coarse=64) if False else mgcg_solve(
        sys_.A, sys_.b, grid, policy=pol
    )
    assert bool(mg.converged)
    assert int(mg.iterations) <= 15
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(mg.x))
    assert np.linalg.norm(r) < 1e-7


def test_mgcg_on_1d_banded_sin_workload():
    # the reference's flagship generator family, via a 1-D hierarchy
    sys_ = banded_sin_system(1023, 8)
    pol = ConvergencePolicy(tol=1e-8)
    mg, _ = mgcg_solve(sys_.A, sys_.b, (1023,), x0=sys_.x0, policy=pol, smoother="jacobi")
    assert bool(mg.converged)
    x_ref = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-8).x
    np.testing.assert_allclose(np.asarray(mg.x), x_ref, rtol=1e-5, atol=1e-8)


def test_hierarchy_reuse_and_jacobi_pc():
    sys_ = tridiagonal_system(255)
    pol = ConvergencePolicy(tol=1e-8)
    res, h = mgcg_solve(sys_.A, sys_.b, (255,), policy=pol)
    res2, _ = mgcg_solve(sys_.A, sys_.b, (255,), policy=pol, hierarchy=h)
    assert int(res.iterations) == int(res2.iterations)
    # point-Jacobi preconditioner path through cg_solve
    import jax.numpy as jnp

    # (constant-diagonal Laplacian: Jacobi can't accelerate, only sanity-check
    # the M= plumbing; absolute 1e-8 on this RHS is at the fp64 noise floor)
    invd = jnp.asarray(1.0 / formats.dia_diagonal(sys_.A))
    r = cg_solve(
        sys_.A.device_put(),
        jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-6),
        M=jacobi_preconditioner(invd),
    )
    assert bool(r.converged)


# --------------------------------------------------------------------------
# Eigen diagnostics
# --------------------------------------------------------------------------


def test_jacobi_eigenvalues_match_numpy():
    from conjugategradient_tpu.solvers.eigen import jacobi_eigenvalues

    rng = np.random.default_rng(5)
    B = rng.standard_normal((12, 12))
    A = B @ B.T + 12 * np.eye(12)
    got = np.asarray(jacobi_eigenvalues(formats.DenseMatrix(A)))
    np.testing.assert_allclose(got, np.linalg.eigvalsh(A), rtol=1e-8)


def test_lanczos_and_gershgorin_bounds():
    from conjugategradient_tpu.solvers.eigen import gershgorin_bounds, lanczos_bounds

    A = poisson1d_matrix(255)
    ev_min = 2 * (1 - np.cos(np.pi / 256))
    ev_max = 2 * (1 - np.cos(255 * np.pi / 256))
    lo, hi = lanczos_bounds(lambda v: oracle.spmv(A, v), 255, k=40)
    assert hi == pytest.approx(ev_max, rel=1e-3)
    # Ritz values lie inside the spectrum, and the clustered low end converges
    # slowly — lo lands above ev_min but within an order or two of magnitude.
    assert ev_min <= lo <= 20 * ev_min
    glo, ghi = gershgorin_bounds(A)
    assert glo <= ev_min and ghi >= ev_max


def test_condition_number_poisson():
    from conjugategradient_tpu.solvers.eigen import condition_number

    A = poisson1d_matrix(127)
    kappa_true = (2 * (1 - np.cos(127 * np.pi / 128))) / (2 * (1 - np.cos(np.pi / 128)))
    assert condition_number(A, k=60) == pytest.approx(kappa_true, rel=0.2)


def test_w_cycle_contracts_at_least_as_well_as_v():
    import jax.numpy as jnp

    from conjugategradient_tpu.precond import as_preconditioner
    from conjugategradient_tpu.solvers.cg import cg_solve

    grid = (63, 63)
    sys_ = poisson_system(grid)
    h = build_hierarchy(sys_.A, grid, smoother="jacobi", max_coarse=64)
    pol = ConvergencePolicy(tol=1e-8)
    b = jnp.asarray(sys_.b)
    v = cg_solve(sys_.A.device_put(), b, policy=pol, M=as_preconditioner(h, gamma=1))
    w = cg_solve(sys_.A.device_put(), b, policy=pol, M=as_preconditioner(h, gamma=2))
    assert bool(v.converged) and bool(w.converged)
    assert int(w.iterations) <= int(v.iterations)


def test_fmg_initial_guess_accuracy():
    import jax.numpy as jnp

    from conjugategradient_tpu.precond import fmg

    grid = (63, 63)
    sys_ = poisson_system(grid)
    h = build_hierarchy(sys_.A, grid, smoother="chebyshev", max_coarse=64)
    x = np.asarray(fmg(h, jnp.asarray(sys_.b).reshape(grid))).reshape(-1)
    r = sys_.b - oracle.spmv(sys_.A, x)
    rel = np.linalg.norm(r) / np.linalg.norm(sys_.b)
    assert rel < 5e-2  # one FMG pass: discretisation-level accuracy
    # flat-vector call path too
    x2 = np.asarray(fmg(h, jnp.asarray(sys_.b)))
    np.testing.assert_allclose(x2, x, rtol=1e-12)


def test_rbgs_smoother_mgcg():
    """Red-black Gauss-Seidel smoothing: symmetric V-cycle, competitive
    iteration counts, matching solutions."""
    grid = (63, 63)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8)
    rb, h = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, smoother="rbgs")
    assert bool(rb.converged)
    assert int(rb.iterations) <= 10
    x_ref = oracle.cg(sys_.A, sys_.b, tol=1e-8).x
    denom = np.maximum(np.abs(x_ref), 1e-3 * np.abs(x_ref).max())
    assert np.max(np.abs(np.asarray(rb.x) - x_ref) / denom) < 1e-4
    # symmetry of the rbgs V-cycle (PCG validity)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    r = rng.standard_normal(sys_.n)
    s = rng.standard_normal(sys_.n)
    Mr = np.asarray(v_cycle(h, jnp.asarray(r)))
    Ms = np.asarray(v_cycle(h, jnp.asarray(s)))
    np.testing.assert_allclose(Mr @ s, r @ Ms, rtol=1e-8)


def test_rbgs_beats_jacobi_iterations():
    grid = (63, 63)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8)
    rb, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, smoother="rbgs", pre=1, post=1)
    ja, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, smoother="jacobi", pre=1, post=1)
    assert int(rb.iterations) <= int(ja.iterations)


def test_chebyshev_preconditioner_cuts_iterations():
    """Fixed-degree Chebyshev PCG: fewer iterations than plain CG (roughly
    degree+1-fold), same solution; kappa(M^-1 A) shrinks accordingly."""
    import jax.numpy as jnp

    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.precond import chebyshev_preconditioner_for
    from conjugategradient_tpu.solvers.cg import cg_solve, cg_solve_traced
    from conjugategradient_tpu.solvers.eigen import spectrum_from_cg
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(2048, 24)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    A = sys_.A.device_put()
    b = jnp.asarray(sys_.b)

    plain = cg_solve(A, b, policy=pol)
    M, (lo, hi) = chebyshev_preconditioner_for(sys_.A, degree=3)
    pcg = cg_solve(A, b, policy=pol, M=M)
    assert bool(plain.converged) and bool(pcg.converged)
    assert 0 < lo < hi
    # degree-3 polynomial: ~4 SpMV-equivalents per iteration; require the
    # iteration count to drop by at least 2.5x so the work tradeoff is real
    assert int(pcg.iterations) * 2.5 <= int(plain.iterations), (
        int(pcg.iterations), int(plain.iterations))
    x64 = oracle.cg(sys_.A, sys_.b, tol=1e-10, norm="rel_l2", max_iteration=2000).x
    np.testing.assert_allclose(np.asarray(pcg.x), x64, rtol=1e-6, atol=1e-9)

    # the spectrum probe sees the compressed preconditioned spectrum
    _, _, (al, be) = cg_solve_traced(
        A, b, policy=pol, M=M, num_steps=int(pcg.iterations) + 1, with_coefficients=True
    )
    _, _, kappa_pre = spectrum_from_cg(al, be, int(pcg.iterations))
    _, _, (al0, be0) = cg_solve_traced(
        A, b, policy=pol, num_steps=int(plain.iterations) + 1, with_coefficients=True
    )
    _, _, kappa_plain = spectrum_from_cg(al0, be0, int(plain.iterations))
    assert kappa_pre < 0.25 * kappa_plain, (kappa_pre, kappa_plain)


def test_cheb_cg_through_facade():
    from conjugategradient_tpu import solve
    from conjugategradient_tpu.core.generators import banded_sin_system

    sys_ = banded_sin_system(1024, 16)
    res = solve(sys_.A, sys_.b, sys_.x0, method="cheb_cg", tol=1e-9, norm="rel_l2", degree=4)
    assert bool(res.converged)
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x, np.float64))
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-8


def test_mgcg_w_cycle_gamma():
    """mgcg_solve(gamma=2): W-cycle preconditioning converges in <= the
    V-cycle's iterations (stronger cycle, more work per application)."""
    from conjugategradient_tpu.core.generators import poisson_system
    from conjugategradient_tpu.precond import mgcg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    grid = (63, 63)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=100)
    res_v, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol)
    res_w, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, gamma=2)
    assert bool(res_v.converged) and bool(res_w.converged)
    assert int(res_w.iterations) <= int(res_v.iterations)
