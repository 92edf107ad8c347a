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
