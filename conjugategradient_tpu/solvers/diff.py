"""Differentiable solves: implicit-function-theorem gradients through CG.

No reference analogue — this is capability only a functional-transform
framework can offer: ``x(theta) = A(theta)^-1 b(theta)`` used inside
``jax.grad`` for inverse problems / PDE-constrained optimisation (estimate
a diffusion coefficient field from observations, differentiate a pressure
solve inside a fluid step, ...).

Differentiating *through* the CG iterations (unrolling) would store every
Krylov iterate and backprop the recurrence — O(iters * n) memory and
numerically ill-advised.  The implicit function theorem instead gives the
exact adjoint at the SOLUTION: for ``A x = b`` with symmetric A,

    dL/db     = lambda,        where  A lambda = dL/dx   (one more CG solve)
    dL/dA_ij  = -lambda_i x_j

so the backward pass is ONE additional CG solve with the same operator
(same preconditioner, same compiled program shape) plus a rank-structure
projection of ``-lambda x^T`` onto the stored diagonals.  Memory: O(n),
independent of iteration count.

``jax.custom_vjp`` over the (data, b) leaves of a DIA system; offsets and
policy are static.  Restricted to SYMMETRIC A (CG's own requirement —
the adjoint system then reuses A itself); the gradient is exact at the
converged solution, to solver tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from conjugategradient_tpu.core.formats import DiaMatrix
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cg_solve_implicit(
    data: jnp.ndarray,
    b: jnp.ndarray,
    offsets: Tuple[int, ...],
    shape: Tuple[int, int],
    policy: ConvergencePolicy = ConvergencePolicy(),
) -> jnp.ndarray:
    """``x = A^-1 b`` for the DIA system ``(data, offsets, shape)`` —
    differentiable w.r.t. ``data`` and ``b`` via the implicit adjoint.

    Returns the solution array only (wrap with ``cg_solve`` directly when
    you need iteration counts/flags — convergence metadata has no
    gradient).  A must be symmetric.
    """
    A = DiaMatrix(data, offsets, shape)
    return cg_solve(A, b, policy=policy).x


def _fwd(data, b, offsets, shape, policy):
    x = cg_solve_implicit(data, b, offsets, shape, policy)
    return x, (data, x)


def _bwd(offsets, shape, policy, res, g):
    data, x = res
    A = DiaMatrix(data, offsets, shape)
    # adjoint solve: A lambda = g (A symmetric); same operator, same
    # compiled-program shape as the forward solve
    lam = cg_solve(A, g, policy=policy).x
    # dL/d data[k, i] = d(-lambda^T A x)/d A[i, i+off_k] = -lam[i] * x[i+off_k]
    n = shape[0]
    i = jnp.arange(n)
    rows = []
    for off in offsets:
        xs = jnp.roll(x, -off)
        valid = (i + off >= 0) & (i + off < n)
        rows.append(jnp.where(valid, -lam * xs, 0.0))
    return jnp.stack(rows), lam


cg_solve_implicit.defvjp(_fwd, _bwd)
