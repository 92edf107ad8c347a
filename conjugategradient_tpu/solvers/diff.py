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
policy are static.  ``cg_solve_implicit`` requires SYMMETRIC A (CG's own
requirement — the adjoint system then reuses A itself);
``bicgstab_solve_implicit`` is the NONSYMMETRIC twin, whose adjoint solves
the TRANSPOSED system (``dia_transpose_traced``: per-diagonal rolls, so
the transpose is itself traced and the whole vjp composes with further
differentiation).  Gradients are exact at the converged solution, to
solver tolerance.
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
    return _project_onto_diagonals(lam, x, offsets, shape[0]), lam


cg_solve_implicit.defvjp(_fwd, _bwd)


def _project_onto_diagonals(lam, x, offsets, n):
    """dL/d data[k, i] = -lam[i] * x[i + off_k] (the rank-structure
    projection of -lam x^T onto the stored diagonals; shared by the
    symmetric and nonsymmetric adjoints)."""
    i = jnp.arange(n)
    rows = []
    for off in offsets:
        xs = jnp.roll(x, -off)
        valid = (i + off >= 0) & (i + off < n)
        rows.append(jnp.where(valid, -lam * xs, 0.0))
    return jnp.stack(rows)


def dia_transpose_traced(data, offsets, n):
    """Traced DIA transpose: ``A[i, i+off] = data[k, i]`` becomes
    ``A^T[i, i-off] = data[k, i-off]`` — per-diagonal rolls + masks, fully
    differentiable (the traced twin of ``formats.transpose``).  Returns
    the transposed data; the offsets become ``(-off for off)``."""
    i = jnp.arange(n)
    rows = []
    for k, off in enumerate(offsets):
        shifted = jnp.roll(data[k], off)
        valid = (i - off >= 0) & (i - off < n)
        rows.append(jnp.where(valid, shifted, 0.0))
    return jnp.stack(rows)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bicgstab_solve_implicit(
    data: jnp.ndarray,
    b: jnp.ndarray,
    offsets: Tuple[int, ...],
    shape: Tuple[int, int],
    policy: ConvergencePolicy = ConvergencePolicy(),
) -> jnp.ndarray:
    """``x = A^-1 b`` for a NONSYMMETRIC DIA system — differentiable via the
    implicit adjoint.  The backward pass is one BiCGStab solve with the
    TRANSPOSED operator (``A^T lambda = dL/dx``; the transpose is the
    per-diagonal roll of ``dia_transpose_traced``, so the adjoint system
    costs the same memory/program shape as the forward one) plus the
    diagonal projection of ``-lambda x^T``.  The symmetric twin
    (``cg_solve_implicit``) reuses A itself."""
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve

    A = DiaMatrix(data, offsets, shape)
    return bicgstab_solve(A, b, policy=policy).x


def _fwd_nonsym(data, b, offsets, shape, policy):
    x = bicgstab_solve_implicit(data, b, offsets, shape, policy)
    return x, (data, x)


def _bwd_nonsym(offsets, shape, policy, res, g):
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve

    data, x = res
    n = shape[0]
    dataT = dia_transpose_traced(data, offsets, n)
    AT = DiaMatrix(dataT, tuple(-o for o in offsets), shape)
    lam = bicgstab_solve(AT, g, policy=policy).x
    return _project_onto_diagonals(lam, x, offsets, n), lam


bicgstab_solve_implicit.defvjp(_fwd_nonsym, _bwd_nonsym)
