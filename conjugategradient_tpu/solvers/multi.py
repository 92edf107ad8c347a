"""Multi-RHS CG: solve A X = B for k right-hand sides in one device program.

Not in the reference (single-RHS throughout) — this is where the SpMM path
(``ops/spmm.py``) earns its keep: one matrix pass serves k Krylov recurrences,
so the per-solve HBM traffic of the dominant operand drops k-fold.  Each
column runs its own scalar recurrence (columnwise alphas/betas); converged
columns freeze (masked updates) until all are done or max_iteration hits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from conjugategradient_tpu.core.formats import (
    BsrMatrix,
    CooMatrix,
    CsrMatrix,
    DenseMatrix,
    DiaMatrix,
    EllMatrix,
    StencilMatrix,
)
from conjugategradient_tpu.solvers.cg import _safe_div
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@dataclasses.dataclass(frozen=True)
class MultiCGResult:
    x: jax.Array  # (n, k)
    iterations: jax.Array  # (k,) int32 per-column iteration counts
    residual: jax.Array  # (k,) final residuals (selected norm)
    converged: jax.Array  # (k,) bool


jax.tree_util.register_dataclass(
    MultiCGResult, data_fields=["x", "iterations", "residual", "converged"], meta_fields=[]
)


def _as_multi_operator(A):
    from conjugategradient_tpu.ops.spmm import spmm
    from conjugategradient_tpu.ops.stencil import spmm_stencil

    if isinstance(A, StencilMatrix):
        # (n, k) <-> (*grid, k)
        def op(P):
            return spmm_stencil(A, P.reshape(A.grid + (P.shape[-1],))).reshape(A.n, -1)

        return op
    if isinstance(A, (DiaMatrix, CsrMatrix, EllMatrix, CooMatrix, BsrMatrix, DenseMatrix)):
        return lambda P: spmm(A, P)
    return A  # already a multi-RHS callable


def cg_solve_multi(
    A,
    B: jnp.ndarray,
    X0: Optional[jnp.ndarray] = None,
    policy: ConvergencePolicy = ConvergencePolicy(),
) -> MultiCGResult:
    """Solve A X = B, B of shape (n, k), fully on device.

    Per-column convergence policy (same tol/norm for all columns); the loop
    exits when every column is converged or at max_iteration.
    """
    op = _as_multi_operator(A)
    n, k = B.shape
    dtype = B.dtype
    tol = jnp.asarray(policy.tol, dtype)
    min_iter = jnp.int32(policy.min_iteration)
    max_iter = jnp.int32(policy.resolve_max(n))

    def cdot(U, V):
        return jnp.sum(U * V, axis=0)  # (k,)

    X = jnp.zeros_like(B) if X0 is None else X0.astype(dtype)
    R = B - op(X)
    P = R
    rr = cdot(R, R)
    rr0 = rr

    def res_of(R, rr):
        if policy.norm == "l2":
            return jnp.sqrt(rr)
        if policy.norm == "linf":
            return jnp.max(jnp.abs(R), axis=0)
        if policy.norm == "rel_l2":
            return jnp.sqrt(rr / jnp.where(rr0 == 0, 1.0, rr0))
        raise ValueError(policy.norm)

    def active_of(R, rr, it):
        res = res_of(R, rr)
        return jnp.logical_and(
            jnp.logical_or(it < min_iter, res >= tol), it < max_iter
        )

    def cond(state):
        X, R, P, rr, it = state
        return jnp.any(active_of(R, rr, it))

    def body(state):
        X, R, P, rr, it = state
        active = active_of(R, rr, it)  # (k,)
        AP = op(P)
        alpha = jnp.where(active, _safe_div(rr, cdot(P, AP)), 0.0)
        X = X + alpha[None, :] * P
        R2 = R - alpha[None, :] * AP
        rr2 = cdot(R2, R2)
        beta = jnp.where(active, _safe_div(rr2, rr), 0.0)
        P2 = jnp.where(active[None, :], R2 + beta[None, :] * P, P)
        rr2 = jnp.where(active, rr2, rr)
        R2 = jnp.where(active[None, :], R2, R)
        return (X, R2, P2, rr2, it + active.astype(jnp.int32))

    X, R, P, rr, it = jax.lax.while_loop(
        cond, body, (X, R, P, rr, jnp.zeros(k, jnp.int32))
    )
    res = res_of(R, rr)
    converged = jnp.logical_and(res < tol, it >= min_iter)
    return MultiCGResult(x=X, iterations=it, residual=res, converged=converged)
