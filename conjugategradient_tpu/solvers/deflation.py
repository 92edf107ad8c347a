"""Deflated / recycled CG: spectral deflation for SEQUENCES of solves.

Production context the reference was built for: its author's SPH solver
calls the pressure-projection CG every time step with the SAME matrix and a
new right-hand side (the reference API's ``Initialize()`` once /
``Solve()`` repeatedly split, ``Mgcg/cuBlas/Mgcg/ConjugateGradientGpu.cs:84-89``,
encodes exactly this).  Plain CG pays for the lowest eigenmodes — the modes
that dominate kappa — again on every solve.  Deflation computes them ONCE
(an m-step device Lanczos probe) and removes them from every subsequent
Krylov iteration: the effective condition number drops from
lambda_max/lambda_1 to lambda_max/lambda_{k+1}.

TPU mapping: the per-iteration deflation work is two (n, k) x (k,) matmuls
plus a k x k triangular solve — tall-skinny MXU work with k a multiple of 8,
negligible next to the SpMV it rides on.  The basis (W, AW, chol(WᵀAW)) is a
registered pytree, so it flows through ``jit`` as an ARGUMENT (never a
closure constant — CLAUDE.md rule) and shards over the mesh like any other
operand.

Algorithm: def-CG (Saad, Yeung, Erhel, Guyomarc'h, SIAM J. Sci. Comput.
21(5), 2000): a Galerkin initial guess makes Wᵀ r0 = 0, and projecting the
(preconditioned) residual out of span{W} inside the direction update —
``cg_solve``'s ``project`` hook, the SAME single recurrence as every other
CG driver here — keeps all search directions A-orthogonal to W, so the
invariant Wᵀ r_j = 0 holds in exact arithmetic and the spectrum is clipped.

When it applies (honest scoping, measured): Lanczos-probe deflation needs
the low modes to be ISOLATED — a handful of outlier eigenvalues separated
from the bulk (weak constraints, near-floating regions, density contrast:
Vuik's bubbly-flow pressure systems).  An m-step probe resolves such
outliers essentially exactly (they converge first in Lanczos), and the
iteration count drops to that of the bulk spectrum.  For CLUSTERED low
modes (the plain Poisson ladder) no small probe can span them — that's
multigrid's job (``precond/``); deflation *complements* the V-cycle, it
does not replace it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu.ops.spmv import as_operator
from conjugategradient_tpu.solvers.cg import CGResult, cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@dataclasses.dataclass(frozen=True)
class Deflation:
    """Deflation space: ``W`` (n, k) Ritz basis, ``AW = A @ W``, and the
    Cholesky factor of the small Galerkin matrix ``E = Wᵀ A W``."""

    W: jax.Array  # (n, k)
    AW: jax.Array  # (n, k)
    chol_E: jax.Array  # (k, k) lower-triangular

    @property
    def k(self) -> int:
        return self.W.shape[1]

    # -- the three pieces def-CG needs (all shape-agnostic: vectors may be
    # grid-shaped; the (n, k) contractions flatten internally) --------------

    def _coeffs(self, U, v):
        c = U.T @ v.reshape(-1)
        return jax.scipy.linalg.cho_solve((self.chol_E, True), c)

    def galerkin_correct(self, x, r):
        """x + W E⁻¹ Wᵀ r — the Galerkin (coarse) solve that zeroes Wᵀ r."""
        return x + (self.W @ self._coeffs(self.W, r)).reshape(x.shape)

    def project_direction(self, z):
        """z - W E⁻¹ (AW)ᵀ z — keeps directions A-orthogonal to span{W}."""
        return z - (self.W @ self._coeffs(self.AW, z)).reshape(z.shape)


jax.tree_util.register_dataclass(
    Deflation, data_fields=["W", "AW", "chol_E"], meta_fields=[]
)


def lanczos_basis(op: Callable, n: int, m: int, dtype=jnp.float32, seed: int = 0):
    """m-step device Lanczos with full reorthogonalisation.

    Returns ``(V, alphas, betas)``: ``V`` is the (m, n) orthonormal Krylov
    basis and the scalars assemble the tridiagonal Rayleigh quotient.  The
    reorthogonalisation is two (m, n) matmuls per step against the masked
    basis — MXU work, so "full" costs nothing at solver scale.  Traceable;
    runs as one jitted ``lax.scan``.
    """
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    V0 = jnp.zeros((m, n), dtype).at[0].set(v0)

    def step(carry, j):
        V, beta_prev, v_prev = carry
        q = V[j]
        w = op(q)
        alpha = jnp.vdot(q, w)
        w = w - alpha * q - beta_prev * v_prev
        # full reorthogonalisation against the rows filled so far (rows past
        # j are zero, so the masked contraction is just the full matmul)
        w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        v_next = jnp.where(beta > 0, w / jnp.where(beta > 0, beta, 1.0), 0.0)
        V = jax.lax.cond(
            j + 1 < m, lambda V: V.at[j + 1].set(v_next), lambda V: V, V
        )
        return (V, beta, q), (alpha, beta)

    (V, _, _), (alphas, betas) = jax.lax.scan(
        step, (V0, jnp.zeros((), dtype), jnp.zeros(n, dtype)), jnp.arange(m)
    )
    return V, alphas, betas


def make_deflation(
    A,
    k: int = 8,
    m: Optional[int] = None,
    dtype=np.float32,
    seed: int = 0,
    use_pallas: bool = False,
) -> Deflation:
    """Build a k-dimensional deflation space for operator ``A`` (any
    container, host or device) from an m-step Lanczos probe (default
    ``m = max(4k, 32)``).

    Setup cost: m SpMVs + one (m, m) host eigendecomposition + one (n, m) x
    (m, k) matmul — amortised over every solve in the sequence.  The Ritz
    vectors need not be exact eigenvectors: any subspace aligned with the
    low modes clips the spectrum proportionally.
    """
    m = m or max(4 * k, 32)
    A_dev = A.device_put(dtype) if hasattr(A, "device_put") else A
    op = as_operator(A_dev, use_pallas=use_pallas)
    n = A_dev.n

    V, alphas, betas = jax.jit(
        lambda A_: lanczos_basis(lambda v: as_operator(A_)(v), n, m, dtype, seed)
    )(A_dev)

    a = np.asarray(alphas, np.float64)
    b_ = np.asarray(betas, np.float64)[:-1]
    T = np.diag(a) + np.diag(b_, 1) + np.diag(b_, -1)
    evals, S = np.linalg.eigh(T)
    Sk = jnp.asarray(S[:, :k], dtype)  # k smallest Ritz pairs

    @jax.jit
    def assemble(V_, Sk_, A_):
        W = V_.T @ Sk_  # (n, k)
        AW = jax.vmap(lambda col: as_operator(A_)(col), in_axes=1, out_axes=1)(W)
        # E is SPD in exact arithmetic (W orthonormal, A SPD); symmetrise the
        # rounding skew only — NO jitter: perturbing E breaks the Wᵀ r = 0
        # invariant the whole recurrence rests on (measured: a 1e-7-scaled
        # jitter left Wᵀ r0 at 1e-5 and the solve stagnated)
        E = 0.5 * (W.T @ AW + AW.T @ W)
        return W, AW, jnp.linalg.cholesky(E)

    W, AW, chol_E = assemble(V, Sk, A_dev)
    if not bool(np.isfinite(np.asarray(chol_E)).all()):
        raise ValueError(
            "deflation Galerkin matrix is not positive definite — the Lanczos "
            "probe degenerated (is A symmetric positive definite?)"
        )
    return Deflation(W, AW, chol_E)


def deflated_cg_solve(
    A,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    deflation: Deflation = None,
    M: Optional[Callable] = None,
    precise_dot: bool = False,
    use_pallas: bool = False,
) -> CGResult:
    """Solve A x = b by def-CG on the deflated spectrum.  Traceable: call
    under ``jit`` with ``deflation`` as a pytree argument.

    The Galerkin initial correction solves the coarse (k x k) problem
    exactly, then CG runs with every direction A-orthogonal to W via the
    ``project`` hook — one shared recurrence with all other drivers.
    """
    if deflation is None:
        raise ValueError("deflated_cg_solve requires deflation=make_deflation(A)")
    op = as_operator(A, use_pallas=use_pallas)
    x_init = jnp.zeros_like(b) if x0 is None else x0.astype(b.dtype)
    r = b - op(x_init)
    x_init = deflation.galerkin_correct(x_init, r)
    return cg_solve(
        A, b, x_init, policy=policy, M=M, precise_dot=precise_dot,
        use_pallas=use_pallas, project=deflation.project_direction,
    )
