"""Krylov-Schur (thick-restart Arnoldi) eigensolver for NONSYMMETRIC operators.

Completes the eigensolver family by symmetry class, the same way
``solvers.minres``/``bicgstab``/``gmres`` completed the linear-solver family:
the reference ships a symmetric Jacobi-rotation eigensolver inside its ELL
matrix (``Mgcg/HandmadeCL/MgcgCL/SparseMatrix.cs:234-372``) and this repo adds
Lanczos bounds and LOBPCG — all symmetric-only.  The nonsymmetric solver
family (bicgstab / gmres / idr on convection-diffusion operators) creates the
demand this module serves: dominant/rightmost eigenvalues and spectral
diagnostics of operators with complex spectra, where Lanczos three-term
recurrences are simply wrong.

Method: Arnoldi with Krylov-Schur thick restarting (Stewart, SIAM J. Matrix
Anal. Appl. 23(3), 2001) — the restarting scheme behind ARPACK-style ``eigs``
but expressed through the ordered Schur form, which makes the restart a plain
basis contraction instead of implicit QR bulge-chasing.

TPU-first split of labour:

- DEVICE: the ``(m+1, n)`` basis expansion.  Orthogonalisation is CGS2 as two
  masked MXU matmuls per step at ``Precision.HIGHEST`` — identical design (and
  identical measured failure class if left at default precision: the TPU
  default truncates fp32 matmul operands to bf16) to ``gmres_loop`` and
  ``solvers.lobpcg``.  One jitted program per restart cycle; only the tiny
  projected matrix leaves the device.
- HOST: the ``(m, m)`` projected eigen/Schur work per restart —
  ``numpy.linalg.eig`` + ``scipy.linalg.schur(sort=...)`` on a ~32x32 matrix,
  orders of magnitude below one n-sized matvec; host-driving the restarts is
  the right placement, exactly as ``precond.multigrid`` host-drives setup.

The restart contraction ``V_p = Q[:, :p]^T V_m`` IS an ``(p, m) @ (m, n)``
matmul and runs on device at HIGHEST precision; the coupling row ``b^T`` is
folded into row ``p`` of the projected matrix ``S`` so each later cycle keeps
the exact relation ``A V_m = S^T-contraction + beta v_m e_last^T`` and the
free residual estimate ``|beta * y[m-1]|`` per Ritz pair stays valid.

Shift-invert (``sigma=``) composes with the nonsymmetric solver stack: each
Arnoldi matvec becomes one BiCGStab solve of ``(A - sigma I) w = v`` inside
the same jitted expansion (a ``lax.while_loop`` nested in the cycle), and the
returned eigenvalues are mapped back ``lambda = sigma + 1/theta``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu.ops.blas import dot as _dot
from conjugategradient_tpu.ops.spmv import as_operator
from conjugategradient_tpu.solvers.cg import _safe_div

_PH = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class EigsResult:
    """k approximate eigenpairs of a (generally nonsymmetric) operator.

    ``values``/``vectors`` are complex numpy arrays (real inputs with real
    spectra come back with zero imaginary parts); ``vectors`` columns have
    unit 2-norm.  ``residuals[i]`` is the Arnoldi estimate
    ``||A x_i - lambda_i x_i||_2`` (exact in exact arithmetic, free from the
    recurrence).  ``matvecs`` counts operator applications (= inner SOLVES
    under shift-invert).
    """

    values: np.ndarray  # (k,) complex128
    vectors: np.ndarray  # (n, k) complex128, unit columns
    residuals: np.ndarray  # (k,) float64
    matvecs: int
    restarts: int
    converged: bool


def _order(which: str, theta: np.ndarray) -> np.ndarray:
    """Indices of ``theta`` sorted most-wanted first."""
    if which == "LM":
        key = -np.abs(theta)
    elif which == "SM":
        key = np.abs(theta)
    elif which == "LR":
        key = -theta.real
    elif which == "SR":
        key = theta.real
    elif which == "LI":
        key = -np.abs(theta.imag)
    else:
        raise ValueError(f"unknown which={which!r}; want LM|SM|LR|SR|LI")
    return np.argsort(key, kind="stable")


def _schur_select(which: str, theta_keep: np.ndarray):
    """A pointwise Schur-sort predicate that marks (at least) the kept set.

    scipy's ordered Schur takes a per-eigenvalue boolean, so 'top p' is
    expressed as a threshold on the sort key; ties may select a few extra —
    the caller widens p to the returned ``sdim`` (never splits the wanted
    set, never splits a 2x2 real-Schur block).
    """
    eps = 1e-12
    if which == "LM":
        cut = np.abs(theta_keep).min()
        return lambda re, im: np.hypot(re, im) >= cut * (1 - eps) - eps
    if which == "SM":
        cut = np.abs(theta_keep).max()
        return lambda re, im: np.hypot(re, im) <= cut * (1 + eps) + eps
    if which == "LR":
        cut = theta_keep.real.min()
        return lambda re, im: re >= cut - eps - abs(cut) * eps
    if which == "SR":
        cut = theta_keep.real.max()
        return lambda re, im: re <= cut + eps + abs(cut) * eps
    if which == "LI":
        cut = np.abs(theta_keep.imag).min()
        return lambda re, im: abs(im) >= cut * (1 - eps) - eps
    raise ValueError(which)


def _make_expand(op, m: int, p: int, precise_dot: bool):
    """Jitted Arnoldi expansion from basis row ``p`` to ``m`` (static p, m:
    exactly two compilations per solve — p=0 for the first cycle, p=restart
    thickness for all later ones)."""
    rows = jnp.arange(m + 1)

    def expand(V, S):
        dtype = V.dtype

        def step(j, carry):
            V, S, beta = carry
            vj = jax.lax.dynamic_index_in_dim(V, j, keepdims=False)
            w = op(vj)
            mask = (rows <= j).astype(dtype)
            h1 = mask * jnp.matmul(V, w, precision=_PH)
            w = w - jnp.matmul(h1, V, precision=_PH)
            h2 = mask * jnp.matmul(V, w, precision=_PH)
            w = w - jnp.matmul(h2, V, precision=_PH)
            h = h1 + h2
            wn = jnp.sqrt(_dot(w, w, precise=precise_dot))
            V = V.at[j + 1].set(_safe_div(1.0, wn) * w)
            # column j of S holds h[:m] with the subdiagonal wn at row j+1;
            # for j == m-1 that entry falls OUTSIDE S — it is beta, the
            # residual coupling carried separately
            hcol = (h.at[j + 1].set(wn))[:m]
            S = S.at[:, j].set(hcol)
            return V, S, wn

        V, S, beta = jax.lax.fori_loop(
            p, m, step, (V, S, jnp.asarray(0.0, V.dtype))
        )
        return V, S, beta

    return jax.jit(expand)


def arnoldi_eigs(
    A,
    k: int = 6,
    m: Optional[int] = None,
    which: str = "LM",
    tol: float = 1e-8,
    max_restarts: int = 60,
    sigma: Optional[float] = None,
    inner_tol: float = 1e-10,
    inner_max_iteration: int = 10000,
    n: Optional[int] = None,
    dtype=None,
    seed: int = 0,
    precise_dot: bool = False,
    M: Optional[Callable] = None,
) -> EigsResult:
    """k eigenpairs of a square (nonsymmetric) operator by Krylov-Schur.

    ``A``: any matrix container or a callable ``v -> A @ v`` (pass ``n=``
    for callables).  ``which``: LM (largest magnitude, default) | SM | LR
    (rightmost) | SR (leftmost) | LI.  ``m``: Arnoldi subspace size
    (default ``max(20, 2k + 8)``, clamped to n).  ``tol`` is RELATIVE:
    converged when ``residual_i <= tol * max(|lambda_i|, 1e-300)``.

    ``sigma``: shift-invert — eigenvalues nearest ``sigma`` converge first
    (each matvec = one BiCGStab solve of ``(A - sigma I) w = v`` to
    ``inner_tol``; ``M`` optionally preconditions that inner solve).  With
    ``sigma`` the ``which`` selection applies to the TRANSFORMED spectrum
    ``1 / (lambda - sigma)``, so the default LM = nearest-to-sigma; returned
    values/residuals are mapped back to the original problem (residuals via
    the exact relation ``||A x - lambda x|| = |lambda - sigma|^2 / |theta|
    * ||(A - sigma)^-1 x - theta x||`` ... reported as the BACK-TRANSFORMED
    estimate ``est / |theta|`` with the transformed-space estimate ``est``,
    conservative for well-separated shifts).

    For symmetric operators prefer ``solvers.lobpcg`` (extremal, with a
    V-cycle preconditioner) or ``eigen.lanczos_bounds``; this is the general
    tool those cannot be: complex spectra, interior nonsym eigenvalues.
    Known single-vector-Krylov property: a degenerate eigenvalue is found
    ONCE (the Krylov space holds one vector per eigenspace) — for clustered
    or multiple symmetric eigenvalues use the BLOCK solver (lobpcg).
    """
    if n is None:
        if hasattr(A, "n"):
            n = int(A.n)
        else:
            raise ValueError("pass n= when A is a callable operator")
    if k < 1:
        raise ValueError("k must be >= 1")
    if k >= n:
        raise ValueError(f"k={k} must be < n={n}")
    if m is None:
        m = max(20, 2 * k + 8)
    m = int(min(m, n))
    if m < k + 2:
        raise ValueError(f"subspace m={m} must be >= k+2={k + 2}")

    op0 = as_operator(A)
    if dtype is None:
        dtype = getattr(A, "dtype", None) or jnp.zeros(0).dtype
    dtype = jnp.zeros(0, dtype).dtype

    if sigma is not None:
        from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
        from conjugategradient_tpu.solvers.policy import ConvergencePolicy

        sig = jnp.asarray(sigma, dtype)
        shifted = lambda u: op0(u) - sig * u
        pol = ConvergencePolicy(
            tol=float(inner_tol), norm="rel_l2",
            max_iteration=int(inner_max_iteration),
        )
        op = lambda v: bicgstab_solve(shifted, v, policy=pol, M=M).x
    else:
        op = op0

    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal(n)
    v0 /= np.linalg.norm(v0)
    V = jnp.zeros((m + 1, n), dtype).at[0].set(jnp.asarray(v0, dtype))
    S = jnp.zeros((m, m), dtype)

    # restart thickness: keep the k wanted plus half the discarded space —
    # the standard robustness pad (pure k-keep restarts stall on clustered
    # spectra); widened per-cycle for Schur-sort ties / 2x2 blocks
    p_keep = min(k + max(1, (m - k) // 2), m - 2)

    expand = {0: _make_expand(op, m, 0, precise_dot)}
    matvecs = 0
    theta = Y = None
    beta_f = 0.0
    wanted = np.arange(k)
    converged = False
    restarts = 0

    for restarts in range(1, max_restarts + 1):
        p = 0 if restarts == 1 else p_cur
        V, S, beta = expand[p](V, S)
        matvecs += m - p
        S_np = np.asarray(jax.device_get(S), np.float64)
        beta_f = float(beta)
        theta, Y = np.linalg.eig(S_np)  # unit eigvec columns
        order = _order(which, theta)
        wanted = order[:k]
        resid = beta_f * np.abs(Y[m - 1, wanted])
        floor = np.maximum(np.abs(theta[wanted]), 1e-300)
        if np.all(resid <= tol * floor):
            converged = True
            break
        if restarts == max_restarts:
            break

        # --- Krylov-Schur contraction to the leading ordered-Schur block ---
        import scipy.linalg

        keep = order[:p_keep]
        T, Q, sdim = scipy.linalg.schur(
            S_np, output="real", sort=_schur_select(which, theta[keep])
        )
        p_cur = max(p_keep, int(sdim))
        p_cur = min(p_cur, m - 1)
        # never split a 2x2 (complex-pair) block
        if p_cur < m and abs(T[p_cur, p_cur - 1]) > 0:
            p_cur += 1
        if p_cur >= m:
            p_cur = m - 1
            if abs(T[p_cur, p_cur - 1]) > 0:
                p_cur -= 1
        Q1 = jnp.asarray(Q[:, :p_cur], dtype)  # (m, p)
        Vp = jnp.matmul(Q1.T, V[:m], precision=_PH)  # (p, n) device contraction
        V = (
            jnp.zeros_like(V)
            .at[:p_cur]
            .set(Vp)
            .at[p_cur]
            .set(V[m])  # the residual direction continues the basis
        )
        S_new = np.zeros((m, m))
        S_new[:p_cur, :p_cur] = T[:p_cur, :p_cur]
        S_new[p_cur, :p_cur] = beta_f * Q[m - 1, :p_cur]  # coupling row b^T
        S = jnp.asarray(S_new, dtype)
        if p_cur not in expand:
            expand[p_cur] = _make_expand(op, m, p_cur, precise_dot)

    # --- assemble eigenpairs: x_i = V_m^T y_i, two real device matmuls ---
    Yw = Y[:, wanted]  # (m, k) complex
    Yr = jnp.asarray(np.ascontiguousarray(Yw.real), dtype)
    Yi = jnp.asarray(np.ascontiguousarray(Yw.imag), dtype)
    Xr = np.asarray(jax.device_get(jnp.matmul(Yr.T, V[:m], precision=_PH)))
    Xi = np.asarray(jax.device_get(jnp.matmul(Yi.T, V[:m], precision=_PH)))
    X = (Xr + 1j * Xi).T.astype(np.complex128)  # (n, k)
    nrm = np.linalg.norm(X, axis=0)
    nrm[nrm == 0] = 1.0
    X /= nrm
    vals = theta[wanted].astype(np.complex128)
    resid = beta_f * np.abs(Y[m - 1, wanted]) / nrm
    if sigma is not None:
        # back-transform: lambda = sigma + 1/theta; the transformed-space
        # estimate scales by |d lambda / d theta| = 1/|theta|^2 ... report
        # the first-order mapping est/|theta| (conservative)
        with np.errstate(divide="ignore", invalid="ignore"):
            vals = sigma + 1.0 / theta[wanted]
            resid = resid / np.maximum(np.abs(theta[wanted]), 1e-300)
    return EigsResult(
        values=vals,
        vectors=X,
        residuals=resid.astype(np.float64),
        matvecs=matvecs,
        restarts=restarts,
        converged=bool(converged),
    )
