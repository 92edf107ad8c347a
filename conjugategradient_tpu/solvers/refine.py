"""Mixed-precision iterative refinement: fp64 accuracy from an fp32 TPU.

The reference is fp64 end-to-end and its flagship tolerance is *absolute*
1e-8 (``Mgcg/cuBlas/Mgcg/MgcgMain.cs:29``).  TPU vector units have no native
fp64, and fp32 storage caps the attainable true residual around 1e-7
relative — so a single fp32 device solve cannot honour the reference's
contract.  Classic mixed-precision iterative refinement closes the gap:

    repeat:
        r = b - A x            (fp64, host — numpy or the native C++ kit)
        stop when ||r|| < tol  (fp64 check: the *true* residual, not the
                                recurrence estimate)
        d = solve(A, r/s)      (fp32, on device — MGCG or CG, relative tol;
                                s = ||r||_inf scaling keeps fp32 in range)
        x = x + s * d          (fp64, host)

Each outer pass multiplies the error by roughly the inner relative tolerance,
so 2-4 passes reach 1e-8 absolute from any starting point.  The expensive
part (the Krylov iteration) runs entirely on-chip in fp32; the fp64 work is
one SpMV + one axpy per outer pass on the host.

This is also the checkpointable outer loop for very long solves: ``x`` lives
host-side in fp64 between passes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.formats import DiaMatrix, dia_to_stencil
from conjugategradient_tpu.solvers.policy import ConvergencePolicy, NotConvergedError


@dataclasses.dataclass
class RefineResult:
    x: np.ndarray  # fp64 solution
    outer_iterations: int
    inner_iterations: int  # total device iterations across passes
    residual: float  # true fp64 residual (selected norm)
    converged: bool
    history: list  # fp64 residual after each outer pass
    stalled: bool = False  # progress hit the fp64 evaluation noise floor
    timings: Optional[dict] = None  # device-resident path only: input_s
    # (b/x dd pairs to device), exec_s (the refinement loop incl. scalar
    # readbacks), output_s (solution dd pair to host) — the reference's own
    # input/exec/output phase convention (MgcgMain.cs:165-167); through the
    # serving tunnel the bulk phases dominate and vary run to run, so the
    # honest record needs the split, not one wall number




# ---------------------------------------------------------------------------
# Module-cached jitted inner solvers.
#
# Rebuilding ``jax.jit(lambda ...)`` per refined_solve CALL made every call
# re-trace/lower its inner programs (the persistent compile cache skips XLA
# compilation but not tracing + lowering + tunnel cache lookups — measured
# ~23 s per warm flagship call in a fresh process where the repeated-call
# cost should be the ~0.2 s of actual work).  Same defect class as the
# round-3 Arnoldi advisor finding; same cure: cache the jitted function on
# its STATIC configuration and pass everything else as pytree arguments.
# ---------------------------------------------------------------------------

import functools as _functools


def _inner_of(inner: str):
    if inner == "bicgstab":
        from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve

        return bicgstab_solve
    from conjugategradient_tpu.solvers.cg import cg_solve as _cg

    return _cg


@_functools.lru_cache(maxsize=64)
def _jit_inner_mg(inner: str, inner_tol: float, max_iter: int, prec: bool):
    import jax

    from conjugategradient_tpu.precond import as_preconditioner as _as_p

    fn = _inner_of(inner)
    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda h_, A_, r: fn(A_, r, policy=pol, M=_as_p(h_), precise_dot=prec)
    )


@_functools.lru_cache(maxsize=64)
def _jit_inner_mg_deflated(inner_tol: float, max_iter: int, prec: bool):
    import jax

    from conjugategradient_tpu.precond import as_preconditioner as _as_p
    from conjugategradient_tpu.solvers.deflation import deflated_cg_solve

    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda h_, A_, d_, r: deflated_cg_solve(
            A_, r, policy=pol, M=_as_p(h_), precise_dot=prec, deflation=d_
        )
    )


@_functools.lru_cache(maxsize=64)
def _jit_inner_cm(inner: str, inner_tol: float, max_iter: int, prec: bool):
    import jax

    from conjugategradient_tpu.ops.pallas_spmv import cm_apply

    fn = _inner_of(inner)
    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda A_, r_cm: fn(
            lambda v: cm_apply(A_, v), r_cm, policy=pol, precise_dot=prec
        )
    )


@_functools.lru_cache(maxsize=64)
def _jit_inner_cm_deflated(inner_tol: float, max_iter: int, prec: bool, offsets, n):
    import jax

    from conjugategradient_tpu.ops.pallas_spmv import cm_apply, from_cm, plan_dia_cm, to_cm
    from conjugategradient_tpu.solvers.deflation import deflated_cg_solve

    plan = plan_dia_cm(offsets, n)
    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)

    def _cm_deflated(A_, d_, r):
        d_cm = d_.map_basis(lambda col: to_cm(col, plan).reshape(-1))
        res = deflated_cg_solve(
            lambda v: cm_apply(A_, v), to_cm(r, plan),
            policy=pol, precise_dot=prec, deflation=d_cm,
        )
        return dataclasses.replace(res, x=from_cm(res.x, plan))

    return jax.jit(_cm_deflated)


@_functools.lru_cache(maxsize=64)
def _jit_inner_plain(inner: str, inner_tol: float, max_iter: int, prec: bool):
    import jax

    fn = _inner_of(inner)
    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(lambda A_, r: fn(A_, r, policy=pol, precise_dot=prec))


@_functools.lru_cache(maxsize=64)
def _jit_inner_plain_deflated(inner_tol: float, max_iter: int, prec: bool):
    import jax

    from conjugategradient_tpu.solvers.deflation import deflated_cg_solve

    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda A_, d_, r: deflated_cg_solve(
            A_, r, policy=pol, precise_dot=prec, deflation=d_
        )
    )


@_functools.lru_cache(maxsize=8)
def _jit_dd_resid():
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.ops import dd

    @jax.jit
    def resid(ddm_, b_dd, x_dd):
        r = dd.dd_residual(ddm_, b_dd, x_dd)
        rr = dd.dd_norm_sq(r)
        mx = dd.dd_max_abs(r)
        s = jnp.where(mx > 0, mx, 1.0)
        return dd.dd_value(r) / s, rr, mx

    return resid


@_functools.lru_cache(maxsize=64)
def _jit_dd_update(mode: str, inner: str, inner_tol: float, max_iter: int,
                   offsets, n):
    """Cached device-residual update program (see _jit_inner_* rationale).
    ``mode``: "mg" | "cm" | "plain"; ``offsets``/``n`` key the CM plan.
    The deflated-vs-plain branch needs no cache key: jax.jit re-specializes
    on the None-vs-Deflation pytree STRUCTURE of the ``d_`` argument."""
    import jax

    from conjugategradient_tpu.ops import dd
    from conjugategradient_tpu.solvers.deflation import deflated_cg_solve

    fn = _inner_of(inner)
    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    if mode == "mg":
        from conjugategradient_tpu.precond import as_preconditioner as _as_p

        @jax.jit
        def update(h_, A_, d_, x_dd, r32, s):
            if d_ is None:
                d = fn(A_, r32, policy=pol, M=_as_p(h_), precise_dot=True)
            else:
                d = deflated_cg_solve(A_, r32, policy=pol, M=_as_p(h_),
                                      precise_dot=True, deflation=d_)
            return dd.dd_axpy(x_dd, s, d.x), d.iterations

        return update
    if mode == "cm":
        from conjugategradient_tpu.ops.pallas_spmv import (
            cm_apply, from_cm, plan_dia_cm, to_cm,
        )

        plan = plan_dia_cm(offsets, n)

        @jax.jit
        def update(A_, d_, x_dd, r32, s):
            if d_ is None:
                d = fn(lambda v: cm_apply(A_, v), to_cm(r32, plan),
                       policy=pol, precise_dot=True)
            else:
                d_cm = d_.map_basis(lambda col: to_cm(col, plan).reshape(-1))
                d = deflated_cg_solve(lambda v: cm_apply(A_, v),
                                      to_cm(r32, plan), policy=pol,
                                      precise_dot=True, deflation=d_cm)
            return dd.dd_axpy(x_dd, s, from_cm(d.x, plan)), d.iterations

        return update

    @jax.jit
    def update(A_, d_, x_dd, r32, s):
        if d_ is None:
            d = fn(A_, r32, policy=pol, precise_dot=True)
        else:
            d = deflated_cg_solve(A_, r32, policy=pol, precise_dot=True,
                                  deflation=d_)
        return dd.dd_axpy(x_dd, s, d.x), d.iterations

    return update


@_functools.lru_cache(maxsize=32)
def _jit_multi_mg(inner_tol: float, max_iter: int):
    import jax

    from conjugategradient_tpu.solvers.multi import (
        as_multi_preconditioner,
        cg_solve_multi,
    )

    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda h_, A_, R: cg_solve_multi(
            A_, R, policy=pol, M=as_multi_preconditioner(h_)
        )
    )


@_functools.lru_cache(maxsize=32)
def _jit_multi_plain(inner_tol: float, max_iter: int, use_pallas: bool):
    import jax

    from conjugategradient_tpu.solvers.multi import cg_solve_multi

    pol = ConvergencePolicy(tol=inner_tol, norm="rel_l2", max_iteration=max_iter)
    return jax.jit(
        lambda A_, R: cg_solve_multi(A_, R, policy=pol, use_pallas=use_pallas)
    )


def refined_solve(
    A: DiaMatrix,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    tol: float = 1e-8,
    norm: str = "l2",
    grid: Optional[Tuple[int, ...]] = None,
    inner_tol: float = 1e-5,
    max_outer: int = 40,
    device_dtype=np.float32,
    hierarchy=None,
    smoother: str = "chebyshev",
    raise_on_divergence: bool = False,
    use_pallas: Optional[bool] = None,
    matrix_dtype=None,
    device_residual: bool = False,
    deflation=None,
    inner: str = "cg",
) -> RefineResult:
    """Solve A x = b to an fp64 tolerance using fp32 device inner solves.

    ``inner="bicgstab"`` swaps the inner Krylov method for BiCGStab —
    iterative refinement does not care that the inner operator is
    nonsymmetric, so this gives NONSYMMETRIC systems (convection-diffusion)
    the same fp64-tolerance-on-fp32-hardware contract as the SPD path;
    with ``grid=`` the inner solve is V-cycle-right-preconditioned
    (mg_bicgstab), and ``device_residual=True`` composes (the dd outer
    pass is symmetry-agnostic).  Not combinable with ``deflation`` (an SPD
    construction).

    ``deflation`` (a ``solvers.deflation.Deflation``, built once per matrix)
    deflates every INNER solve: Galerkin initial correction + the def-CG
    direction projection.  For fp64-tolerance solve SEQUENCES on outlier
    spectra — probe once, refine every time step cheaply.  Composes with
    every inner path (MGCG, plain DIA, the column-major Pallas kernel).

    ``A``/``b`` are host fp64.  When ``grid`` is given the inner solver is
    stencil-layout MGCG (built once, reused across passes); otherwise plain
    device CG on DIA.  The returned residual is the *true* fp64 residual.

    ``use_pallas`` (gridless path only): run the inner CG with the
    column-major Pallas SpMV and column-major-resident Krylov state
    (``ops.pallas_spmv.make_cm_operator``) — measured at the HBM roofline on
    chip, ~10-20x the flat-XLA DIA SpMV for the band-160 family.  Default:
    on for TPU backends, off elsewhere (interpret-mode Pallas on CPU is for
    tests, not speed).

    ``matrix_dtype`` stores the device matrix narrower than the Krylov state
    (e.g. ``jnp.bfloat16`` with fp32 vectors).  Gridless path: the CM kernel
    streams it at half HBM width and accumulates fp32 (measured 1.93x per
    SpMV on chip, ``artifacts/bf16_spmv_r02.json``).  Grid path: the
    variable-coefficient stencil legs are stored narrow and each
    ``leg * window`` product promotes to ``device_dtype`` (measured on chip
    for the jump-coefficient diffusion family: 1.81x per SpMV on the 2-D
    5-leg stencil, 1.86x on the 3-D 7-leg, above the pure-traffic ceilings
    because the halved working set sits nearer VMEM —
    ``artifacts/bf16_stencil_r02.json`` — only the OPERATOR is narrowed;
    the V-cycle preconditioner keeps ``device_dtype``, since narrowing the
    preconditioner vectors measured 2.1x slower,
    ``scripts/bf16_vcycle_experiment.py``).  Const-detected operators (the
    Poisson ladder) ignore it — they ship zero matrix bytes already.  The
    inner CG then converges on the rounded operator — a ~4e-3 relative
    perturbation of A — and the fp64 outer refinement corrects for it with
    (typically) a few more outer passes; the returned residual is still the
    TRUE fp64 residual.

    bf16 envelope: refinement against the rounded operator contracts per
    pass by roughly ``kappa(A) * 2**-8``, so ``matrix_dtype=bf16`` only
    converges while that product stays below 1 (the band-160 flagship and
    smooth-coefficient diffusion qualify; a 1e4-contrast jump-coefficient
    Laplacian does NOT — the solve then reports ``stalled``/not-converged
    honestly rather than looping).

    ``device_residual=True`` keeps the OUTER loop on device too: the true
    residual, its norm, the inf-norm scaling and the solution update all run
    in double-float (two-fp32) arithmetic (``ops.dd``, effective precision
    ~2^-48), so the only host traffic per outer pass is three scalars — no
    host fp64 SpMV (seconds per pass at rung-4 sizes) and no full-vector
    D2H (the dominant flagship wall cost through the serving tunnel,
    ``artifacts/flagship_profile_r02.json``).  The certified residual floor
    rises from eps64 to eps_dd ~ 3.6e-15 relative — two decades below every
    tolerance in the reference suite.
    """
    import jax
    import jax.numpy as jnp

    # solver construction moved to the module-cached _jit_inner_* builders
    # (keyed on ``inner``); this block only validates the configuration
    if inner not in ("cg", "bicgstab"):
        raise ValueError(f"unknown inner {inner!r}; want cg|bicgstab")
    if inner == "bicgstab" and deflation is not None:
        raise ValueError("deflation requires inner='cg' (SPD construction)")

    if device_residual:
        return _refined_solve_device(
            A, b, x0, tol=tol, norm=norm, grid=grid, inner_tol=inner_tol,
            max_outer=max_outer, device_dtype=device_dtype,
            hierarchy=hierarchy, smoother=smoother,
            raise_on_divergence=raise_on_divergence, use_pallas=use_pallas,
            matrix_dtype=matrix_dtype, deflation=deflation, inner=inner,
        )

    n = A.n
    b64 = np.asarray(b, dtype=np.float64)
    x = np.zeros(n) if x0 is None else np.asarray(x0, dtype=np.float64).copy()

    # --- build the fp32 inner solver once -------------------------------
    M = None
    if grid is not None:
        from conjugategradient_tpu.core.formats import StencilMatrix
        from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy

        h = hierarchy or build_hierarchy(
            A, grid, smoother=smoother, dtype=device_dtype, layout="stencil"
        )
        A_dev = (
            h.levels[0].A
            if h.levels
            else dia_to_stencil(A, tuple(grid)).device_put(device_dtype)
        )
        if matrix_dtype is not None and isinstance(A_dev, StencilMatrix):
            # narrow ONLY the operator legs; each leg*window product promotes
            # back to device_dtype, and the V-cycle stays at device_dtype
            A_dev = A_dev.astype(matrix_dtype)
        M = as_preconditioner(h)
        shape = tuple(grid)
    else:
        A_dev = A.device_put(matrix_dtype or device_dtype)
        shape = (n,)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

    max_it = min(8 * n, 1_000_000)
    # operator and preconditioner ride as pytree ARGUMENTS, and the jitted
    # inner programs are MODULE-CACHED on their static configuration (a
    # fresh jax.jit per call re-traces every pass — measured ~23 s/call of
    # pure tracing/lowering overhead on the flagship; see _jit_inner_*)
    prec = device_dtype == np.float32
    if M is not None:
        if deflation is None:
            solve_jit = _jit_inner_mg(inner, float(inner_tol), max_it, prec)
            solve = lambda r: solve_jit(h, A_dev, r)
        else:
            solve_jit = _jit_inner_mg_deflated(float(inner_tol), max_it, prec)
            solve = lambda r: solve_jit(h, A_dev, deflation, r)
    elif use_pallas and grid is None:
        from conjugategradient_tpu.ops.pallas_spmv import from_cm, plan_dia_cm, to_cm

        plan = plan_dia_cm(tuple(A.offsets), n)
        if deflation is None:
            solve_jit = _jit_inner_cm(inner, float(inner_tol), max_it, prec)

            def solve(r):  # r arrives flat; Krylov state stays column-major
                res = solve_jit(A_dev, to_cm(r.reshape(-1), plan))
                return dataclasses.replace(res, x=from_cm(res.x, plan))

        else:
            # deflation IN CM space: relayout the basis once per solve (a
            # permutation+pad is linear and inner-product-preserving, so the
            # Galerkin/projection algebra is unchanged) instead of the
            # iterate twice per iteration
            solve_jit = _jit_inner_cm_deflated(
                float(inner_tol), max_it, prec, tuple(A.offsets), n
            )
            solve = lambda r: solve_jit(A_dev, deflation, r.reshape(-1))
    else:
        if deflation is None:
            solve_jit = _jit_inner_plain(inner, float(inner_tol), max_it, prec)
            solve = lambda r: solve_jit(A_dev, r)
        else:
            solve_jit = _jit_inner_plain_deflated(float(inner_tol), max_it, prec)
            solve = lambda r: solve_jit(A_dev, deflation, r)

    def true_residual(x):
        r = b64 - oracle.spmv(A, x)
        rr = float(r @ r)
        return r, oracle.residual_norm(r, rr, rr0, norm)

    r0 = b64 - oracle.spmv(A, x)
    rr0 = float(r0 @ r0)

    history = []
    inner_total = 0
    stall_count = 0
    for outer in range(max_outer):
        r, res = true_residual(x)
        history.append(res)
        if res < tol:
            return RefineResult(x, outer, inner_total, res, True, history)
        if len(history) >= 2 and res > 0.9 * history[-2]:
            # no meaningful progress: the true-residual evaluation itself has
            # a noise floor ~ eps64 * |A| |x| sqrt(n); a tolerance below it is
            # unmeasurable in any precision.  Require TWO consecutive
            # no-progress passes before declaring the stall — a single slow
            # pass (a loose inner solve, a noisy fp64 evaluation) must not
            # abandon a legitimately converging refinement.
            stall_count += 1
            if stall_count >= 2:
                return RefineResult(x, outer, inner_total, res, False, history, stalled=True)
        else:
            stall_count = 0
        s = float(np.max(np.abs(r)))
        if s == 0.0:
            return RefineResult(x, outer, inner_total, 0.0, True, history)
        r_dev = jnp.asarray((r / s).astype(device_dtype)).reshape(shape)
        dres = solve(r_dev)
        # ONE batched readback per pass: separate int(iterations) /
        # np.asarray(x) reads each block on the serving tunnel's dispatch-
        # to-readback latency (measured ~2.5 s PER scalar read on the
        # flagship — 10 of the 13.5 s warm wall time were four iteration
        # counts and their paired solution reads)
        d_host, it_host = jax.device_get((dres.x, dres.iterations))
        inner_total += int(it_host)
        x = x + s * np.asarray(d_host, dtype=np.float64).reshape(-1)

    r, res = true_residual(x)
    history.append(res)
    if raise_on_divergence and res >= tol:
        raise NotConvergedError(
            f"iterative refinement: {max_outer} outer passes, residual {res:.3e}"
        )
    return RefineResult(x, max_outer, inner_total, res, res < tol, history)


def _refined_solve_device(
    A: DiaMatrix,
    b: np.ndarray,
    x0: Optional[np.ndarray] = None,
    tol: float = 1e-8,
    norm: str = "l2",
    grid: Optional[Tuple[int, ...]] = None,
    inner_tol: float = 1e-5,
    max_outer: int = 40,
    device_dtype=np.float32,
    hierarchy=None,
    smoother: str = "chebyshev",
    raise_on_divergence: bool = False,
    use_pallas: Optional[bool] = None,
    matrix_dtype=None,
    deflation=None,
    inner: str = "cg",
) -> RefineResult:
    """Device-resident refinement: the outer loop's fp64 work (residual,
    norm, scaling, update) runs on chip in double-float arithmetic.
    ``inner="bicgstab"`` drives nonsymmetric inner solves (the dd residual
    pass is symmetry-agnostic; deflation stays CG-only).

    Two device programs per outer pass — ``resid`` (dd residual + norms +
    scaled fp32 residual, which never leaves the device) and ``update``
    (inner Krylov solve + dd solution update) — with three scalar readbacks
    between them, so the host skips the final pass's inner solve exactly
    like the host-residual loop does.  The solution lives on device as an
    fp32 (hi, lo) pair and is read back once, at the end.
    """
    import jax
    import jax.numpy as jnp

    from conjugategradient_tpu.ops import dd

    if inner not in ("cg", "bicgstab"):
        raise ValueError(f"unknown inner {inner!r}; want cg|bicgstab")
    if inner == "bicgstab" and deflation is not None:
        raise ValueError("deflation requires inner='cg' (SPD construction)")
    if np.dtype(device_dtype) != np.float32:
        raise ValueError("device_residual requires device_dtype=float32 "
                         "(dd pairs are fp32 hi/lo)")
    n = A.n
    b64 = np.asarray(b, dtype=np.float64)
    x64 = np.zeros(n) if x0 is None else np.asarray(x0, dtype=np.float64)

    # --- dd operator + inner fp32 solver, both as pytree arguments --------
    M = None
    if grid is not None:
        from conjugategradient_tpu.core.formats import (
            StencilMatrix,
            stencil_to_const,
        )
        from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy

        h = hierarchy or build_hierarchy(
            A, grid, smoother=smoother, dtype=device_dtype, layout="stencil"
        )
        A_dev = (
            h.levels[0].A
            if h.levels
            else dia_to_stencil(A, tuple(grid)).device_put(device_dtype)
        )
        if matrix_dtype is not None and isinstance(A_dev, StencilMatrix):
            A_dev = A_dev.astype(matrix_dtype)
        M = as_preconditioner(h)
        shape = tuple(grid)
        st64 = dia_to_stencil(A, tuple(grid))
        ddm = dd.dd_split_matrix(stencil_to_const(st64) or st64)
    else:
        A_dev = A.device_put(matrix_dtype or device_dtype)
        shape = (n,)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        ddm = dd.dd_split_matrix(A)

    max_it = min(8 * n, 1_000_000)
    resid = _jit_dd_resid()
    # the jitted update programs are MODULE-CACHED (see _jit_inner_*); the
    # (d_ is None) branch inside resolves at TRACE time — None is an empty
    # pytree, so undeflated programs carry no dead deflation branches
    if M is not None:
        update = _jit_dd_update("mg", inner, float(inner_tol), max_it, (), 0)
        update_args = lambda: (h, A_dev, deflation)
    elif use_pallas and grid is None:
        update = _jit_dd_update("cm", inner, float(inner_tol), max_it,
                                tuple(A.offsets), n)
        update_args = lambda: (A_dev, deflation)
    else:
        update = _jit_dd_update("plain", inner, float(inner_tol), max_it, (), 0)
        update_args = lambda: (A_dev, deflation)

    import time as _time

    t0 = _time.perf_counter()
    b_dd = dd.dd_from_f64(b64.reshape(shape))
    # zero initial guess: build the dd pair ON DEVICE — dd_from_f64 of the
    # host zeros ships 2 full fp32 arrays of zeros through the (slow) tunnel
    # (132 MB at 255^3, measured as a visible slice of the refined wall)
    x_dd = (
        dd.dd_zeros(shape, dtype=np.float32)
        if x0 is None
        else dd.dd_from_f64(x64.reshape(shape))
    )
    jax.block_until_ready((b_dd, x_dd))
    input_s = _time.perf_counter() - t0

    res = run_device_refinement(
        lambda b_, x_: resid(ddm, b_, x_),
        lambda x_, r32, s: update(*update_args(), x_, r32, s),
        b_dd, x_dd, tol=tol, norm=norm, max_outer=max_outer,
        raise_on_divergence=raise_on_divergence,
    )
    res.timings = dict(res.timings or {}, input_s=round(input_s, 3))
    return res


def run_device_refinement(
    resid_fn,
    update_fn,
    b_dd,
    x_dd,
    tol: float,
    norm: str,
    max_outer: int,
    raise_on_divergence: bool = False,
) -> RefineResult:
    """THE device-resident refinement outer loop, written once (shared by
    ``_refined_solve_device`` and the mesh-partitioned
    ``parallel.gspmd.gspmd_refined_solve``).

    ``resid_fn(b_dd, x_dd) -> (r32_scaled, rr, mx)`` — one device program:
    dd residual, dd norm², max-abs, and the inf-norm-scaled fp32 residual
    (which never leaves the device).  ``update_fn(x_dd, r32, s) -> (x_dd,
    inner_its)`` — inner Krylov solve + dd solution update.  Per pass:
    three scalar readbacks (rr, mx, its); the dd solution pair is read back
    once, at the end.  Convergence/stall policy: 2 consecutive <10%-
    reduction passes declare ``stalled`` (the fp64-evaluation noise floor).
    """
    import jax.numpy as jnp

    from conjugategradient_tpu.ops import dd

    def res_of(rr, mx, rr0):
        if norm == "l2":
            return float(np.sqrt(max(rr, 0.0)))
        if norm == "linf":
            return float(mx)
        if norm == "rel_l2":
            return float(np.sqrt(max(rr, 0.0) / (rr0 if rr0 > 0 else 1.0)))
        raise ValueError(f"unknown norm {norm!r}")

    import time as _time

    t_loop0 = _time.perf_counter()

    def finish(x_dd, outer, inner_total, res, converged, history, stalled=False):
        exec_s = _time.perf_counter() - t_loop0
        t0 = _time.perf_counter()
        x = dd.dd_to_f64(x_dd).reshape(-1)
        output_s = _time.perf_counter() - t0
        if raise_on_divergence and not converged:
            raise NotConvergedError(
                f"iterative refinement: {outer} outer passes, residual {res:.3e}"
            )
        return RefineResult(x, outer, inner_total, res, converged, history,
                            stalled=stalled,
                            timings={"exec_s": round(exec_s, 3),
                                     "output_s": round(output_s, 3)})

    history: list = []
    inner_total = 0
    stall_count = 0
    rr0 = None
    res = float("inf")
    import jax as _jax

    its_pending = None  # previous pass's inner-iteration count (device)
    for outer in range(max_outer):
        r32, rr_a, mx_a = resid_fn(b_dd, x_dd)
        # ONE batched readback per pass — separate float()/int() calls each
        # pay the serving tunnel's dispatch-to-readback latency (measured
        # ~2.5 s PER scalar on the flagship); the previous pass's iteration
        # count rides along instead of blocking right after its update
        got = _jax.device_get(
            (rr_a, mx_a) if its_pending is None else (rr_a, mx_a, its_pending)
        )
        rr, mx = float(got[0]), float(got[1])
        if its_pending is not None:
            inner_total += int(got[2])
            its_pending = None
        if rr0 is None:
            rr0 = rr
        res = res_of(rr, mx, rr0)
        history.append(res)
        if res < tol:
            return finish(x_dd, outer, inner_total, res, True, history)
        if len(history) >= 2 and res > 0.9 * history[-2]:
            stall_count += 1
            if stall_count >= 2:
                return finish(x_dd, outer, inner_total, res, False, history,
                              stalled=True)
        else:
            stall_count = 0
        if mx == 0.0:
            return finish(x_dd, outer, inner_total, 0.0, True, history)
        x_dd, its = update_fn(x_dd, r32, jnp.float32(mx))
        its_pending = its  # read with the NEXT pass's batch

    _, rr_a, mx_a = resid_fn(b_dd, x_dd)
    got = _jax.device_get(
        (rr_a, mx_a) if its_pending is None else (rr_a, mx_a, its_pending)
    )
    if its_pending is not None:
        inner_total += int(got[2])
    res = res_of(float(got[0]), float(got[1]), rr0 if rr0 is not None else 1.0)
    history.append(res)
    return finish(x_dd, max_outer, inner_total, res, res < tol, history)


@dataclasses.dataclass
class RefineMultiResult:
    x: np.ndarray  # (n, k) fp64 solutions
    outer_iterations: int
    inner_iterations: np.ndarray  # (k,) total device iterations per column
    residual: np.ndarray  # (k,) true fp64 residuals (selected norm)
    converged: np.ndarray  # (k,) bool
    history: list  # (k,) residual array after each outer pass
    stalled: np.ndarray  # (k,) bool — column hit the fp64 noise floor


def refined_solve_multi(
    A: DiaMatrix,
    B: np.ndarray,
    X0: Optional[np.ndarray] = None,
    tol: float = 1e-8,
    norm: str = "l2",
    grid: Optional[Tuple[int, ...]] = None,
    inner_tol: float = 1e-5,
    max_outer: int = 40,
    device_dtype=np.float32,
    hierarchy=None,
    smoother: str = "chebyshev",
    use_pallas: Optional[bool] = None,
    matrix_dtype=None,
) -> RefineMultiResult:
    """Multi-RHS iterative refinement: solve A X = B, B of shape (n, k), to
    an fp64 tolerance with fp32 block-CG inner solves.

    The outer loop is the single-RHS recurrence per column (fp64 host
    residual, per-column inf-norm scaling, 2-consecutive-pass stall rule),
    but every inner solve is ONE device program over the whole block
    (``cg_solve_multi``): the matrix streams once per iteration for all k
    columns, so the dominant HBM traffic of the refinement is amortised
    k-fold exactly as in the unrefined block solver.  Grid path: multi-RHS
    MGCG (``as_multi_preconditioner``); gridless TPU path: the column-major
    multi-RHS Pallas kernel.  Converged/stalled columns are frozen — their
    residual columns enter the inner solve as exact zeros (the block solver
    retires them on the spot) and their updates are masked host-side.

    fp64-contract analogue of the reference's flagship tolerance
    (``Mgcg/cuBlas/Mgcg/MgcgMain.cs:29``) for right-hand-side blocks the
    reference never supported.
    """
    import jax
    import jax.numpy as jnp

    n = A.n
    B64 = np.asarray(B, dtype=np.float64)
    if B64.ndim != 2 or B64.shape[0] != n:
        raise ValueError(f"B must be (n, k) = ({n}, k), got {B64.shape}")
    k = B64.shape[1]
    X = (
        np.zeros((n, k))
        if X0 is None
        else np.asarray(X0, dtype=np.float64).reshape(n, k).copy()
    )

    # --- build the fp32 block inner solver once --------------------------
    if grid is not None:
        from conjugategradient_tpu.core.formats import StencilMatrix
        from conjugategradient_tpu.precond import build_hierarchy

        h = hierarchy or build_hierarchy(
            A, grid, smoother=smoother, dtype=device_dtype, layout="stencil"
        )
        A_dev = (
            h.levels[0].A
            if h.levels
            else dia_to_stencil(A, tuple(grid)).device_put(device_dtype)
        )
        if matrix_dtype is not None and isinstance(A_dev, StencilMatrix):
            A_dev = A_dev.astype(matrix_dtype)
    else:
        A_dev = A.device_put(matrix_dtype or device_dtype)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

    max_it = min(8 * n, 1_000_000)
    # hierarchy/operator ride as pytree ARGUMENTS, never closure constants;
    # the jitted programs are MODULE-CACHED (see _jit_inner_* rationale)
    if grid is not None:
        solve_jit = _jit_multi_mg(float(inner_tol), max_it)
        solve = lambda R: solve_jit(h, A_dev, R)
    else:
        solve_jit = _jit_multi_plain(float(inner_tol), max_it, bool(use_pallas))
        solve = lambda R: solve_jit(A_dev, R)

    def spmm64(X):
        return np.stack([oracle.spmv(A, X[:, j]) for j in range(k)], axis=1)

    R0 = B64 - spmm64(X)
    rr0 = np.sum(R0 * R0, axis=0)

    def col_norms(R):
        rr = np.sum(R * R, axis=0)
        if norm == "l2":
            return np.sqrt(rr)
        if norm == "linf":
            return np.abs(R).max(axis=0) if R.size else np.zeros(k)
        if norm == "rel_l2":
            return np.sqrt(rr / np.where(rr0 > 0, rr0, 1.0))
        raise ValueError(f"unknown norm {norm!r}")

    history: list = []
    inner_total = np.zeros(k, dtype=np.int64)
    stall_count = np.zeros(k, dtype=np.int64)
    stalled = np.zeros(k, dtype=bool)
    res = col_norms(R0)
    outer = 0
    for outer in range(max_outer):
        R = B64 - spmm64(X)
        res = col_norms(R)
        history.append(res)
        conv = res < tol
        if len(history) >= 2:
            no_progress = res > 0.9 * history[-2]
            stall_count = np.where(no_progress, stall_count + 1, 0)
            stalled = stalled | ((stall_count >= 2) & ~conv)
        active = ~conv & ~stalled
        if not active.any():
            return RefineMultiResult(
                X, outer, inner_total, res, conv, history, stalled
            )
        # per-column inf-norm scaling keeps every fp32 column in range;
        # frozen columns enter as exact-zero residuals (retired instantly)
        s = np.abs(R).max(axis=0)
        s = np.where(active & (s > 0), s, 1.0)
        Rs = np.where(active[None, :], R / s[None, :], 0.0)
        dres = solve(jnp.asarray(Rs.astype(device_dtype)))
        # one batched readback per pass (separate reads each pay the
        # tunnel's dispatch-to-readback latency; see run_device_refinement)
        D_host, its_host = jax.device_get((dres.x, dres.iterations))
        inner_total += np.where(active, np.asarray(its_host), 0)
        D = np.asarray(D_host, dtype=np.float64)
        X = X + np.where(active[None, :], s[None, :], 0.0) * D

    R = B64 - spmm64(X)
    res = col_norms(R)
    history.append(res)
    return RefineMultiResult(
        X, max_outer, inner_total, res, res < tol, history, stalled
    )
