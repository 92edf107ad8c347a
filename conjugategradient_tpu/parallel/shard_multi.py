"""Explicit ``shard_map`` multi-RHS MGCG: block CG over row shards.

Completes the multi-RHS story (``solvers/multi.py``, not in the reference —
single-RHS throughout) for the explicit-collective distributed design: the
GSPMD path shards ``cg_solve_multi`` automatically; this module hand-places
the collectives, mirroring ``parallel.shard_mgcg`` with a trailing RHS axis:

- the sharded stencil SpMM pads only the *grid* axes — one ``ppermute`` pair
  moves halo slabs carrying all ``k`` columns at once, so the per-iteration
  collective count is independent of ``k`` (the whole point of multi-RHS:
  one matrix pass and one halo exchange serve k Krylov recurrences);
- per-column dots are local grid-axis reductions followed by ONE ``psum`` of
  a (k,)-vector — k scalars ride a single collective;
- the V-cycle preconditioner reuses the sharded transfers of
  ``shard_mgcg`` (they index leading axes only, so a trailing column axis
  broadcasts through untouched) and the replicated coarse tail runs the
  single-device ``v_cycle`` vmapped over columns;
- per-column convergence: converged columns freeze via masked updates, the
  loop exits when all are done (same semantics as ``cg_solve_multi``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from conjugategradient_tpu.core.generators import LinearSystem
from conjugategradient_tpu.parallel.shard_mgcg import (
    _prep_shard_hierarchy,
    prolong_hybrid_shard,
    restrict_hybrid_shard,
)
from conjugategradient_tpu.precond import transfer
from conjugategradient_tpu.precond.multigrid import _SA_W, MgHierarchy, v_cycle
from conjugategradient_tpu.precond.smoothers import chebyshev_smooth, jacobi_smooth
from conjugategradient_tpu.solvers.cg import _safe_div
from conjugategradient_tpu.solvers.multi import MultiCGResult
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def spmm_stencil_shard(data_l, shifts, X, halo0: int, axis: str, num: int):
    """Local rows of a stencil SpMM on an axis-0 row block.

    ``X`` is this shard's ``(g0/num, *rest, k)`` block — only the first
    ``len(shifts[0])`` axes are grid axes; the trailing column axis rides
    along (halo slabs included: one ppermute pair carries all k columns)."""
    d = len(shifts[0])
    if halo0 > 0:
        fwd = [(i, (i + 1) % num) for i in range(num)]
        bwd = [(i, (i - 1) % num) for i in range(num)]
        left = jax.lax.ppermute(X[-halo0:], axis, fwd)
        right = jax.lax.ppermute(X[:halo0], axis, bwd)
        xp = jnp.concatenate([left, X, right], axis=0)
    else:
        xp = X
    halos = [max(abs(s[ax]) for s in shifts) for ax in range(d)]
    pad = [(0, 0)] + [(halos[ax], halos[ax]) for ax in range(1, d)] + [(0, 0)] * (X.ndim - d)
    xp = jnp.pad(xp, pad)
    n0 = X.shape[0]
    y = None
    for k, shift in enumerate(shifts):
        sl = (slice(halo0 + shift[0], halo0 + shift[0] + n0),) + tuple(
            slice(halos[ax] + shift[ax], halos[ax] + shift[ax] + X.shape[ax])
            for ax in range(1, d)
        )
        term = data_l[k][..., None] * xp[sl]
        y = term if y is None else y + term
    return y


def _restrict_agg_multi(v, d: int):
    """Aggregation restriction over the first ``d`` (grid) axes only."""
    for ax in range(d):
        v = jnp.moveaxis(transfer._restrict_agg_axis(jnp.moveaxis(v, ax, -1)), -1, ax)
    return v


def _prolong_agg_multi(e, fine, d: int):
    for ax in range(d):
        e = jnp.moveaxis(transfer._prolong_agg_axis(jnp.moveaxis(e, ax, -1), fine[ax]), -1, ax)
    return e


def _restrict_fw_multi(v, d: int):
    for ax in range(d):
        v = jnp.moveaxis(transfer._restrict_axis(jnp.moveaxis(v, ax, -1)), -1, ax)
    return v


def _prolong_fw_multi(e, fine, d: int):
    for ax in range(d):
        e = jnp.moveaxis(transfer._prolong_axis(jnp.moveaxis(e, ax, -1), fine[ax]), -1, ax)
    return e


def make_shard_multi_mgcg(
    system: LinearSystem,
    B,
    grid,
    mesh: Mesh,
    policy: ConvergencePolicy = ConvergencePolicy(),
    axis: str = "x",
    smoother: str = "chebyshev",
    pre: int = 2,
    post: int = 2,
    dtype=None,
    hierarchy: Optional[MgHierarchy] = None,
):
    """Build a jitted explicit-collective multi-RHS MGCG solver.

    ``B`` is ``(n, k)``.  Returns ``(solve, (B_dev, X0_dev))`` with
    ``solve(B, X0) -> MultiCGResult`` (x of shape ``(n, k)``); all hierarchy
    arrays ride as sharded jit arguments.
    """
    grid = tuple(grid)
    d = len(grid)
    dt = dtype or np.asarray(system.A.data).dtype
    B = np.asarray(B, dtype=dt)
    n, k = B.shape
    if n != int(np.prod(grid)):
        raise ValueError(f"B rows {n} != prod(grid) {int(np.prod(grid))}")
    h, n_sharded, metas, datas, invds, weights, masks, rep_h, put = _prep_shard_hierarchy(
        system.A, grid, mesh, axis, smoother, pre, post, dt, hierarchy
    )
    num = mesh.shape[axis]
    grid_axes = tuple(range(d))

    B_dev = put(B.reshape(grid + (k,)), P(axis))
    X0_dev = put(np.zeros_like(B).reshape(grid + (k,)), P(axis))

    tol = jnp.asarray(policy.tol, dt)
    min_iter = jnp.int32(policy.min_iteration)
    max_iter = jnp.int32(policy.resolve_max(n))

    def local_solve(datas_, invds_, weights_, masks_, rep_h_, B_l, X0_l):
        def make_op(level):
            m = metas[level]
            return lambda V: spmm_stencil_shard(
                datas_[level], m["shifts"], V, m["halo0"], axis, num
            )

        def smooth(op, invd_l, mask_l, m, b, x, sweeps, post_sweep=False):
            if sweeps <= 0:
                return x
            iv = invd_l[..., None]
            if h.smoother == "chebyshev":
                lo, hi = m["bounds"]
                return chebyshev_smooth(op, iv, b, x, sweeps, hi, lo)
            if h.smoother == "rbgs":
                from conjugategradient_tpu.precond.smoothers import (
                    redblack_gs_smooth,
                    redblack_gs_smooth_reversed,
                )

                fn = redblack_gs_smooth_reversed if post_sweep else redblack_gs_smooth
                # the (grid...) mask broadcasts over the trailing RHS axis
                return fn(op, iv, b, x, sweeps, mask_l[..., None])
            return jacobi_smooth(op, iv, b, x, sweeps, h.omega)

        def v_local(level, r):
            if level == n_sharded:
                r_g = jax.lax.all_gather(r, axis, axis=0, tiled=True)
                e_g = jax.vmap(lambda rr: v_cycle(rep_h_, rr), in_axes=-1, out_axes=-1)(r_g)
                n0_l = r.shape[0]
                start = jax.lax.axis_index(axis) * n0_l
                return jax.lax.dynamic_slice_in_dim(e_g, start, n0_l, axis=0)
            m = metas[level]
            op = make_op(level)
            invd_l = invds_[level]
            mask_l = masks_[level]
            x = jnp.zeros_like(r)
            x = smooth(op, invd_l, mask_l, m, r, x, h.pre)
            res = r - op(x)
            if m["kind"] == "agg" and m["sa_smooth"]:
                c = _SA_W / m["bounds"][1]
                W_l = weights_[level][..., None]
                iv = invd_l[..., None]
                rc = _restrict_agg_multi(W_l * (res - c * op(iv * res)), d)
                ec = v_local(level + 1, rc)
                w = W_l * _prolong_agg_multi(ec, r.shape[:d], d)
                x = x + (w - c * (iv * op(w)))
            elif m["kind"] == "agg":
                W_l = weights_[level][..., None]
                rc = _restrict_agg_multi(W_l * res, d)
                ec = v_local(level + 1, rc)
                x = x + W_l * _prolong_agg_multi(ec, r.shape[:d], d)
            elif m["kind"] == "hyb":
                # leading-axis-only indexing: the trailing column axis rides
                # through the sharded cc/fw transfers untouched
                rc = restrict_hybrid_shard(res, m["grid"], axis, num)
                ec = v_local(level + 1, rc)
                x = x + prolong_hybrid_shard(ec, m["grid"], axis, num)
            elif m["kind"].startswith("semi"):
                # axis 0 unmasked (_shardable): partial per-axis transfers
                # are shard-local; the trailing column axis rides through
                # (partial_kinds zips the d-entry mask, ignoring axis d)
                from conjugategradient_tpu.precond.multigrid import _semi_mask

                smask = _semi_mask(m["kind"])
                rc = transfer.restrict_partial_grid(res, smask)
                ec = v_local(level + 1, rc)
                x = x + transfer.prolong_partial_grid(ec, res.shape[:d] , smask)
            else:  # num == 1 fallback: plain full weighting, fully local
                rc = _restrict_fw_multi(res, d)
                ec = v_local(level + 1, rc)
                x = x + _prolong_fw_multi(ec, r.shape[:d], d)
            x = smooth(op, invd_l, mask_l, m, r, x, h.post, post_sweep=True)
            return x

        op0 = make_op(0)
        M = lambda R: v_local(0, R)

        def cdot(U, V):  # (k,): one psum carries all k partial dots
            return jax.lax.psum(jnp.sum(U * V, axis=grid_axes), axis)

        X = X0_l
        R = B_l - op0(X)
        Z = M(R)
        Pdir = Z
        rz = cdot(R, Z)
        rr = cdot(R, R)
        rr0 = rr

        def res_of(R, rr):
            if policy.norm == "l2":
                return jnp.sqrt(rr)
            if policy.norm == "linf":
                return jax.lax.pmax(jnp.max(jnp.abs(R), axis=grid_axes), axis)
            if policy.norm == "rel_l2":
                return jnp.sqrt(rr / jnp.where(rr0 == 0, 1.0, rr0))
            raise ValueError(policy.norm)

        def active_of(R, rr, it):
            res = res_of(R, rr)
            return jnp.logical_and(
                jnp.logical_or(it < min_iter, res >= tol), it < max_iter
            )

        def cond(state):
            X, R, Pd, rz, rr, it = state
            return jnp.any(active_of(R, rr, it))

        def body(state):
            X, R, Pd, rz, rr, it = state
            active = active_of(R, rr, it)  # (k,) — replicated across shards
            AP = op0(Pd)
            alpha = jnp.where(active, _safe_div(rz, cdot(Pd, AP)), 0.0)
            X = X + alpha * Pd
            R2 = R - alpha * AP
            Z2 = M(R2)
            rz2 = cdot(R2, Z2)
            rr2 = cdot(R2, R2)
            beta = jnp.where(active, _safe_div(rz2, rz), 0.0)
            P2 = jnp.where(active, Z2 + beta * Pd, Pd)
            rz2 = jnp.where(active, rz2, rz)
            rr2 = jnp.where(active, rr2, rr)
            R2 = jnp.where(active, R2, R)
            return (X, R2, P2, rz2, rr2, it + active.astype(jnp.int32))

        X, R, Pd, rz, rr, it = jax.lax.while_loop(
            cond, body, (X, R, Pdir, rz, rr, jnp.zeros(k, jnp.int32))
        )
        res = res_of(R, rr)
        converged = jnp.logical_and(res < tol, it >= min_iter)
        return MultiCGResult(x=X, iterations=it, residual=res, converged=converged)

    rep_specs = jax.tree.map(lambda _: P(), rep_h)
    in_specs = (
        tuple(P(None, axis) for _ in datas),
        tuple(P(axis) for _ in invds),
        tuple(P(axis) if w is not None else None for w in weights),
        tuple(P(axis) if mk is not None else None for mk in masks),
        rep_specs,
        P(axis),
        P(axis),
    )
    shard_fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=MultiCGResult(x=P(axis), iterations=P(), residual=P(), converged=P()),
    )
    jitted = jax.jit(shard_fn)

    def solve(B_, X0_):
        res = jitted(datas, invds, weights, masks, rep_h, B_, X0_)
        return MultiCGResult(
            x=res.x.reshape(n, k),
            iterations=res.iterations,
            residual=res.residual,
            converged=res.converged,
        )

    solve.jitted = jitted
    solve.lower_args = (datas, invds, weights, masks, rep_h, B_dev, X0_dev)
    return solve, (B_dev, X0_dev)


def shard_multi_mgcg_solve(
    system: LinearSystem,
    B,
    grid,
    mesh: Optional[Mesh] = None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    X0=None,
    **kw,
) -> MultiCGResult:
    """One-call convenience: build, place, solve A X = B for all columns."""
    import jax
    from jax.sharding import NamedSharding

    if mesh is None:
        from conjugategradient_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    solve, (B_dev, X0_dev) = make_shard_multi_mgcg(system, B, grid, mesh, policy, **kw)
    if X0 is not None:
        X0_dev = jax.device_put(
            jnp.asarray(np.asarray(X0, dtype=B_dev.dtype)).reshape(B_dev.shape),
            NamedSharding(mesh, P("x")),
        )
    return solve(B_dev, X0_dev)


def sharded_cg_multi_solve(
    A,
    B,
    X0=None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    mesh: Optional[Mesh] = None,
    axis: str = "x",
    dtype=None,
    method: str = "cg",
) -> MultiCGResult:
    """Row-block-sharded block CG for a flat DIA matrix, k right-hand sides.

    Fills the [multi-RHS x flat-band x distributed] cell: the halo-exchange
    SpMV (``parallel.halo``) is vmapped over the trailing column axis — the
    two ``ppermute``s move (halo, k) slabs, so the per-iteration collective
    count is independent of k — and the recurrence is ``cg_solve_multi``
    itself running inside ``shard_map`` with ONE (k,)-psum per dot
    (``psum_axis``; no third copy of the block recurrence).
    ``method="bicgstab"`` swaps in ``bicgstab_solve_multi`` — the NONSYM
    block recurrence over the same vmapped halo SpMV and (k,)-psum dots.
    """
    from jax.sharding import NamedSharding

    from conjugategradient_tpu.core.formats import DiaMatrix
    from conjugategradient_tpu.parallel.halo import (
        spmv_dia_allgather,
        spmv_dia_local_overlap,
    )
    from conjugategradient_tpu.solvers.multi import cg_solve_multi

    if not isinstance(A, DiaMatrix):
        raise TypeError("sharded_cg_multi_solve wants a DiaMatrix")
    if mesh is None:
        from conjugategradient_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis=axis)
    num = mesh.shape[axis]
    n = A.n
    if n % num:
        raise ValueError(f"n={n} not divisible by {num} shards; pad_system first")
    n_local = n // num
    halo = A.bandwidth
    offsets = A.offsets
    use_allgather = halo > n_local
    dt = dtype or np.asarray(A.data).dtype

    def local_solve(data, B_l, X0_l):
        if use_allgather:
            base = lambda p: spmv_dia_allgather(data, offsets, p, axis, num)
        else:
            base = lambda p: spmv_dia_local_overlap(data, offsets, p, halo, axis, num)
        op = lambda P: jax.vmap(base, in_axes=1, out_axes=1)(P)
        if method == "bicgstab":
            from conjugategradient_tpu.solvers.multi import bicgstab_solve_multi

            return bicgstab_solve_multi(
                op, B_l, X0_l, policy, psum_axis=axis, n_global=n
            )
        return cg_solve_multi(op, B_l, X0_l, policy, psum_axis=axis, n_global=n)

    row2d = P(axis, None)
    shard_fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(P(None, axis), row2d, row2d),
        out_specs=MultiCGResult(x=row2d, iterations=P(), residual=P(), converged=P()),
    )
    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    data = put(np.asarray(A.data, dtype=dt), P(None, axis))
    B_d = put(np.asarray(B, dtype=dt), row2d)
    X0_a = np.zeros_like(np.asarray(B, dtype=dt)) if X0 is None else np.asarray(X0, dtype=dt)
    X0_d = put(X0_a, row2d)
    return jax.jit(shard_fn)(data, B_d, X0_d)
