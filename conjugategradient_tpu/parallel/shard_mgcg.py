"""Explicit ``shard_map`` MGCG: hand-placed per-level halo collectives.

The flagship distributed design — the re-design of the reference's
hand-orchestrated multi-GPU path (``ConjugateGradientParallelGpu.cs:424-565``)
— covered plain/Jacobi CG in round 1; the multigrid V-cycle was GSPMD-only.
This module distributes the V-cycle itself with explicit collectives:

- each *sharded* level runs on row blocks of the grid's leading axis; its
  stencil SpMV exchanges a ``halo0``-wide slab with ring neighbors
  (``ppermute``) exactly like the CG-level SpMV — one pair of permutes per
  operator application, nothing else;
- smoothers (Jacobi / Chebyshev / red-black Gauss-Seidel) are pointwise +
  SpMV, so they inherit the sharded operator unchanged — rbgs masks are
  parity-of-global-index, so the row-sharded slice of the host mask IS each
  shard's checkerboard, and each half-sweep pays the usual halo pair;
- smoothed-aggregation transfers are *communication-free*: aggregates are
  index pairs along each axis, and a shard whose local extent is even never
  owns half an aggregate — restriction/prolongation stay local (the SA
  smoothing term ``(I - c D^{-1}A)`` reuses the halo SpMV);
- hybrid fw/cell-centered transfers (``transfer_kind="hyb"``, the default
  for even grids — ~2x fewer MGCG iterations than aggregation) exchange ONE
  boundary element along the sharded axis per restrict/prolong (a 1-element
  ``ppermute`` pair), since cc interpolation couples adjacent cells across
  the pair boundary;
- coarse levels whose leading axis stops dividing the mesh switch to
  *replicated*: one ``all_gather`` of the restricted residual, the standard
  single-device ``v_cycle`` below (zero collectives), and a local slice of
  the correction on the way back up.  Coarse grids are tiny by construction,
  so this costs one small gather per V-cycle.

Collective budget per MGCG iteration (vs GSPMD's partitioner-derived
schedule): 2 ``ppermute`` per sharded-level SpMV, 3 ``psum`` for the CG dots,
1 ``all_gather`` + nothing else at the sharded/replicated boundary.  See
``tests/test_shard_mgcg.py`` for the HLO collective-count comparison.

Sharding constraint: the fine grid's leading axis must divide the mesh with
an *even* local extent (smoothed aggregation halves axes, so power-of-two
extents shard cleanly: 128 -> 64 -> 32 ...).  Odd (2^k - 1) full-weighting
grids do not divide evenly — use ``parallel.gspmd`` there (XLA reshards and
replicates as needed).  SEMICOARSENED levels ("semiXX", auto-selected on
anisotropic operators) shard whenever axis 0 is not among the coarsened
axes (its transfer is then the identity — fully shard-local); levels that
coarsen axis 0 fall to the replicated tail.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from conjugategradient_tpu.core.formats import StencilMatrix
from conjugategradient_tpu.core.generators import LinearSystem
from conjugategradient_tpu.parallel.sharded_cg import sharded_cg_loop
from conjugategradient_tpu.precond import transfer
from conjugategradient_tpu.precond.multigrid import _SA_W, MgHierarchy, v_cycle
from conjugategradient_tpu.precond.smoothers import (
    chebyshev_smooth,
    jacobi_smooth,
    redblack_gs_smooth,
    redblack_gs_smooth_reversed,
)
from conjugategradient_tpu.solvers.cg import CGResult
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def spmv_stencil_shard(data_l, shifts, x, halo0: int, axis: str, num: int):
    """Local rows of a stencil SpMV on an axis-0 row block.

    ``x`` is this shard's ``(g0/num, *rest)`` block.  Axis 0 is padded with
    ring-neighbor slabs (two ``ppermute``), remaining axes with zeros; each
    leg is then a static slice — the sharded twin of ``ops.stencil.spmv_stencil``.
    Ring wraparound at the global edges lands on the legs' structural zeros
    (same masking contract as the DIA path, ``parallel.halo``).
    """
    ndim = x.ndim
    if halo0 > 0:
        fwd = [(i, (i + 1) % num) for i in range(num)]
        bwd = [(i, (i - 1) % num) for i in range(num)]
        left = jax.lax.ppermute(x[-halo0:], axis, fwd)  # left neighbor's tail
        right = jax.lax.ppermute(x[:halo0], axis, bwd)  # right neighbor's head
        xp = jnp.concatenate([left, x, right], axis=0)
    else:
        xp = x
    halos = [max(abs(s[ax]) for s in shifts) for ax in range(ndim)]
    pad = [(0, 0)] + [(halos[ax], halos[ax]) for ax in range(1, ndim)]
    xp = jnp.pad(xp, pad)
    n0 = x.shape[0]
    y = None
    for k, shift in enumerate(shifts):
        sl = (slice(halo0 + shift[0], halo0 + shift[0] + n0),) + tuple(
            slice(halos[ax] + shift[ax], halos[ax] + shift[ax] + x.shape[ax])
            for ax in range(1, ndim)
        )
        term = data_l[k] * xp[sl]
        y = term if y is None else y + term
    return y


def _cc0_halo(v, axis: str, num: int):
    """(left, right): ring neighbors' edge slabs (1 element) along the
    leading axis, zeroed at the global boundary — matching the zero padding
    of the unsharded cell-centered transfers (``transfer._restrict_cc_axis``).
    """
    if num == 1:
        z = jnp.zeros_like(v[:1])
        return z, z
    fwd = [(i, (i + 1) % num) for i in range(num)]
    bwd = [(i, (i - 1) % num) for i in range(num)]
    left = jax.lax.ppermute(v[-1:], axis, fwd)  # previous shard's last element
    right = jax.lax.ppermute(v[:1], axis, bwd)  # next shard's first element
    idx = jax.lax.axis_index(axis)
    left = jnp.where(idx == 0, 0.0, left)
    right = jnp.where(idx == num - 1, 0.0, right)
    return left, right


def _restrict_cc0_shard(v, axis: str, num: int):
    """Cell-centered restriction along the sharded leading axis:
    ``rc[J] = (3 v[2J] + 3 v[2J+1] + v[2J-1] + v[2J+2]) / 8`` on the local
    block — the two boundary terms cost one 1-element ppermute pair."""
    a = v[0::2]
    b = v[1::2]
    left, right = _cc0_halo(v, axis, num)
    lft = jnp.concatenate([left, b[:-1]], axis=0)  # v[2J-1]
    rgt = jnp.concatenate([a[1:], right], axis=0)  # v[2J+2]
    return (3.0 * (a + b) + lft + rgt) / 8.0


def _prolong_cc0_shard(e, axis: str, num: int):
    """Cell-centered prolongation along the sharded leading axis
    (exact transpose of ``_restrict_cc0_shard`` up to the 1/2 scaling)."""
    left, right = _cc0_halo(e, axis, num)
    lf = jnp.concatenate([left, e[:-1]], axis=0)  # ec[J-1]
    rt = jnp.concatenate([e[1:], right], axis=0)  # ec[J+1]
    even = (3.0 * e + lf) / 4.0
    odd = (3.0 * e + rt) / 4.0
    return jnp.stack([even, odd], axis=1).reshape((2 * e.shape[0],) + e.shape[1:])


def restrict_hybrid_shard(v, global_grid, axis: str, num: int):
    """Hybrid fw/cc restriction on an axis-0 row block.  Only axis 0 crosses
    shards (a sharded axis is even, hence cell-centered); the other axes run
    the local per-axis operators unchanged."""
    kinds = transfer.hybrid_kinds(global_grid)
    if kinds[0] == "cc":
        v = _restrict_cc0_shard(v, axis, num)
    else:  # odd axis 0 -> only reachable when num == 1
        v = jnp.moveaxis(transfer._restrict_axis(jnp.moveaxis(v, 0, -1)), -1, 0)
    for ax in range(1, len(kinds)):
        fn = transfer._restrict_axis if kinds[ax] == "fw" else transfer._restrict_cc_axis
        v = jnp.moveaxis(fn(jnp.moveaxis(v, ax, -1)), -1, ax)
    return v


def prolong_hybrid_shard(e, global_grid, axis: str, num: int):
    """Hybrid fw/cc prolongation onto an axis-0 row block of ``global_grid``."""
    kinds = transfer.hybrid_kinds(global_grid)
    if kinds[0] == "cc":
        e = _prolong_cc0_shard(e, axis, num)
    else:
        e = jnp.moveaxis(
            transfer._prolong_axis(jnp.moveaxis(e, 0, -1), global_grid[0]), -1, 0
        )
    for ax in range(1, len(kinds)):
        fn = transfer._prolong_axis if kinds[ax] == "fw" else transfer._prolong_cc_axis
        e = jnp.moveaxis(fn(jnp.moveaxis(e, ax, -1), global_grid[ax]), -1, ax)
    return e


def _shardable(lvl, num: int) -> bool:
    """A level runs sharded iff its leading axis splits evenly with an even
    local extent (aggregates/cc pairs must not straddle shards), its stencil
    halo fits in one neighbor hop, and its transfers are aggregation or
    hybrid (vertex-centered full weighting needs odd axes, which never
    divide an even mesh) — or SEMICOARSENING that leaves axis 0 alone
    (mask[0] False: the axis-0 transfer is the identity, so restriction/
    prolongation are fully shard-local and the even-local-extent pairing
    requirement does not apply).  Axis-0-coarsening semi levels fall to the
    replicated tail (reorder axes so the strong/coarsened axes trail, or
    use the GSPMD carrier)."""
    g0 = lvl.grid[0]
    if g0 % num:
        return False
    n_local = g0 // num
    halo0 = max((abs(s[0]) for s in lvl.A.shifts), default=0)
    if halo0 > n_local:
        return False
    if lvl.transfer.startswith("semi"):
        from conjugategradient_tpu.precond.multigrid import _semi_mask

        return num == 1 or not _semi_mask(lvl.transfer)[0]
    if num > 1 and lvl.transfer not in ("agg", "hyb"):
        return False
    return num == 1 or n_local % 2 == 0


def _prep_shard_hierarchy(
    A_dia,
    grid,
    mesh: Mesh,
    axis: str,
    smoother: str,
    pre: int,
    post: int,
    dt,
    hierarchy: Optional[MgHierarchy],
):
    """Shared setup for the explicit shard_map MGCG paths: build (or take)
    the hierarchy, expand constant-coefficient levels to grid legs, split it
    at the deepest shardable level, and pre-place every array on the mesh.

    Returns ``(h, n_sharded, metas, datas, invds, weights, masks, rep_h, put)``.
    """
    from conjugategradient_tpu.precond import build_hierarchy

    grid = tuple(grid)
    h = hierarchy or build_hierarchy(
        A_dia, grid, smoother=smoother, pre=pre, post=post, dtype=dt,
        layout="stencil",
    )
    # the explicit shard_map path needs grid-shaped legs (its per-level data
    # arrays are row-sharded); expand constant-coefficient levels back
    import dataclasses as _dc

    from conjugategradient_tpu.core.formats import ConstStencilMatrix, const_to_stencil

    expanded = []
    for lvl in h.levels:
        if isinstance(lvl.A, ConstStencilMatrix):
            inv_d = lvl.inv_diag
            if getattr(inv_d, "ndim", 1) == 0:
                inv_d = jnp.broadcast_to(inv_d, lvl.grid)
            lvl = _dc.replace(lvl, A=const_to_stencil(lvl.A).device_put(dt), inv_diag=inv_d)
        expanded.append(lvl)
    if expanded:
        h = MgHierarchy(tuple(expanded), h.coarse_inv, h.smoother, h.pre, h.post, h.omega)
    if not h.levels or not isinstance(h.levels[0].A, StencilMatrix):
        raise ValueError("make_shard_mgcg needs a stencil-layout hierarchy with >= 1 level")
    num = mesh.shape[axis]

    n_sharded = 0
    for lvl in h.levels:
        if _shardable(lvl, num):
            n_sharded += 1
        else:
            break
    if n_sharded == 0:
        raise ValueError(
            f"fine grid {grid} axis 0 does not shard over {num} devices "
            "(need even local extents and agg/hyb transfers, or "
            "semicoarsening that leaves axis 0 alone — reorder axes so the "
            "coarsened/strong axes trail); use parallel.gspmd"
        )

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    sh_levels = h.levels[:n_sharded]
    # static per-level metadata (trace-time constants)
    metas = [
        dict(
            shifts=lvl.A.shifts,
            grid=lvl.grid,
            halo0=max((abs(s[0]) for s in lvl.A.shifts), default=0),
            bounds=lvl.cheb_bounds,
            kind=lvl.transfer,
            sa_smooth=lvl.sa_smooth,
        )
        for lvl in sh_levels
    ]
    datas = tuple(put(lvl.A.data, P(None, axis)) for lvl in sh_levels)
    invds = tuple(put(lvl.inv_diag, P(axis)) for lvl in sh_levels)
    weights = tuple(
        put(lvl.weight, P(axis)) if lvl.weight is not None else None for lvl in sh_levels
    )
    # rbgs checkerboard masks: parity is a function of GLOBAL indices, so the
    # row-sharded slice of the host-built mask is exactly each shard's colors
    masks = tuple(
        put(lvl.mask, P(axis)) if lvl.mask is not None else None for lvl in sh_levels
    )
    rep_h = MgHierarchy(
        levels=tuple(h.levels[n_sharded:]),
        coarse_inv=h.coarse_inv,
        smoother=h.smoother,
        pre=h.pre,
        post=h.post,
        omega=h.omega,
    )
    rep_h = jax.device_put(rep_h)  # replicated (single-sharding default)
    return h, n_sharded, metas, datas, invds, weights, masks, rep_h, put


def make_shard_mgcg(
    system: LinearSystem,
    grid,
    mesh: Mesh,
    policy: ConvergencePolicy = ConvergencePolicy(),
    axis: str = "x",
    smoother: str = "chebyshev",
    pre: int = 2,
    post: int = 2,
    dtype=None,
    hierarchy: Optional[MgHierarchy] = None,
    variant: str = "cg",
):
    """Build a jitted explicit-collective MGCG solver over a 1-D mesh.

    Returns ``(solve, (b, x0))`` with ``solve(b, x0) -> CGResult`` (flat x),
    mirroring ``gspmd.make_gspmd_mgcg``.  All matrix/hierarchy arrays ride as
    sharded jit arguments (never closure constants).  ``variant`` selects the
    outer Krylov loop's communication structure (``sharded_cg_loop``):
    ``"cg1"``/``"pipelined"`` collapse the per-iteration scalar allreduces to
    one fused psum — with a V-cycle preconditioner each iteration is
    M-application-dominated, but on latency-bound (multi-host) meshes the
    saved allreduce still matters at small shard sizes.
    """
    grid = tuple(grid)
    dt = dtype or np.asarray(system.A.data).dtype
    h, n_sharded, metas, datas, invds, weights, masks, rep_h, put = _prep_shard_hierarchy(
        system.A, grid, mesh, axis, smoother, pre, post, dt, hierarchy
    )
    num = mesh.shape[axis]

    b_dev = put(np.asarray(system.b, dtype=dt).reshape(grid), P(axis))
    x0_dev = put(np.asarray(system.x0, dtype=dt).reshape(grid), P(axis))
    n = int(np.prod(grid))

    def _smooth_local(op, invd_l, mask_l, meta, b, x, sweeps, post_sweep=False):
        if sweeps <= 0:
            return x
        if h.smoother == "chebyshev":
            lo, hi = meta["bounds"]
            return chebyshev_smooth(op, invd_l, b, x, sweeps, hi, lo)
        if h.smoother == "rbgs":
            fn = redblack_gs_smooth_reversed if post_sweep else redblack_gs_smooth
            return fn(op, invd_l, b, x, sweeps, mask_l)
        return jacobi_smooth(op, invd_l, b, x, sweeps, h.omega)

    def local_solve(datas_, invds_, weights_, masks_, rep_h_, b_l, x0_l):
        def make_op(level):
            m = metas[level]
            return lambda v: spmv_stencil_shard(
                datas_[level], m["shifts"], v, m["halo0"], axis, num
            )

        def v_local(level, r):
            """Sharded V-cycle on local blocks; below ``n_sharded`` gathers
            once and runs the replicated tail."""
            if level == n_sharded:
                r_g = jax.lax.all_gather(r, axis, axis=0, tiled=True)
                e_g = v_cycle(rep_h_, r_g)
                n0_l = r.shape[0]
                start = jax.lax.axis_index(axis) * n0_l
                return jax.lax.dynamic_slice_in_dim(e_g, start, n0_l, axis=0)
            m = metas[level]
            op = make_op(level)
            invd_l = invds_[level]
            mask_l = masks_[level]
            x = jnp.zeros_like(r)
            x = _smooth_local(op, invd_l, mask_l, m, r, x, h.pre)
            res = r - op(x)
            if m["kind"] == "agg" and m["sa_smooth"]:
                c = _SA_W / m["bounds"][1]
                W_l = weights_[level]
                rc = transfer.restrict_agg_grid(W_l * (res - c * op(invd_l * res)))
                ec = v_local(level + 1, rc)
                w = W_l * transfer.prolong_agg_grid(ec, r.shape)
                x = x + (w - c * (invd_l * op(w)))
            elif m["kind"] == "agg":
                # plain weighted aggregation (sa_smooth=False, e.g. probed
                # hierarchies): transfers must match the UNsmoothed P the
                # coarse Galerkin products were built from
                W_l = weights_[level]
                rc = transfer.restrict_agg_grid(W_l * res)
                ec = v_local(level + 1, rc)
                x = x + W_l * transfer.prolong_agg_grid(ec, r.shape)
            elif m["kind"] == "hyb":
                # hybrid fw/cell-centered: the cc boundary terms along the
                # sharded axis cost one 1-element ppermute pair each way
                rc = restrict_hybrid_shard(res, m["grid"], axis, num)
                ec = v_local(level + 1, rc)
                x = x + prolong_hybrid_shard(ec, m["grid"], axis, num)
            elif m["kind"].startswith("semi"):
                # semicoarsening with axis 0 unmasked (the _shardable gate):
                # the axis-0 transfer is the identity, so the partial
                # per-axis operators are fully shard-local on local blocks
                from conjugategradient_tpu.precond.multigrid import _semi_mask

                smask = _semi_mask(m["kind"])
                rc = transfer.restrict_partial_grid(res, smask)
                ec = v_local(level + 1, rc)
                x = x + transfer.prolong_partial_grid(ec, r.shape, smask)
            else:  # num == 1 fallback: plain full weighting, fully local
                rc = transfer.restrict_grid(res)
                ec = v_local(level + 1, rc)
                x = x + transfer.prolong_grid(ec, r.shape)
            x = _smooth_local(op, invd_l, mask_l, m, r, x, h.post, post_sweep=True)
            return x

        op0 = make_op(0)
        res = sharded_cg_loop(
            op0, lambda r: v_local(0, r), b_l, x0_l, policy, axis, n, variant=variant
        )
        return CGResult(
            x=res.x,
            iterations=res.iterations,
            residual=res.residual,
            converged=res.converged,
        )

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
        out_specs=CGResult(x=P(axis), iterations=P(), residual=P(), converged=P()),
    )
    jitted = jax.jit(shard_fn)

    def solve(b, x0):
        res = jitted(datas, invds, weights, masks, rep_h, b, x0)
        return CGResult(
            x=res.x.reshape(-1),
            iterations=res.iterations,
            residual=res.residual,
            converged=res.converged,
        )

    solve.lower_args = (datas, invds, weights, masks, rep_h, b_dev, x0_dev)  # for HLO inspection
    solve.jitted = jitted
    return solve, (b_dev, x0_dev)


def shard_mgcg_solve(
    system: LinearSystem,
    grid,
    mesh: Optional[Mesh] = None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    **kw,
) -> CGResult:
    """One-call convenience: build, place, solve."""
    if mesh is None:
        from conjugategradient_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    solve, (b, x0) = make_shard_mgcg(system, grid, mesh, policy, **kw)
    return solve(b, x0)
