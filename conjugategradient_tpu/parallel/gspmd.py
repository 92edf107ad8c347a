"""GSPMD-partitioned solvers: the whole (MG)CG program jitted over a mesh.

Two distributed designs live in ``parallel``:

- ``sharded_cg`` — explicit ``shard_map``: hand-placed ``ppermute`` halos and
  ``psum`` dots, full control of the communication schedule (the re-design of
  the reference's hand-orchestrated multi-GPU path).
- this module — **GSPMD**: the solver (including the multigrid V-cycle, whose
  inter-level transfers make hand-sharding laborious) is written as plain
  jnp on global shapes, sharding is declared on the *data*, and XLA's SPMD
  partitioner derives the per-device program and inserts the collectives.
  This is the idiomatic JAX answer for complex programs — the analogue of the
  scaling-book recipe: pick a mesh, annotate shardings, let XLA do the rest.

The one formulation choice that makes GSPMD partition the banded SpMV with
*neighbor* communication instead of gathers: diagonal shifts are expressed as
``jnp.roll`` (cyclic), which partitions into a collective-permute of the
boundary slice.  Roll wraps around the global edges — and exactly there the
DIA ``data`` stores structural zeros (see ``core.formats.DiaMatrix``), so the
wrapped values are multiplied away.  Same masking trick as the ``shard_map``
path's ring halos, stated once in the storage format.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from conjugategradient_tpu.core.formats import DiaMatrix
from conjugategradient_tpu.ops.spmv import as_operator
from conjugategradient_tpu.core.generators import LinearSystem
from conjugategradient_tpu.solvers.cg import CGResult, cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def shard_system(
    system: LinearSystem, mesh: Mesh, axis: str = "x", dtype=None
):
    """Place A (DIA), b, x0 on the mesh row-sharded (replicate where the
    length does not divide the axis — XLA then reshards as needed)."""
    num = mesh.shape[axis]
    dt = dtype or np.asarray(system.A.data).dtype

    def put_vec(v):
        v = jnp.asarray(np.asarray(v, dtype=dt))
        spec = P(axis) if v.shape[0] % num == 0 else P()
        return jax.device_put(v, NamedSharding(mesh, spec))

    data = jnp.asarray(np.asarray(system.A.data, dtype=dt))
    dspec = P(None, axis) if data.shape[1] % num == 0 else P()
    A = DiaMatrix(
        jax.device_put(data, NamedSharding(mesh, dspec)),
        system.A.offsets,
        system.A.shape,
    )
    return A, put_vec(system.b), put_vec(system.x0)


def make_gspmd_mgcg(
    system: LinearSystem,
    grid,
    mesh: Mesh,
    policy: ConvergencePolicy = ConvergencePolicy(),
    axes=("x",),
    smoother: str = "chebyshev",
    pre: int = 2,
    post: int = 2,
    dtype=None,
    hierarchy=None,
    axis: str = None,
):
    """Build a jitted, mesh-partitioned MGCG solver.

    Returns ``(solve, inputs)`` where ``solve(b, x0) -> CGResult`` runs the
    full multigrid-preconditioned CG as one SPMD program.  ``axes`` names one
    mesh axis per *grid* axis to shard (e.g. ``("x",)`` = 1-D row blocks,
    ``("x", "y")`` = 2-D block partition over a 2-D mesh — each device owns a
    contiguous sub-block, halos become collective-permutes on both axes).
    Levels whose extents stop dividing the mesh fall back to replicated —
    they are tiny by construction.  ``inputs = (b, x0)`` pre-placed.
    """
    from conjugategradient_tpu.core.formats import StencilMatrix
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.precond.multigrid import MgHierarchy, MgLevel

    if axis is not None:  # back-compat alias
        axes = (axis,)
    axes = tuple(axes)
    dt = dtype or np.asarray(system.A.data).dtype
    h = hierarchy or build_hierarchy(
        system.A, grid, smoother=smoother, pre=pre, post=post, dtype=dt, layout="stencil"
    )

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))

    nd = len(grid)

    from conjugategradient_tpu.parallel.mesh import specs_for_grid

    def specs_for(g):
        # tiny/odd coarse levels replicate — they cost nothing
        return specs_for_grid(g, mesh, axes)

    import dataclasses as _dc

    from conjugategradient_tpu.core.formats import ConstStencilMatrix

    levels = []
    for lvl in h.levels:
        dspec, vspec = specs_for(lvl.grid)
        if isinstance(lvl.A, ConstStencilMatrix):
            # constant-coefficient level: coeffs are static metadata, no data
            A_sh = lvl.A
            ivspec = P() if getattr(lvl.inv_diag, "ndim", 0) == 0 else vspec
        else:
            A_sh = StencilMatrix(put(lvl.A.data, dspec), lvl.A.shifts, lvl.A.grid)
            ivspec = vspec
        levels.append(
            _dc.replace(
                lvl,
                A=A_sh,
                inv_diag=put(lvl.inv_diag, ivspec),
                mask=None if lvl.mask is None else put(lvl.mask, vspec),
                weight=None if lvl.weight is None else put(lvl.weight, vspec),
            )
        )
    h_sharded = MgHierarchy(
        levels=tuple(levels),
        coarse_inv=put(h.coarse_inv, P()),
        smoother=h.smoother,
        pre=h.pre,
        post=h.post,
        omega=h.omega,
    )

    dspec0, vspec0 = specs_for(tuple(grid))
    if h_sharded.levels:
        fine_A = h_sharded.levels[0].A
    else:
        # below max_coarse the hierarchy is just the direct solve; build the
        # fine stencil operator separately
        from conjugategradient_tpu.core.formats import dia_to_stencil

        st = dia_to_stencil(system.A, tuple(grid)).astype(dt)
        fine_A = StencilMatrix(put(st.data, dspec0), st.shifts, st.grid)
    b_dev = put(np.asarray(system.b, dtype=dt).reshape(grid), vspec0)
    x0_dev = put(np.asarray(system.x0, dtype=dt).reshape(grid), vspec0)

    # hierarchy + fine operator ride as jitted pytree ARGUMENTS — closure
    # constants ship inside the compile request (~600 MB / HTTP 413 measured
    # at 16M rows through the serving tunnel; see CLAUDE.md)
    @jax.jit
    def _solve(h_, A_, b, x0):
        from conjugategradient_tpu.precond.multigrid import v_cycle

        res = cg_solve(as_operator(A_, roll=True), b, x0, policy, M=lambda r: v_cycle(h_, r, roll=True))
        return CGResult(
            x=res.x.reshape(-1),
            iterations=res.iterations,
            residual=res.residual,
            converged=res.converged,
        )

    return lambda b, x0: _solve(h_sharded, fine_A, b, x0), (b_dev, x0_dev)


def gspmd_mgcg_solve(
    system: LinearSystem,
    grid,
    mesh: Optional[Mesh] = None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    **kw,
) -> CGResult:
    """One-call convenience: shard, jit, solve."""
    if mesh is None:
        from conjugategradient_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    solve, (b, x0) = make_gspmd_mgcg(system, grid, mesh, policy, **kw)
    return solve(b, x0)
