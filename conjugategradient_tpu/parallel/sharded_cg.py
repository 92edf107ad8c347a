"""Row-block-sharded CG over a device mesh — the flagship distributed solver.

TPU-native re-design of the reference's multi-GPU CG host
(``Mgcg/cuBlas/Mgcg/ConjugateGradientParallelGpu.cs:11-596``).  Its per
-iteration choreography was: host-threaded ``SyncP`` halo staging →
``Solve1`` fan-out (SpMV + partial p·Ap) → host allreduce alpha → ``Solve2``
fan-out (x,r update + partial r·r) → host allreduce → convergence check →
``Solve3`` fan-out (p = r + beta p), with 2x(deviceCount) staged halo copies
and 3x(deviceCount) scalar D2H reads per iteration (SURVEY.md §3.1 step 5).

Here the *entire solve* — halo exchange, SpMV, dots, convergence predicate,
iteration loop — is one jitted SPMD program under ``shard_map``:

- ``jax.lax.psum`` over the mesh axis replaces the host-side
  ``resultsDot.Sum()`` allreduce (``ConjugateGradientParallelGpu.cs:463,499,525``),
- ``jax.lax.ppermute`` neighbor shifts replace the staged P2Host/P2Device
  boundary copies,
- XLA program order inside the ``while_loop`` replaces the bulk-synchronous
  ``Parallel.For`` thread barriers,
- scalars (alpha, beta, residual, iteration count) are replicated on-device —
  zero host round-trips for any number of iterations or devices.

The same program runs on a single-host ICI mesh or a multi-host DCN-spanning
mesh; only the Mesh construction changes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from conjugategradient_tpu.core.formats import DiaMatrix
from conjugategradient_tpu.ops.blas import residual_norm as _residual_norm
from conjugategradient_tpu.parallel.halo import (
    halo_exchange,
    spmv_dia_allgather,
    spmv_dia_local,
    spmv_dia_local_overlap,
)
from conjugategradient_tpu.solvers.cg import CGResult, _safe_div
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _pdot(a, b, axis):
    # ravel: locals may be grid-shaped (the stencil MGCG path); for 1-D
    # inputs this is a no-op and lowers to the same fused dot
    return jax.lax.psum(jnp.dot(a.ravel(), b.ravel(), preferred_element_type=a.dtype), axis)


def _presidual(r_local, rr, rr0, norm, axis):
    if norm == "linf":
        return jax.lax.pmax(jnp.max(jnp.abs(r_local)), axis)
    return _residual_norm(r_local, rr, rr0, norm)


def sharded_cg_loop(op, M, b, x0, policy: ConvergencePolicy, axis: str, n_global: int) -> CGResult:
    """The sharded CG recurrence, format-agnostic: ``op``/``M`` act on this
    shard's local slice (with whatever collectives they need inside), dots are
    ``psum`` over ``axis``.  Shared by the DIA solver below and the
    general-sparsity (CSR/ELL exact-halo) solver in ``sharded_general``.
    Runs inside ``shard_map``; the whole loop is one ``lax.while_loop`` —
    scalars never leave the devices (the re-design of the reference's
    host-allreduce choreography, ``ConjugateGradientParallelGpu.cs:424-565``).
    """
    dtype = b.dtype
    tol = jnp.asarray(policy.tol, dtype)
    min_iter = policy.min_iteration
    max_iter = policy.resolve_max(n_global)
    norm = policy.norm

    x = x0
    r = b - op(x)
    z = M(r)
    p = z
    rz = _pdot(r, z, axis)
    rr = _pdot(r, r, axis)
    rr0 = rr

    def res_of(r, rr):
        return _presidual(r, rr, rr0, norm, axis)

    def cond(state):
        _, r, _, _, rr, it = state
        res = res_of(r, rr)
        return jnp.logical_and(jnp.logical_or(it < min_iter, res >= tol), it < max_iter)

    def body(state):
        x, r, p, rz, rr, it = state
        Ap = op(p)
        alpha = _safe_div(rz, _pdot(p, Ap, axis))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _pdot(r, z, axis)
        rr_new = _pdot(r, r, axis)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        return (x, r, p, rz_new, rr_new, it + 1)

    x, r, p, rz, rr, it = jax.lax.while_loop(cond, body, (x, r, p, rz, rr, jnp.int32(0)))
    res = res_of(r, rr)
    converged = jnp.logical_and(res < tol, it >= min_iter)
    return CGResult(x=x, iterations=it, residual=res, converged=converged)


def make_sharded_cg(
    A: DiaMatrix,
    mesh: Mesh,
    policy: ConvergencePolicy = ConvergencePolicy(),
    axis: str = "x",
    M_local: Optional[Callable] = None,
    donate: bool = True,
):
    """Build a jitted sharded solver.

    Returns ``solve(data, b, x0) -> CGResult`` — or, when ``M_local`` is
    given, ``solve(data, b, x0, m_aux) -> CGResult`` where ``m_aux`` is a
    row-sharded (n,) auxiliary array (e.g. the inverse diagonal for Jacobi)
    and ``M_local(r_local, m_aux_local)`` applies the preconditioner to this
    shard's slice.  ``M_local`` must be equivariant to row sharding (pointwise
    or local-stencil operations qualify).

    ``A`` supplies static structure only (offsets, shape); the DIA ``data``
    array is a runtime argument so one compiled program serves many systems
    with the same sparsity (the reference re-uploads values through
    ``Initialize`` the same way, ``ConjugateGradientParallelGpu.cs:358-379``).

    Requires ``A.n % num_shards == 0`` (use ``core.partition.pad_system``).
    When bandwidth <= n_local the SpMV uses one-hop ``ppermute`` halos (the
    reference's rank±1 chain topology, SURVEY.md §5.8); wider bandwidths fall
    back to the all-gather formulation (``halo.spmv_dia_allgather`` — the
    reference's global-length ``vectorP`` worst case,
    ``ConjugateGradientParallelGpu.cs:321``).  For general CSR/ELL sparsity
    see ``parallel.sharded_general`` (exact halo ranges, multi-hop rings).
    """
    num = mesh.shape[axis]
    n = A.n
    if n % num:
        raise ValueError(f"n={n} not divisible by {num} shards; pad_system first")
    n_local = n // num
    halo = A.bandwidth
    offsets = A.offsets
    use_allgather = halo > n_local

    def local_solve(data, b, x0, m_aux=None):
        if use_allgather:
            op = lambda p: spmv_dia_allgather(data, offsets, p, axis, num)
        else:
            # halo-overlap formulation: interior compute carries no data
            # dependence on the ppermute (see halo.spmv_dia_local_overlap)
            op = lambda p: spmv_dia_local_overlap(data, offsets, p, halo, axis, num)

        def M(r):
            return M_local(r, m_aux) if M_local is not None else r

        return sharded_cg_loop(op, M, b, x0, policy, axis, n)

    in_specs = (P(None, axis), P(axis), P(axis))
    if M_local is not None:
        in_specs = in_specs + (P(axis),)
    else:
        local_solve = partial(local_solve, m_aux=None)
    shard_fn = jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=CGResult(x=P(axis), iterations=P(), residual=P(), converged=P()),
    )
    donate_argnums = (2,) if donate else ()
    return jax.jit(shard_fn, donate_argnums=donate_argnums)


def sharded_cg_solve(
    A: DiaMatrix,
    b,
    x0=None,
    policy: ConvergencePolicy = ConvergencePolicy(),
    mesh: Optional[Mesh] = None,
    axis: str = "x",
    M_local: Optional[Callable] = None,
    M_aux=None,
    dtype=None,
) -> CGResult:
    """One-call convenience: place the system on the mesh and solve.

    ``A`` may hold host (numpy) or device data; arrays are device_put with the
    row-block sharding so no resharding happens at dispatch.  For a
    preconditioned solve pass both ``M_local(r_local, aux_local)`` and the
    global (n,) ``M_aux`` array (sharded here).
    """
    import numpy as np

    if mesh is None:
        from conjugategradient_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis=axis)
    solve = make_sharded_cg(A, mesh, policy, axis=axis, M_local=M_local, donate=False)
    dt = dtype or np.asarray(A.data).dtype
    row_sharding = NamedSharding(mesh, P(axis))
    data = jax.device_put(jnp.asarray(np.asarray(A.data, dtype=dt)), NamedSharding(mesh, P(None, axis)))
    b_dev = jax.device_put(jnp.asarray(np.asarray(b, dtype=dt)), row_sharding)
    x0_arr = np.zeros(A.n, dtype=dt) if x0 is None else np.asarray(x0, dtype=dt)
    x0_dev = jax.device_put(jnp.asarray(x0_arr), row_sharding)
    if M_local is not None:
        aux_dev = jax.device_put(jnp.asarray(np.asarray(M_aux, dtype=dt)), row_sharding)
        return solve(data, b_dev, x0_dev, aux_dev)
    return solve(data, b_dev, x0_dev)
