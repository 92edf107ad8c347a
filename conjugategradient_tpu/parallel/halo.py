"""Halo exchange and per-shard SpMV — the communication backend, TPU-native.

The reference's halo exchange stages boundary slices of the search-direction
vector device->host->device through pinned .NET arrays, one neighbor pair at a
time (``P2Host``/``P2Device`` ``Mgcg/cuBlas/MgcgGpu/Mgcg.cu:88-113``,
orchestrated by ``SyncP`` ``Mgcg/cuBlas/Mgcg/ConjugateGradientParallelGpu.cs:384-419``;
fixed-band variant ``Mgcg/HandmadeCL/MgcgCL/ConjugateGradientParallelGpu.cs:426-441``).

Here the same data motion is two ``jax.lax.ppermute`` neighbor shifts over
ICI/DCN *inside* the jitted SPMD program: no host staging, no thread barriers,
and XLA's scheduler is free to overlap the shift with interior compute.  The
halo width is the matrix bandwidth — static metadata — so the exchanged slices
are compile-time-shaped, the moral equivalent of the reference discovering
exact ``minJ``/``maxJ`` ranges at init (``Mgcg.cu:82-84``) rather than moving
the whole vector.

Ring wraparound note: ``ppermute`` is cyclic, so the first/last shards receive
wrapped data in their halos.  This is *correct by construction*: DIA stores
structural zeros wherever ``i + offset`` exits the global index range, so
wrapped halo values are always multiplied by zero (tested in
``tests/test_parallel.py::test_wraparound_halo_is_masked``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def halo_exchange(p: jnp.ndarray, halo: int, axis: str, num_shards: int) -> jnp.ndarray:
    """Return p padded with its neighbors' boundary slices.

    ``p`` is this shard's (n_local,) slice; the result is
    (n_local + 2*halo,): [left neighbor's tail | p | right neighbor's head].
    """
    if halo == 0:
        return p
    fwd = [(i, (i + 1) % num_shards) for i in range(num_shards)]  # send right
    bwd = [(i, (i - 1) % num_shards) for i in range(num_shards)]  # send left
    left_halo = jax.lax.ppermute(p[-halo:], axis, fwd)  # receive left nbr's tail
    right_halo = jax.lax.ppermute(p[:halo], axis, bwd)  # receive right nbr's head
    return jnp.concatenate([left_halo, p, right_halo])


def spmv_dia_local(
    data_local: jnp.ndarray,
    offsets: Tuple[int, ...],
    p_padded: jnp.ndarray,
    halo: int,
) -> jnp.ndarray:
    """Local rows of y = A p from halo-padded p.

    ``data_local`` is (ndiags, n_local) — this shard's rows of the global DIA
    data (row-indexed, so no rebasing needed; the reference instead rebases CSR
    row pointers by elementOffset, ``Mgcg.cu:73``).  ``p_padded`` is
    (n_local + 2*halo,).  For local row i (global row offset+i):
    y[i] = sum_k data[k, i] * p_global[offset + i + off] and
    p_global[offset + i + off] == p_padded[halo + i + off] since
    |off| <= halo.
    """
    n_local = data_local.shape[1]
    y = jnp.zeros(n_local, dtype=jnp.result_type(data_local.dtype, p_padded.dtype))
    for k, off in enumerate(offsets):
        y = y + data_local[k] * jax.lax.dynamic_slice(p_padded, (halo + off,), (n_local,))
    return y


def exchange_halos(p: jnp.ndarray, halo: int, axis: str, num_shards: int):
    """The two neighbor slices only (not concatenated) — returned separately
    so callers can keep interior compute independent of the communication."""
    fwd = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    bwd = [(i, (i - 1) % num_shards) for i in range(num_shards)]
    left_halo = jax.lax.ppermute(p[-halo:], axis, fwd)
    right_halo = jax.lax.ppermute(p[:halo], axis, bwd)
    return left_halo, right_halo


def spmv_dia_local_overlap(
    data_local: jnp.ndarray,
    offsets: Tuple[int, ...],
    p: jnp.ndarray,
    halo: int,
    axis: str,
    num_shards: int,
) -> jnp.ndarray:
    """Halo-overlap SpMV: communication rides under the interior compute.

    The reference's halo exchange is fully synchronous — ``SyncP`` completes
    before any SpMV work starts (``ConjugateGradientParallelGpu.cs:427,469``).
    Here the dependency structure *tells* XLA's latency-hiding scheduler what
    can overlap: interior rows ``[halo, n_local - halo)`` read only local
    ``p``, so their (dominant) compute has no data dependence on the
    ``ppermute``; only the 2*halo boundary rows wait for neighbor data.  This
    is the async upgrade SURVEY.md §7 lists as hard part 6, expressed purely
    through dataflow — no manual double-buffering.
    """
    n_local = data_local.shape[1]
    if halo == 0 or 2 * halo >= n_local:
        return spmv_dia_local(data_local, offsets, halo_exchange(p, halo, axis, num_shards), halo)

    left_halo, right_halo = exchange_halos(p, halo, axis, num_shards)

    # interior rows: depend on local p only — overlappable with the permutes
    p_loc = jnp.pad(p, (halo, halo))  # zero pad; interior rows never read the pads
    y_int = jnp.zeros(n_local, dtype=jnp.result_type(data_local.dtype, p.dtype))
    for k, off in enumerate(offsets):
        y_int = y_int + data_local[k] * jax.lax.dynamic_slice(p_loc, (halo + off,), (n_local,))

    # boundary rows: the only consumers of the received halos
    head = jnp.concatenate([left_halo, p[: 2 * halo]])  # covers rows [0, halo)
    tail = jnp.concatenate([p[-2 * halo :], right_halo])  # covers rows [n-halo, n)
    y_head = jnp.zeros(halo, dtype=y_int.dtype)
    y_tail = jnp.zeros(halo, dtype=y_int.dtype)
    for k, off in enumerate(offsets):
        y_head = y_head + data_local[k, :halo] * jax.lax.dynamic_slice(head, (halo + off,), (halo,))
        y_tail = y_tail + data_local[k, n_local - halo :] * jax.lax.dynamic_slice(
            tail, (halo + off,), (halo,)
        )
    return jnp.concatenate([y_head, y_int[halo : n_local - halo], y_tail])
