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
