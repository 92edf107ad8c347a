"""Multi-host meshes: the DCN-spanning deployment path (ladder rung 5).

The reference's multi-device story ends at one host (``Parallel.For`` over
local GPUs); scaling further there would have meant MPI.  On TPU pods the
same SPMD programs in this package run unchanged across hosts — the *only*
additions are process-group initialisation and building the mesh from global
devices.  This module wraps exactly that; there is nothing else to port,
because ``psum``/``ppermute`` already ride ICI within a slice and DCN across
slices, scheduled by XLA.

Single-host environments (this development box) see these helpers degrade to
the local mesh; the multi-host path follows the documented JAX distributed
initialisation contract and is exercised for real only on a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the JAX process group (no-op if already initialised or solo).

    On Cloud TPU pods all three arguments are auto-detected from the
    environment; pass them explicitly for manual clusters.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialised (or single-process) — both fine
        pass


def global_mesh(axis: str = "x", devices: Optional[Sequence] = None):
    """1-D mesh over *all* global devices (every process sees the same mesh;
    each host addresses only its local shard of any distributed array)."""
    import jax
    from jax.sharding import Mesh

    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis,))


def host_count() -> int:
    import jax

    return jax.process_count()


def make_distributed_system(workload_name: str, mesh, axis: str = "x", dtype=None):
    """Build a ladder workload directly into mesh-sharded device arrays.

    Each process materialises only its own row block on the host (the full
    100M-row system never exists in one host's memory) and contributes it via
    ``jax.make_array_from_callback``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.models import get

    w = get(workload_name)
    system = w.build(dtype=dtype)  # NOTE: per-block generation is the pod-scale
    # upgrade path; the generators are vectorized and slice cleanly by rows.
    data = np.asarray(system.A.data)
    sh_mat = NamedSharding(mesh, P(None, axis))
    sh_vec = NamedSharding(mesh, P(axis))
    A_data = jax.make_array_from_callback(
        data.shape, sh_mat, lambda idx: jnp.asarray(data[idx])
    )
    b = jax.make_array_from_callback(
        system.b.shape, sh_vec, lambda idx: jnp.asarray(system.b[idx])
    )
    x0 = jax.make_array_from_callback(
        system.x0.shape, sh_vec, lambda idx: jnp.asarray(system.x0[idx])
    )
    return system.A, A_data, b, x0
