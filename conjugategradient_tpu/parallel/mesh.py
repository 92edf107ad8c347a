"""Device-mesh helpers.

Replaces the reference's device-discovery runtime exports (``GetDeviceCount`` /
``SetDevice``, ``Mgcg/cuBlas/MgcgGpu/Runtime.cu:7-62``) — on TPU there are no
handles to create; a ``jax.sharding.Mesh`` over ``jax.devices()`` *is* the
communication topology, and XLA owns streams/queues.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_devices: int | None = None, axis: str = "x") -> Mesh:
    """1-D mesh over the first ``num_devices`` devices (all by default).

    The reference's parallel solvers run on "however many devices exist"
    (``ConjugateGradientParallelGpu.cs:268``); same spirit here.  The axis is
    the row-block dimension; halos ride neighbor ``ppermute`` along it.
    """
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def specs_for_grid(g, mesh, axes):
    """(data_spec, vector_spec) sharding the leading ``len(axes)`` grid axes
    that divide their mesh axes (NamedSharding requires even divisibility);
    non-divisible axes replicate.  The one divisibility rule shared by
    ``parallel.gspmd`` and ``precond.distributed``."""
    from jax.sharding import PartitionSpec as P

    names = []
    for i, ax_name in enumerate(tuple(axes)[: len(g)]):
        names.append(ax_name if g[i] % mesh.shape[ax_name] == 0 else None)
    if not any(names):
        return P(), P()
    tail = [None] * (len(g) - len(names))
    return P(None, *names, *tail), P(*names, *tail)
