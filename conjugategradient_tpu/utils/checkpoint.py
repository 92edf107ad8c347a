"""Checkpoint / resume for long solves — SURVEY.md §5.4 (absent in the
reference: its solver state lives only in device memory for the duration of
``Solve``).  CG state is tiny (4 vectors + 3 scalars), so checkpointing is a
host download + ``.npz`` — worth it for multi-host solves measured in minutes.

Works with ``solvers.cg.cg_solve_chunked``: run a chunk of iterations, persist
the returned state, resume later (even in a new process) from the file.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class CGState:
    """The full CG recurrence state; resuming from it continues the *same*
    Krylov sequence (no restart penalty)."""

    x: np.ndarray
    r: np.ndarray
    p: np.ndarray
    rz: float
    rr: float
    rr0: float
    iteration: int

    @property
    def n(self) -> int:
        return int(self.x.shape[0])


def save_state(path: str, state: CGState) -> None:
    tmp = path + ".tmp"
    _atomic_savez(
        path,
        compressed=False,
        x=np.asarray(state.x),
        r=np.asarray(state.r),
        p=np.asarray(state.p),
        scalars=np.asarray([state.rz, state.rr, state.rr0], dtype=np.float64),
        iteration=np.asarray(state.iteration, dtype=np.int64),
    )


def load_state(path: str) -> CGState:
    with np.load(path) as z:
        rz, rr, rr0 = (float(v) for v in z["scalars"])
        return CGState(
            x=z["x"], r=z["r"], p=z["p"], rz=rz, rr=rr, rr0=rr0, iteration=int(z["iteration"])
        )


def maybe_resume(path: Optional[str]) -> Optional[CGState]:
    if path and os.path.exists(path):
        return load_state(path)
    return None


# --- pytree (hierarchy) persistence ------------------------------------------
#
# Multigrid setup is the expensive phase (measured: 45 s device-probed /
# 190 s host at 255^3, artifacts/probed_setup_onechip_r02.json), while the
# hierarchy itself is just a registered pytree of arrays + static metadata.
# Persisting it turns every later process's setup into a file read — the
# production serving pattern (build once, solve many, across restarts).


def _atomic_savez(path: str, compressed: bool, **payload) -> None:
    """savez to a tmp name (numpy appends .npz) + atomic rename — one copy
    of the dance for both the CG-state and pytree savers."""
    tmp = path + ".tmp"
    (np.savez_compressed if compressed else np.savez)(tmp, **payload)
    os.replace(tmp + ".npz", path)


def save_pytree(path: str, tree) -> None:
    """Persist any registered pytree (``MgHierarchy``, ``AmgHierarchy``,
    ``Deflation``, a matrix container, ...) atomically to ``path``.

    Array leaves are stored as an ``.npz`` payload; the tree STRUCTURE
    (container types + static metadata: grids, offsets, smoother config)
    rides as a pickled treedef inside the same file.  Load with
    ``load_pytree`` — from TRUSTED files only (the structure channel is
    pickle).
    """
    import pickle

    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__treedef__"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8
    )
    _atomic_savez(path, compressed=True, **payload)


def load_pytree(path: str, device: bool = True):
    """Load a pytree saved by ``save_pytree``.  ``device=True`` places array
    leaves on the default device (``jnp.asarray``); ``device=False`` returns
    numpy leaves (e.g. to re-place onto a mesh yourself).  Only open files
    you trust (see ``save_pytree``)."""
    import pickle

    import jax

    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["__treedef__"].tobytes())
        leaves = [z[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    if device:
        import jax.numpy as jnp

        leaves = [jnp.asarray(l) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
