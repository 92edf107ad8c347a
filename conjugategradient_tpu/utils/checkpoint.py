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
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        x=np.asarray(state.x),
        r=np.asarray(state.r),
        p=np.asarray(state.p),
        scalars=np.asarray([state.rz, state.rr, state.rr0], dtype=np.float64),
        iteration=np.asarray(state.iteration, dtype=np.int64),
    )
    # numpy appends .npz to the tmp name
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


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
