"""Structured residual logging — SURVEY.md §5.5's upgrade.

The reference's observability is ``Console.WriteLine`` per iteration
(``Mgcg/HandmadeCL/MgcgCL/ConjugateGradient.cs:61``, ``ComputerGpu.cpp:75``)
— unstructured, host-blocking, and disagreeing between variants on which norm
is printed.  Here the solver returns a dense on-device residual history (one
``lax.scan``, zero mid-solve host traffic — see ``cg_solve_traced``) and this
module turns it into structured records carrying *all three* norm conventions
explicitly, serialisable to JSONL/CSV.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterable, List, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ResidualRecord:
    iteration: int
    l2: float
    rel_l2: float
    linf: Optional[float] = None  # only when the linf history was requested

    def to_json(self) -> str:
        d = {"iteration": self.iteration, "l2": self.l2, "rel_l2": self.rel_l2}
        if self.linf is not None:
            d["linf"] = self.linf
        return json.dumps(d)


def records_from_history(
    history, iterations: Optional[int] = None, linf_history=None, r0: Optional[float] = None
) -> List[ResidualRecord]:
    """Convert a ``cg_solve_traced`` L2 residual history into records.

    ``history[k]`` is ‖r‖₂ after iteration k+1; entries after convergence are
    frozen (flat) — pass ``iterations`` to trim to the active prefix.

    ``r0`` is the *initial* residual ‖b − A x₀‖₂ (before iteration 1), the
    denominator of the solver's ``rel_l2`` convention.  When omitted the
    fallback normalises by ``history[0]`` — the residual *after* the first
    iteration — which makes the first record's rel_l2 exactly 1.0 and every
    later value disagree with the solver's rel_l2 norm; pass the true r0
    (e.g. ``float(jnp.linalg.norm(b - op(x0)))``) for convention-exact logs.
    """
    h = np.asarray(history, dtype=np.float64)
    n = int(iterations) if iterations is not None else len(h)
    r0 = float(r0) if r0 is not None else (h[0] if len(h) else 1.0)
    linf = None if linf_history is None else np.asarray(linf_history, dtype=np.float64)
    out = []
    for k in range(min(n, len(h))):
        out.append(
            ResidualRecord(
                iteration=k + 1,
                l2=float(h[k]),
                rel_l2=float(h[k] / r0) if r0 > 0 else 0.0,
                linf=None if linf is None else float(linf[k]),
            )
        )
    return out


def write_jsonl(path: str, records: Iterable[ResidualRecord]) -> None:
    with open(path, "w") as f:
        for r in records:
            f.write(r.to_json() + "\n")


def write_csv(path: str, records: Iterable[ResidualRecord]) -> None:
    records = list(records)
    has_linf = any(r.linf is not None for r in records)
    with open(path, "w") as f:
        f.write("iteration,l2,rel_l2" + (",linf" if has_linf else "") + "\n")
        for r in records:
            row = f"{r.iteration},{r.l2!r},{r.rel_l2!r}"
            if has_linf:
                row += f",{'' if r.linf is None else repr(r.linf)}"
            f.write(row + "\n")


def convergence_rate(records: List[ResidualRecord]) -> float:
    """Geometric-mean per-iteration residual reduction factor (diagnostic:
    for CG this tracks (sqrt(kappa)-1)/(sqrt(kappa)+1))."""
    if len(records) < 2:
        return float("nan")
    first, last = records[0].l2, records[-1].l2
    if first <= 0 or last <= 0:
        return float("nan")
    return float((last / first) ** (1.0 / (len(records) - 1)))
