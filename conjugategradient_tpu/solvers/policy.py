"""Convergence policy — the reference's CG base-class contract, device-resident.

Re-design of ``Mgcg/cuBlas/Mgcg/ConjugateGradient.cs:6-84``: min_iteration /
max_iteration / allowable_residual plus the ``IsConverged`` rule (below min →
never converged; past max → error; else residual < tol).  The one semantic
change forced by XLA: you cannot throw from inside a compiled ``while_loop``
(the reference throws ApplicationException at ``ConjugateGradient.cs:73``), so
exceeding max_iteration surfaces as ``converged=False`` in the result, and
``CGResult.raise_if_diverged()`` recreates the throwing behaviour host-side.

The reference's variants also disagree on strict-vs-inclusive min-iteration
comparisons (``Mgcg.cu:252`` uses ``<=`` where ``SimpleConjugateGradient.cu:107``
uses ``<``) — we standardise on *inclusive*: converged requires
``iteration >= min_iteration``.
"""

from __future__ import annotations

import dataclasses
import enum


class Norm(str, enum.Enum):
    """The three residual conventions the reference's backends use
    (SURVEY.md §2.4)."""

    L2 = "l2"  # sqrt(r.r)      — cuBlas & Simple CUDA
    LINF = "linf"  # max|r|     — HandmadeCL
    REL_L2 = "rel_l2"  # sqrt(r.r / r0.r0) — ViennaCL


@dataclasses.dataclass(frozen=True)
class ConvergencePolicy:
    tol: float = 1e-8
    norm: str = Norm.L2
    min_iteration: int = 0
    max_iteration: int | None = None  # defaults to n at solve time

    def __post_init__(self):
        object.__setattr__(self, "norm", Norm(self.norm).value)
        if self.tol <= 0:
            raise ValueError("tol must be positive")
        if self.min_iteration < 0:
            raise ValueError("min_iteration must be >= 0")
        if self.max_iteration is not None and self.max_iteration < self.min_iteration:
            raise ValueError("max_iteration must be >= min_iteration")

    def resolve_max(self, n: int) -> int:
        """Default cap = n (exact-arithmetic CG termination bound), clamped
        to int32 range: iteration counters are device int32 everywhere, and
        at 347M+ rows a caller passing ``max_iteration=8*n`` overflowed the
        ``jnp.int32`` carry (found at 703^3)."""
        m = int(self.max_iteration) if self.max_iteration is not None else int(n)
        return min(m, 2**31 - 1)


class NotConvergedError(RuntimeError):
    """Host-side reconstruction of the reference's non-convergence throw."""
