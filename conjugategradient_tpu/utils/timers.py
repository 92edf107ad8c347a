"""Phase timing — the reference's measurement discipline, made device-correct.

The reference hand-times every solver: .NET ``Stopwatch`` ticks +
ticks-per-iteration (``Mgcg/cuBlas/Mgcg/MgcgMain.cs:110-126,165-167``),
input/exec/output ms splits (``Mgcg/ViennaCL/MgcgCL/MgcgCLMain.cs:116-134``),
``boost::timer`` seconds (``SimpleConjugateGradient.cu:223-239``).  On TPU a
wall-clock around an async dispatch measures nothing — every phase here ends
with ``jax.block_until_ready`` on the phase's outputs, and the report keeps the
reference's formats (per-phase ms, per-iteration microseconds).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Dict, List, Optional


@dataclasses.dataclass
class Phase:
    name: str
    seconds: float

    @property
    def ms(self) -> float:
        return self.seconds * 1e3


class PhaseTimer:
    """Accumulates named, device-synchronised phases.

    >>> t = PhaseTimer()
    >>> with t.phase("input"):
    ...     dev = jax.device_put(host_array)          # doctest: +SKIP
    >>> with t.phase("solve", sync=result):           # doctest: +SKIP
    ...     result = solve(dev)
    >>> print(t.report(iterations=int(result.iterations)))  # doctest: +SKIP
    """

    def __init__(self) -> None:
        self.phases: List[Phase] = []

    @contextlib.contextmanager
    def phase(self, name: str, sync: Any = None):
        """Time a phase; if ``sync`` is given (array/pytree), block on it.

        ``sync`` may also be a zero-arg callable evaluated at phase end that
        returns the value to block on (for outputs created inside the block).
        """
        import jax

        t0 = time.perf_counter()
        holder: Dict[str, Any] = {}
        try:
            yield holder
        finally:
            target = holder.get("sync", sync)
            if callable(target) and not hasattr(target, "shape"):
                target = target()
            if target is not None:
                jax.block_until_ready(target)
            self.phases.append(Phase(name, time.perf_counter() - t0))

    def __getitem__(self, name: str) -> float:
        for p in reversed(self.phases):
            if p.name == name:
                return p.seconds
        raise KeyError(name)

    @property
    def total(self) -> float:
        return sum(p.seconds for p in self.phases)

    def report(self, iterations: Optional[int] = None) -> str:
        """The ViennaCL-driver style input/exec/output report, extended."""
        parts = [f"{p.name} {p.ms:9.2f} ms" for p in self.phases]
        line = " | ".join(parts) + f" | total {self.total*1e3:9.2f} ms"
        if iterations:
            solve_s = None
            for p in self.phases:
                if p.name in ("solve", "exec", "compute"):
                    solve_s = p.seconds
            per_it = (solve_s if solve_s is not None else self.total) / max(iterations, 1)
            line += f" | {iterations} it, {per_it*1e6:.1f} us/it"
        return line

    def as_dict(self) -> Dict[str, float]:
        return {p.name: p.seconds for p in self.phases}


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when ``log_dir`` is None) — the
    device-side profiling the reference never had (SURVEY.md §5.1)."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
