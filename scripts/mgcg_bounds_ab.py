"""A/B the 2-D headline MGCG under different Chebyshev bounds on chip.

Round-4 triage: the first r4 bench printed MGCG 0.853 ms vs the r02 record
0.647 ms with IDENTICAL plain-CG times (15.2 ms), so the chip is fine and
the V-cycle program changed.  Candidates: (a) the new analytic const-stencil
bounds (0.5, 2.0) vs the old power-iteration bounds (0.536, 2.143), (b)
round-3 code drift that was never measured on chip (r03 bench timed out).

Usage: python scripts/mgcg_bounds_ab.py [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    grid = (1023, 1023) if on_tpu else (255, 255)
    dtype = np.float32 if on_tpu else np.float64
    tol = 1e-6 if on_tpu else 1e-8
    k_pair = (2, 82) if on_tpu else (1, 3)

    system = generators.poisson_system(grid, dtype=dtype)
    policy = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * system.n)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    rng = np.random.default_rng()

    h = build_hierarchy(system.A, grid, smoother="chebyshev", pre=3, post=3, dtype=dtype)
    A = h.levels[0].A

    def rebound(h, bounds):
        return dataclasses.replace(
            h,
            levels=tuple(
                dataclasses.replace(l, cheb_bounds=bounds) for l in h.levels
            ),
        )

    def run(h_, A_, b_, scales):
        M = as_preconditioner(h_)

        def step(prev_x, s):
            res = cg_solve(
                A_, b_ * s + 1e-30 * prev_x, policy=policy, M=M,
                precise_dot=dtype == np.float32,
            )
            return res.x, (res.iterations, res.residual, res.converged)

        x, (its, ress, convs) = jax.lax.scan(step, jnp.zeros_like(b_), scales)
        return x, its, ress, convs

    runj = jax.jit(run)

    def timed(h_, tries=3):
        k1, k2 = k_pair
        times = {}
        out = None
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            runj(h_, A, b, scales)
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                x, its, ress, convs = runj(h_, A, b, scales)
                float(ress[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            out = (its, ress, convs)
        its, ress, convs = out
        assert bool(np.asarray(convs).all())
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9), int(np.asarray(its)[-1])

    results = {}
    for tag, bounds in [
        ("analytic_0.5_2.0", (0.5, 2.0)),
        ("powerit_0.536_2.143", (0.5357178659144467, 2.142871463657787)),
    ]:
        t, its = timed(rebound(h, bounds))
        results[tag] = {"solve_s": round(t, 6), "iters": its}
        print(json.dumps({"experiment": "mgcg_bounds_ab", "platform": platform, tag: results[tag]}), flush=True)

    print(json.dumps({"experiment": "mgcg_bounds_ab", "platform": platform, "grid": list(grid), **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
