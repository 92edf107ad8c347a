"""Rung-4 on-chip measurement: MGCG on the 16.6M-row 3-D Poisson (255³).

BASELINE.md's config ladder rung 4 is "4+-level MGCG/Chebyshev on 10M-row 3D
Poisson" — this times the 255³ = 16,581,375-row case on the one attached
chip with the scan-differencing discipline (CLAUDE.md) and writes
``artifacts/rung4_255cubed_r02.json``.  (The 4-chip part of rung 4 is
validated structurally on the virtual mesh / dryrun; per-chip time is what
one chip can measure.)

Usage: python scripts/rung4_bench.py [--cpu] [--grid 255] [--k 1 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=255)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--k", type=int, nargs=2, default=(1, 5))
    p.add_argument("--tries", type=int, default=3)
    p.add_argument("--tol", type=float, default=1e-6)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.precond.multigrid import v_cycle
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    platform = jax.devices()[0].platform
    dtype = np.float32
    g = args.grid if platform != "cpu" or args.grid <= 63 else 63
    grid = (g, g, g)
    system = generators.poisson_system(grid, dtype=dtype)
    n = system.n
    policy = ConvergencePolicy(tol=args.tol, norm="rel_l2", max_iteration=8 * n)

    t0 = time.perf_counter()
    h = build_hierarchy(system.A, grid, smoother="chebyshev", pre=3, post=3, dtype=dtype)
    t_setup = time.perf_counter() - t0
    A = h.levels[0].A if h.levels else system.A.device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)

    def run(h_, A_, b_, scales):
        def step(prev_x, s):
            res = cg_solve(
                A_, b_ * s + 1e-30 * prev_x, policy=policy, M=(v_cycle, h_),
                precise_dot=True,
            )
            return res.x, (res.iterations, res.residual, res.converged)

        x, (its, ress, convs) = jax.lax.scan(step, jnp.zeros_like(b_), scales)
        return x, its, ress, convs

    runj = jax.jit(run)
    rng = np.random.default_rng()
    k1, k2 = args.k
    times = {}
    out = None
    for k in (k1, k2):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        t0 = time.perf_counter()
        jax.block_until_ready(runj(h, A, b, scales)[0])  # compile + warm
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.tries):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            t0 = time.perf_counter()
            x, its, ress, convs = runj(h, A, b, scales)
            float(ress[-1])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        out = (its, ress, convs)
    its, ress, convs = out
    assert bool(np.asarray(convs).all()), np.asarray(ress)
    t_solve = max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    # fp64 true-residual check reuses the timed scan's final solution: it
    # solves b*s_last (+ a 1e-30 seed term, negligible), so x/s_last checks
    # against b without compiling a second full MGCG program through the
    # tunnel (first compile ~minutes at this size)
    s_last = float(np.asarray(scales)[-1])
    x64 = np.asarray(x, np.float64).reshape(-1) / s_last
    r = np.asarray(system.b, np.float64) - oracle.spmv(system.A, x64)
    rel = float(np.linalg.norm(r) / np.linalg.norm(system.b))

    print(
        json.dumps(
            {
                "experiment": "rung4_mgcg_3d",
                "platform": platform,
                "grid": list(grid),
                "n": n,
                "levels": f"{len(h.levels)}+1",
                "solve_s": round(t_solve, 5),
                "iterations": int(np.asarray(its)[-1]),
                "setup_s": round(t_setup, 2),
                "true_rel_residual": rel,
                "tol": args.tol,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
