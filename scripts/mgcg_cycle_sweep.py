"""On-chip MGCG cycle-shape sweep: depth (max_coarse) x smoother strength.

Round-4 context: the same compiled MGCG program that measured 0.647 ms on
08-19 measures ~0.87 ms on 08-20 (r02 code re-run in a worktree confirms the
drift is the CHIP/tunnel, not the code — plain CG times are identical, so
HBM-bound streaming is unaffected while the latency-bound coarse-level chain
slowed).  This sweep re-tunes the cycle shape for the current machine state:
fewer levels = fewer serial small kernels per cycle but a bigger dense
coarse solve; stronger smoothing = fewer CG iterations but more fine-level
work per cycle.

Usage: python scripts/mgcg_cycle_sweep.py [--cpu]
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
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--k", type=int, nargs=2, default=None)
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
    k_pair = tuple(args.k) if args.k else ((2, 42) if on_tpu else (1, 3))

    system = generators.poisson_system(grid, dtype=dtype)
    policy = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * system.n)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    rng = np.random.default_rng()

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

    def timed(h_, A_, tries=2):
        k1, k2 = k_pair
        times = {}
        out = None
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            runj(h_, A_, b, scales)
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                x, its, ress, convs = runj(h_, A_, b, scales)
                float(ress[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            out = (its, ress, convs)
        its, ress, convs = out
        if not bool(np.asarray(convs).all()):
            return None, -1
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9), int(np.asarray(its)[-1])

    results = []
    # d6 = the production depth; the d5 arm (63^2 dense coarse, one big
    # MXU matvec for two small-grid levels) measured WORSE across the
    # board in the first sweep and was dropped
    for max_coarse, tag in [(1025, "d6")]:
        for pre, post in [(1, 1), (2, 1), (1, 2), (2, 2), (3, 3)]:
            h = build_hierarchy(
                system.A, grid, smoother="chebyshev", pre=pre, post=post,
                dtype=dtype, max_coarse=max_coarse,
                coarse_operator=generators.poisson_coarse_operator(dtype),
            )
            A = h.levels[0].A
            t, its = timed(h, A)
            row = {
                "levels": f"{len(h.levels)}+1",
                "coarse_n": int(h.coarse_inv.shape[0]),
                "pre_post": [pre, post],
                "solve_s": None if t is None else round(t, 6),
                "iters": its,
            }
            results.append(row)
            print(json.dumps({"experiment": "mgcg_cycle_sweep", "platform": platform, **row}), flush=True)

    out = {
        "experiment": "mgcg_cycle_sweep",
        "platform": platform,
        "grid": list(grid),
        "k_pair": list(k_pair),
        "rows": results,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "mgcg_cycle_sweep_r04.json")
    if on_tpu:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
