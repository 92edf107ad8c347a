"""Headline benchmark: MGCG time-to-solution on the ~1M-row 2-D Poisson
ladder workload (BASELINE.json configs[2]), one chip.

Prints ONE JSON line:
  {"metric": ..., "value": <MGCG steady-state solve seconds>, "unit": "s",
   "vs_baseline": <plain-CG time / MGCG time>}

``vs_baseline`` is the speedup over plain (unpreconditioned) CG on the same
chip and kernels — plain CG being what the reference actually implements
(its "Mgcg" name notwithstanding, SURVEY.md §0), this is the direct
capability-times-performance ratio against the reference design.  ``value``
tracks absolute kernel/solver performance across rounds.

On TPU: fp32 storage + compensated dots, relative-L2 tolerance 1e-6 (fp32's
attainable floor; the reference's absolute 1e-8 is an fp64 number).  On CPU
fallback (no TPU attached): fp64, same tolerances, smaller grid to keep
runtime sane.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs skip the (slow) TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    if on_tpu:
        grid = (1023, 1023)
        dtype = np.float32
        tol = 1e-6
    else:
        grid = (511, 511)
        dtype = np.float64
        tol = 1e-8

    system = generators.poisson_system(grid, dtype=dtype)
    n = system.n
    policy = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * n)
    # grid-stencil layout: the TPU roofline path (see ops/stencil.py)
    from conjugategradient_tpu.core.formats import dia_to_stencil

    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    precise = dtype == np.float32

    def timed(solve, reps: int = 20):
        jax.block_until_ready(solve(b).x)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            res = solve(b)
        jax.block_until_ready(res.x)
        # repeated dispatches pipeline, amortising per-call host/tunnel latency
        return (time.perf_counter() - t0) / reps, res

    # matrices/hierarchies pass as jit ARGUMENTS (pytrees), never closure
    # constants — constants ship with the compile payload and blow up at scale
    plain_jit = jax.jit(lambda A, b: cg_solve(A, b, policy=policy, precise_dot=precise))
    t_plain, plain = timed(lambda b: plain_jit(A, b))

    h = build_hierarchy(system.A, grid, smoother="chebyshev", dtype=dtype)
    mg_jit = jax.jit(
        lambda h, A, b: cg_solve(
            A, b, policy=policy, M=as_preconditioner(h), precise_dot=precise
        )
    )
    t_mg, mg = timed(lambda b: mg_jit(h, A, b))

    assert bool(mg.converged), f"MGCG failed to converge: residual {float(mg.residual):.3e}"
    print(
        json.dumps(
            {
                "metric": f"mgcg_poisson2d_{n}_time",
                "value": round(t_mg, 6),
                "unit": "s",
                "vs_baseline": round(t_plain / t_mg, 3),
                "platform": platform,
                "n": n,
                "mgcg_iters": int(mg.iterations),
                "plain_cg_iters": int(plain.iterations),
                "plain_cg_s": round(t_plain, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
