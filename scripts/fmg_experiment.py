"""On-chip experiment: FMG-bootstrapped MGCG vs plain MGCG on the flagship.

Full multigrid (coarsest-first cascade, `precond.multigrid.fmg`) produces a
discretization-accurate iterate in ~1.5 V-cycle-equivalents; starting MGCG
from it should shave iterations off the 3-iteration flagship solve.  Also
tries the W-cycle (gamma=2) preconditioner at the flagship size.

Timing: bench.py's scan-differencing with scalar readback.  Writes
artifacts/fmg_experiment_r03.json.  Run only when no other TPU process is
active.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.precond.multigrid import fmg, v_cycle
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    grid = (1023, 1023)
    dtype = np.float32
    system = generators.poisson_system(grid, dtype=dtype)
    policy = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=8 * system.n)
    h = build_hierarchy(system.A, grid, dtype=np.dtype(dtype))
    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    rng = np.random.default_rng()

    def make_scan(mode, gamma=1):
        def run(h_, A_, b_, scales):
            M = (
                as_preconditioner(h_)
                if gamma == 1
                else (lambda r: v_cycle(h_, r, gamma=gamma))
            )

            def step(prev_x, s):
                bb = b_ * s + 1e-30 * prev_x
                x0 = fmg(h_, bb) if mode == "fmg" else None
                res = cg_solve(A_, bb, x0=x0, policy=policy, M=M, precise_dot=True)
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    def timed(runj, k_pair=(2, 82), tries=3):
        times = {}
        aux = None
        for k in k_pair:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            out = runj(h, A, b, scales)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32)
                )
                t0 = time.perf_counter()
                out = runj(h, A, b, scales)
                float(np.asarray(out[1][1])[-1])  # scalar readback
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = out[1]
        k1, k2 = k_pair
        return (times[k2] - times[k1]) / (k2 - k1), aux

    out = {"device": str(jax.devices()[0]), "n": system.n}
    for mode, gamma, key in [
        ("plain", 1, "mgcg"),
        ("fmg", 1, "fmg_mgcg"),
        ("plain", 2, "wcycle_cg"),
    ]:
        per, (its, ress, convs) = timed(make_scan(mode, gamma))
        assert bool(np.asarray(convs).all()), f"{key} did not converge"
        out[f"{key}_ms"] = round(1e3 * per, 4)
        out[f"{key}_its"] = int(np.asarray(its)[-1])
        print(key, out[f"{key}_ms"], "ms,", out[f"{key}_its"], "it", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "fmg_experiment_r03.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
