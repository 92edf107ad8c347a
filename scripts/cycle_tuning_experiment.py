"""On-chip experiment: V-cycle smoothing budget vs MGCG iteration count.

The flagship MGCG solve is V-cycle-dominated; the (pre, post) smoothing
budget trades per-cycle cost against iteration count.  Sweeps (pre, post)
on the 1023^2 Poisson flagship with the chebyshev smoother, bench.py's
scan-differenced timing + scalar readback.  Writes
artifacts/cycle_tuning_r03.json.  Run only when no other TPU process is
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
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    grid = (1023, 1023)
    dtype = np.float32
    system = generators.poisson_system(grid, dtype=dtype)
    policy = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=8 * system.n)
    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    rng = np.random.default_rng()

    def make_scan():
        def run(h_, A_, b_, scales):
            def step(prev_x, s):
                res = cg_solve(
                    A_, b_ * s + 1e-30 * prev_x, policy=policy,
                    M=as_preconditioner(h_), precise_dot=True,
                )
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    runj = make_scan()  # one program; hierarchies differ only in pytree data
    # NOTE: pre/post are PYTREE METADATA (static) — each (pre, post) pair
    # recompiles; that is fine, the cache persists.

    def timed(h, k_pair=(2, 82), tries=3):
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
    for pre, post in [(2, 2), (2, 1), (1, 1), (3, 3)]:
        h = build_hierarchy(
            system.A, grid, dtype=np.dtype(dtype), pre=pre, post=post
        )
        per, (its, ress, convs) = timed(h)
        assert bool(np.asarray(convs).all()), f"({pre},{post}) did not converge"
        key = f"pre{pre}_post{post}"
        out[key] = {"ms": round(1e3 * per, 4), "its": int(np.asarray(its)[-1])}
        print(key, out[key], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "cycle_tuning_r03.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
