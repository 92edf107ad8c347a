"""On-chip measurement: auto-semicoarsened MGCG on anisotropic diffusion.

1023x1023, coefficient ratio 1000:1 (the measured full-coarsening failure
class: 6 -> 130 its on CPU at 127^2), fp32, bench.py's scan-differenced
timing with scalar readback.  Writes artifacts/aniso_onchip_r03.json.
Run only when no other TPU process is active.
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
    system = generators.anisotropic_diffusion_system(grid, (0.001, 1.0), dtype=dtype)
    policy = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=8 * system.A.n)
    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    rng = np.random.default_rng()

    def make_scan(h_semi):
        def run(h_, A_, b_, scales):
            def step(prev_x, sc):
                res = cg_solve(
                    A_, b_ * sc + 1e-30 * prev_x, policy=policy,
                    M=as_preconditioner(h_), precise_dot=True,
                )
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    def timed(h, k_pair, tries=3):
        runj = make_scan(h)
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

    out = {"device": str(jax.devices()[0]), "n": system.A.n, "ratio": "1000:1"}
    t0 = time.perf_counter()
    h_semi = build_hierarchy(system.A, grid, dtype=np.dtype(dtype))
    out["semi_setup_s"] = round(time.perf_counter() - t0, 2)
    out["semi_level_kinds"] = [l.transfer for l in h_semi.levels]
    per, (its, _, convs) = timed(h_semi, (2, 42))
    assert bool(np.asarray(convs).all())
    out["semi_ms"] = round(1e3 * per, 3)
    out["semi_its"] = int(np.asarray(its)[-1])
    print("semi", out["semi_ms"], "ms,", out["semi_its"], "it", flush=True)

    h_full = build_hierarchy(system.A, grid, dtype=np.dtype(dtype), semicoarsen=False)
    per_f, (its_f, _, convs_f) = timed(h_full, (1, 5))
    out["full_ms"] = round(1e3 * per_f, 3)
    out["full_its"] = int(np.asarray(its_f)[-1])
    out["full_converged"] = bool(np.asarray(convs_f).all())
    if out["full_converged"]:
        out["speedup"] = round(per_f / per, 2)
    print("full", out["full_ms"], "ms,", out["full_its"], "it", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "aniso_onchip_r03.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
