"""133.4M rows (511^3) to TRUE fp64 tolerance on one chip.

The capability statement that closes the precision story at the largest
single-chip scale: mixed-precision refinement (fp32 const-stencil MGCG
inners + fp64 host residuals) on the 511^3 Poisson system to an absolute
fp64 contract the chip's fp32 units cannot express alone.

Run only when no other TPU process is active:
    python scripts/rung511_refined_onchip.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "rung511_refined_r04.json")


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.refine import refined_solve

    g = (511, 511, 511)
    t0 = time.perf_counter()
    system = generators.poisson_system(g, dtype=np.float64)
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    h = build_hierarchy(
        system.A, g, smoother="chebyshev", pre=2, post=2, dtype=np.float32,
        coarse_operator=generators.poisson_coarse_operator(np.float32),
    )
    setup_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    rres = refined_solve(
        system.A, system.b, tol=1e-8, norm="rel_l2", grid=g,
        inner_tol=1e-5, device_dtype=np.float32, hierarchy=h,
    )
    wall = time.perf_counter() - t0

    x = np.asarray(rres.x, np.float64)
    r = system.b - oracle.spmv(system.A, x)
    true_rel = float(np.linalg.norm(r) / np.linalg.norm(system.b))
    out = {
        "experiment": "rung511_refined_1e-8",
        "grid": list(g),
        "n": system.n,
        "tol": 1e-8,
        "norm": "rel_l2",
        "wall_s": round(wall, 2),
        "gen_s": round(gen_s, 1),
        "setup_s": round(setup_s, 1),
        "outer_iterations": int(rres.outer_iterations),
        "inner_iterations": int(rres.inner_iterations),
        "converged": bool(rres.converged),
        "stalled": bool(rres.stalled),
        "true_fp64_rel_residual": true_rel,
    }
    print(json.dumps(out))
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
