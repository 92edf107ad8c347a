"""On-chip experiment: device-resident (dd) refinement vs host-residual.

The round-2 flagship profile (``artifacts/flagship_profile_r02.json``) showed
the refined flagship solve at ~5.5 s wall with only ~0.14 s device compute —
the rest is per-pass full-vector D2H + host fp64 SpMV through the serving
tunnel.  ``refined_solve(device_residual=True)`` moves the outer loop onto
the chip in double-float arithmetic (``ops/dd.py``): per pass, two device
programs and three scalar readbacks.

Measures, on the attached TPU:
  1. flagship (band-160, n=207,402, absolute 1e-8, reference-exact): wall
     time host-residual vs device-residual, both oracle-validated on host.
  2. 1023^2 2-D Poisson (~1M rows) MGCG-refined to absolute 1e-8: same
     comparison at ladder-rung-3 scale.

Wall-clock here is honest despite the tunnel's memoization because each
repetition perturbs x0 (different executions), and the quantity of interest
(seconds of round trips) dwarfs the ~ms jitter.

Writes artifacts/dd_refine_r02.json.
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_case(name, A, b, x0, tol, norm, grid, reps, **kw):
    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.solvers.refine import refined_solve

    out = {}
    for mode, dev_res in [("host_residual", False), ("device_residual", True)]:
        walls = []
        last = None
        for j in range(reps):
            x0j = None if x0 is None else x0 * (1.0 + 1e-9 * (j + 1))
            t0 = time.perf_counter()
            res = refined_solve(
                A, b, x0j, tol=tol, norm=norm, grid=grid,
                device_residual=dev_res, **kw,
            )
            walls.append(time.perf_counter() - t0)
            last = res
        r64 = b - oracle.spmv(A, last.x)
        true_res = float(np.linalg.norm(r64))
        out[mode] = {
            "walls_s": [round(w, 4) for w in walls],
            "best_wall_s": round(min(walls), 4),
            "outer": last.outer_iterations,
            "inner": int(np.sum(last.inner_iterations)),
            "converged": bool(last.converged),
            "true_residual": true_res,
        }
        print(f"[{name}] {mode}: walls={out[mode]['walls_s']} "
              f"outer={last.outer_iterations} inner={out[mode]['inner']} "
              f"true |r| {true_res:.3e} converged={last.converged}")
        assert true_res < tol * 1.01 or last.converged, f"{name}/{mode} failed"
    out["speedup"] = round(
        out["host_residual"]["best_wall_s"] / out["device_residual"]["best_wall_s"], 2
    )
    print(f"[{name}] device-residual speedup: {out['speedup']}x")
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    platform = jax.devices()[0].platform
    print("platform:", platform)

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.models.workloads import WORKLOADS

    results = {"platform": platform}

    # 1. reference flagship, exact size
    w = WORKLOADS["cublas_flagship"]
    system = w.build(dtype=np.float64)
    results["flagship"] = run_case(
        "flagship", system.A, system.b, system.x0,
        tol=1e-8, norm="l2", grid=None, reps=3, inner_tol=1e-4,
    )

    # 2. rung-3-scale Poisson, MGCG inner
    grid = (1023, 1023)
    psys = generators.poisson_system(grid, dtype=np.float64)
    results["poisson_1023"] = run_case(
        "poisson_1023", psys.A, psys.b, None,
        tol=1e-8, norm="l2", grid=grid, reps=2,
    )

    with open("artifacts/dd_refine_r02.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "platform"}))


if __name__ == "__main__":
    main()
