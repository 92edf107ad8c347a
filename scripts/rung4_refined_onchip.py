"""Rung-4 at the reference-grade tolerance: 255^3 (16.6M rows) to a TRUE
fp64 relative residual of 1e-8 via mixed-precision iterative refinement on
the rediscretized const-stencil hierarchy.  ``--grid 511`` produces the
133.4M-row capability artifact.

Round-5 (VERDICT r4 #3): the outer loop is DEVICE-RESIDENT
(``refined_solve(device_residual=True)`` — dd residual/norm/update on chip,
three scalar readbacks per pass, one final solution read).  The r4 runs used
fp64 HOST residuals, which shipped 0.5-1 GB vectors through the ~2.5 s-
latency tunnel per pass: 180 s wall for ~8.5 s of device solve at 511^3.
``--host-residual`` keeps the old path for A/B comparison.

Run only when no other TPU process is active:
    python scripts/rung4_refined_onchip.py [--grid 255]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

def _out_path(grid: int) -> str:
    name = "rung4_refined_r05.json" if grid == 255 else f"rung{grid}_refined_r05.json"
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=255)
    ap.add_argument("--host-residual", action="store_true",
                    help="r4 A/B: fp64 host residuals (full-vector D2H/pass)")
    args = ap.parse_args()
    assert jax.devices()[0].platform != "cpu", "run on the TPU"

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.solvers.refine import refined_solve

    g = (args.grid,) * 3
    system = generators.poisson_system(g, dtype=np.float64)
    t0 = time.perf_counter()
    h = build_hierarchy(
        system.A, g, smoother="chebyshev", pre=2, post=2, dtype=np.float32,
        coarse_operator=generators.poisson_coarse_operator(np.float32),
    )
    setup_s = time.perf_counter() - t0

    best = float("inf")
    rres = None
    best_t = None
    reps = 2  # first call compiles; min over reps (device-resident passes
    # are cheap enough that two reps fit the 511^3 budget too)
    for _ in range(reps):
        t0 = time.perf_counter()
        rres = refined_solve(
            system.A, system.b, tol=1e-8, norm="rel_l2", grid=g,
            inner_tol=1e-5, device_dtype=np.float32, hierarchy=h,
            device_residual=not args.host_residual,
        )
        w = time.perf_counter() - t0
        if w < best:
            best, best_t = w, rres.timings

    x = np.asarray(rres.x, np.float64)
    r = system.b - oracle.spmv(system.A, x)
    true_rel = float(np.linalg.norm(r) / np.linalg.norm(system.b))

    # tunnel-I/O phase estimate (the reference's input/output phases,
    # MgcgMain.cs:165-167): the device-resident contract still ships b in
    # (2 fp32 arrays as a dd pair) and the solution out (2 fp32 arrays) —
    # on this serving tunnel that bulk I/O dominates wall; on a
    # host-attached chip it is PCIe-speed noise.  Measure it directly.
    out = {
        "experiment": "rung4_refined_1e-8",
        "outer_loop": "host_fp64" if args.host_residual else "device_dd",
        "grid": list(g),
        "n": system.n,
        "tol": 1e-8,
        "norm": "rel_l2",
        "wall_s": round(best, 2),
        # the reference's input/exec/output phase convention, measured
        # inside the device-resident loop: input/output = the dd pairs'
        # bulk tunnel I/O (PCIe-speed noise on attached hardware; seconds
        # and highly variable through the serving tunnel), exec = the
        # refinement loop itself (inner solves + 3 scalar readbacks/pass)
        "phases": best_t,
        "setup_s": round(setup_s, 1),
        "outer_iterations": int(rres.outer_iterations),
        "inner_iterations": int(rres.inner_iterations),
        "converged": bool(rres.converged),
        "stalled": bool(rres.stalled),
        "true_fp64_rel_residual": true_rel,
    }
    print(json.dumps(out))
    with open(_out_path(args.grid), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
