"""Phase breakdown of the flagship refined solve (cublas_flagship).

Answers "where do the seconds go" for the mixed-precision refinement path on
the band-160 N=207,402 reference workload (``Mgcg/cuBlas/Mgcg/MgcgMain.cs``):
per outer pass, how much time is the host fp64 true-residual SpMV, the
host<->device transfer, and the on-device inner CG (and how many inner
iterations) — so a wall-clock regression can be attributed instead of
guessed at.  Reuses refined_solve's exact building blocks rather than
duplicating its algorithm.

Measured through the serving tunnel (artifacts/flagship_profile_r02.json):
the on-device inner CG is 0.14 s TOTAL (34 iterations, Pallas CM kernel) and
the fp64 host SpMV 0.57 s — but each result *download* costs ~60 s through
the tunnel (257 s of the 258 s wall).  On locally-attached hardware the D2H
of a 207k-element vector is sub-ms, so the box's wall-clock for this
workload measures the tunnel, not the framework; this is why bench.py times
chained solves inside one program instead (CLAUDE.md timing discipline).

Usage: python scripts/flagship_profile.py [--cpu] [--inner-tol 1e-4]
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
    p.add_argument("--inner-tol", type=float, default=1e-4)
    p.add_argument("--no-pallas", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.models import WORKLOADS
    from conjugategradient_tpu.ops.pallas_spmv import cm_apply, from_cm, plan_dia_cm, to_cm
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    w = WORKLOADS["cublas_flagship"]
    fsys = w.build(dtype=np.float64)
    A, b, x0 = fsys.A, np.asarray(fsys.b, np.float64), np.asarray(fsys.x0, np.float64)
    n = A.n
    tol, norm = w.policy.tol, w.policy.norm

    use_pallas = (not args.no_pallas) and jax.default_backend() == "tpu"
    device_dtype = np.float32
    A_dev = A.device_put(device_dtype)
    inner_policy = ConvergencePolicy(
        tol=args.inner_tol, norm="rel_l2", max_iteration=min(8 * n, 1_000_000)
    )
    if use_pallas:
        plan = plan_dia_cm(tuple(A.offsets), n)
        solve_jit = jax.jit(
            lambda A_, r_cm: cg_solve(
                lambda v: cm_apply(A_, v), r_cm, policy=inner_policy, precise_dot=True
            )
        )

        def solve(r):
            res = solve_jit(A_dev, to_cm(r, plan))
            return dataclasses.replace(res, x=from_cm(res.x, plan))

    else:
        solve_jit = jax.jit(
            lambda A_, r: cg_solve(A_, r, policy=inner_policy, precise_dot=True)
        )
        solve = lambda r: solve_jit(A_dev, r)

    # warm the compile (not counted)
    _ = solve(jnp.zeros(n, device_dtype).at[0].set(1.0))
    jax.block_until_ready(_.x)

    x = x0.copy()
    r0 = b - oracle.spmv(A, x)
    rr0 = float(r0 @ r0)
    passes = []
    t_total0 = time.perf_counter()
    for outer in range(40):
        t0 = time.perf_counter()
        r = b - oracle.spmv(A, x)
        rr = float(r @ r)
        res = oracle.residual_norm(r, rr, rr0, norm)
        t_host_spmv = time.perf_counter() - t0
        if res < tol:
            passes.append({"outer": outer, "residual": res, "host_spmv_s": round(t_host_spmv, 4)})
            break
        s = float(np.max(np.abs(r)))
        t1 = time.perf_counter()
        r_dev = jnp.asarray((r / s).astype(device_dtype))
        r_dev.block_until_ready()
        t_upload = time.perf_counter() - t1
        t2 = time.perf_counter()
        dres = solve(r_dev)
        jax.block_until_ready(dres.x)
        t_device = time.perf_counter() - t2
        t3 = time.perf_counter()
        d = np.asarray(dres.x, dtype=np.float64)
        x = x + s * d
        t_down_axpy = time.perf_counter() - t3
        passes.append(
            {
                "outer": outer,
                "residual": res,
                "inner_iters": int(dres.iterations),
                "host_spmv_s": round(t_host_spmv, 4),
                "upload_s": round(t_upload, 4),
                "device_solve_s": round(t_device, 4),
                "down_axpy_s": round(t_down_axpy, 4),
            }
        )
    t_total = time.perf_counter() - t_total0

    agg = {
        "total_s": round(t_total, 3),
        "host_spmv_s": round(sum(p["host_spmv_s"] for p in passes), 3),
        "device_solve_s": round(sum(p.get("device_solve_s", 0.0) for p in passes), 3),
        "upload_s": round(sum(p.get("upload_s", 0.0) for p in passes), 3),
        "down_axpy_s": round(sum(p.get("down_axpy_s", 0.0) for p in passes), 3),
        "inner_iters": sum(p.get("inner_iters", 0) for p in passes),
        "outer_passes": len(passes),
        "final_residual": passes[-1]["residual"],
        "use_pallas": use_pallas,
        "inner_tol": args.inner_tol,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps({"passes": passes, "summary": agg}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
