"""Run every reference driver workload end-to-end, exactly as configured.

The reference has four mains + the R prototype (SURVEY.md §3, BASELINE.md
workload table).  This driver replays all of them through this framework:
build the exact system, solve on device (CG), solve with the CPU oracle,
validate element-wise with the reference's own 1% rule
(``Mgcg/cuBlas/Mgcg/MgcgMain.cs:129-140``), and report phase timings in the
reference's formats.

Run:  python examples/reference_workloads.py [--cpu] [--quick] [--only NAME]
``--quick`` scales every N down ~20x (CI-sized); default is the reference's
exact sizes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUICK_SIZES = {
    "cublas_flagship": 10_368,
    "handmade_cl": 17_280,
    "simple_cuda": 4_096,
    "viennacl_small": 10,
    "viennacl_large": 8_640,
    "r_prototype": 21,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None,
                    help="write per-workload phase rows as a JSON artifact")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_ENABLE_X64"] = "true"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import dataclasses

    import jax.numpy as jnp

    from conjugategradient_tpu import ConvergencePolicy, cg_solve, native
    from conjugategradient_tpu.core import formats
    from conjugategradient_tpu.models import WORKLOADS
    from conjugategradient_tpu.utils import PhaseTimer

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = np.float32 if (on_tpu or not jax.config.jax_enable_x64) else np.float64
    print(f"backend={jax.devices()[0].platform} dtype={np.dtype(dtype).name} "
          f"sizes={'quick' if args.quick else 'reference-exact'}")

    failures = 0
    rows = []
    for name, w in WORKLOADS.items():
        if name.startswith("ladder_"):
            continue  # BASELINE ladder runs in bench.py / mgcg_demo.py
        if args.only and name != args.only:
            continue
        if args.quick:
            w = dataclasses.replace(w, n=QUICK_SIZES[name])
        pol = w.policy

        t = PhaseTimer()
        with t.phase("build"):
            system = w.build(dtype=np.float64)
        with t.phase("oracle"):
            csr = formats.dia_to_csr(system.A)
            ref = native.cg(csr, system.b, system.x0, tol=pol.tol, norm=pol.norm,
                            min_iteration=pol.min_iteration, max_iteration=4 * system.n)
        if dtype == np.float32:
            # fp64-less backend: mixed-precision iterative refinement meets the
            # workload's TRUE tolerance (fp32 device inner solves + fp64 host
            # residuals) — a single fp32 solve cannot (solvers/refine.py).
            from conjugategradient_tpu.solvers.refine import refined_solve

            # high-kappa workloads (the 2^16 tridiagonal: kappa ~ 1.7e9) get a
            # 1-D smoothed-aggregation MGCG inner solver — ~10 inner its
            # instead of ~130k plain-CG its per refinement pass
            mg_grid = (system.n,) if w.builder == "tridiagonal" else None
            with t.phase("solve"):
                rres = refined_solve(
                    system.A, system.b, system.x0, tol=pol.tol, norm=pol.norm,
                    inner_tol=1e-4, device_dtype=np.float32, grid=mg_grid,
                )
            x_dev = rres.x
            it = rres.inner_iterations
            # a refinement that stalls did so at the fp64 residual-evaluation
            # noise floor (eps64 * |A||x| sqrt(n)) — for ill-scaled RHS (e.g.
            # simple_cuda's b=i^2/2) that floor sits above the absolute 1e-8
            # tolerance, which even a pure-fp64 solver can only claim via its
            # recurrence; the elementwise check below is the real arbiter
            converged = rres.converged or rres.stalled
            residual = rres.residual
            extra = f"{rres.outer_iterations} outer" + (" (noise floor)" if rres.stalled else "")
        else:
            with t.phase("input"):
                A = system.A.device_put(dtype=dtype)
                b = jnp.asarray(system.b, dtype=dtype)
                x0 = jnp.asarray(system.x0, dtype=dtype)
            policy = ConvergencePolicy(tol=pol.tol, norm=pol.norm,
                                       min_iteration=pol.min_iteration,
                                       max_iteration=4 * system.n)
            solve = jax.jit(lambda b, x0: cg_solve(A, b, x0, policy))
            with t.phase("compile+first", sync=lambda: res.x):
                res = solve(b, x0)
            with t.phase("solve", sync=lambda: res.x):
                res = solve(b, x0)
            with t.phase("output"):
                x_dev = np.asarray(res.x, dtype=np.float64)
            it = int(res.iterations)
            converged = bool(res.converged)
            residual = float(res.residual)
            extra = ""
        # the reference's own validation: elementwise relative error > 1% flags
        denom = np.maximum(np.abs(ref.x), 1e-3 * np.max(np.abs(ref.x)) + 1e-300)
        rel = np.max(np.abs(x_dev - ref.x) / denom)
        stalled = bool(extra) and "noise floor" in extra
        ok = converged and rel < 1e-2
        failures += 0 if ok else 1
        # stalled-but-validated is labelled distinctly from converged: the
        # recurrence hit the fp64 evaluation noise floor, the elementwise 1%
        # check (the reference's own arbiter) is what passed it
        label = "OK*" if (ok and stalled) else ("OK " if ok else "MISMATCH")
        print(f"[{name:16s}] n={system.n:>8d} {label} "
              f"dev {it:6d} it {extra} (res {residual:.2e}, norm {pol.norm}, tol {pol.tol:g}) | "
              f"oracle {ref.iterations:6d} it | rel err {rel:.2e}")
        print(f"  {t.report(iterations=it)}")
        rows.append({
            "workload": name, "n": int(system.n), "ok": bool(ok),
            "stalled_at_noise_floor": stalled,
            "iterations": int(it), "oracle_iterations": int(ref.iterations),
            "residual": float(residual), "norm": pol.norm, "tol": pol.tol,
            "max_elementwise_rel_err": float(rel),
            # the reference's own input/exec/output split
            # (Mgcg/ViennaCL/MgcgCL/MgcgCLMain.cs:116-134)
            "phases_ms": {p.name: round(p.seconds * 1e3, 2) for p in t.phases},
        })
    print("ALL OK" if failures == 0 else f"{failures} MISMATCHES")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump({
                "platform": jax.devices()[0].platform,
                "dtype": np.dtype(dtype).name,
                "sizes": "quick" if args.quick else "reference-exact",
                "validation": "elementwise rel err < 1% vs fp64 native oracle "
                              "(MgcgMain.cs:129-140 rule)",
                "rows": rows,
            }, f, indent=1)
        print(f"wrote {args.json}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
