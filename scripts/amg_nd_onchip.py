"""Round-5 AMG on-chip: N-D cube-blocked (gather-free) aggregation.

r4 banked the 1-D blocked cycle at 4.08 ms/solve on 511^2 Poisson-as-CSR
(17.6x over greedy's gather-bound 71.8 ms) but its strips cost 10-vs-6
iterations, its stencils explode down the hierarchy (ndiags 5 -> 17 -> 53 ->
161 -> 325), and nonsymmetric inputs were excluded entirely (strips ignore
the convection direction: 143-vs-12 its).  r5's ``_infer_grid`` recovers the
tensor grid from the banded offsets and blocks with edge-3 CUBES: stencils
stay 9-diag forever, iterations match greedy, and the same zero-gather
transfers carry NONSYMMETRIC operators (auto-unsmoothed P keeps the
composition exact) — CPU-measured 67-vs-110 / 52-vs-144 its against greedy
on 255^2/511^2 convection.  This banks both on chip:

  1. symmetric 511^2 Poisson-as-CSR (the r4 exhibit): greedy vs 1-D blocked
     vs ND cubes, same (2, 22) chained-solve protocol;
  2. nonsymmetric 511^2 convection-diffusion-as-CSR (eps=0.05) via
     AMG-BiCGStab: greedy vs ND cubes — the VERDICT r4 #4 target
     (<= 20 ms/solve, its within 1.5x of greedy).

Run only when no other TPU process is active:
    python scripts/amg_nd_onchip.py
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "amg_nd_r05.json")


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.io import from_scipy, to_scipy
    from conjugategradient_tpu.precond.amg import (
        amg_preconditioner,
        build_amg_hierarchy,
    )
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    dtype = np.float32
    rng = np.random.default_rng()

    def make_runner(solver, pol):
        def run(h_, A_, b_, scales):
            M = amg_preconditioner(h_)

            def step(prev_x, sc):
                res = solver(A_, b_ * sc + 1e-30 * prev_x, policy=pol, M=M)
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    def timed(runj, h_, A_dev, b_, k_pair, tries=4):
        times, aux = {}, None
        for k in k_pair:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            o = runj(h_, A_dev, b_, scales)
            float(np.asarray(o[1][1]).ravel()[-1])  # force the warm chain
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                o = runj(h_, A_dev, b_, scales)
                float(np.asarray(o[1][1]).ravel()[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = o[1]
        k1, k2 = k_pair
        return (times[k2] - times[k1]) / (k2 - k1), aux

    out = {}

    # --- 1. symmetric: 511^2 Poisson-as-CSR, AMG-CG to 1e-6 rel ----------
    agrid = (511, 511)
    asys = generators.poisson_system(agrid, dtype=dtype)
    A_csr = from_scipy(to_scipy(asys.A).tocsr())
    apol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=2000)
    ab = jnp.asarray(asys.b, dtype=dtype)
    cg_runner = make_runner(
        lambda A_, b_, policy, M: cg_solve(A_, b_, policy=policy, M=M,
                                           precise_dot=True),
        apol,
    )
    sym = {"workload": "poisson 511^2 as CSR, AMG-CG to 1e-6 rel_l2",
           "n": asys.n}
    for tag, kw in (
        ("greedy", dict(aggregation="greedy")),
        ("blocked1d", dict(aggregation="blocked", blk=4, infer_grid=False)),
        ("nd_cubes", dict(aggregation="auto")),
    ):
        t0 = time.perf_counter()
        h_ = build_amg_hierarchy(A_csr, dtype=dtype, use_pallas=False, **kw)
        setup_s = time.perf_counter() - t0
        per, aux = timed(cg_runner, h_, h_.levels[0].A, ab, (2, 22))
        sym[tag] = {
            "ms": round(1e3 * per, 3),
            "its": int(np.asarray(aux[0])[-1]),
            "converged": bool(np.asarray(aux[2]).all()),
            "setup_s": round(setup_s, 2),
            "levels": [
                (type(l.A).__name__, int(l.A.n), int(l.blk),
                 list(l.blk_nd[1]) if l.blk_nd else None)
                for l in h_.levels
            ],
        }
        print(f"sym/{tag}: {sym[tag]['ms']:.2f} ms, {sym[tag]['its']} its, "
              f"converged={sym[tag]['converged']}", flush=True)
    sym["speedup_nd_vs_greedy"] = round(
        sym["greedy"]["ms"] / sym["nd_cubes"]["ms"], 2)
    out["symmetric"] = sym
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)

    # --- 2. nonsymmetric: 511^2 convection-diffusion-as-CSR --------------
    csys = generators.convection_diffusion_system((511, 511), eps=0.05,
                                                  dtype=dtype)
    C_csr = from_scipy(to_scipy(csys.A).tocsr())
    cpol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=4000)
    cb = jnp.asarray(csys.b, dtype=dtype)
    bi_runner = make_runner(
        lambda A_, b_, policy, M: bicgstab_solve(A_, b_, policy=policy, M=M),
        cpol,
    )
    nonsym = {
        "workload": "convection-diffusion 511^2 eps=0.05 as CSR, "
                    "AMG-BiCGStab to 1e-6 rel_l2",
        "n": csys.n,
    }
    for tag, kw in (
        ("greedy", dict(aggregation="greedy")),
        ("nd_cubes", dict(aggregation="auto")),
    ):
        t0 = time.perf_counter()
        h_ = build_amg_hierarchy(C_csr, dtype=dtype, smoother="jacobi",
                                 use_pallas=False, **kw)
        setup_s = time.perf_counter() - t0
        per, aux = timed(bi_runner, h_, h_.levels[0].A, cb, (2, 12))
        nonsym[tag] = {
            "ms": round(1e3 * per, 3),
            "its": int(np.asarray(aux[0])[-1]),
            "converged": bool(np.asarray(aux[2]).all()),
            "setup_s": round(setup_s, 2),
            "levels": [
                (type(l.A).__name__, int(l.A.n), int(l.blk),
                 list(l.blk_nd[1]) if l.blk_nd else None)
                for l in h_.levels
            ],
        }
        print(f"nonsym/{tag}: {nonsym[tag]['ms']:.2f} ms, "
              f"{nonsym[tag]['its']} its, "
              f"converged={nonsym[tag]['converged']}", flush=True)
    nonsym["speedup_nd_vs_greedy"] = round(
        nonsym["greedy"]["ms"] / nonsym["nd_cubes"]["ms"], 2)
    out["nonsymmetric"] = nonsym

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
