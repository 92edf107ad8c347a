"""Round-4 AMG cycle measurement: Pallas CM level operators vs the XLA path.

The r3 trail on the 511^2 Poisson-as-CSR workload: 1311 ms gather-CSR ->
197.6 ms DIA relayout -> 71.8 ms composition-form transfers.  The remaining
dominant term is the level-operator SpMVs themselves — the smoothers apply
the (flat DIA) operator 2*(pre+post)+1 times per level per cycle through the
XLA DIA path, which CLAUDE.md's ground truths put at 10-20x slower than the
column-major Pallas kernel.  ``AmgHierarchy.use_pallas`` (round-4) reroutes
them; this script banks the number.  Target (VERDICT r3): <= 20 ms/solve.

Run only when no other TPU process is active:
    python scripts/amg_pallas_onchip.py
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
                   "artifacts", "amg_pallas_r04.json")


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.io import from_scipy, to_scipy
    from conjugategradient_tpu.precond.amg import (
        amg_preconditioner,
        build_amg_hierarchy,
    )
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    dtype = np.float32
    rng = np.random.default_rng()

    agrid = (511, 511)
    asys = generators.poisson_system(agrid, dtype=dtype)
    A_csr = from_scipy(to_scipy(asys.A).tocsr())
    apol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=2000)
    ab_flat = jnp.asarray(asys.b, dtype=dtype)

    def run_amg(h_, A_, b_, scales):
        M = amg_preconditioner(h_)

        def step(prev_x, sc):
            res = cg_solve(A_, b_ * sc + 1e-30 * prev_x, policy=apol, M=M,
                           precise_dot=True)
            return res.x, (res.iterations, res.residual, res.converged)

        x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
        return x, aux

    run_amg_j = jax.jit(run_amg)

    def timed(h_, A_dev, k_pair, tries=3):
        times, aux = {}, None
        for k in k_pair:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            o = run_amg_j(h_, A_dev, ab_flat, scales)
            jax.block_until_ready(o)
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                o = run_amg_j(h_, A_dev, ab_flat, scales)
                float(np.asarray(o[1][1]).ravel()[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = o[1]
        k1, k2 = k_pair
        return (times[k2] - times[k1]) / (k2 - k1), aux

    out = {"workload": "poisson 511^2 as CSR, AMG-CG to 1e-6 rel_l2", "n": asys.n}
    t0 = time.perf_counter()
    h_x = build_amg_hierarchy(A_csr, dtype=dtype, use_pallas=False)
    out["setup_s"] = round(time.perf_counter() - t0, 2)
    import dataclasses

    h_p = dataclasses.replace(h_x, use_pallas=True)

    for tag, h_, kp in (("xla_dia", h_x, (2, 22)), ("pallas_cm", h_p, (2, 22))):
        per, aux = timed(h_, h_.levels[0].A, kp)
        out[tag] = {
            "ms": round(1e3 * per, 3),
            "its": int(np.asarray(aux[0])[-1]),
            "converged": bool(np.asarray(aux[2]).all()),
        }
        print(f"{tag}: {1e3*per:.2f} ms, {out[tag]['its']} its, "
              f"converged={out[tag]['converged']}", flush=True)

    out["speedup"] = round(out["xla_dia"]["ms"] / out["pallas_cm"]["ms"], 2)
    out["level_types"] = [type(l.A).__name__ for l in h_x.levels]
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
