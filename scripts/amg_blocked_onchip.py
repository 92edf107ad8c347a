"""Round-4 AMG on-chip: blocked (gather-free) aggregation vs greedy.

r4 profile of the 511^2 Poisson-as-CSR cycle (71.8 ms/solve, 9.2 ms/V-cycle):
the level-0 segment_sum+gather transfer round trip alone is 3.99 ms, the CSR
tail levels ~2.8 ms — TPU scatters/gathers, not SpMVs, are the whole cycle
(rerouting level SpMVs through the Pallas CM kernel moved nothing: 71.8 ->
71.3 ms).  ``aggregation="blocked"`` replaces them: contiguous aggregates
make restrict a reshape-sum and prolong a broadcast — zero gathers — and
keep every Galerkin level banded (no CSR tail), at ~2x the iterations
(measured fp64: 8 -> 15 at 511^2).  This banks the net effect.

Run only when no other TPU process is active:
    python scripts/amg_blocked_onchip.py
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
                   "artifacts", "amg_blocked_r04.json")


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
    for tag, kw in (
        ("greedy", dict(aggregation="greedy")),
        ("blocked4", dict(aggregation="blocked", blk=4)),
        ("blocked6", dict(aggregation="blocked", blk=6)),
    ):
        t0 = time.perf_counter()
        h_ = build_amg_hierarchy(A_csr, dtype=dtype, use_pallas=False, **kw)
        setup_s = time.perf_counter() - t0
        per, aux = timed(h_, h_.levels[0].A, (2, 22))
        out[tag] = {
            "ms": round(1e3 * per, 3),
            "its": int(np.asarray(aux[0])[-1]),
            "converged": bool(np.asarray(aux[2]).all()),
            "setup_s": round(setup_s, 2),
            "levels": [
                (type(l.A).__name__, int(l.A.n), int(l.blk)) for l in h_.levels
            ],
        }
        print(f"{tag}: {out[tag]['ms']:.2f} ms, {out[tag]['its']} its, "
              f"converged={out[tag]['converged']}", flush=True)

    out["speedup_blocked4_vs_greedy"] = round(
        out["greedy"]["ms"] / out["blocked4"]["ms"], 2
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
