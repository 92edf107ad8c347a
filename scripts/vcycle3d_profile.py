"""Round-5 (VERDICT r4 #6): decompose the 3-D 255^3 V-cycle against its
bandwidth bound.

The r5 bench measures 255^3 MGCG at ~44 ms / 5 its = ~8.8 ms/iteration.
The fine-level const stencil ships zero matrix bytes, so one cheb(2,2)
iteration moves ~(2*(pre+post)+3) ~ 10 vector passes x 66 MB = ~0.7 GB =
~1 ms at the 745 GB/s canary rate — where do the other ~8 ms go?  Two
instruments:

  1. per-depth V-cycle cost: time MGCG solves with the hierarchy truncated
     at ``max_levels`` = full..3 (the truncated tail becomes a dense-inverse
     coarse solve; 15^3 = 3375 -> 45 MB inverse, fine; 31^3 would be 3.5 GB
     -> skipped), separating "fine-level streaming" from "coarse-chain
     latency";
  2. level-L smoother cost: chained cheb(2,2) applications per level size,
     giving the per-level streaming floor the cycle should sum to.

Writes artifacts/vcycle3d_profile_r05.json.  Run only when no other TPU
process is active.
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
                   "artifacts", "vcycle3d_profile_r05.json")


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.precond.multigrid import v_cycle
    from conjugategradient_tpu.precond.smoothers import chebyshev_smooth
    from conjugategradient_tpu.ops.spmv import as_operator
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    dtype = np.float32
    rng = np.random.default_rng()
    g3 = (255, 255, 255)
    sys3 = generators.poisson_system(g3, dtype=dtype)
    pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=8 * sys3.n)
    b3 = jnp.asarray(sys3.b, dtype=dtype).reshape(g3)

    def timed_scan(run, args, k_pair, tries=3):
        times = {}
        aux = None
        for k in k_pair:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            o = run(*args, scales)
            float(np.asarray(o[0]).ravel()[-1])  # force the warm chain
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                o = run(*args, scales)
                float(np.asarray(o[0]).ravel()[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = o
        k1, k2 = k_pair
        return (times[k2] - times[k1]) / (k2 - k1), aux

    out = {"grid": list(g3), "n": sys3.n}

    # --- 1. per-depth truncation ladder ---------------------------------
    depth_rows = []
    for max_lv in (25, 6, 5, 4):
        t0 = time.perf_counter()
        try:
            h = build_hierarchy(
                sys3.A, g3, smoother="chebyshev", pre=2, post=2, dtype=dtype,
                coarse_operator=generators.poisson_coarse_operator(dtype),
                max_levels=max_lv,
            )
        except ValueError as e:  # redisc refuses over-truncated hierarchies
            print(f"max_levels={max_lv}: {e}", flush=True)
            continue
        setup_s = time.perf_counter() - t0
        nc = int(h.coarse_inv.shape[0])
        if nc > 20000:
            print(f"max_levels={max_lv}: coarse {nc} too large for a dense "
                  f"inverse, skipped", flush=True)
            continue
        A0 = h.levels[0].A if h.levels else None

        def run(h, A, b, scales):
            M = as_preconditioner(h)

            def step(prev_x, s):
                res = cg_solve(A, b * s + 1e-30 * prev_x, policy=pol, M=M,
                               precise_dot=True)
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b), scales)
            return aux[1], aux[0], aux[2]

        runj = jax.jit(run)
        per, aux = timed_scan(runj, (h, A0, b3), (1, 13))
        row = {
            "max_levels": max_lv,
            "levels": len(h.levels),
            "coarse_n": nc,
            "setup_s": round(setup_s, 1),
            "solve_ms": round(per * 1e3, 2),
            "its": int(np.asarray(aux[1])[-1]),
            "converged": bool(np.asarray(aux[2]).all()),
            "ms_per_iter": round(per * 1e3 / max(int(np.asarray(aux[1])[-1]), 1), 2),
        }
        depth_rows.append(row)
        print(f"max_levels={max_lv}: {row['solve_ms']} ms, {row['its']} its "
              f"({row['ms_per_iter']} ms/it), levels={row['levels']}+1 "
              f"coarse_n={nc}", flush=True)
    out["depth_ladder"] = depth_rows
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)

    # --- 2. per-level smoother streaming cost ---------------------------
    h = build_hierarchy(
        sys3.A, g3, smoother="chebyshev", pre=2, post=2, dtype=dtype,
        coarse_operator=generators.poisson_coarse_operator(dtype),
    )
    lvl_rows = []
    for li, lvl in enumerate(h.levels):
        A_l = lvl.A
        shape = A_l.grid if hasattr(A_l, "grid") else (A_l.n,)
        v0 = jnp.asarray(rng.standard_normal(shape).astype(dtype))
        bl = jnp.asarray(rng.standard_normal(shape).astype(dtype))

        def run(A_l, inv_d, bl, v, scales, lvl=lvl):
            op = as_operator(A_l)
            lo, hi = lvl.cheb_bounds

            def step(w, s):
                w = chebyshev_smooth(op, inv_d, bl, w * s, 4, hi, lo)
                return w, jnp.vdot(w, w)

            w, d = jax.lax.scan(step, v, scales)
            return d, w

        runj = jax.jit(run)
        k_pair = (16, 528) if int(np.prod(shape)) < 3_000_000 else (4, 68)
        per, _ = timed_scan(runj, (A_l, lvl.inv_diag, bl, v0), k_pair)
        n_l = int(np.prod(shape))
        lvl_rows.append({
            "level": li,
            "n": n_l,
            "kind": type(A_l).__name__,
            "cheb4_us": round(per * 1e6, 1),
            # cheb-4 streams ~9 full vector passes (4 SpMV + axpys)
            "implied_gb_s": round(9 * 4.0 * n_l / per / 1e9, 1),
        })
        print(f"level {li}: n={n_l} cheb4 {per*1e6:.1f} us", flush=True)
    out["levels_cheb4"] = lvl_rows
    # one full v_cycle for reference
    M = as_preconditioner(h)

    def run_vc(h, b, scales):
        def step(w, s):
            y = M(b * s + 1e-30 * w)
            return y, jnp.vdot(y, y)

        w, d = jax.lax.scan(step, jnp.zeros_like(b), scales)
        return d, w

    # M closes over h (trace-time constant here is fine for a one-off probe
    # at fixed h — the pytree is passed via closure but jit is fresh)
    runj = jax.jit(lambda b, scales: run_vc(h, b, scales))
    per, _ = timed_scan(runj, (b3,), (4, 68))
    out["v_cycle_ms"] = round(per * 1e3, 3)
    print(f"one V-cycle: {per*1e3:.3f} ms", flush=True)

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
