"""On-chip IDR(s) measurement: idr(4) vs BiCGStab wall time and matvecs on
a 1,046,529-row nonsymmetric banded system (fp32, rel 1e-6) — validates the
shadow-space (s, n) matmul path on real hardware and records the honest
wall-time trade (IDR pays extra axpys + shadow Grams per matvec).  Appends
to artifacts/r3s2_onchip.json.  Run only when no other TPU process is
active.
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
                   "artifacts", "r3s2_onchip.json")


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
    from conjugategradient_tpu.solvers.idr import idr_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    dtype = np.float32
    rng = np.random.default_rng()
    with open(OUT) as f:
        out = json.load(f)

    # 255^2 mild convection-diffusion: hundreds of matvecs (a banded-sin
    # nonsym system converged in 10 — too easy to time through the tunnel,
    # which produced an impossible negative scan diff on the first attempt)
    grid = (255, 255)
    sys_ = generators.convection_diffusion_system(grid, eps=0.5, dtype=np.float64)
    n = sys_.A.n
    A = sys_.A.device_put(dtype=dtype)
    b = jnp.asarray(sys_.b, dtype=dtype)
    pol = ConvergencePolicy(tol=1e-5, norm="rel_l2", max_iteration=20000)

    def make_scan(solver, **skw):
        def run(A_, b_, scales):
            def step(prev_x, sc):
                res = solver(A_, b_ * sc + 1e-30 * prev_x, policy=pol, **skw)
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    def timed(runj, k_pair, tries=3):
        times, aux = {}, None
        for k in k_pair:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            o = runj(A, b, scales)
            jax.block_until_ready(o)
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                o = runj(A, b, scales)
                float(np.asarray(o[1][1]).ravel()[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = o[1]
        k1, k2 = k_pair
        return (times[k2] - times[k1]) / (k2 - k1), aux

    per_i, aux_i = timed(make_scan(idr_solve, s=4), (2, 12))
    out["idr4_convdiff_255sq"] = {
        "n": n, "eps": 0.5,
        "ms": round(1e3 * per_i, 2),
        "matvecs": int(np.asarray(aux_i[0])[-1]),
        "converged": bool(np.asarray(aux_i[2]).all()),
    }
    print(f"idr(4): {1e3*per_i:.2f} ms, {out['idr4_convdiff_255sq']['matvecs']} mv",
          flush=True)
    per_b, aux_b = timed(make_scan(bicgstab_solve), (2, 12))
    out["bicgstab_convdiff_255sq"] = {
        "ms": round(1e3 * per_b, 2),
        "matvecs": 2 * int(np.asarray(aux_b[0])[-1]),
        "converged": bool(np.asarray(aux_b[2]).all()),
        "idr_over_bicgstab_time": round(per_i / per_b, 2),
    }
    print(f"bicgstab: {1e3*per_b:.2f} ms, "
          f"{out['bicgstab_convdiff_255sq']['matvecs']} mv "
          f"(idr/bicgstab time {per_i/per_b:.2f}x)", flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
