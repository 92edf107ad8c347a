"""Multi-RHS Pallas SpMM vs k single SpMVs — the amortisation measurement.

The multi-RHS column-major kernel (``ops/pallas_spmv.py::spmm_dia_pallas``)
reads each coefficient block once per program while k x-slabs ride beside it,
so ideally Y = A @ X at (n, k) costs ~1 matrix stream instead of k.  This
script measures both on the band-160 |sin| family (flat, no grid structure)
with the scan-differencing discipline (CLAUDE.md) and writes the artifact the
claim in README/PARITY cites.

Usage: python scripts/spmm_multirhs_bench.py [--cpu] [--n 414720] [--k 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=414_720)
    p.add_argument("--band", type=int, default=160)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scan-k", type=int, nargs=2, default=(16, 144))
    p.add_argument("--tries", type=int, default=5)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.ops import pallas_spmv as ps

    platform = jax.devices()[0].platform
    dtype = np.float32
    n, k = args.n, args.k
    A = generators.banded_sin_matrix(n, args.band, dtype=dtype).device_put()
    rng = np.random.default_rng(0)
    X_h = rng.standard_normal((n, k)).astype(dtype)
    X = jnp.asarray(X_h)

    # correctness first (compiled on TPU, interpret elsewhere)
    Y = np.asarray(ps.spmm_dia_pallas(A, X))
    scale = 0.0
    for j in range(k):
        yo = oracle.spmv(A, X_h[:, j].astype(np.float64))
        scale = max(scale, float(np.abs(Y[:, j] - yo).max() / np.abs(yo).max()))
    assert scale < 1e-5, scale

    plan = ps.plan_dia_cm_multi(tuple(A.offsets), n)
    Vm = ps.to_cm_multi(X, plan)  # (k, segp, 128)

    def timed(step, v0):
        def run(Ad, v, scales):
            def body(w, s):
                y = step(Ad, w)
                nrm = jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30)
                return y * (nrm * s), ()

            v, _ = jax.lax.scan(body, v, scales)
            return jnp.vdot(v, v)

        runj = jax.jit(run)
        k1, k2 = args.scan_k
        times = {}
        for kk in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, kk).astype(dtype))
            float(runj(A, v0, scales))  # compile + warm
            best = float("inf")
            for _ in range(args.tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, kk).astype(dtype))
                t0 = time.perf_counter()
                float(runj(A, v0, scales))
                best = min(best, time.perf_counter() - t0)
            times[kk] = best
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    # multi-RHS: one kernel pass serves all k columns
    t_multi = timed(lambda Ad, V: ps.cm_apply_multi(Ad, V), Vm)
    # baseline: the same k columns as k sequential single-RHS kernel passes
    t_klones = timed(
        lambda Ad, V: jnp.stack([ps.cm_apply(Ad, V[j]) for j in range(k)]), Vm
    )
    flops = 2.0 * len(A.offsets) * n * k
    out = {
        "experiment": "spmm_multirhs",
        "platform": platform,
        "n": n,
        "band": args.band,
        "k": k,
        "multi_us": round(t_multi * 1e6, 1),
        "k_singles_us": round(t_klones * 1e6, 1),
        "amortisation_x": round(t_klones / t_multi, 2),
        "multi_gflops": round(flops / t_multi / 1e9, 1),
        "max_rel_err": scale,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
