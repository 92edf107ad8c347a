"""On-chip SpMV microbenchmark: XLA flat DIA vs the Pallas column-major
kernel vs the fused SpMV-dot vs the XLA column-major twin.

Timing discipline per CLAUDE.md (the serving tunnel memoizes identical
executions and drops abandoned results): K chained SpMVs inside one jitted
``lax.scan`` (each step consumes and renormalises the previous product, so
nothing can be elided), a scalar readback, and differencing two scan lengths
to cancel fixed dispatch/readback overhead.  Matrices ride as pytree
ARGUMENTS (never closure constants).

Also validates the COMPILED Pallas kernel against interpret mode on a small
system first (VERDICT round 1, weak #2: Mosaic lowering regressions must
fail the bench, not only on-chip users).

Usage:  python scripts/spmv_bench.py [--n 207360] [--band 160] [--quick]
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
    p.add_argument("--n", type=int, default=207360)
    p.add_argument("--band", type=int, default=160)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--k", type=int, nargs=2, default=(16, 528))
    p.add_argument("--tries", type=int, default=5)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.ops import pallas_spmv
    from conjugategradient_tpu.ops.spmv import spmv_dia

    dtype = np.float32
    A_host = generators.banded_sin_matrix(args.n, args.band, dtype=dtype)
    A = A_host.device_put(dtype=dtype)
    n, ndiags = A.n, A.ndiags
    flops = 2.0 * ndiags * n
    bytes_min = 4.0 * (ndiags * n + 2 * n)  # data + x read + y write

    # --- compiled-vs-interpret validation (small system, bitwise-domain) ---
    As = generators.banded_sin_matrix(20000, args.band, dtype=dtype).device_put()
    xs = jnp.asarray(
        np.random.default_rng(0).standard_normal(As.n).astype(dtype)
    )
    y_c = np.asarray(pallas_spmv.spmv_dia_pallas(As, xs))
    y_i = np.asarray(pallas_spmv.spmv_dia_pallas(As, xs, interpret=True))
    y_o = oracle.spmv(As, np.asarray(xs, np.float64))
    ci = float(np.abs(y_c - y_i).max())
    co = float(np.abs(y_c - y_o).max() / np.abs(y_o).max())
    yd_c, d_c = pallas_spmv.spmv_dot_dia_pallas(As, xs)
    dd = abs(float(d_c) - float(np.asarray(xs, np.float64) @ y_o)) / abs(
        float(np.asarray(xs, np.float64) @ y_o)
    )
    assert ci < 1e-5 * np.abs(y_o).max(), f"compiled vs interpret diverge: {ci}"
    assert co < 1e-5, f"compiled vs oracle diverge: {co}"
    assert dd < 1e-4, f"fused dot diverges: {dd}"
    print(f"validate[n=20000]: compiled-vs-interpret {ci:.2e}, vs-oracle rel {co:.2e}, fused-dot rel {dd:.2e}")

    def make_run(op, fused=False):
        def run(Ad, v0, scales):
            def step(v, s):
                if fused:
                    w, d = op(Ad, v)
                else:
                    w = op(Ad, v)
                    d = jnp.vdot(v, w)
                w = w * (jax.lax.rsqrt(jnp.vdot(w, w) / w.size + 1e-30) * s)
                return w, d

            v, ds = jax.lax.scan(step, v0, scales)
            return ds[-1]

        return jax.jit(run)

    rng = np.random.default_rng()
    v0 = jnp.asarray(rng.standard_normal(n).astype(dtype))

    def timed(run):
        k1, k2 = args.k
        times = {}
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            float(run(A, v0, scales))  # compile + warm
            best = float("inf")
            for _ in range(args.tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                float(run(A, v0, scales))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    variants = {
        "xla_flat": make_run(lambda Ad, v: spmv_dia(Ad, v)),
        "xla_cm": make_run(lambda Ad, v: pallas_spmv.spmv_dia_cm_xla(Ad, v)),
        "pallas_cm": make_run(lambda Ad, v: pallas_spmv.spmv_dia_pallas(Ad, v)),
        "pallas_cm_fused": make_run(
            lambda Ad, v: pallas_spmv.spmv_dot_dia_pallas(Ad, v), fused=True
        ),
    }
    out = {"n": n, "ndiags": ndiags, "platform": platform}
    for name, run in variants.items():
        t = timed(run)
        gflops = flops / t / 1e9
        gbs = bytes_min / t / 1e9
        out[name] = {"us": round(t * 1e6, 1), "gflops": round(gflops, 1), "gbs_min": round(gbs, 1)}
        print(f"{name:16s} {t*1e6:9.1f} us  {gflops:7.1f} GFLOP/s  {gbs:7.1f} GB/s(min-traffic)")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
