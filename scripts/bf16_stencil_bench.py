"""bf16 stencil-leg SpMV measurement: variable-coefficient diffusion on chip.

The variable-coefficient stencil path (``ops/stencil.py::spmv_stencil``)
streams one grid-shaped coefficient array per leg — the first stencil
workload with real matrix bytes (the Poisson const path ships zero).
Storing legs bf16 halves the dominant stream; each ``leg * window`` product
promotes to fp32 (exact widening), so only the input rounding is bf16.

Traffic model per SpMV (L legs, n rows): fp32 = (L+2)*4n bytes,
bf16 legs = (2L+8)n bytes -> ceiling 1.56x at L=5 (2-D), 1.64x at L=7 (3-D).

Measured via the scan-differencing pattern (CLAUDE.md: the only trustworthy
timing through the tunnel).  Artifact: artifacts/bf16_stencil_r02.json.

Usage: python scripts/bf16_stencil_bench.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil
from conjugategradient_tpu.ops.stencil import spmv_stencil

out = {"experiment": "bf16_stencil_legs", "platform": jax.devices()[0].platform}
rng = np.random.default_rng(0)
for label, grid in (("2d_1440", (1440, 1440)), ("3d_128", (128, 128, 128))):
    a = generators.diffusion_coefficients(grid, kind="jump", seed=1)
    A = generators.diffusion_matrix(grid, a, dtype=np.float64)
    S64 = dia_to_stencil(A, grid)
    n = S64.n
    x = rng.standard_normal(grid).astype(np.float32)
    yref = oracle.spmv(A, x.reshape(-1).astype(np.float64))
    scale = np.abs(yref).max()
    case = {"n": n, "legs": S64.nlegs}
    for tag, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        Sd = S64.device_put(dt)
        xd = jnp.asarray(x)
        y = np.asarray(spmv_stencil(Sd, xd), dtype=np.float64).reshape(-1)
        err = float(np.abs(y - yref).max() / scale)

        def run(Sdv, v, scales):
            def step(w, s):
                y = spmv_stencil(Sdv, w)
                nrm = jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30)
                return (y * (nrm * s)).astype(v.dtype), ()
            v, _ = jax.lax.scan(step, v, scales)
            return jnp.vdot(v, v)

        # us-scale steps need a LARGE scan spread (see STATUS.md): 4032
        # differenced steps put the diff at ~100-300 ms, far above tunnel noise
        runj = jax.jit(run)
        ks = (64, 4096)
        times = {}
        for k in ks:
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            float(runj(Sd, xd, scales))
            best = float("inf")
            for _ in range(3):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
                t0 = time.perf_counter()
                float(runj(Sd, xd, scales))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        t = max((times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0]), 1e-9)
        leg_bytes = 2 if dt == jnp.bfloat16 else 4
        traffic = (S64.nlegs * leg_bytes + 8) * n  # legs + x read + y write
        case[tag] = {
            "us": round(t * 1e6, 1),
            "gflops": round(2.0 * S64.nlegs * n / t / 1e9, 1),
            "gbps_min_traffic": round(traffic / t / 1e9, 1),
            "max_rel_err": err,
        }
    case["speedup_bf16_x"] = round(case["fp32"]["us"] / case["bf16"]["us"], 2)
    out[label] = case
print(json.dumps(out))
