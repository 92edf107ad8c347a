"""bf16-stream SpMV measurement: half the HBM bytes, fp32 accumulation.

The CM kernel streams coefficient blocks at their STORED dtype and casts
per-block to the fp32 accumulator (exact for float widening), so a
bf16-stored matrix moves half the bytes of the dominant stream.  Measured
on chip (band-160, n=2.07M): 927 us vs 1787 us fp32 = **1.93x**, 711
useful-GFLOP/s, max rel err 2.4e-3 (bf16 input rounding, NOT accumulation
drift — the sum over 159 diagonals is fp32).
Artifact: artifacts/bf16_spmv_r02.json.

Usage: python scripts/bf16_spmv_bench.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.ops import pallas_spmv as ps

n, band = 2_073_600, 160
A = generators.banded_sin_matrix(n, band, dtype=np.float32)
rng = np.random.default_rng(0)
x = rng.standard_normal(n).astype(np.float32)
yref = oracle.spmv(A, x.astype(np.float64)); scale = np.abs(yref).max()
res = {}
for tag, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
    Ad = A.device_put(dtype=dt)
    xd = jnp.asarray(x)
    y = np.asarray(ps.spmv_dia_pallas(Ad, xd))
    err = float(np.abs(y - yref).max() / scale)
    def run(Adv, v, scales):
        def step(w, s):
            y = ps.spmv_dia_pallas(Adv, w)
            return (y * (jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30) * s)).astype(v.dtype), ()
        v, _ = jax.lax.scan(step, v, scales)
        return jnp.vdot(v, v)
    runj = jax.jit(run)
    times = {}
    for k in (16, 144):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
        float(runj(Ad, xd, scales))
        best = float("inf")
        for _ in range(4):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            t0 = time.perf_counter(); float(runj(Ad, xd, scales)); best = min(best, time.perf_counter()-t0)
        times[k] = best
    t = max((times[144]-times[16])/128, 1e-9)
    res[tag] = {"us": round(t*1e6,1), "gflops": round(2.0*A.ndiags*n/t/1e9,1), "max_rel_err": err}
res["speedup_bf16_x"] = round(res["fp32"]["us"]/res["bf16"]["us"], 2)
res.update({"experiment":"bf16_stream_spmv","n":n,"band":band,"platform":jax.devices()[0].platform})
print(json.dumps(res))
