"""bf16 V-cycle preconditioner (fp32 outer CG) — measured, and SLOWER.

Hypothesis: run the whole M application in bf16 (half the V-cycle's vector
traffic), keep the outer CG operator fp32 — classic mixed-precision MG.

Measured on chip (1023^2 Poisson headline config, cheb(3,3)):
fp32 V-cycle 0.854 ms / 3 iterations; bf16 V-cycle 1.768 ms / 7 iterations —
**2.1x slower overall**.  Two reasons: (1) bf16 rounding degrades the
preconditioner enough to double the outer iteration count (kappa(M^-1 A)
inflates), and (2) the per-iteration saving is only ~11% (285 -> 253 us):
the headline cycle's fine level is a CONST stencil (zero matrix bytes) and
the coarse tail is latency/fusion-bound, so halving vector width buys little.
Verdict: the preconditioner stays fp32; bf16 belongs on MATRIX streams
(scripts/bf16_spmv_bench.py, 1.93x), not on the V-cycle's vectors.
Artifact: artifacts/bf16_vcycle_experiment_r02.json.

Usage: python scripts/bf16_vcycle_experiment.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from conjugategradient_tpu.core import generators
from conjugategradient_tpu.core.formats import dia_to_stencil
from conjugategradient_tpu.precond import build_hierarchy
from conjugategradient_tpu.precond.multigrid import v_cycle
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy

grid = (1023, 1023)
dtype = np.float32
system = generators.poisson_system(grid, dtype=dtype)
n = system.n
policy = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=8 * n)
b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
rng = np.random.default_rng()

h32 = build_hierarchy(system.A, grid, smoother="chebyshev", pre=3, post=3, dtype=np.float32)
h16 = build_hierarchy(system.A, grid, smoother="chebyshev", pre=3, post=3, dtype=jnp.bfloat16)
A32 = h32.levels[0].A if h32.levels else dia_to_stencil(system.A, grid).device_put(dtype=dtype)

def M32(h_, r): return v_cycle(h_, r)
def M16(h_, r): return v_cycle(h_, r.astype(jnp.bfloat16)).astype(r.dtype)

def make_run(Mfn):
    def run(h_, A_, b_, scales):
        def step(prev_x, s):
            res = cg_solve(A_, b_ * s + 1e-30 * prev_x, policy=policy,
                           M=(Mfn, h_), precise_dot=True)
            return res.x, (res.iterations, res.residual, res.converged)
        x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
        return x, aux
    return jax.jit(run)

out = {}
for tag, h_, Mfn in (("fp32", h32, M32), ("bf16_vcycle", h16, M16)):
    runj = make_run(Mfn)
    times = {}
    aux = None
    for k in (2, 42):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        jax.block_until_ready(runj(h_, A32, b, scales)[0])
        best = float("inf")
        for _ in range(3):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            t0 = time.perf_counter()
            x, aux = runj(h_, A32, b, scales)
            float(aux[1][-1])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    t = max((times[42]-times[2])/40, 1e-9)
    its, ress, convs = aux
    out[tag] = {"ms": round(t*1e3, 3), "iters": int(np.asarray(its)[-1]),
                "converged": bool(np.asarray(convs).all()),
                "residual": float(np.asarray(ress)[-1])}
out["speedup_x"] = round(out["fp32"]["ms"]/out["bf16_vcycle"]["ms"], 3)
print(json.dumps(out))
