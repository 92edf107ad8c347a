"""One-chip device-probed hierarchy setup at 255^3 vs the host builder.

The host scipy Galerkin builder takes 190 s at 16.6M rows
(artifacts/rung4_255cubed_r02.json) while the solve takes 54 ms — setup
dominates single-shot use.  The device-side probed builder
(precond/distributed.py, written for rung 5) also runs on a ONE-device mesh:
measured 45.3 s setup + 7.8 s sharded assembly on the chip (4.2x; includes
tunnel compiles), same 1e-6 convergence (5 iterations, true rel residual
4.7e-7).  Artifact: artifacts/probed_setup_onechip_r02.json.

Usage: python scripts/probed_setup_bench.py
"""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.parallel import rung5
from conjugategradient_tpu.precond.distributed import build_hierarchy_probed
from conjugategradient_tpu.solvers.policy import ConvergencePolicy
from conjugategradient_tpu.core import generators, oracle

grid = (255, 255, 255)
mesh = make_mesh(1)
t0 = time.perf_counter()
A, b, x0, padded, real = rung5.make_rung5_system(grid, mesh, dtype=np.float32)
t_asm = time.perf_counter() - t0
t0 = time.perf_counter()
rh = build_hierarchy_probed(A, mesh, max_coarse=1025)
jax.block_until_ready(rh.levels[0].inv_diag)
t_setup = time.perf_counter() - t0
pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=500)
t0 = time.perf_counter()
res = rung5.make_rung5_mgcg(pol, rh)(b, x0)
jax.block_until_ready(res.x)
t_solve_first = time.perf_counter() - t0
sys_h = generators.poisson_system(grid, dtype=np.float64)
r = sys_h.b - oracle.spmv(sys_h.A, np.asarray(res.x, np.float64).reshape(-1)[: sys_h.n])
rel = float(np.linalg.norm(r) / np.linalg.norm(sys_h.b))
print(json.dumps({
    "grid": list(grid), "assembly_s": round(t_asm, 2),
    "probed_setup_s": round(t_setup, 2), "first_solve_s": round(t_solve_first, 2),
    "iterations": int(res.iterations), "levels": len(rh.levels),
    "true_rel_residual": rel, "converged": bool(res.converged),
}))
