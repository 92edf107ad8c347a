"""Rung-5 NONSYMMETRIC data path: sharded convection-diffusion at scale.

The nonsym twin of ``rung5_demo.py``: an even-extent 3-D upwind
convection-diffusion system is assembled slab-by-slab into mesh-sharded
arrays (no global host materialisation), the multigrid hierarchy is built
by REDISCRETIZATION (``precond.distributed.build_hierarchy_redisc`` — one
generator pass per level; the Galerkin/probed route diverges on this
operator family, see ``generators.convection_diffusion_coarse_operator``),
and mg-preconditioned BiCGStab runs as one GSPMD program.

Run (virtual 8-device CPU mesh):

    python examples/rung5_nonsym_demo.py --grid 64          # 262k rows, fast
    python examples/rung5_nonsym_demo.py --grid 256         # 16.8M rows
    python examples/rung5_nonsym_demo.py --grid 512         # 134M rows (rung 5)
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=64, help="cubic grid extent (even)")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--eps", type=float, default=0.05)
    p.add_argument("--tol", type=float, default=1e-5)
    p.add_argument("--max-it", type=int, default=400)
    args = p.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS", f"--xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.parallel import rung5
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.precond.distributed import build_hierarchy_redisc
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    mesh = make_mesh()
    grid = (args.grid,) * 3
    n = int(np.prod(grid))
    rss0 = rss_gb()

    t0 = time.perf_counter()
    A, b, x0 = rung5.make_convection_system(
        grid, mesh, eps=args.eps, dtype=np.float32
    )
    jax.block_until_ready((A.data, b, x0))
    t_asm = time.perf_counter() - t0
    bytes_fine = (A.data.size + b.size + x0.size) * 4
    print(
        f"assembled {n:,} rows ({A.nlegs}-leg upwind stencil, cell Peclet "
        f"{1.0/args.eps:.0f}) in {t_asm:.1f} s | sharded footprint "
        f"{bytes_fine/1e9:.2f} GB | peak RSS {rss0:.2f} -> {rss_gb():.2f} GB"
    )

    t0 = time.perf_counter()
    slab = generators.convection_diffusion_level_slab(args.eps, dtype=np.float32)
    h = build_hierarchy_redisc(grid, mesh, slab, smoother="jacobi")
    jax.block_until_ready([l.A.data for l in h.levels])
    t_setup = time.perf_counter() - t0
    print(
        f"rediscretized hierarchy: {len(h.levels)}+1 levels "
        f"{[l.grid for l in h.levels]} in {t_setup:.1f} s | peak RSS "
        f"{rss_gb():.2f} GB"
    )

    pol = ConvergencePolicy(tol=args.tol, norm="rel_l2", max_iteration=args.max_it)
    solve = rung5.make_rung5_mg_nonsym(pol, h, method="bicgstab")
    t0 = time.perf_counter()
    res = jax.block_until_ready(solve(b, x0))
    t_solve = time.perf_counter() - t0
    rss_end = rss_gb()
    print(
        f"mg_bicgstab: {int(res.iterations)} its, rel residual "
        f"{float(res.residual):.3e}, converged={bool(res.converged)} in "
        f"{t_solve:.1f} s | peak RSS {rss_end:.2f} GB"
    )

    summary = {
        "rows": n,
        "grid": list(grid),
        "devices": args.devices,
        "eps": args.eps,
        "assembly_s": round(t_asm, 2),
        "setup_s": round(t_setup, 2),
        "solve_s": round(t_solve, 2),
        "iterations": int(res.iterations),
        "rel_residual": float(res.residual),
        "converged": bool(res.converged),
        "sharded_footprint_gb": round(bytes_fine / 1e9, 3),
        "peak_rss_gb": round(rss_end, 2),
        "mesh": "virtual-cpu",
    }
    print(json.dumps(summary))
    return 0 if res.converged else 1


if __name__ == "__main__":
    sys.exit(main())
