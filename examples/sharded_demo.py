"""Multi-device sharded CG demo on a 1-D mesh.

The reference's multi-GPU benchmark path (``Mgcg/cuBlas/Mgcg/MgcgMain.cs``
step 5, SURVEY.md §3.1) reborn: row-block partition, halo exchange, allreduce
dots — except the entire solve is one jitted SPMD program and the "exchange"
is `ppermute` over the mesh, not staged host copies.

Run:  python examples/sharded_demo.py [--devices 8] [--n 8192] [--band 32]
(uses virtual CPU devices unless real multi-chip hardware is present)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--band", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-9)
    args = ap.parse_args()

    # Force a virtual CPU mesh when the machine lacks that many real chips.
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    os.environ["JAX_ENABLE_X64"] = "true"
    import jax

    jax.config.update("jax_enable_x64", True)
    # Default to the virtual CPU mesh: querying the real backend first would
    # lock in its device set before the CPU override could take effect.
    if not os.environ.get("CGT_REAL_CHIPS"):
        jax.config.update("jax_platforms", "cpu")

    from conjugategradient_tpu import ConvergencePolicy
    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.core.partition import pad_system
    from conjugategradient_tpu.parallel import make_mesh
    from conjugategradient_tpu.parallel.sharded_cg import sharded_cg_solve

    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")
    mesh = make_mesh(args.devices)

    raw = generators.banded_sin_system(args.n, args.band)
    system, n_orig = pad_system(raw, args.devices)
    policy = ConvergencePolicy(tol=args.tol, max_iteration=4 * system.n)

    t0 = time.perf_counter()
    res = sharded_cg_solve(system.A, system.b, system.x0, policy, mesh)
    jax.block_until_ready(res.x)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sharded_cg_solve(system.A, system.b, system.x0, policy, mesh)
    jax.block_until_ready(res.x)
    t_solve = time.perf_counter() - t0

    ref = oracle.cg(raw.A, raw.b, raw.x0, tol=args.tol, max_iteration=4 * raw.n)
    x = np.asarray(res.x)[:n_orig]
    rel = np.max(np.abs(x - ref.x) / np.maximum(np.abs(ref.x), 1e-30))
    print(f"sharded: {int(res.iterations)} it, residual {float(res.residual):.3e}, "
          f"first {t_first*1e3:.1f} ms, steady {t_solve*1e3:.1f} ms | "
          f"oracle: {ref.iterations} it | max rel err {rel:.3e}")
    ok = bool(res.converged) and rel < 1e-6
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
