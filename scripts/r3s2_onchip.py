"""On-chip measurements for round-3 session-2 paths.

1. rbgs vs chebyshev vs jacobi smoothing in MGCG at 1023^2 Poisson (fp32):
   iterations + scan-differenced ms/solve — does the classic strong
   smoother's 2-applies-per-sweep price buy its iteration cut on a TPU?
2. Algebraic multigrid ON CHIP: amg_cg on 511^2 Poisson presented as CSR
   with the grid DISCARDED (the no-structure worst case: segment-sum
   gather SpMVs per level) vs geometric MGCG on the same system — the
   honest cost of unstructured sparsity on this hardware.
3. Multi-RHS block BiCGStab (k=8, mg-preconditioned, rediscretized coarse
   ops) vs k sequential single-RHS solves on 511^2 convection-diffusion.

bench.py's timing rules: chained solves inside one jitted lax.scan, scalar
readback inside the timed region, differenced scan lengths.  Writes
artifacts/r3s2_onchip.json incrementally.  Run only when no other TPU
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
                   "artifacts", "r3s2_onchip.json")


def save(out):
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


def scan_diff_time(runj, args_of_k, k_pair, tries=3):
    """Best-of-`tries` scan-differenced seconds/solve; returns (per, aux)."""
    times, aux = {}, None
    for k in k_pair:
        out = runj(*args_of_k(k))
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            out = runj(*args_of_k(k))
            float(np.asarray(out[1][1]).ravel()[-1])  # scalar readback
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        aux = out[1]
    k1, k2 = k_pair
    return (times[k2] - times[k1]) / (k2 - k1), aux


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    dtype = np.float32
    rng = np.random.default_rng()
    out = {"device": str(jax.devices()[0])}

    # --- 1. smoother comparison at 1023^2 --------------------------------
    grid = (1023, 1023)
    system = generators.poisson_system(grid, dtype=dtype)
    policy = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=2000)
    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)

    def make_scan(policy):
        def run(h_, A_, b_, scales):
            def step(prev_x, sc):
                res = cg_solve(
                    A_, b_ * sc + 1e-30 * prev_x, policy=policy,
                    M=as_preconditioner(h_), precise_dot=True,
                )
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        return jax.jit(run)

    runj = make_scan(policy)
    out["smoothers_1023sq"] = {}
    for sm in ("chebyshev", "rbgs", "jacobi"):
        h = build_hierarchy(system.A, grid, smoother=sm, dtype=np.dtype(dtype))

        def args_of_k(k):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            return (h, A, b, scales)

        per, aux = scan_diff_time(runj, args_of_k, (2, 42))
        its = int(np.asarray(aux[0])[-1])
        conv = bool(np.asarray(aux[2]).all())
        out["smoothers_1023sq"][sm] = {
            "ms": round(1e3 * per, 3), "its": its, "converged": conv,
        }
        print(f"MGCG {sm}: {1e3*per:.3f} ms, {its} it, conv={conv}", flush=True)
        save(out)

    # --- 2. AMG on chip (511^2 Poisson as CSR, grid discarded) -----------
    from conjugategradient_tpu.core.io import from_scipy, to_scipy
    from conjugategradient_tpu.precond.amg import amg_preconditioner, build_amg_hierarchy

    agrid = (511, 511)
    asys = generators.poisson_system(agrid, dtype=dtype)
    A_csr = from_scipy(to_scipy(asys.A).tocsr())
    t0 = time.perf_counter()
    h_amg = build_amg_hierarchy(A_csr, dtype=dtype)
    amg_setup = time.perf_counter() - t0
    apol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=2000)
    ab_flat = jnp.asarray(asys.b, dtype=dtype)

    def run_amg(h_, b_, scales):
        M = amg_preconditioner(h_)
        A0 = h_.levels[0].A

        def step(prev_x, sc):
            res = cg_solve(A0, b_ * sc + 1e-30 * prev_x, policy=apol, M=M,
                           precise_dot=True)
            return res.x, (res.iterations, res.residual, res.converged)

        x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
        return x, aux

    run_amg_j = jax.jit(run_amg)

    def aargs(k):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        return (h_amg, ab_flat, scales)

    per_a, aux_a = scan_diff_time(run_amg_j, aargs, (2, 12))
    out["amg_511sq_csr"] = {
        "n": asys.A.n,
        "setup_s": round(amg_setup, 2),
        "levels": [int(l.A.n) for l in h_amg.levels],
        "ms": round(1e3 * per_a, 3),
        "its": int(np.asarray(aux_a[0])[-1]),
        "converged": bool(np.asarray(aux_a[2]).all()),
    }
    print(f"AMG-CG 511^2 CSR: {1e3*per_a:.2f} ms, "
          f"{out['amg_511sq_csr']['its']} it (setup {amg_setup:.1f}s)", flush=True)
    save(out)

    # geometric MGCG twin on the same system (same tol) for the honest ratio
    hg = build_hierarchy(asys.A, agrid, dtype=np.dtype(dtype))
    Ag = dia_to_stencil(asys.A, agrid).device_put(dtype=dtype)
    abg = jnp.asarray(asys.b, dtype=dtype).reshape(agrid)
    run_g = make_scan(apol)

    def gargs(k):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        return (hg, Ag, abg, scales)

    per_g, aux_g = scan_diff_time(run_g, gargs, (2, 42))
    out["geometric_mgcg_511sq"] = {
        "ms": round(1e3 * per_g, 3),
        "its": int(np.asarray(aux_g[0])[-1]),
        "converged": bool(np.asarray(aux_g[2]).all()),
        "amg_over_geometric": round(per_a / per_g, 1),
    }
    print(f"geometric MGCG 511^2: {1e3*per_g:.3f} ms "
          f"(AMG/geo = {per_a/per_g:.1f}x)", flush=True)
    save(out)

    # --- 3. multi-RHS block BiCGStab vs sequential (511^2 convection) ----
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
    from conjugategradient_tpu.solvers.multi import (
        as_multi_preconditioner,
        bicgstab_solve_multi,
    )

    cgrid = (511, 511)
    csys = generators.convection_diffusion_system(cgrid, eps=0.1, dtype=dtype)
    ch = build_hierarchy(
        csys.A, cgrid, smoother="jacobi", dtype=np.dtype(dtype),
        coarse_operator=generators.convection_diffusion_coarse_operator(
            eps=0.1, dtype=np.float64
        ),
    )
    kk = 8
    cB = rng.standard_normal((csys.A.n, kk)).astype(dtype)
    cpol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=500)
    cB_dev = jnp.asarray(cB)

    # NOTE: bicgstab_solve_multi flattens (n, k); the stencil operator wants
    # grid-shaped leading axes — pass the (grid..., k) block directly.
    def run_block2(h_, B_, scales):
        Mk_ = as_multi_preconditioner(h_)

        def step(prev, sc):
            res = bicgstab_solve_multi(
                h_.levels[0].A, B_ * sc + 1e-30 * prev, policy=cpol,
                M=Mk_,
            )
            return res.x, (res.iterations, res.residual, res.converged)

        x, aux = jax.lax.scan(step, jnp.zeros_like(B_), scales)
        return x, aux

    run_block_j = jax.jit(run_block2)

    def bargs(k):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        return (ch, cB_dev, scales)

    per_b, aux_b = scan_diff_time(run_block_j, bargs, (1, 9))
    out["block_bicgstab_511sq_k8"] = {
        "ms_per_block_solve": round(1e3 * per_b, 2),
        "its": np.asarray(aux_b[0])[-1].tolist(),
        "converged": bool(np.asarray(aux_b[2]).all()),
    }
    print(f"block mg_bicgstab k=8: {1e3*per_b:.2f} ms/block", flush=True)
    save(out)

    # sequential solves want flat columns: reshape to (n, k) for indexing,
    # grid-shape each column for the stencil op
    def run_seq2(h_, Bf_, scales):
        M1_ = as_preconditioner(h_)

        def step(prev, sc):
            def col(j, acc):
                x_acc, its_acc = acc
                bj = jax.lax.dynamic_index_in_dim(Bf_, j, axis=1, keepdims=False)
                pj = jax.lax.dynamic_index_in_dim(prev, j, axis=1, keepdims=False)
                res = bicgstab_solve(
                    h_.levels[0].A, (bj * sc + 1e-30 * pj).reshape(cgrid),
                    policy=cpol, M=M1_,
                )
                x_acc = jax.lax.dynamic_update_index_in_dim(
                    x_acc, res.x.reshape(-1), j, axis=1
                )
                return (x_acc, its_acc + res.iterations)

            x, its = jax.lax.fori_loop(
                0, kk, col, (jnp.zeros_like(Bf_), jnp.int32(0))
            )
            return x, (its, jnp.float32(0.0), jnp.asarray(True))

        x, aux = jax.lax.scan(step, jnp.zeros_like(Bf_), scales)
        return x, aux

    run_seq_j = jax.jit(run_seq2)
    cBf = jnp.asarray(cB)

    def sargs(k):
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
        return (ch, cBf, scales)

    per_s, aux_s = scan_diff_time(run_seq_j, sargs, (1, 9))
    out["sequential_bicgstab_511sq_k8"] = {
        "ms_per_k_solves": round(1e3 * per_s, 2),
        "total_its": int(np.asarray(aux_s[0])[-1]),
        "block_speedup": round(per_s / per_b, 2),
    }
    print(f"sequential k=8: {1e3*per_s:.2f} ms "
          f"(block speedup {per_s/per_b:.2f}x)", flush=True)
    save(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
