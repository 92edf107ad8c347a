"""On-chip measurement: nonsymmetric solves + LOBPCG (session-5 paths).

Round 3: the mg_bicgstab hierarchy uses rediscretized upwind coarse
operators — the Galerkin-coarsened hierarchy DIVERGES at this size (the
round-2 version of this script hit max_iteration and the 40000-iteration
chained scan read back as a tunnel "device error").

Measures, with the tunnel-proof scan-differencing pattern from bench.py
(chained solves inside one jitted scan, difference two scan lengths):

- mg_bicgstab on a 1023x1023 upwind convection-diffusion system (fp32,
  stencil fast path, V-cycle right preconditioner)
- plain BiCGStab on the same system (the preconditioning payoff)
- LOBPCG (k=8, V-cycle M) on 511x511 Poisson

Writes artifacts/nonsym_onchip_r03.json.  Run only when no other TPU
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


def timed_chain(run_one, args, b, k_pair=(2, 10), tries=3):
    """Difference two chained-scan lengths; returns seconds per solve.

    ``args`` is a pytree of operator/preconditioner state passed as a jit
    ARGUMENT (CLAUDE.md: closure constants ship inside the compile request
    — prohibitive through the tunnel at these sizes); ``run_one(args, bb)``
    performs one solve.
    """
    rng = np.random.default_rng()

    def chain(args, b, scales):
        def step(prev_x, s):
            res = run_one(args, b * s + 1e-30 * prev_x)
            return res[0], res[1:]

        x, aux = jax.lax.scan(step, jnp.zeros_like(b), scales)
        return x, aux

    chain_j = jax.jit(chain)
    times = {}
    aux_out = None
    for k in k_pair:
        scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
        out = chain_j(args, b, scales)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(tries):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            t0 = time.perf_counter()
            out = chain_j(args, b, scales)
            # scalar readback of the LAST chain element forces the whole
            # chain through the tunnel — block_until_ready alone measurably
            # returns early on dropped/deduplicated executions (bench.py
            # uses the same guard; a (8,208) spread once differenced to 0.0)
            float(np.asarray(out[1][1])[-1])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
        aux_out = out[1]
    k1, k2 = k_pair
    return (times[k2] - times[k1]) / (k2 - k1), aux_out


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
    from conjugategradient_tpu.solvers.lobpcg import lobpcg
    from conjugategradient_tpu.solvers.multi import as_multi_preconditioner
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    out = {"device": str(jax.devices()[0])}

    # --- mg_bicgstab / plain bicgstab at 1023^2 --------------------------
    grid = (1023, 1023)
    sys_ = generators.convection_diffusion_system(grid, eps=0.05, dtype=np.float32)
    t0 = time.perf_counter()
    # rediscretized coarse operators: Galerkin-of-upwind diverges from
    # 127x127 up (see generators.convection_diffusion_coarse_operator)
    h = build_hierarchy(
        sys_.A, grid, dtype=np.dtype(np.float32),
        coarse_operator=generators.convection_diffusion_coarse_operator(
            eps=0.05, dtype=np.float32),
    )
    out["hierarchy_setup_s"] = round(time.perf_counter() - t0, 2)
    A_st = dia_to_stencil(sys_.A, grid).device_put(dtype=jnp.float32)
    b = jnp.asarray(sys_.b, jnp.float32).reshape(grid)
    pol = ConvergencePolicy(tol=1e-5, norm="rel_l2", max_iteration=40000)
    from conjugategradient_tpu.precond import as_preconditioner as _as_p

    def run_mg(args, bb):
        A_, h_ = args
        res = bicgstab_solve(A_, bb, policy=pol, M=_as_p(h_))
        return res.x, res.iterations, res.residual, res.converged

    # large scan spread: small spreads measurably produce negative diffs
    # through the tunnel (see CLAUDE.md / STATUS operational notes)
    per, (its, ress, convs) = timed_chain(run_mg, (A_st, h), b, k_pair=(8, 208))
    assert bool(np.asarray(convs).all()), "mg_bicgstab did not converge on chip"
    out["mg_bicgstab_1023_ms"] = round(1e3 * per, 3)
    out["mg_bicgstab_1023_its"] = int(np.asarray(its)[-1])

    def run_plain(args, bb):
        res = bicgstab_solve(args, bb, policy=pol)
        return res.x, res.iterations, res.residual, res.converged

    per_p, (its_p, _, convs_p) = timed_chain(run_plain, A_st, b, k_pair=(1, 3))
    out["bicgstab_1023_ms"] = round(1e3 * per_p, 3)
    out["bicgstab_1023_its"] = int(np.asarray(its_p)[-1])
    # unpreconditioned fp32 BiCGStab at this size stagnates into the rho~0
    # breakdown freeze (recorded, not asserted — the point of mg_)
    out["bicgstab_1023_converged"] = bool(np.asarray(convs_p).all())
    if out["bicgstab_1023_converged"]:
        out["mg_speedup"] = round(per_p / per, 2)

    # --- LOBPCG k=8 on 511^2 Poisson -------------------------------------
    egrid = (511, 511)
    esys = generators.poisson_system(egrid, dtype=np.float32)
    eh = build_hierarchy(esys.A, egrid, dtype=np.dtype(np.float32))
    eM = as_multi_preconditioner(eh)
    eA = dia_to_stencil(esys.A, egrid).device_put(dtype=jnp.float32)
    n = esys.n

    # grid-native block operator: reshape columns to the grid, vmap stencil
    from conjugategradient_tpu.ops.stencil import spmv_stencil

    def _op(X):
        Y = jax.vmap(lambda c: spmv_stencil(eA, c.reshape(egrid)), in_axes=1, out_axes=0)(X)
        return Y.reshape(X.shape[1], n).T

    t0 = time.perf_counter()
    # fp32 floor for ||Ax - lam x||/(|lam|+1) at n=261k, lam_max~8 is
    # ~4e-4 (eps32 * sqrt(n) * ||A||); 1e-4 is unreachable — use 2e-3 and
    # validate the eigenvalues against the closed-form Laplacian spectrum
    eres = lobpcg(_op, 8, X0=jax.random.normal(jax.random.PRNGKey(0), (n, 8), jnp.float32),
                  M=eM, tol=2e-3, max_iterations=200, dtype=jnp.float32)
    jax.block_until_ready(eres.eigenvalues)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    eres = lobpcg(_op, 8, X0=jax.random.normal(jax.random.PRNGKey(1), (n, 8), jnp.float32),
                  M=eM, tol=2e-3, max_iterations=200, dtype=jnp.float32)
    jax.block_until_ready(eres.eigenvalues)
    out["lobpcg_511_s"] = round(time.perf_counter() - t0, 3)
    out["lobpcg_511_first_s"] = round(t_first, 3)
    out["lobpcg_511_its"] = int(eres.iterations)
    out["lobpcg_511_converged"] = bool(eres.converged)
    out["lobpcg_511_lam1"] = float(np.asarray(eres.eigenvalues)[0])
    # closed form: lam_{i,j} = 4 - 2cos(i pi/512) - 2cos(j pi/512)
    m = egrid[0] + 1
    ij = np.arange(1, 6)
    lam = (2 - 2 * np.cos(ij * np.pi / m))[:, None] + (
        2 - 2 * np.cos(ij * np.pi / m)
    )[None, :]
    exact = np.sort(lam.ravel())[:8]
    got = np.sort(np.asarray(eres.eigenvalues, np.float64))
    out["lobpcg_511_max_rel_eig_err"] = float(
        np.max(np.abs(got - exact) / exact)
    )

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "artifacts", "nonsym_onchip_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
