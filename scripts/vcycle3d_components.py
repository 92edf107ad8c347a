"""Round-5 follow-up to ``scripts/vcycle3d_profile.py``: decompose the
post-kernel 255^3 V-cycle (2.63 ms) into its fused-kernel components.

The fused slab Chebyshev kernel (``ops.pallas_stencil.cheb_smooth_const_
pallas``) took the cycle 6.4 -> 2.63 ms, but its STANDALONE cost at the
fine level was never banked — so "where do the remaining ~1 ms over the
3-pass roofline go" is an open question.  Three chained measurements:

  1. pre-smooth + residual (zero-x0, want_resid, degree 2) — the level-0
     entry op; roofline = read b + write x + write r = 3 passes x 66.3 MB.
  2. post-smooth (nonzero x0, no resid, degree 2) — the level-0 exit op;
     roofline = read b + read x + write x = 3 passes.
  3. the whole V-cycle — so (cycle - pre - post) bounds everything else
     (transfers, correction axpy, levels 1+, coarse dense solve).

Chaining discipline (STATUS item 74: a `w = f(w)*rsqrt(..)*s` chain step
adds 2 full HBM passes — at roofline that HIDES the op cost being
measured): the carried value feeds the next step DIRECTLY (no per-step
scaling passes); per-try freshness comes from scaling the chain INPUT once
on host.  Decay to exact zero over long chains is harmless — the kernels
have no data-dependent control flow.  Long spreads per the r5 headline
rule (sub-second signal measures the tunnel's +-150-300 ms call variance,
not the chip).

Writes artifacts/vcycle3d_components_r05.json.  Run only when no other
TPU process is active.
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
                   "artifacts", "vcycle3d_components_r05.json")
DTYPE = np.float32


def timed_chain(runj, args, v0, k_pair, tries=3):
    """Differenced per-step seconds for a chained scan ``runj(*args, w0, k)``.

    ``k`` selects a static scan length (jit-specialized); ``w0`` is scaled
    freshly per try so no two executions are identical (the serving tunnel
    memoizes identical executions — CLAUDE.md)."""
    rng = np.random.default_rng(7)
    times = {}
    for k in k_pair:
        w0 = v0 * (1.0 + DTYPE(rng.uniform(1e-5, 1e-3)))
        out = runj(*args, w0, k)
        float(np.asarray(out).ravel()[0])  # warm + force
        best = float("inf")
        for _ in range(tries):
            w0 = v0 * (1.0 + DTYPE(rng.uniform(1e-5, 1e-3)))
            t0 = time.perf_counter()
            out = runj(*args, w0, k)
            float(np.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    k1, k2 = k_pair
    return (times[k2] - times[k1]) / (k2 - k1), times


def main():
    assert jax.devices()[0].platform != "cpu", "run on the TPU"
    from functools import partial

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.ops.pallas_stencil import cheb_smooth_const_pallas
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.precond.multigrid import v_cycle

    g3 = (255, 255, 255)
    sys3 = generators.poisson_system(g3, dtype=DTYPE)
    h = build_hierarchy(
        sys3.A, g3, smoother="chebyshev", pre=2, post=2, dtype=DTYPE,
        coarse_operator=generators.poisson_coarse_operator(DTYPE),
    )
    lvl = h.levels[0]
    A0, inv_d = lvl.A, lvl.inv_diag
    lo, hi = lvl.cheb_bounds
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal(g3).astype(DTYPE))
    b0 = jnp.asarray(rng.standard_normal(g3).astype(DTYPE))
    mb = v0.size * 4 / 1e6  # one full-array pass, MB

    @partial(jax.jit, static_argnums=(2,))
    def run_pre(A, w0, k):
        def step(w, _):
            _x, r = cheb_smooth_const_pallas(
                A, w, None, 2, hi, lo, inv_d, want_resid=True)
            return r, None
        w, _ = jax.lax.scan(step, w0, None, length=k)
        return w[0, 0, :1]

    @partial(jax.jit, static_argnums=(3,))
    def run_post(A, b, x0, k):
        def step(x, _):
            return cheb_smooth_const_pallas(A, b, x, 2, hi, lo, inv_d), None
        x, _ = jax.lax.scan(step, x0, None, length=k)
        return x[0, 0, :1]

    @partial(jax.jit, static_argnums=(2,))
    def run_cycle(hh, w0, k):
        def step(w, _):
            return v_cycle(hh, w), None
        w, _ = jax.lax.scan(step, w0, None, length=k)
        return w[0, 0, :1]

    out = {"grid": list(g3), "n": int(sys3.n), "pre_post": [2, 2],
           "pass_mb": round(mb, 1)}

    pre_s, pre_raw = timed_chain(run_pre, (A0,), v0, (2, 1202))
    out["cheb2_pre_resid"] = {
        "us": round(pre_s * 1e6, 1),
        "roofline_passes": 3,
        "implied_gb_s": round(3 * mb / 1e3 / pre_s, 1),
        "raw_chain_s": {k: round(v, 4) for k, v in pre_raw.items()},
    }
    print("pre+resid:", out["cheb2_pre_resid"], flush=True)

    post_s, post_raw = timed_chain(
        lambda A, b, w0, k: run_post(A, b, w0, k), (A0, b0), v0, (2, 1202))
    out["cheb2_post"] = {
        "us": round(post_s * 1e6, 1),
        "roofline_passes": 3,
        "implied_gb_s": round(3 * mb / 1e3 / post_s, 1),
        "raw_chain_s": {k: round(v, 4) for k, v in post_raw.items()},
    }
    print("post:", out["cheb2_post"], flush=True)

    cyc_s, cyc_raw = timed_chain(run_cycle, (h,), v0, (2, 402))
    rest = cyc_s - pre_s - post_s
    out["v_cycle"] = {
        "ms": round(cyc_s * 1e3, 3),
        "raw_chain_s": {k: round(v, 4) for k, v in cyc_raw.items()},
    }
    out["rest_ms"] = round(rest * 1e3, 3)
    out["note"] = (
        "rest = v_cycle - level-0 pre - level-0 post: restriction, "
        "prolong+correct, levels 1+ (62.6 us cheb4 at level 1 per "
        "vcycle3d_profile), coarse dense solve, and XLA scheduling gaps")
    print(json.dumps(out, indent=1), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
