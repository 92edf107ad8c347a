"""Single-call multi-RHS kernel with a revisited y block — measured, and SLOWER.

Hypothesis (from the traffic model in ``ops/pallas_spmv.py``): the chained
per-group pallas_calls re-stream the y block once per diagonal group
(2*(G-1)*k*n*4 B), so ONE call with grid (tiles, groups) — the group axis
sequential ("arbitrary"), the output block's index map ignoring it so Mosaic
keeps y resident across the sweep — should save ~15%.

Measured on chip (band-160, n=414,720, k=8, fp32): **1634 us vs 733 us for
the chained formulation — 2.2x SLOWER.**  The sequential group dimension
defeats the pipeliner: with the output block revisited, Mosaic schedules the
whole g-sweep conservatively (no parallel tiling across the revisit, and the
per-step x/D fetches no longer overlap the previous step's compute the way
independent per-call grids do).  Verdict: the chained-call formulation with
``input_output_aliases`` stays the library path (``cm_apply_multi``); this
experiment is kept runnable so the negative result stays reproducible.

Usage: python scripts/spmm_acc_experiment.py [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=414_720)
    ap.add_argument("--band", type=int, default=160)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.ops import pallas_spmv as ps
    from conjugategradient_tpu.ops.pallas_spmv import _LANE, _R, CmPlan, dia_data_cm

    def dia_data_cm_all(A, plan, dtype):
        Gs = dia_data_cm(A, plan, dtype)
        lmax = max(d.shape[0] for d in Gs)
        return jnp.stack(
            [jnp.pad(d, ((0, lmax - d.shape[0]), (0, 0), (0, 0))) for d in Gs]
        )

    def kernel(S_ref, x0, x1, x2, d, y_out, *, groups, k, acc_dtype):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            y_out[...] = jnp.zeros_like(y_out)

        slab = jnp.concatenate([x0[...], x1[...], x2[...]], axis=1).astype(acc_dtype)
        for gi, (_, rels, idx) in enumerate(groups):

            @pl.when(g == gi)
            def _group(rels=rels):
                acc = None
                for j, rel in enumerate(rels):
                    w = jax.lax.slice(slab, (0, rel, 0), (k, rel + _R, _LANE))
                    t = d[0, j].astype(acc_dtype) * w
                    acc = t if acc is None else acc + t
                y_out[...] += acc

    @functools.partial(jax.jit, static_argnames=("plan", "interpret"))
    def apply_acc(Xt, D_all, S, plan: CmPlan, interpret: bool):
        k = Xt.shape[0]
        G = len(plan.groups)
        lmax = D_all.shape[1]
        acc_dtype = jnp.result_type(D_all.dtype, Xt.dtype)
        if acc_dtype == jnp.bfloat16:
            acc_dtype = jnp.dtype(jnp.float32)

        def xspec(f):
            return pl.BlockSpec(
                (k, _R, _LANE), lambda i, g, S_ref, f=f: (0, S_ref[g] + i + f, 0)
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(plan.tiles, G),
            in_specs=[
                xspec(0),
                xspec(1),
                xspec(2),
                pl.BlockSpec((1, lmax, _R, _LANE), lambda i, g, S_ref: (g, 0, i, 0)),
            ],
            out_specs=pl.BlockSpec((k, _R, _LANE), lambda i, g, S_ref: (0, i, 0)),
        )
        return pl.pallas_call(
            functools.partial(kernel, groups=plan.groups, k=k, acc_dtype=acc_dtype),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((k, plan.segp, _LANE), acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=interpret,
        )(S, Xt, Xt, Xt, D_all)

    n, k = args.n, args.k
    A = generators.banded_sin_matrix(n, args.band, dtype=np.float32).device_put()
    rng = np.random.default_rng(0)
    X_h = rng.standard_normal((n, k)).astype(np.float32)
    plan = ps.plan_dia_cm_multi(tuple(A.offsets), n)
    Vm = ps.to_cm_multi(jnp.asarray(X_h), plan)
    itp = jax.default_backend() != "tpu"
    D_all = dia_data_cm_all(A, plan, jnp.asarray(A.data).dtype)
    S = jnp.asarray([g[0] for g in plan.groups], jnp.int32)
    Xt = jax.vmap(lambda v: ps.expand_cm(v, plan))(Vm)

    Yc = np.asarray(ps.from_cm_multi(apply_acc(Xt, D_all, S, plan, itp), plan))
    err = 0.0
    for j in range(k):
        yo = oracle.spmv(A, X_h[:, j].astype(np.float64))
        err = max(err, float(np.abs(Yc[:, j] - yo).max() / np.abs(yo).max()))
    assert err < 1e-5, err

    def timed(step, v0):
        def run(Ad, v, scales):
            def body(w, s):
                y = step(Ad, w)
                nrm = jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30)
                return (y * (nrm * s)).astype(v.dtype), ()

            v, _ = jax.lax.scan(body, v, scales)
            return jnp.vdot(v, v)

        runj = jax.jit(run)
        times = {}
        for kk in (16, 144):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, kk).astype(np.float32))
            float(runj(A, v0, scales))
            best = float("inf")
            for _ in range(4):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, kk).astype(np.float32))
                t0 = time.perf_counter()
                float(runj(A, v0, scales))
                best = min(best, time.perf_counter() - t0)
            times[kk] = best
        return max((times[144] - times[16]) / 128, 1e-9)

    t_chain = timed(lambda Ad, V: ps.cm_apply_multi(Ad, V), Vm)
    t_acc = timed(
        lambda Ad, V: apply_acc(
            jax.vmap(lambda v: ps.expand_cm(v, plan))(V), D_all, S, plan, itp
        ),
        Vm,
    )
    print(
        json.dumps(
            {
                "experiment": "spmm_acc_single_call",
                "platform": jax.devices()[0].platform,
                "n": n,
                "k": k,
                "chained_us": round(t_chain * 1e6, 1),
                "single_call_us": round(t_acc * 1e6, 1),
                "chained_over_single_x": round(t_acc / t_chain, 2),
                "max_rel_err": err,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
