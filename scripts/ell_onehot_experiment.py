"""ELL SpMV: gather vs block-windowed one-hot contraction vs Pallas-DIA.

Settles the one STATUS idea left unexplored: could the ELL gather path
(``ops/spmv.py::spmv_ell``) be replaced by a ONE-HOT formulation that turns
the gather into a dense contraction (the MXU/VPU-friendly shape)?

The formulation: split rows into blocks of R; each block's column indices
span a bounded window ``[start_b, start_b + W)`` (W static per matrix,
computed at setup exactly like the reference's per-shard minJ/maxJ,
``Mgcg/cuBlas/MgcgGpu/Mgcg.cu:82-84``).  Then

    onehot[b, r, w, W] = (cols[b, r, w] == start_b + arange(W))
    y[b, r] = sum_{w, W} data[b, r, w] * onehot[b, r, w, W] * x[start_b + W]

i.e. the gather becomes a (R*w, W) x (W,) contraction per block.  Arithmetic
cost inflates by the window size W (= R + band for banded matrices): the
formulation trades an irregular gather for W-fold redundant dense work.

Verdict from the on-chip run (artifacts/ell_onehot_r02.json, band-160
n=103,680 fp32): the one-hot contraction beats the flat XLA gather path by
~11x (11.4 ms vs 124 ms — TPU gathers really are that bad) but loses to the
Pallas-DIA relayout by 158x (72 us, 457 useful-GFLOP/s): the W=414-fold FLOP
inflation keeps it ~2 orders of magnitude off the bandwidth roofline.  So
the decision in ``ops/pallas_spmv.py`` ("bounded-band ELL IS DIA in
disguise; relayout, do not gather or one-hot") carries a measured
justification — and if a matrix ever CAN'T be relayouted (truly irregular
columns), one-hot is the better XLA-only fallback on TPU, not gather.
A one-hot WIN over relayout would need W ~ w (an already block-dense
matrix) — none of the reference workloads are.

Usage:  python scripts/ell_onehot_experiment.py [--cpu] [--n 103680]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_onehot_spmv(ell, block: int):
    """Returns (jitted fn(data_b, cols_b, starts, x) -> y, static parts).

    Window starts/size are computed host-side at setup (static shapes);
    everything else is traced.  ``n`` must divide by ``block``.
    """
    import jax
    import jax.numpy as jnp

    n, w = ell.data.shape
    assert n % block == 0, (n, block)
    nb = n // block
    cols = np.asarray(ell.cols).reshape(nb, block, w)
    data = np.asarray(ell.data).reshape(nb, block, w)
    starts = cols.min(axis=(1, 2))
    W = int((cols.max(axis=(1, 2)) - starts + 1).max())
    # clamp windows to the vector end (padding rows gather in-window zeros)
    starts = np.minimum(starts, n - W).astype(np.int32)

    def spmv(data_b, cols_b, starts_d, x):
        iota = jnp.arange(W, dtype=jnp.int32)

        def per_block(d, c, s):
            xw = jax.lax.dynamic_slice(x, (s,), (W,))
            onehot = (c[..., None] == (s + iota)).astype(d.dtype)  # (R, w, W)
            # contraction: (R*w, W) @ (W,) then weighted row-sum
            g = jnp.einsum("rwW,W->rw", onehot, xw)
            return (d * g).sum(axis=1)

        # lax.map, not vmap: the materialized one-hot is (R, w, W) PER BLOCK
        # (~67 MB at the default shapes); batching all blocks would ask for
        # tens of GB.  Sequential blocks also give the formulation its best
        # case (one-hot resident in VMEM during its contraction).
        return jax.lax.map(lambda t: per_block(*t), (data_b, cols_b, starts_d)).reshape(-1)

    return jax.jit(spmv), (jnp.asarray(data), jnp.asarray(cols), jnp.asarray(starts), W)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=103_680)
    p.add_argument("--band", type=int, default=160)
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--k", type=int, nargs=2, default=(16, 144))
    p.add_argument("--tries", type=int, default=5)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    platform = jax.devices()[0].platform

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.core.formats import csr_to_ell, dia_to_csr
    from conjugategradient_tpu.ops import pallas_spmv
    from conjugategradient_tpu.ops.spmv import spmv_ell

    dtype = np.float32
    n = (args.n // args.block) * args.block
    A_dia = generators.banded_sin_matrix(n, args.band, dtype=dtype)
    ell_h = csr_to_ell(dia_to_csr(A_dia))
    ell = ell_h.device_put()
    onehot_fn, (data_b, cols_b, starts, W) = make_onehot_spmv(ell_h, args.block)

    rng = np.random.default_rng(0)
    x_h = rng.standard_normal(n).astype(dtype)
    x = jnp.asarray(x_h)

    # correctness vs oracle first
    y_ref = oracle.spmv(A_dia, x_h.astype(np.float64))
    scale = np.abs(y_ref).max()
    y_gather = np.asarray(jax.jit(spmv_ell)(ell, x))
    y_onehot = np.asarray(onehot_fn(data_b, cols_b, jnp.asarray(starts), x))
    pallas_op = pallas_spmv.make_pallas_operator(ell_h)
    y_pallas = np.asarray(jax.jit(pallas_op)(x))
    errs = {
        "gather": float(np.abs(y_gather - y_ref).max() / scale),
        "onehot": float(np.abs(y_onehot - y_ref).max() / scale),
        "pallas_dia": float(np.abs(y_pallas - y_ref).max() / scale),
    }
    for k, e in errs.items():
        assert e < 1e-5, (k, e)

    # timing: chained scan, scan-length differencing (CLAUDE.md discipline)
    def timed(step_of, *mats):
        def run(ms, v0, scales):
            def step(v, s):
                y = step_of(ms, v)
                return y * (jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30) * s), ()

            v, _ = jax.lax.scan(step, v0, scales)
            return jnp.vdot(v, v)

        runj = jax.jit(run)
        k1, k2 = args.k
        times = {}
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            float(runj(mats, x, scales))  # compile + warm
            best = float("inf")
            for _ in range(args.tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                float(runj(mats, x, scales))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    t_gather = timed(lambda ms, v: spmv_ell(ms[0], v), ell)
    t_onehot = timed(
        lambda ms, v: onehot_fn(ms[0], ms[1], ms[2], v),
        data_b, cols_b, jnp.asarray(starts),
    )
    Ad = A_dia.device_put()
    t_pallas = timed(lambda ms, v: pallas_spmv.spmv_dia_pallas(ms[0], v), Ad)

    flops_useful = 2.0 * ell.k * n
    out = {
        "experiment": "ell_onehot",
        "platform": platform,
        "n": n,
        "band": args.band,
        "ell_width": ell.k,
        "block": args.block,
        "window_W": W,
        "flop_inflation_x": round(W, 1),
        "gather_us": round(t_gather * 1e6, 1),
        "onehot_us": round(t_onehot * 1e6, 1),
        "pallas_dia_us": round(t_pallas * 1e6, 1),
        "gather_gflops_useful": round(flops_useful / t_gather / 1e9, 1),
        "onehot_gflops_useful": round(flops_useful / t_onehot / 1e9, 1),
        "pallas_gflops_useful": round(flops_useful / t_pallas / 1e9, 1),
        "max_rel_err": errs,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
