"""Headline benchmark: MGCG time-to-solution on the ~1M-row 2-D Poisson
ladder workload (BASELINE.json configs[2]), one chip.

Prints JSON lines; each line is the FULL record so far, so the *last*
complete line is always the most complete result and the *first* line
already carries the headline:
  {"metric": ..., "value": <MGCG steady-state solve seconds>, "unit": "s",
   "vs_baseline": <plain-CG time / MGCG time>, ...extras...}

``vs_baseline`` is the speedup over plain (unpreconditioned) CG on the same
chip and kernels — plain CG being what the reference actually implements
(its "Mgcg" name notwithstanding, SURVEY.md §0), this is the direct
capability-times-performance ratio against the reference design.  ``value``
tracks absolute kernel/solver performance across rounds.

Robustness discipline (round-3 lesson: `BENCH_r03.json` was rc=124 with
NOTHING printed — a tunnel outage during the later sections lost the whole
round's record):
  1. The headline MGCG number prints IMMEDIATELY after its two scan pairs
     complete; everything after is additive.
  2. Every extra section runs under a wall-clock budget
     (``BENCH_DEADLINE_S``, default 1080 s) and is skipped — with the skip
     recorded — when the remaining budget is below its floor.
  3. Section failures are caught and recorded; the record line re-prints
     after every section either way.

Measurement discipline (learned the hard way on the serving tunnel): repeated
host-side calls are unreliable — identical executions can be memoized,
abandoned results dropped, and per-call pytree-argument overhead dominates.
So the repetition lives *inside* one compiled program: a ``lax.scan`` chains
K full solves (each consuming the previous solution, so nothing can be
elided), and two scan lengths are differenced to cancel the fixed
dispatch/readback overhead exactly.

Self-verification discipline (round-5, after the r4 record banked a headline
2.8x the builder's same-day measurement of the same code with nothing in the
record to arbitrate):
  1. A chip-state CANARY runs before anything else and lands in the record:
     ``jax.devices()[0].device_kind`` plus measured copy and read-reduce HBM
     GB/s — so "drift" vs "regression" vs "different chip behind the tunnel"
     is decidable from the JSON alone.
  2. The headline is measured as TWO independent scan pairs (fresh scales);
     they must agree within 15% or a third pair runs and the record carries
     ``headline_unstable: true``.  The reported value is the median of all
     pairs; every pair's differenced value AND the raw per-try chain times
     for both scan lengths are in the record.
  3. Every SpMV row carries ``implied_gb_s`` (minimum stored-stream bytes /
     time) and an ``hbm_consistent`` verdict against the same-run canary
     bandwidth — a row implying more traffic than the chip's measured HBM
     rate (and too big for VMEM residency) is flagged, not silently printed
     (the r2-r4 records republished a 207k-row Pallas point implying
     ~1.75 TB/s on a 725 GB/s chip three rounds running).

On TPU: fp32 storage + compensated dots, relative-L2 tolerance 1e-6 (fp32's
attainable floor; the reference's absolute 1e-8 is an fp64 number — see
``solvers/refine.py`` for meeting it via iterative refinement).  On CPU
fallback: fp64, tol 1e-8, smaller grids to keep runtime sane.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1080"))


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _devices_or_die(timeout_s: int = 600):
    """Backend discovery with a hard timeout.

    The axon tunnel, when down, makes ``jax.devices()`` HANG for tens of
    minutes before raising (observed: a ~7 h outage on 2026-08-18 where
    every probe blocked >5 min).  A benched round must fail fast and
    legibly instead.  The probe runs in a SUBPROCESS — the hang sits
    inside C-level PJRT client init, which defers in-process signal
    handlers indefinitely (SIGALRM measured not to fire), but a child can
    always be killed.  On timeout/init failure: one JSON line with an
    ``error`` field, exit nonzero, so the driver records the outage
    rather than a silent stall.
    """
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        ok = probe.returncode == 0
        detail = "" if ok else probe.stderr.decode()[-300:]
    except subprocess.TimeoutExpired:
        ok = False
        detail = f"backend init exceeded {timeout_s}s"
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "mgcg_1M_poisson_solve",
                    "value": None,
                    "unit": "s",
                    "vs_baseline": None,
                    "error": f"TPU backend unavailable: {detail}",
                }
            ),
            flush=True,
        )
        sys.exit(1)
    import jax

    return jax.devices()


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs skip the (slow) TPU compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    _devices_or_die()
    dev0 = jax.devices()[0]
    platform = dev0.platform
    on_tpu = platform != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
    from conjugategradient_tpu.solvers.cg import cg_solve
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    if on_tpu:
        grid = (1023, 1023)
        dtype = np.float32
        tol = 1e-6
        # Spread sizing is SIGNAL vs per-call-overhead VARIANCE, not just
        # jitter: the first r5 run banked raw chain walls showing ±150-300 ms
        # of tunnel dispatch/readback variance PER CALL (min-of-3 did not
        # tame it), so an 80-solve MGCG spread (~62 ms of signal) measures
        # noise — exactly how r4's official 2.17 ms happened.  The MGCG
        # chain therefore carries 1200 solves (~0.9 s of signal, ~15x the
        # post-min residual noise); plain CG keeps 80 (already ~1.2 s).
        k_pair_plain = (2, 82)
        k_pair_mg = (2, 1202)
        n_tries = 5
    else:
        grid = (511, 511)
        dtype = np.float64
        tol = 1e-8
        k_pair_plain = k_pair_mg = (1, 3)
        n_tries = 3

    system = generators.poisson_system(grid, dtype=dtype)
    n = system.n
    policy = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * n)
    A = dia_to_stencil(system.A, grid).device_put(dtype=dtype)
    b = jnp.asarray(system.b, dtype=dtype).reshape(grid)
    precise = dtype == np.float32
    rng = np.random.default_rng()

    def make_scan(with_mg: bool, policy=policy):
        """One jitted program running scales.shape[0] chained full solves."""

        def run(h, A, b, scales):
            M = as_preconditioner(h) if with_mg else None

            def step(prev_x, s):
                res = cg_solve(
                    A, b * s + 1e-30 * prev_x, policy=policy, M=M, precise_dot=precise
                )
                return res.x, (res.iterations, res.residual, res.converged)

            x, (its, ress, convs) = jax.lax.scan(step, jnp.zeros_like(b), scales)
            return x, its, ress, convs

        return jax.jit(run)

    def timed(run, h, A, b, K_pair, tries: int = 3, dtype=dtype):
        """Difference two scan lengths (min over ``tries`` to cut round-trip
        noise); scales drawn fresh each call (anti-memoization).  Returns the
        per-solve time, the last chain's aux outputs, and the RAW per-try
        chain wall times for both lengths (banked in the record so a bad
        differenced value is diagnosable after the fact)."""
        k1, k2 = K_pair
        times = {}
        raw = {}
        out = None
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
            x, its, ress, convs = run(h, A, b, scales)
            float(ress[-1])  # force the warm chain too (an un-read result can
            # be dropped by the tunnel and re-run inside the first timed try)
            raw[k] = []
            for _ in range(tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(dtype))
                t0 = time.perf_counter()
                x, its, ress, convs = run(h, A, b, scales)
                float(ress[-1])  # scalar readback forces the whole chain
                raw[k].append(time.perf_counter() - t0)
            times[k] = min(raw[k])
            out = (its, ress, convs)
        per_solve = (times[k2] - times[k1]) / (k2 - k1)
        return max(per_solve, 1e-9), out, raw

    def timed_verified(run, h, A, b, K_pair, tries: int = 3, dtype=dtype,
                       rel_gate: float = 0.15):
        """The self-verifying headline protocol: TWO independent scan pairs
        must agree within ``rel_gate`` of the smaller; on disagreement a
        THIRD pair runs and ``unstable`` is flagged.  Reported value =
        median of all pairs (r4 lesson: one silent (2,82) pair banked
        2.17 ms against two builder measurements of 0.77 ms with nothing in
        the record to arbitrate)."""
        vals, raws = [], []
        out = None
        for _ in range(2):
            t, out, raw = timed(run, h, A, b, K_pair, tries=tries, dtype=dtype)
            vals.append(t)
            raws.append(raw)
        unstable = abs(vals[0] - vals[1]) > rel_gate * min(vals)
        if unstable:
            t, out, raw = timed(run, h, A, b, K_pair, tries=tries, dtype=dtype)
            vals.append(t)
            raws.append(raw)
        value = float(np.median(vals))
        protocol = {
            "pairs_s": [round(v, 7) for v in vals],
            "raw_chain_s": [
                {str(k): [round(t, 5) for t in ts] for k, ts in raw.items()}
                for raw in raws
            ],
            "unstable": bool(unstable),
        }
        return value, out, protocol

    # ------------------------------------------------------------------
    # Section 0 (chip-state canary — runs FIRST, lands in every record):
    # device kind + measured copy / read-reduce HBM GB/s.  These arbitrate
    # every other number in the record: a headline 3x slower with identical
    # canaries is a protocol/measurement problem, not chip drift; an SpMV
    # row implying more GB/s than the canary is an artifact.
    # ------------------------------------------------------------------
    canary = {"device_kind": getattr(dev0, "device_kind", platform)}
    try:
        m = (64 * 1024 * 1024) if on_tpu else (8 * 1024 * 1024)
        key = jax.random.PRNGKey(0)
        xc = jax.random.normal(key, (m,), dtype=jnp.float32)

        # ANTI-ELISION (measured, first r5 run): (a) returning y[0] lets XLA
        # slice the whole copy chain to scalar arithmetic (DCE through the
        # scan) — the final consumer must need EVERY element; (b) any
        # summand LINEAR in the invariant array factorizes (sum(x*s) ->
        # s*sum(x)) and the hoisted sum(x) collapses the chain — the
        # per-step op must be nonlinear in x with a step-varying scalar.
        # Both "bandwidths" came out as the 1e-12 clamp floor before this.
        def copy_chain(y, scales):
            # y = y * s + tiny: one read + one write of the full array per
            # step; the final full-array sum blocks slicing
            def step(c, s):
                return c * s + (s * 1e-30), ()

            y, _ = jax.lax.scan(step, y, scales)
            return jnp.sum(y)

        def reduce_chain(x, scales):
            # max(x, s_step): nonlinear in x, scalar varies per step — not
            # factorable, not hoistable; one full read per step, no write
            def step(c, s):
                return jnp.sum(jnp.maximum(x, s + 1e-30 * c)), ()

            c, _ = jax.lax.scan(step, jnp.float32(0.0), scales)
            return c

        def bw_timed(fn, arg, k_pair, bytes_per_step):
            runj = jax.jit(fn)
            k1, k2 = k_pair
            times = {}
            for k in (k1, k2):
                scales = jnp.asarray(
                    1.0 + rng.uniform(1e-6, 1e-4, k).astype(np.float32)
                )
                float(runj(arg, scales))  # compile + warm (forced)
                best = float("inf")
                for _ in range(5):
                    scales = jnp.asarray(
                        1.0 + rng.uniform(1e-6, 1e-4, k).astype(np.float32)
                    )
                    t0 = time.perf_counter()
                    float(runj(arg, scales))
                    best = min(best, time.perf_counter() - t0)
                times[k] = best
            per = max((times[k2] - times[k1]) / (k2 - k1), 1e-12)
            return bytes_per_step / per / 1e9

        # 400-step spread: ~0.35 s of copy signal / ~0.14 s read signal vs
        # the ±150-300 ms per-call variance (same sizing rule as the headline)
        k_bw = (4, 404) if on_tpu else (2, 6)
        canary["copy_gb_s"] = round(bw_timed(copy_chain, xc, k_bw, 2 * 4 * m), 1)
        canary["read_reduce_gb_s"] = round(
            bw_timed(reduce_chain, xc, k_bw, 4 * m), 1
        )
        del xc
    except Exception as e:  # noqa: BLE001 — a lost canary must not lose the bench
        canary["error"] = f"{type(e).__name__}: {e}"[:200]
    # the achievable-HBM denominator for the SpMV physics checks below.
    # Plausibility clamp: v5e HBM is nominally 819 GB/s, so a canary outside
    # (10, 1200) means the measurement itself broke (the first r5 run
    # printed 2.7e11 "GB/s" — a DCE'd chain — and that nonsense denominator
    # silently passed a 1.6 TB/s SpMV row); fall back to the chip's
    # previously measured 725 GB/s and flag it.
    _hbm_gb_s = canary.get("read_reduce_gb_s")
    if on_tpu and not (_hbm_gb_s and 10.0 < _hbm_gb_s < 1200.0):
        canary["suspect"] = True
        _hbm_gb_s = 725.0
    elif not _hbm_gb_s:
        _hbm_gb_s = 50.0

    # ------------------------------------------------------------------
    # Section 1 (headline — prints before anything else can fail): MGCG vs
    # plain CG on the 1023^2 (1,046,529-row) Poisson system.
    # ------------------------------------------------------------------
    # cycle shape from the r4 on-chip sweep (artifacts/mgcg_cycle_sweep_r04):
    # rediscretized 5-point const-stencil levels + cheb(2,2) = 0.285 ms @ 4
    # its vs 0.87 for the r2-era Galerkin 9-point + cheb(3,3) config on the
    # same day (Galerkin coarse stencils carry 9 legs; redisc keeps 5, and
    # the coarse-level chain is latency-bound).  Poisson redisc == Galerkin
    # convergence class (test_redisc), setup is generator-time.
    h = build_hierarchy(
        system.A, grid, smoother="chebyshev", pre=2, post=2, dtype=dtype,
        coarse_operator=generators.poisson_coarse_operator(dtype),
    )
    # the hierarchy's fine operator is const-detected (the Dirichlet
    # Laplacian has constant coefficients): zero matrix bytes per SpMV.
    # BOTH runs use it — plain CG gets the same upgrade, so vs_baseline
    # stays an algorithm comparison, not an operator trick.
    A_var = A  # variable-coefficient stencil (the BASELINE SpMV metric)
    if h.levels:
        A = h.levels[0].A

    plain_run = make_scan(with_mg=False)
    t_plain, (p_its, p_ress, p_convs), plain_proto = timed_verified(
        plain_run, h, A, b, k_pair_plain, tries=n_tries
    )

    mg_run = make_scan(with_mg=True)
    t_mg, (m_its, m_ress, m_convs), mg_proto = timed_verified(
        mg_run, h, A, b, k_pair_mg, tries=n_tries
    )

    assert bool(np.asarray(m_convs).all()), f"MGCG failed: residuals {np.asarray(m_ress)}"

    record = {
        "metric": f"mgcg_poisson2d_{n}_time",
        "value": round(t_mg, 6),
        "unit": "s",
        "vs_baseline": round(t_plain / t_mg, 3),
        "platform": platform,
        "n": n,
        "mgcg_iters": int(np.asarray(m_its)[-1]),
        "plain_cg_iters": int(np.asarray(p_its)[-1]),
        "plain_cg_s": round(t_plain, 6),
        "headline_unstable": bool(mg_proto["unstable"] or plain_proto["unstable"]),
        "headline_protocol": {"mgcg": mg_proto, "plain_cg": plain_proto},
        "canary": canary,
        "sections_skipped": {},
    }
    print(json.dumps(record), flush=True)

    record["section_wall_s"] = {}

    def section(name: str, floor_s: float):
        """Decorator-ish runner: executes fn under budget, records skips,
        failures and per-section wall time, re-prints the cumulative record
        either way."""

        def run(fn):
            rem = _remaining()
            if rem < floor_s:
                record["sections_skipped"][name] = f"budget: {rem:.0f}s left < {floor_s:.0f}s floor"
            else:
                t0 = time.monotonic()
                try:
                    fn()
                except Exception as e:  # noqa: BLE001 — a lost section must not lose the record
                    record["sections_skipped"][name] = f"{type(e).__name__}: {e}"[:300]
                record["section_wall_s"][name] = round(time.monotonic() - t0, 1)
            print(json.dumps(record), flush=True)

        return run

    # ------------------------------------------------------------------
    # Section 2: the 3-D ladder rung (BASELINE configs[3]) — 255^3 =
    # 16,581,375 rows, rediscretized const-stencil hierarchy (setup is
    # generator-time; every level streams zero matrix bytes).
    # ------------------------------------------------------------------
    @section("mgcg_poisson3d", floor_s=300.0 if on_tpu else 30.0)
    def _poisson3d():
        g3 = (255, 255, 255) if on_tpu else (63, 63, 63)
        sys3 = generators.poisson_system(g3, dtype=dtype)
        t0 = time.perf_counter()
        # cheb(2,2) also wins in 3-D: 45.5 ms @ 5 its vs 51.4 @ 4 for (3,3)
        # (on-chip A/B, r4)
        h3 = build_hierarchy(
            sys3.A, g3, smoother="chebyshev", pre=2, post=2, dtype=dtype,
            coarse_operator=generators.poisson_coarse_operator(dtype),
        )
        setup_s = time.perf_counter() - t0
        A3 = h3.levels[0].A
        b3 = jnp.asarray(sys3.b, dtype=dtype).reshape(g3)
        pol3 = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * sys3.n)
        run3 = make_scan(with_mg=True, policy=pol3)
        # (1,13) spread: at ~40 ms/solve the 12-solve difference carries
        # ~0.5 s of signal against the measured ±150-300 ms per-call
        # variance (the r5 headline-spread rule; the old (1,5)'s 4-solve
        # difference was inside the noise).  Scan-pipelining error is
        # bounded by one V-cycle's head/tail overlap (~1%) at this size.
        # Raw chain times ride in the record regardless.
        t3, (i3, r3, c3), proto3 = timed(run3, h3, A3, b3, (1, 13) if on_tpu else (1, 3))
        assert bool(np.asarray(c3).all()), f"3-D MGCG failed: {np.asarray(r3)}"
        record["mgcg_poisson3d"] = {
            "n": sys3.n,
            "grid": list(g3),
            "solve_s": round(t3, 5),
            "iters": int(np.asarray(i3)[-1]),
            "setup_s": round(setup_s, 1),
            "levels": f"{len(h3.levels)}+1",
            "tol": tol,
            "raw_chain_s": {str(k): [round(t, 4) for t in ts]
                            for k, ts in proto3.items()},
        }

    # ------------------------------------------------------------------
    # Section 2b: the 100M-row ladder extension — 511^3 = 133.4M rows on
    # ONE chip (the const-stencil hierarchy ships zero matrix bytes, so the
    # operator costs nothing in HBM; setup is ~2 s host-side after the r4
    # O(boundary) stencil-validation overhaul).
    # ------------------------------------------------------------------
    @section("mgcg_poisson3d_511", floor_s=420.0 if on_tpu else 1e9)
    def _poisson3d_511():
        g5 = (511, 511, 511)
        sys5 = generators.poisson_system(g5, dtype=dtype)
        t0 = time.perf_counter()
        h5 = build_hierarchy(
            sys5.A, g5, smoother="chebyshev", pre=2, post=2, dtype=dtype,
            coarse_operator=generators.poisson_coarse_operator(dtype),
        )
        setup_s = time.perf_counter() - t0
        A5 = h5.levels[0].A
        b5 = jnp.asarray(sys5.b, dtype=dtype).reshape(g5)
        pol5 = ConvergencePolicy(tol=tol, norm="rel_l2", max_iteration=8 * sys5.n)
        run5 = make_scan(with_mg=True, policy=pol5)
        # short (1,3) spread: see the 255^3 rationale — at ~0.5 s/solve the
        # pipelining error is negligible and wall budget dominates
        t5, (i5, r5, c5), proto5 = timed(run5, h5, A5, b5, (1, 3), tries=2)
        assert bool(np.asarray(c5).all()), f"511^3 MGCG failed: {np.asarray(r5)}"
        record["mgcg_poisson3d_511"] = {
            "n": sys5.n,
            "solve_s": round(t5, 4),
            "iters": int(np.asarray(i5)[-1]),
            "setup_s": round(setup_s, 1),
            "levels": f"{len(h5.levels)}+1",
            "tol": tol,
            "raw_chain_s": {str(k): [round(t, 3) for t in ts]
                            for k, ts in proto5.items()},
        }

    # ------------------------------------------------------------------
    # Section 3: per-chip SpMV metrics (BASELINE.md declared targets:
    # GFLOP/s + nnz/s for the stencil roofline path AND the handmade
    # Pallas-DIA path).
    # ------------------------------------------------------------------
    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.ops import pallas_spmv
    from conjugategradient_tpu.ops.spmv import as_operator

    def spmv_timed(op, A_arg, v0, k_pair, fused=False, tries=5):
        def run(Ad, v, scales):
            def step(w, s):
                if fused:
                    y, d = op(Ad, w)
                else:
                    y = op(Ad, w)
                    d = jnp.vdot(w, y)
                y = y * (jax.lax.rsqrt(jnp.vdot(y, y) / y.size + 1e-30) * s)
                return y, d

            _, ds = jax.lax.scan(step, v, scales)
            return ds[-1]

        runj = jax.jit(run)
        k1, k2 = k_pair
        times = {}
        for k in (k1, k2):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            float(runj(A_arg, v0, scales))  # compile + warm
            best = float("inf")
            for _ in range(tries):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
                t0 = time.perf_counter()
                float(runj(A_arg, v0, scales))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    # 4096-step spread: at 16-75 us/step the old 512-step difference carried
    # 8-40 ms of signal against the measured ±150-300 ms per-call variance
    # (see the headline-spread note) — 8x longer puts the Pallas-207k signal
    # at ~0.3 s and the stencil at ~70 ms, above the post-min noise
    k_spmv = (16, 4112) if on_tpu else (2, 6)
    # VMEM-residency bound: v5e has 128 MiB = 134.2 MB of VMEM/core; a
    # working set under it can legitimately exceed HBM rates — XLA pins
    # loop-invariant operands and scan-carried state in VMEM across chained
    # steps.  Measured proof (r5 run 2): the 207k Pallas row's 133.5 MB
    # stream ran at an implied 1.8 TB/s over a 4096-step chain (real, not
    # chain noise) while the 1.3 GB row sat exactly at the 745 GB/s canary.
    _VMEM_MB = 134.2

    def spmv_physics(stream_bytes: float, t_s: float) -> dict:
        """Implied traffic rate vs the SAME-RUN canary HBM bandwidth.

        ``stream_bytes`` is the minimum per-op stream (matrix coefficients +
        x read + y write).  ``hbm_consistent`` is False when the implied
        rate exceeds 1.1x the canary read-reduce rate AND the working set is
        too large for VMEM residency — i.e. the number violates physics and
        must be treated as a measurement artifact (VERDICT r4 weak #2: the
        banked 75.4 us at n=207k implied ~1.75 TB/s on a 725 GB/s chip)."""
        implied = stream_bytes / t_s / 1e9
        fits_vmem = stream_bytes / 1e6 <= _VMEM_MB
        return {
            "implied_gb_s": round(implied, 1),
            "stream_mb": round(stream_bytes / 1e6, 1),
            "hbm_consistent": bool(implied <= 1.1 * _hbm_gb_s or fits_vmem),
            "vmem_resident_possible": bool(fits_vmem),
        }

    @section("spmv_stencil", floor_s=120.0 if on_tpu else 10.0)
    def _spmv_stencil():
        # stencil path: the fine operator of the headline workload — measured
        # on the VARIABLE-coefficient form (the BASELINE metric; the
        # const-detected operator moves no matrix bytes, reported separately)
        v0 = jnp.asarray(rng.standard_normal(A_var.grid).astype(np.float32))
        t_st = spmv_timed(
            lambda Ad, v: as_operator(Ad)(v), A_var.astype(jnp.float32), v0, k_spmv
        )
        stencil_metrics = {
            "us": round(t_st * 1e6, 1),
            "gflops": round(2.0 * A_var.nlegs * n / t_st / 1e9, 1),
            "gnnz_per_s": round(A_var.nnz / t_st / 1e9, 2),
            **spmv_physics((A_var.nlegs + 2) * 4.0 * n, t_st),
        }
        if h.levels and A is not A_var:
            t_cst = spmv_timed(
                lambda Ad, v: as_operator(Ad)(v), A.astype(jnp.float32), v0, k_spmv
            )
            stencil_metrics["const_us"] = round(t_cst * 1e6, 1)
            stencil_metrics["const_gflops"] = round(2.0 * A_var.nlegs * n / t_cst / 1e9, 1)
        record["spmv_stencil"] = stencil_metrics

    @section("spmv_pallas", floor_s=180.0 if on_tpu else 10.0)
    def _spmv_pallas():
        # handmade Pallas path: the reference's band-160 |sin| family (no grid
        # structure -> the flat-DIA kernel's home turf), fused pair included.
        # TWO sizes: n=207k (the historical point — its ~132 MB stream is just
        # past VMEM, so any implied rate above the canary is an artifact and
        # gets flagged) and n=2.07M (the r02 artifact size: 1.3 GB stream,
        # strictly HBM-bound, roofline-checkable — THE trustworthy row).
        n_band = 207_360 if on_tpu else 20_000
        Ab = generators.banded_sin_matrix(n_band, 160, dtype=np.float32).device_put()
        vb = jnp.asarray(rng.standard_normal(n_band).astype(np.float32))
        t_pl = spmv_timed(lambda Ad, v: pallas_spmv.spmv_dia_pallas(Ad, v), Ab, vb, k_spmv)
        t_plf = spmv_timed(
            lambda Ad, v: pallas_spmv.spmv_dot_dia_pallas(Ad, v), Ab, vb, k_spmv, fused=True
        )
        record["spmv_pallas_dia_band160"] = {
            "us": round(t_pl * 1e6, 1),
            "gflops": round(2.0 * Ab.ndiags * n_band / t_pl / 1e9, 1),
            "gnnz_per_s": round(Ab.nnz / t_pl / 1e9, 2),
            "fused_us": round(t_plf * 1e6, 1),
            **spmv_physics((Ab.ndiags + 2) * 4.0 * n_band, t_pl),
        }

    @section("spmv_pallas_2M", floor_s=180.0 if on_tpu else 1e9)
    def _spmv_pallas_2m():
        n_big = 2_073_600
        Ab = generators.banded_sin_matrix(n_big, 160, dtype=np.float32).device_put()
        vb = jnp.asarray(rng.standard_normal(n_big).astype(np.float32))
        # at ~1.8 ms/step the (16,528) difference carries ~0.9 s of signal
        # against the ±150-300 ms call variance, and sequential-dependence
        # pipelining cannot hide an HBM-bound stream 13x the size of VMEM
        t_pl = spmv_timed(
            lambda Ad, v: pallas_spmv.spmv_dia_pallas(Ad, v), Ab, vb, (16, 528)
        )
        row = {
            "us": round(t_pl * 1e6, 1),
            "gflops": round(2.0 * Ab.ndiags * n_big / t_pl / 1e9, 1),
            "gnnz_per_s": round(Ab.nnz / t_pl / 1e9, 2),
            **spmv_physics((Ab.ndiags + 2) * 4.0 * n_big, t_pl),
        }
        record["spmv_pallas_dia_band160_2M"] = row
        # the big row MUST be physical: 1.3 GB of stream cannot be VMEM-
        # cached, so implied > 1.1x canary means the protocol itself broke
        assert row["hbm_consistent"], (
            f"2.07M-row Pallas SpMV implies {row['implied_gb_s']} GB/s against "
            f"a {_hbm_gb_s} GB/s canary — measurement artifact"
        )

    @section("pallas_validation", floor_s=60.0 if on_tpu else 5.0)
    def _pallas_validation():
        # compiled-vs-interpret Mosaic validation (small system, fp32
        # tolerance) — every benched round revalidates the Pallas lowering
        Av = generators.banded_sin_matrix(20_000, 160, dtype=np.float32).device_put()
        xv = jnp.asarray(np.random.default_rng(0).standard_normal(20_000).astype(np.float32))
        y_c = np.asarray(pallas_spmv.spmv_dia_pallas(Av, xv))
        y_i = np.asarray(pallas_spmv.spmv_dia_pallas(Av, xv, interpret=True))
        y_o = oracle.spmv(Av, np.asarray(xv, np.float64))
        pallas_err = float(np.abs(y_c - y_i).max() / np.abs(y_o).max())
        assert pallas_err < 1e-5, f"Pallas compiled vs interpret diverge: {pallas_err}"
        # same for the multi-RHS kernel (k slabs sharing one coefficient stream)
        Xv = jnp.asarray(np.random.default_rng(1).standard_normal((20_000, 4)).astype(np.float32))
        Ym_c = np.asarray(pallas_spmv.spmm_dia_pallas(Av, Xv))
        Ym_i = np.asarray(pallas_spmv.spmm_dia_pallas(Av, Xv, interpret=True))
        pallas_multi_err = float(np.abs(Ym_c - Ym_i).max() / np.abs(Ym_i).max())
        assert pallas_multi_err < 1e-5, f"multi-RHS Pallas diverges: {pallas_multi_err}"
        record["pallas_compiled_vs_interpret_relerr"] = pallas_err
        record["pallas_multi_compiled_vs_interpret_relerr"] = pallas_multi_err
        # and the big-const-stencil slab kernel (r5: the 3-D ladder's fine
        # levels route through it) — compiled vs the XLA pad+slice path
        from conjugategradient_tpu.core.formats import dia_to_stencil, stencil_to_const
        from conjugategradient_tpu.ops.pallas_stencil import spmv_const_stencil_pallas
        from conjugategradient_tpu.ops.stencil import spmv_const_stencil as _st_xla

        gs = (33, 31, 29)
        ssys = generators.poisson_system(gs, dtype=np.float32)
        Ast = stencil_to_const(dia_to_stencil(ssys.A, gs))
        xs = jnp.asarray(
            np.random.default_rng(2).standard_normal(gs).astype(np.float32)
        )
        y_k = np.asarray(spmv_const_stencil_pallas(Ast, xs))
        y_x = np.asarray(_st_xla(Ast, xs))
        st_err = float(np.abs(y_k - y_x).max() / max(np.abs(y_x).max(), 1e-30))
        assert st_err < 1e-5, f"const-stencil Pallas diverges: {st_err}"
        record["pallas_stencil_vs_xla_relerr"] = st_err

    @section("amg_cg_511sq", floor_s=240.0 if on_tpu else 1e9)
    def _amg():
        # grid-free AMG-CG on the 511^2 Poisson handed over as bare CSR —
        # the r4 blocked (gather-free) aggregation path (measured 17.6x
        # over the r3 greedy cycle; artifacts/amg_blocked_r04.json)
        from conjugategradient_tpu.core.io import from_scipy, to_scipy
        from conjugategradient_tpu.precond.amg import (
            amg_preconditioner,
            build_amg_hierarchy,
        )

        asys = generators.poisson_system((511, 511), dtype=np.float32)
        A_csr = from_scipy(to_scipy(asys.A).tocsr())
        apol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=2000)
        ab = jnp.asarray(asys.b, dtype=np.float32)
        h_amg = build_amg_hierarchy(A_csr, dtype=np.float32, use_pallas=False)

        def run_amg(h_, A_, b_, scales):
            M = amg_preconditioner(h_)

            def step(prev_x, sc):
                res = cg_solve(
                    A_, b_ * sc + 1e-30 * prev_x, policy=apol, M=M,
                    precise_dot=True,
                )
                return res.x, (res.iterations, res.residual, res.converged)

            x, aux = jax.lax.scan(step, jnp.zeros_like(b_), scales)
            return x, aux

        runj = jax.jit(run_amg)
        A0 = h_amg.levels[0].A
        times = {}
        aux = None
        for k in (2, 22):
            scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
            o = runj(h_amg, A0, ab, scales)
            jax.block_until_ready(o)
            best = float("inf")
            for _ in range(3):
                scales = jnp.asarray(1.0 + rng.uniform(1e-5, 1e-3, k).astype(np.float32))
                t0 = time.perf_counter()
                o = runj(h_amg, A0, ab, scales)
                float(np.asarray(o[1][1]).ravel()[-1])
                best = min(best, time.perf_counter() - t0)
            times[k] = best
            aux = o[1]
        per = max((times[22] - times[2]) / 20, 1e-9)
        assert bool(np.asarray(aux[2]).all()), "AMG-CG failed"
        lvl0 = h_amg.levels[0]
        record["amg_cg_511sq"] = {
            "ms": round(per * 1e3, 3),
            "its": int(np.asarray(aux[0])[-1]),
            "aggregation": (
                "nd_cubes_stencil" if lvl0.blk_nd is not None
                else "blocked" if lvl0.blk else "greedy"
            ),
        }

    @section("flagship_refined", floor_s=180.0 if on_tpu else 1e9)
    def _flagship():
        # one reference workload time: cublas_flagship through mixed-precision
        # refinement (the fp64-tolerance path on fp64-less hardware)
        from conjugategradient_tpu.models import WORKLOADS
        from conjugategradient_tpu.solvers.refine import refined_solve

        w = WORKLOADS["cublas_flagship"]
        fsys = w.build(dtype=np.float64)
        best = float("inf")
        rres = None
        # first call traces; the module-cached inner jits make repeats
        # cheap (~5 s each), so min-of-3 rides out tunnel-latency windows
        for _ in range(3):
            t0 = time.perf_counter()
            rres = refined_solve(
                fsys.A, fsys.b, fsys.x0, tol=w.policy.tol, norm=w.policy.norm,
                inner_tol=1e-4, device_dtype=np.float32,
            )
            best = min(best, time.perf_counter() - t0)
        assert rres.converged or rres.stalled
        record["flagship_refined_s"] = round(best, 3)

    record["bench_wall_s"] = round(time.monotonic() - _T0, 1)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
