"""Communication-reduced CG variants (cg1 / pipelined) on the virtual mesh.

The variants restructure the recurrence so all per-iteration scalars ship in
ONE fused psum (vs the textbook loop's two allreduce dependency points — the
on-device descendant of the reference's three sequential host allreduces,
``Mgcg/cuBlas/Mgcg/ConjugateGradientParallelGpu.cs:463,499,525``).  Tested
properties: same Krylov trajectory as textbook CG (identical solutions and
near-identical iteration counts in fp64), preconditioned + general-sparsity
paths, and an HLO audit proving the while-body really contains a single
all-reduce (artifact: ``artifacts/collectives_cg_variants.json``).
"""

import json
import os
import re

import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.formats import dia_diagonal, dia_to_csr
from conjugategradient_tpu.core.generators import banded_sin_system, poisson_system
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg, sharded_cg_solve
from conjugategradient_tpu.parallel.sharded_general import sharded_cg_solve_general
from conjugategradient_tpu.solvers.policy import ConvergencePolicy

VARIANTS = ["cg", "cg1", "pipelined"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_variant_matches_oracle(variant):
    sys_ = banded_sin_system(1024, 16)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    res = sharded_cg_solve(sys_.A, sys_.b, sys_.x0, pol, make_mesh(8), variant=variant)
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-9


def test_variants_share_the_krylov_trajectory():
    """cg1 is algebraically identical to cg; pipelined adds recurrence drift.
    In fp64 at 1e-10 all three must agree on the solution and land within a
    couple of iterations of each other."""
    sys_ = poisson_system((16, 16))
    pol = ConvergencePolicy(tol=1e-10, max_iteration=2000)
    results = {
        v: sharded_cg_solve(sys_.A, sys_.b, sys_.x0, pol, make_mesh(8), variant=v)
        for v in VARIANTS
    }
    its = {v: int(r.iterations) for v, r in results.items()}
    assert abs(its["cg1"] - its["cg"]) <= 1, its
    # pipelined's convergence check lags one update and its u/w recurrences
    # drift: allow a small spread, never fewer iterations than cg-1
    assert its["cg"] <= its["pipelined"] <= its["cg"] + 5, its
    x_cg = np.asarray(results["cg"].x)
    for v in ("cg1", "pipelined"):
        np.testing.assert_allclose(np.asarray(results[v].x), x_cg, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("variant", ["cg1", "pipelined"])
def test_variant_preconditioned(variant):
    """Jacobi-preconditioned single-reduce CG: M is applied once per
    iteration in both restructurings."""
    sys_ = banded_sin_system(512, 8)
    inv_diag = 1.0 / dia_diagonal(sys_.A)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    res = sharded_cg_solve(
        sys_.A,
        sys_.b,
        sys_.x0,
        pol,
        make_mesh(8),
        M_local=lambda r, aux: r * aux,
        M_aux=inv_diag,
        variant=variant,
    )
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-9


@pytest.mark.parametrize("variant", ["cg1", "pipelined"])
def test_variant_general_sparsity(variant):
    """The exact-halo CSR solver shares sharded_cg_loop, so the variants must
    work there too."""
    sys_ = banded_sin_system(512, 12)
    csr = dia_to_csr(sys_.A)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    res = sharded_cg_solve_general(csr, sys_.b, sys_.x0, pol, make_mesh(8), variant=variant)
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-9


@pytest.mark.parametrize("variant", VARIANTS)
def test_variant_exact_x0_min_iteration(variant):
    """x0 already solves the system + min_iteration forces extra sweeps: the
    safe-div guards must keep every variant NaN-free (the csrkit_cg bug class,
    ADVICE r1)."""
    sys_ = banded_sin_system(256, 8)
    x_star = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-14, max_iteration=5000).x
    pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", min_iteration=3, max_iteration=100)
    res = sharded_cg_solve(sys_.A, sys_.b, x_star, pol, make_mesh(4), variant=variant)
    x = np.asarray(res.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x, x_star, rtol=1e-7, atol=1e-9)


def _while_body_allreduces(hlo_text):
    """Count all-reduce ops executed per while-loop iteration.

    Compiled HLO stamps every op with its trace provenance
    (``metadata={op_name="jit(...)/shard_map/while/body/..."}``) — ops inside
    the iteration carry ``/while/body/``.  Collectives outside the loop (init
    dots, the pipelined variant's final fresh rr) don't count — the
    per-iteration wire cost is what the variants change.
    """
    return sum(
        1
        for line in hlo_text.splitlines()
        if re.search(r"\ball-reduce(?:-start)?\(", line) and "/while/body" in line
    )


def test_hlo_single_allreduce_per_iteration():
    """The load-bearing claim, audited in HLO: cg1/pipelined while-bodies
    carry exactly ONE all-reduce; textbook cg carries two (XLA fuses the
    adjacent rz/rr psums).  Recorded as a round artifact."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sys_ = banded_sin_system(1024, 16)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    mesh = make_mesh(8)
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(jnp.asarray(np.asarray(sys_.A.data)), NamedSharding(mesh, P(None, "x")))
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.asarray(sys_.x0), row)

    body_counts = {}
    totals = {}
    for v in VARIANTS:
        solve = make_sharded_cg(sys_.A, mesh, pol, variant=v, donate=False)
        hlo = solve.lower(data, b, x0).compile().as_text()
        body_counts[v] = _while_body_allreduces(hlo)
        totals[v] = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))

    assert body_counts["cg"] == 2, body_counts
    assert body_counts["cg1"] == 1, body_counts
    assert body_counts["pipelined"] == 1, body_counts

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts", "collectives_cg_variants.json")
    payload = json.dumps(
        {
            "workload": "band-16 n=1024, 8-device virtual mesh",
            "allreduce_per_iteration": body_counts,
            "allreduce_total_program": totals,
        },
        indent=1,
    )
    # refresh the committed artifact only when the counts actually changed,
    # so a local XLA-version drift doesn't silently dirty the working tree
    try:
        current = open(path).read()
    except OSError:
        current = None
    if current != payload:
        with open(path, "w") as f:
            f.write(payload)


def test_shard_mgcg_variant_cg1():
    """The explicit shard_map MGCG accepts the single-reduce outer loop."""
    from conjugategradient_tpu.parallel.shard_mgcg import shard_mgcg_solve

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=200)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, variant="cg1")
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-8
    # same iteration count as the textbook loop (identical maths in fp64)
    res_cg = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, variant="cg")
    assert abs(int(res.iterations) - int(res_cg.iterations)) <= 1
