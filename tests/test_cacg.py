"""s-step communication-avoiding CG (solvers.cacg + variant="cacg").

Differential strategy: CA-CG is mathematically plain CG — iterate counts
must MATCH cg_solve exactly (not approximately) at every block size s on a
well-conditioned system, and the solution validates against the fp64
direct solve.  The distributed claim (one all-reduce per s iterations) is
audited in HLO like the other variants (tests/test_cg_variants.py).
"""

import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg, sharded_cg_solve
from conjugategradient_tpu.solvers.cacg import cacg_solve
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rel(x, x_true):
    return np.linalg.norm(
        np.asarray(x, np.float64).ravel() - x_true
    ) / np.linalg.norm(x_true)


@pytest.fixture(scope="module")
def poisson():
    sys_ = generators.poisson_system((31, 31))
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


@pytest.mark.parametrize("s", [1, 3, 4, 6])
def test_matches_cg_iteration_for_iteration(poisson, s):
    sys_, x_true = poisson
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    ref = cg_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    res = cacg_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, s=s)
    assert bool(res.converged)
    # same Krylov sequence; the block boundary can overshoot by < s steps
    assert int(ref.iterations) <= int(res.iterations) < int(ref.iterations) + s
    assert _rel(res.x, x_true) < 1e-9


def test_grid_shaped_rhs(poisson):
    from conjugategradient_tpu.core.formats import dia_to_stencil

    sys_, x_true = poisson
    A_st = dia_to_stencil(sys_.A, (31, 31)).device_put()
    res = cacg_solve(
        A_st, jnp.asarray(sys_.b).reshape(31, 31),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2"), s=4,
    )
    assert bool(res.converged)
    assert res.x.shape == (31, 31)
    assert _rel(res.x, x_true) < 1e-9


def test_linf_refused(poisson):
    sys_, _ = poisson
    with pytest.raises(ValueError, match="coordinate-space"):
        cacg_solve(
            sys_.A.device_put(), jnp.asarray(sys_.b),
            policy=ConvergencePolicy(tol=1e-8, norm="linf"),
        )


def test_facade_and_prefix_guard(poisson):
    sys_, x_true = poisson
    res = solve(sys_.A, sys_.b, method="cacg", s=4, tol=1e-10, norm="rel_l2")
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-9
    with pytest.raises(ValueError, match="only the jacobi_ prefix"):
        solve(sys_.A, sys_.b, method="bjacobi_cacg", tol=1e-8)


def test_jacobi_cacg_symmetric_scaling():
    """jacobi_cacg = symmetric diagonal scaling folded into the operator:
    on an ill-scaled SPD system it must cut iterations vs plain cacg and
    still validate against the direct solve (solution in ORIGINAL scale)."""
    rng = np.random.default_rng(3)
    base = generators.banded_sin_system(512, 8)
    scale = np.exp(rng.uniform(-3, 3, 512))
    from conjugategradient_tpu.core.formats import DiaMatrix, dia_to_dense

    # congruence scaling in DIA: data[k, i] *= scale[i] * scale[i + off]
    n = 512
    data = np.array(np.asarray(base.A.data), copy=True)
    for k, off in enumerate(base.A.offsets):
        col = np.zeros(n)
        lo, hi = max(0, -off), min(n, n - off)
        col[lo:hi] = scale[lo + off : hi + off]
        data[k] = data[k] * scale * col
    A_dia = DiaMatrix(data, base.A.offsets, base.A.shape)
    dense = np.asarray(dia_to_dense(A_dia).data)
    x_true = np.linalg.solve(dense.astype(np.float64), base.b)
    pol_kw = dict(tol=1e-10, norm="rel_l2", max_iteration=20000)
    plain = solve(A_dia, base.b, method="cacg", s=4, **pol_kw)
    scaled = solve(A_dia, base.b, method="jacobi_cacg", s=4, **pol_kw)
    assert bool(scaled.converged)
    assert _rel(scaled.x, x_true) < 1e-7
    assert int(scaled.iterations) < int(plain.iterations)
    # mesh route too
    scaled_sh = solve(
        A_dia, base.b, method="jacobi_cacg", s=4, mesh=make_mesh(8), **pol_kw
    )
    assert bool(scaled_sh.converged)
    assert _rel(scaled_sh.x, x_true) < 1e-7


def test_sharded_matches_single_device():
    sys_ = generators.banded_sin_system(1024, 16)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=5000)
    single = cacg_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, s=4)
    shard = sharded_cg_solve(
        sys_.A, sys_.b, policy=pol, mesh=make_mesh(8), variant="cacg", s=4
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-8
    assert abs(int(shard.iterations) - int(single.iterations)) <= 4


def test_facade_mesh_routing():
    sys_ = generators.banded_sin_system(512, 8)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    res = solve(
        sys_.A, sys_.b, method="cacg", mesh=make_mesh(8), s=4,
        tol=1e-10, norm="rel_l2",
    )
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-8


def test_cacg_refuses_preconditioner_and_deflation():
    sys_ = generators.banded_sin_system(512, 8)
    with pytest.raises(ValueError, match="unpreconditioned"):
        sharded_cg_solve(
            sys_.A, sys_.b, mesh=make_mesh(8), variant="cacg",
            M_local=lambda r, a: a * r, M_aux=np.ones(512),
        )


def test_hlo_one_allreduce_per_s_iterations():
    """The load-bearing claim in HLO: the cacg while-BODY (one body = s
    iterations) carries exactly TWO all-reduces (Gram + true-residual
    replacement) — vs 2 per single iteration for textbook cg.  Recorded as
    a round artifact."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sys_ = generators.banded_sin_system(1024, 16)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    mesh = make_mesh(8)
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(
        jnp.asarray(np.asarray(sys_.A.data)), NamedSharding(mesh, P(None, "x"))
    )
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.asarray(sys_.x0), row)

    s = 4
    solve_fn = make_sharded_cg(sys_.A, mesh, pol, variant="cacg", s=s, donate=False)
    hlo = solve_fn.lower(data, b, x0).compile().as_text()
    body = [
        line
        for line in hlo.splitlines()
        if re.search(r"\ball-reduce(?:-start)?\(", line) and "/while/body" in line
    ]
    # 2 = the fused Gram psum + the block-boundary true-residual norm
    # (the residual replacement that keeps fp32 convergence claims honest)
    assert len(body) == 2, f"expected 2 all-reduces per {s}-step body, got {len(body)}"
    # the MATRIX-POWERS kernel claim: the whole 2s+1-column basis costs ONE
    # fused widened halo exchange (2 permutes) + the residual-replacement
    # SpMV's one-hop exchange (2 more) = 4 collective-permutes per outer
    # body (vs 2 per SpMV x 2s SpMVs = 16 for the naive form at s=4)
    perms = [
        line
        for line in hlo.splitlines()
        if re.search(r"\bcollective-permute(?:-start)?\(", line)
        and "/while/body" in line
    ]
    assert len(perms) == 4, f"expected 4 permutes per body, got {len(perms)}"

    path = os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "collectives_cacg.json"
    )
    payload = json.dumps(
        {
            "workload": "band-16 n=1024, 8-device virtual mesh",
            "s": s,
            "allreduce_per_outer_body": len(body),
            "allreduce_roles": "fused Gram psum + block-boundary true-residual norm",
            "collective_permutes_per_outer_body": len(perms),
            "iterations_per_outer_body": s,
            "note": "matrix-powers kernel (2 permutes/basis) + residual-"
                    "replacement SpMV (2): 4 permutes + 2 all-reduces per "
                    "s=4-iteration body vs 16 permutes + 8 all-reduces naive",
        },
        indent=1,
    )
    try:
        current = open(path).read()
    except OSError:
        current = None
    if current != payload:
        with open(path, "w") as f:
            f.write(payload)


def test_zero_rhs_exits_immediately(poisson):
    """Review finding: rel_l2 with rr0 = 0 made tol_sq = 0 and the loop
    spun the full budget (225 its + NaN) — must exit at 0 like cg."""
    sys_, _ = poisson
    res = cacg_solve(
        sys_.A.device_put(), jnp.zeros(sys_.n),
        policy=ConvergencePolicy(tol=1e-8, norm="rel_l2"),
    )
    assert int(res.iterations) == 0
