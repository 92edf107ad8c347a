"""Distributed algebraic multigrid (``parallel.shard_amg``): row-sharded SA
levels with exact-hop ring gathers, replicated coarse tail, the V-cycle as
the ``M`` of the sharded Krylov loops.  All on the 8-device virtual CPU
mesh; trajectories compared against the single-device ``precond.amg`` cycle
(same hierarchy, same arithmetic up to reduction order) and solutions
against the fp64 oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.io import from_scipy, to_scipy
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.parallel.shard_amg import (
    _rect_shard_arrays,
    sharded_amg_solve,
)
from conjugategradient_tpu.precond.amg import amg_cg_solve, build_amg_hierarchy
from conjugategradient_tpu.solvers.policy import ConvergencePolicy
from conjugategradient_tpu import solve


POL = ConvergencePolicy(tol=1e-8, norm="rel_l2")


def _as_csr(A):
    return from_scipy(to_scipy(A).tocsr())


def _validate(A, b, res, tol=1e-6):
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = np.asarray(b, np.float64) - oracle.spmv(A, x)
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b, np.float64))
    assert rel < tol, f"relative residual {rel:.3e}"


def test_rect_shard_arrays_roundtrip():
    """The rectangular per-shard layout reproduces S @ v exactly (ring and
    all-gather coordinate conventions both)."""
    rng = np.random.default_rng(0)
    # a banded-ish rectangular matrix: rows 32, cols 16, num=4
    S = sp.random(32, 16, density=0.3, random_state=0, format="csr")
    v = rng.standard_normal(16)
    data, cols, rows, hops, use_ag = _rect_shard_arrays(S, 4)
    y = np.zeros(32)
    nr_local, nc_local = 8, 4
    for s in range(4):
        if use_ag:
            window = v
        else:
            idx = [(s + k) % 4 for k in range(-hops, hops + 1)]
            window = np.concatenate([v[i * nc_local : (i + 1) * nc_local] for i in idx])
        for d, c, r in zip(data[s], cols[s], rows[s]):
            y[s * nr_local + r] += d * window[c]
    np.testing.assert_allclose(y, S @ v, atol=1e-12)


def test_sharded_amg_cg_matches_single_device():
    """Same hierarchy, 8 shards vs 1 device: iteration counts equal, both
    oracle-validated.  n = 961 (31x31 Poisson as CSR, NOT divisible by 8 —
    exercises the internal identity padding)."""
    sys_ = generators.poisson_system((31, 31))
    A = _as_csr(sys_.A)
    res_s, h = sharded_amg_solve(A, sys_.b, policy=POL, mesh=make_mesh(axis="x"))
    res_1, _ = amg_cg_solve(A, sys_.b, policy=POL, hierarchy=h)
    assert int(res_s.iterations) == int(res_1.iterations)
    _validate(sys_.A, sys_.b, res_s)
    assert res_s.x.shape == (sys_.A.n,)


def test_sharded_amg_allgather_fallback_permuted():
    """A randomly permuted Poisson matrix destroys aggregate locality — the
    exact windows cover most of the ring and every level falls back to the
    reference's global-vector (all-gather) form.  Still converges and
    validates."""
    sys_ = generators.poisson_system((25, 25))
    S = to_scipy(sys_.A).tocsr()
    rng = np.random.default_rng(1)
    perm = rng.permutation(S.shape[0])
    Pm = sp.csr_matrix(
        (np.ones(len(perm)), (np.arange(len(perm)), perm)), shape=S.shape
    )
    Sp = (Pm @ S @ Pm.T).tocsr()
    bp = np.asarray(sys_.b)[perm]
    res, h = sharded_amg_solve(from_scipy(Sp), bp, policy=POL, mesh=make_mesh())
    assert bool(res.converged)
    xr = sp.linalg.spsolve(Sp.tocsc(), bp)
    rel = np.max(np.abs(np.asarray(res.x) - xr)) / np.max(np.abs(xr))
    assert rel < 1e-6


def test_sharded_amg_nonsym_bicgstab():
    """amg_bicgstab over the mesh: hierarchy on A itself (jacobi smoothing,
    the single-device nonsym recipe), right-preconditioned sharded
    BiCGStab."""
    sysn = generators.convection_diffusion_system((31, 31), eps=0.1)
    A = _as_csr(sysn.A)
    res, h = sharded_amg_solve(
        A, sysn.b, policy=POL, mesh=make_mesh(), method="bicgstab"
    )
    assert bool(res.converged)
    # way fewer iterations than plain BiCGStab (~660 at this eps in fp64)
    assert int(res.iterations) < 60
    x_ref = oracle.direct_solve(sysn.A, sysn.b)
    rel = np.max(np.abs(np.asarray(res.x) - x_ref)) / np.max(np.abs(x_ref))
    assert rel < 1e-6


@pytest.mark.parametrize("method", ["gmres", "fgmres", "minres"])
def test_sharded_amg_other_methods(method):
    if method == "minres":
        sys_ = generators.poisson_system((25, 25))
    else:
        sys_ = generators.convection_diffusion_system((25, 25), eps=0.1)
    A = _as_csr(sys_.A)
    res, _ = sharded_amg_solve(A, sys_.b, policy=POL, mesh=make_mesh(), method=method)
    _validate(sys_.A, sys_.b, res)


def test_facade_amg_mesh_routing():
    """solve(method='amg_cg', mesh=) routes to the distributed carrier and
    matches the single-device facade result."""
    sys_ = generators.poisson_system((25, 25))
    A = _as_csr(sys_.A)
    mesh = make_mesh()
    res = solve(A, sys_.b, method="amg_cg", mesh=mesh, tol=1e-8, norm="rel_l2")
    _validate(sys_.A, sys_.b, res)
    res_n = solve(
        A, sys_.b, method="amg_bicgstab", mesh=mesh, tol=1e-8, norm="rel_l2"
    )
    # the nonsym route accepts SPD too (right-preconditioned BiCGStab)
    _validate(sys_.A, sys_.b, res_n)


def test_sharded_amg_hierarchy_reuse_and_tiny_refusal():
    sys_ = generators.poisson_system((25, 25))
    A = _as_csr(sys_.A)
    h = build_amg_hierarchy(A, dtype=np.float64)
    res, h2 = sharded_amg_solve(A, sys_.b, policy=POL, mesh=make_mesh(), hierarchy=h)
    assert h2 is h
    _validate(sys_.A, sys_.b, res)
    tiny = generators.poisson_system((8, 8))  # n=64 <= max_coarse
    with pytest.raises(ValueError, match="too small"):
        sharded_amg_solve(_as_csr(tiny.A), tiny.b, policy=POL, mesh=make_mesh())


def test_sharded_amg_wcycle_matches_single_device():
    """Review regression: gamma=2 must ride into the replicated tail's
    sub-levels too — trajectory parity with single-device amg_vcycle at
    gamma=2 (forced-deep hierarchy so several levels replicate)."""
    sys_ = generators.poisson_system((31, 31))
    A = _as_csr(sys_.A)
    h = build_amg_hierarchy(A, dtype=np.float64, max_coarse=20)
    res_s, _ = sharded_amg_solve(
        A, sys_.b, policy=POL, mesh=make_mesh(), hierarchy=h, gamma=2,
        min_local=64,
    )
    res_1, _ = amg_cg_solve(A, sys_.b, policy=POL, hierarchy=h, gamma=2)
    assert int(res_s.iterations) == int(res_1.iterations)
    _validate(sys_.A, sys_.b, res_s)


def test_sharded_amg_collective_audit():
    """HLO audit: the sharded AMG program's collective schedule is fixed —
    ring ppermutes (exact hops) + all-reduce dots + one all-gather at the
    replicated-tail boundary per cycle.  Recorded to
    artifacts/collectives_amg.json (house convention)."""
    import json
    import os
    import re

    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.parallel.shard_amg import make_sharded_amg

    COLLECTIVES = ("all-reduce", "all-gather", "collective-permute", "all-to-all")

    sys_ = generators.poisson_system((32, 32))
    A = _as_csr(sys_.A)
    h = build_amg_hierarchy(A, dtype=np.float64)
    import jax

    mesh = make_mesh(8)
    solve, mats_and_tail, n_pad = make_sharded_amg(
        h, sys_.A.n, mesh, POL, method="cg", min_local=16
    )
    row = NamedSharding(mesh, P("x"))
    b_pad = np.zeros(n_pad)
    b_pad[: sys_.A.n] = np.asarray(sys_.b)
    b_dev = jax.device_put(jnp.asarray(b_pad), row)
    x0_dev = jax.device_put(jnp.zeros(n_pad), row)
    hlo = solve.lower(mats_and_tail, b_dev, x0_dev).compile().as_text()
    counts = {
        c: len(re.findall(rf"\b{c}(?:-start)?\(", hlo)) for c in COLLECTIVES
    }
    # fixed schedule: dots psum, at least one ring permute pair (the exact
    # -hop windows), one gather at the sharded/replicated boundary
    assert counts["all-reduce"] >= 1
    assert counts["collective-permute"] >= 2
    assert counts["all-gather"] >= 1
    assert counts["all-to-all"] == 0
    path = os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "collectives_amg.json"
    )
    with open(path, "w") as f:
        json.dump(
            {
                "workload": "poisson 32x32 as CSR, amg_cg, 8-device virtual mesh",
                "note": "per-program totals (while-body shared across iterations); "
                        "ring permutes = exact-hop windows per level SpMV/transfer, "
                        "one all-gather per V-cycle at the replicated tail",
                "shard_map_explicit": counts,
            },
            f,
            indent=1,
        )
