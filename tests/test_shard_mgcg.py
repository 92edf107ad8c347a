"""Explicit shard_map MGCG (VERDICT round 1, missing #2): hand-placed
per-level halo collectives, replicated coarse tail, GSPMD equivalence."""

import re

import jax
import numpy as np
import pytest

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import poisson_system
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.parallel.gspmd import gspmd_mgcg_solve
from conjugategradient_tpu.parallel.shard_mgcg import (
    make_shard_mgcg,
    shard_mgcg_solve,
    spmv_stencil_shard,
)
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _true_rel(sys_, res):
    x = np.asarray(res.x, np.float64)
    r = sys_.b - oracle.spmv(sys_.A, x)
    return np.linalg.norm(r) / np.linalg.norm(sys_.b)


def test_sharded_stencil_spmv_matches_global():
    from jax.sharding import PartitionSpec as P

    grid = (64, 32)
    sys_ = poisson_system(grid)
    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.ops.stencil import spmv_stencil

    st = dia_to_stencil(sys_.A, grid)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(grid)
    import jax.numpy as jnp

    want = np.asarray(spmv_stencil(st, jnp.asarray(x)))
    mesh = make_mesh(8)
    fn = jax.shard_map(
        lambda d, v: spmv_stencil_shard(d, st.shifts, v, 1, "x", 8),
        mesh=mesh,
        in_specs=(P(None, "x"), P("x")),
        out_specs=P("x"),
    )
    got = np.asarray(jax.jit(fn)(jnp.asarray(np.asarray(st.data)), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_shard_mgcg_matches_gspmd_to_fp_tolerance():
    """The VERDICT 'done' bar: 8-shard explicit shard_map MGCG == GSPMD MGCG
    on the same hierarchy, to fp tolerance."""
    from conjugategradient_tpu.precond import build_hierarchy

    grid = (128, 128)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=500)
    mesh = make_mesh(8)
    # one shared agg hierarchy: the explicit path's halo transfers cover agg
    # only (hyb needs in-transfer halo exchange — GSPMD's job)
    h = build_hierarchy(
        sys_.A, grid, smoother="chebyshev", transfer_kind="agg", layout="stencil"
    )
    res_sm = shard_mgcg_solve(
        sys_, grid, mesh=mesh, policy=pol, smoother="chebyshev", hierarchy=h
    )
    res_gs = gspmd_mgcg_solve(
        sys_, grid, mesh=mesh, policy=pol, smoother="chebyshev", hierarchy=h
    )
    assert bool(res_sm.converged) and bool(res_gs.converged)
    assert _true_rel(sys_, res_sm) < 1e-9
    # same preconditioner maths -> same Krylov path: iteration counts agree
    # and the solutions match far below the solve tolerance
    assert abs(int(res_sm.iterations) - int(res_gs.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res_sm.x), np.asarray(res_gs.x), rtol=1e-8, atol=1e-11)


@pytest.mark.parametrize("num", [1, 2, 4, 8])
def test_shard_mgcg_shard_count_invariance(num):
    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=500)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(num), policy=pol, smoother="jacobi")
    assert bool(res.converged)
    assert _true_rel(sys_, res) < 1e-9


def test_shard_mgcg_3d():
    grid = (32, 16, 16)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=500)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol)
    assert bool(res.converged)
    assert _true_rel(sys_, res) < 1e-8


def test_shard_mgcg_multilevel_hierarchy_sharded_depth():
    """With max_coarse small the hierarchy has several levels; the leading
    ones must actually run sharded (not silently replicate everything)."""
    from conjugategradient_tpu.parallel.shard_mgcg import _shardable
    from conjugategradient_tpu.precond import build_hierarchy

    grid = (128, 128)
    sys_ = poisson_system(grid)
    h = build_hierarchy(
        sys_.A, grid, smoother="chebyshev", max_coarse=64, transfer_kind="agg"
    )
    n_sharded = 0
    for lvl in h.levels:
        if _shardable(lvl, 8):
            n_sharded += 1
        else:
            break
    assert n_sharded >= 2, [lvl.grid for lvl in h.levels]
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=500)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, hierarchy=h)
    assert bool(res.converged)
    assert _true_rel(sys_, res) < 1e-9


COLLECTIVES = ("all-reduce", "collective-permute", "all-gather", "all-to-all", "reduce-scatter")


def _collective_counts(hlo_text):
    return {c: len(re.findall(rf"\b{c}(?:-start)?\(", hlo_text)) for c in COLLECTIVES}


def test_shard_mgcg_collective_count_vs_gspmd():
    """HLO audit (the VERDICT 'done' bar): the explicit program's collective
    schedule is fixed and small; record it next to GSPMD's derived one."""
    from conjugategradient_tpu.parallel.gspmd import make_gspmd_mgcg

    from conjugategradient_tpu.precond import build_hierarchy

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=100)
    mesh = make_mesh(8)

    # one shared agg hierarchy so both programs run the same maths
    h = build_hierarchy(
        sys_.A, grid, smoother="jacobi", transfer_kind="agg", layout="stencil"
    )
    solve_sm, (b_sm, x0_sm) = make_shard_mgcg(
        sys_, grid, mesh, pol, smoother="jacobi", hierarchy=h
    )
    hlo_sm = solve_sm.jitted.lower(*solve_sm.lower_args).compile().as_text()
    counts_sm = _collective_counts(hlo_sm)

    solve_gs, (b_gs, x0_gs) = make_gspmd_mgcg(
        sys_, grid, mesh, pol, smoother="jacobi", hierarchy=h
    )
    # reach the underlying jitted fn: __wrapped__ of the returned lambda
    import conjugategradient_tpu.parallel.gspmd as gspmd_mod

    hlo_gs = None
    # the returned callable closes over the jitted _solve; recover via its cell
    for cell in solve_gs.__closure__ or ():
        obj = cell.cell_contents
        if hasattr(obj, "lower"):
            import jax.numpy as jnp

            # mirror the call signature (h_, A_, b, x0)
            hlo_gs = None  # filled below with the actual args
            jitted_gs = obj
    assert jitted_gs is not None

    # find h_sharded and fine_A from the other closure cells
    args = [cell.cell_contents for cell in solve_gs.__closure__]
    h_like = [a for a in args if a.__class__.__name__ == "MgHierarchy"]
    A_like = [a for a in args if a.__class__.__name__ in ("StencilMatrix", "ConstStencilMatrix")]
    assert h_like and A_like
    hlo_gs = jitted_gs.lower(h_like[0], A_like[0], b_gs, x0_gs).compile().as_text()
    counts_gs = _collective_counts(hlo_gs)

    total_sm = sum(counts_sm.values())
    total_gs = sum(counts_gs.values())
    # the explicit schedule must stay bounded: psum dots + per-level permutes
    # + one gather at the replicated boundary
    assert counts_sm["all-reduce"] >= 1 and counts_sm["collective-permute"] >= 1
    assert total_sm <= total_gs, (counts_sm, counts_gs)

    import json, os

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts", "collectives_mgcg.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(
            {
                "workload": "poisson 64x64, jacobi MGCG, 8-device virtual mesh",
                "shard_map_explicit": counts_sm,
                "gspmd_derived": counts_gs,
            },
            f,
            indent=1,
        )


def test_shard_mgcg_plain_agg_hierarchy_matches_vcycle():
    """Review fix r2: a caller-supplied plain-aggregation hierarchy
    (sa_smooth_levels=0, as the probed rung-5 setup produces) must get the
    matching UNsmoothed transfers in the sharded V-cycle — the solve agrees
    with the single-device MGCG on the same hierarchy."""
    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.precond.multigrid import mgcg_solve

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=200)
    mesh = make_mesh(8)

    h = build_hierarchy(
        sys_.A, grid, sa_smooth_levels=0, layout="stencil", transfer_kind="agg"
    )
    solve, (b, x0) = make_shard_mgcg(sys_, grid, mesh, pol, hierarchy=h)
    res = solve(b, x0)
    assert bool(res.converged)

    ref, _ = mgcg_solve(sys_.A, sys_.b, grid, sys_.x0, policy=pol, hierarchy=h)
    assert bool(ref.converged)
    # same preconditioner => same Krylov sequence => same iteration count
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64), np.asarray(ref.x, np.float64), rtol=1e-5, atol=1e-8
    )


def test_shard_mgcg_hybrid_transfers_match_gspmd():
    """Hyb transfers in the explicit path (1-element ppermute pair per cc
    restrict/prolong): same hierarchy through shard_map and GSPMD gives the
    same Krylov path."""
    from conjugategradient_tpu.precond import build_hierarchy

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=200)
    mesh = make_mesh(8)
    h = build_hierarchy(sys_.A, grid, smoother="chebyshev", layout="stencil")
    assert h.levels[0].transfer == "hyb"  # even grid: auto picks hyb
    res_sm = shard_mgcg_solve(sys_, grid, mesh=mesh, policy=pol, hierarchy=h)
    res_gs = gspmd_mgcg_solve(sys_, grid, mesh=mesh, policy=pol, hierarchy=h)
    assert bool(res_sm.converged) and bool(res_gs.converged)
    assert _true_rel(sys_, res_sm) < 1e-9
    assert abs(int(res_sm.iterations) - int(res_gs.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res_sm.x), np.asarray(res_gs.x), rtol=1e-8, atol=1e-11
    )


@pytest.mark.parametrize("num", [1, 2, 4, 8])
def test_shard_mgcg_hybrid_shard_count_invariance(num):
    """The hyb boundary exchange must be exact: any shard count reproduces
    the single-device hybrid V-cycle result."""
    grid = (64, 32)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=200)
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(num), policy=pol)
    assert bool(res.converged)
    assert int(res.iterations) <= 10  # the hyb iteration win, sharded
    assert _true_rel(sys_, res) < 1e-9


def test_shard_mgcg_rbgs_matches_single_device():
    """rbgs masks ride as row-sharded inputs: parity is a function of GLOBAL
    indices, so each shard's slice of the host mask IS its checkerboard —
    the sharded trajectory matches the single-device rbgs MGCG."""
    import jax.numpy as jnp

    from conjugategradient_tpu.precond import build_hierarchy
    from conjugategradient_tpu.precond.multigrid import as_preconditioner
    from conjugategradient_tpu.solvers.cg import cg_solve

    grid = (64, 64)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-8, norm="rel_l2")
    res = shard_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, smoother="rbgs")
    assert bool(res.converged)
    assert _true_rel(sys_, res) < 1e-8
    h = build_hierarchy(sys_.A, grid, smoother="rbgs", layout="stencil")
    res1 = cg_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), None, pol, M=as_preconditioner(h)
    )
    assert int(res.iterations) == int(res1.iterations)


def test_shard_multi_rbgs():
    from conjugategradient_tpu.parallel.shard_multi import shard_multi_mgcg_solve

    grid = (64, 64)
    sys_ = poisson_system(grid)
    B = np.random.default_rng(0).standard_normal((sys_.n, 3))
    res = shard_multi_mgcg_solve(
        sys_, B, grid, mesh=make_mesh(8),
        policy=ConvergencePolicy(tol=1e-8, norm="rel_l2"), smoother="rbgs",
    )
    assert bool(np.asarray(res.converged).all())
    X = np.asarray(res.x, np.float64)
    for j in range(3):
        r = B[:, j] - oracle.spmv(sys_.A, X[:, j])
        assert np.linalg.norm(r) / np.linalg.norm(B[:, j]) < 1e-7
