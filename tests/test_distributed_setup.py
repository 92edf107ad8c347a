"""Device-side Galerkin probing (``precond.distributed``) vs the host builder.

The probed hierarchy must reproduce ``build_hierarchy(..., layout="stencil",
sa_smooth_levels=0)`` exactly (same transfers, same Galerkin products) —
differential testing in the spirit of the suite's oracle strategy, with the
host scipy triple-product as the oracle.
"""

import numpy as np
import pytest

import jax

from conjugategradient_tpu.core.formats import StencilMatrix, stencil_to_dia
from conjugategradient_tpu.core import formats
from conjugategradient_tpu.parallel import rung5
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.precond.distributed import build_hierarchy_probed
from conjugategradient_tpu.precond.multigrid import build_hierarchy
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _dense(st: StencilMatrix) -> np.ndarray:
    D = stencil_to_dia(StencilMatrix(np.asarray(st.data), st.shifts, st.grid))
    return np.asarray(formats.dia_to_dense(D).data)


@pytest.mark.parametrize("grid", [(14, 16), (29,), (6, 7, 8)])
def test_probed_hierarchy_matches_host_builder(grid):
    mesh = make_mesh()
    A, b, x0, padded, n_real = rung5.make_rung5_system(grid, mesh, dtype=np.float64)
    h = build_hierarchy_probed(A, mesh, max_coarse=8)

    A_dia = stencil_to_dia(StencilMatrix(np.asarray(A.data), A.shifts, A.grid))
    hh = build_hierarchy(
        A_dia, padded, max_coarse=8, sa_smooth_levels=0, layout="stencil", dtype=np.float64
    )
    assert len(h.levels) == len(hh.levels) and len(h.levels) >= 2
    for lp, lh in zip(h.levels, hh.levels):
        assert lp.grid == lh.grid
        assert lp.transfer == lh.transfer and lp.sa_smooth is False
        np.testing.assert_allclose(_dense(lp.A), _dense(lh.A), atol=1e-12)
        if lp.weight is None:
            assert lh.weight is None
        else:
            np.testing.assert_allclose(
                np.asarray(lp.weight), np.asarray(lh.weight), atol=1e-12
            )
        np.testing.assert_allclose(
            np.asarray(lp.inv_diag), np.asarray(lh.inv_diag), atol=1e-12
        )
    np.testing.assert_allclose(
        np.asarray(h.coarse_inv), np.asarray(hh.coarse_inv), atol=1e-10
    )


def test_probed_leg_pruning_per_kind():
    """Leg pruning: aggregation levels keep extent-1 stencils; hybrid
    (fw/cell-centered) levels stay within extent 2 per axis, never the full
    probing box."""
    mesh = make_mesh()
    A, *_ = rung5.make_rung5_system((14, 16), mesh, dtype=np.float32)
    h = build_hierarchy_probed(A, mesh, max_coarse=4)
    kinds = [lvl.transfer for lvl in h.levels]
    assert "hyb" in kinds  # 16x16 fine level qualifies
    parent_kind = None  # a level's operator extent is set by its PARENT's
    # transfer (Galerkin product of the level above); fine level is extent 1
    for lvl in h.levels:
        max_ext = 2 if parent_kind == "hyb" else 1
        assert all(max(abs(c) for c in s) <= max_ext for s in lvl.A.shifts)
        parent_kind = lvl.transfer
    # agg-only build keeps the 5-point star everywhere (round-1 invariant)
    h_agg = build_hierarchy_probed(A, mesh, max_coarse=4, transfer_kind="agg")
    for lvl in h_agg.levels:
        assert len(lvl.A.shifts) == 5  # 2d+1 in 2-D
        assert all(sum(abs(c) for c in s) <= 1 for s in lvl.A.shifts)


def test_probed_hybrid_beats_agg_on_iterations():
    """The hybrid transfers' purpose: fewer MGCG iterations than plain
    aggregation on the same (even-axis padded) system."""
    mesh = make_mesh()
    grid = (30, 31, 31)
    A, b, x0, padded, n_real = rung5.make_rung5_system(grid, mesh, dtype=np.float32)
    pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=100)
    its = {}
    for kind in ("hyb", "agg"):
        h = build_hierarchy_probed(A, mesh, max_coarse=129, transfer_kind=kind)
        res = rung5.make_rung5_mgcg(pol, h)(b, x0)
        assert bool(res.converged), kind
        its[kind] = int(res.iterations)
    assert its["hyb"] < its["agg"], its


def test_rung5_mgcg_solves_and_matches_oracle():
    """Sharded MGCG with the probed hierarchy (fine op = level-0 operator)
    converges and matches the fp64 oracle solution on the real sub-grid."""
    from conjugategradient_tpu.core import generators, oracle

    mesh = make_mesh()
    grid = (31, 31, 31)
    A, b, x0, padded, n_real = rung5.make_rung5_system(grid, mesh, dtype=np.float32)
    h = build_hierarchy_probed(A, mesh, max_coarse=129)
    pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=200)
    res = rung5.make_rung5_mgcg(pol, h)(b, x0)
    assert bool(res.converged)
    assert int(res.iterations) < 20  # mesh-independent MGCG, not CG-like

    x = np.asarray(res.x, dtype=np.float64).reshape(padded)[: grid[0]].reshape(-1)
    sysd = generators.poisson_system(grid)
    r = sysd.b - oracle.spmv(sysd.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(sysd.b) < 1e-5


def test_rung5_cg_plain():
    mesh = make_mesh()
    A, b, x0, padded, n_real = rung5.make_rung5_system((14, 15), mesh, dtype=np.float32)
    pol = ConvergencePolicy(tol=1e-6, norm="rel_l2", max_iteration=1000)
    res = rung5.make_rung5_cg(pol)(A, b, x0)
    assert bool(res.converged)


def test_rung5_slab_assembly_matches_dia_path():
    """The closed-form slab generator must reproduce poisson*_matrix +
    identity padding exactly (stencil legs AND the rhs recipe)."""
    from conjugategradient_tpu.core import generators
    from conjugategradient_tpu.core.formats import dia_to_stencil

    mesh = make_mesh()
    grid = (13, 6)
    A, b, x0, padded, n_real = rung5.make_rung5_system(grid, mesh, dtype=np.float64)
    assert padded == (16, 6)

    sysd = generators.poisson_system(grid)
    st = dia_to_stencil(sysd.A, grid)
    legs = np.asarray(A.data)
    # real slab equals the DIA-derived stencil; shift sets must agree
    assert A.shifts == st.shifts
    np.testing.assert_allclose(legs[:, : grid[0]], np.asarray(st.data), atol=0)
    # padded plane: pure identity rows
    center = A.shifts.index((0, 0))
    for k in range(len(A.shifts)):
        expect = 1.0 if k == center else 0.0
        np.testing.assert_allclose(legs[k, grid[0] :], expect, atol=0)
    np.testing.assert_allclose(np.asarray(b).reshape(-1)[: sysd.b.size], sysd.b, atol=0)
    np.testing.assert_allclose(np.asarray(b)[grid[0] :], 0.0, atol=0)
