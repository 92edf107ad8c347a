"""GSPMD-partitioned MGCG on the 8-device virtual CPU mesh.

Validates the second distributed design (sharding annotations + XLA SPMD
partitioner) against the oracle and against the single-device result —
shard-count invariance being the property the reference could never test
without racks of GPUs (SURVEY.md §4.6)."""

import numpy as np

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import banded_sin_system, poisson_system
from conjugategradient_tpu.ops.spmv import spmv_dia_roll
from conjugategradient_tpu.parallel.gspmd import gspmd_mgcg_solve, make_gspmd_mgcg, shard_system
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def test_roll_spmv_matches_oracle():
    sys_ = banded_sin_system(513, 12)
    x = np.linspace(-2, 2, 513)
    got = np.asarray(spmv_dia_roll(sys_.A.device_put(), x))
    np.testing.assert_allclose(got, oracle.spmv(sys_.A, x), rtol=1e-12, atol=1e-12)


def test_gspmd_mgcg_poisson2d_8dev():
    grid = (63, 63)
    sys_ = poisson_system(grid)
    mesh = make_mesh(8)
    pol = ConvergencePolicy(tol=1e-8)
    res = gspmd_mgcg_solve(sys_, grid, mesh=mesh, policy=pol)
    assert bool(res.converged)
    assert int(res.iterations) <= 12
    x = np.asarray(res.x)
    r = sys_.b - oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) < 1e-7


def test_gspmd_matches_single_device():
    grid = (63,)
    sys_ = banded_sin_system(63, 6)
    pol = ConvergencePolicy(tol=1e-10)
    res8 = gspmd_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, smoother="jacobi")
    res1 = gspmd_mgcg_solve(sys_, grid, mesh=make_mesh(1), policy=pol, smoother="jacobi")
    assert bool(res8.converged) and bool(res1.converged)
    np.testing.assert_allclose(np.asarray(res8.x), np.asarray(res1.x), rtol=1e-8, atol=1e-12)


def test_shard_system_places_row_sharding():
    import jax

    sys_ = poisson_system((16, 16))  # n=256 divisible by 8
    mesh = make_mesh(8)
    A, b, x0 = shard_system(sys_, mesh)
    assert b.sharding.spec == jax.sharding.PartitionSpec("x")
    assert A.data.sharding.spec == jax.sharding.PartitionSpec(None, "x")


def test_gspmd_solver_reuse():
    grid = (31, 31)
    sys_ = poisson_system(grid)
    mesh = make_mesh(4)
    solve, (b, x0) = make_gspmd_mgcg(sys_, grid, mesh, ConvergencePolicy(tol=1e-8))
    r1 = solve(b, x0)
    r2 = solve(b, x0)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_gspmd_mgcg_2d_mesh_block_partition():
    """2-D block partition: a (4, 2) mesh shards both grid axes; halos become
    collective-permutes on both axes.  Result matches the 1-D mesh solve."""
    import jax
    from jax.sharding import Mesh

    grid = (64, 64)  # both extents divide their mesh axes (4 and 2)
    sys_ = poisson_system(grid)
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devices, ("x", "y"))
    pol = ConvergencePolicy(tol=1e-8)
    res2 = gspmd_mgcg_solve(sys_, grid, mesh=mesh2, policy=pol, axes=("x", "y"))
    res1 = gspmd_mgcg_solve(sys_, grid, mesh=make_mesh(8), policy=pol, axes=("x",))
    assert bool(res2.converged) and bool(res1.converged)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x), rtol=1e-9, atol=1e-11)
