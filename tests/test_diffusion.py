"""Variable-coefficient diffusion family: -div(a grad u) = f.

New capability (no reference analogue — the reference's fixtures are all
constant-coefficient, SURVEY.md §4.5, while its author's target application,
the MPS pressure equation, is variable-coefficient).  This is also the
workload where the variable-coefficient stencil path actually streams matrix
bytes, so the bf16-stencil-legs tests live here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_dense, dia_to_stencil
from conjugategradient_tpu.ops.stencil import spmv_stencil
from conjugategradient_tpu.precond import as_preconditioner, build_hierarchy
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy
from conjugategradient_tpu.solvers.refine import refined_solve


@pytest.mark.parametrize("grid", [(9,), (5, 7), (4, 3, 5)])
@pytest.mark.parametrize("kind", ["jump", "smooth"])
def test_symmetric_positive_definite(grid, kind):
    a = generators.diffusion_coefficients(grid, kind=kind, contrast=1e3, seed=1)
    assert np.all(a > 0)
    A = generators.diffusion_matrix(grid, a)
    D = dia_to_dense(A).data
    np.testing.assert_allclose(D, D.T, atol=0)
    assert np.linalg.eigvalsh(D).min() > 0


def test_const_coefficients_reduce_to_poisson():
    Ac = generators.diffusion_matrix((5, 7), np.ones((5, 7)))
    Ap = generators.poisson2d_matrix(7, 5)
    np.testing.assert_allclose(dia_to_dense(Ac).data, dia_to_dense(Ap).data)


@pytest.mark.parametrize("grid", [(17,), (9, 11), (5, 6, 7)])
def test_stencil_spmv_matches_oracle(grid):
    A = generators.diffusion_matrix(
        grid, generators.diffusion_coefficients(grid, seed=3)
    )
    st = dia_to_stencil(A, grid).device_put()
    x = np.random.default_rng(0).standard_normal(A.n)
    y_st = np.asarray(spmv_stencil(st, jnp.asarray(x).reshape(grid))).reshape(-1)
    np.testing.assert_allclose(y_st, oracle.spmv(A, x), rtol=1e-12, atol=1e-12)


def test_coefficients_deterministic():
    a1 = generators.diffusion_coefficients((8, 9), kind="jump", seed=5)
    a2 = generators.diffusion_coefficients((8, 9), kind="jump", seed=5)
    np.testing.assert_array_equal(a1, a2)
    a3 = generators.diffusion_coefficients((8, 9), kind="jump", seed=6)
    assert not np.array_equal(a1, a3)


def test_mgcg_jump_coefficients_converge():
    """Multigrid stays effective under 1e4 coefficient jumps (63^2 grid —
    above max_coarse, so a real multilevel cycle runs)."""
    grid = (63, 63)
    system = generators.diffusion_system(grid, kind="jump", contrast=1e4, seed=2)
    h = build_hierarchy(system.A, grid, dtype=np.float64)
    assert h.levels, "63^2 must build at least one coarsening level"
    res = cg_solve(
        h.levels[0].A,
        jnp.asarray(system.b).reshape(grid),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2"),
        M=as_preconditioner(h),
    )
    assert bool(res.converged)
    assert int(res.iterations) < 60  # far fewer than plain CG on kappa~1e4*n
    x_or = oracle.direct_solve(system.A, system.b)
    err = np.abs(np.asarray(res.x).reshape(-1) - x_or).max() / np.abs(x_or).max()
    assert err < 1e-8


# ---------------------------------------------------------------------------
# bf16 stencil legs: stream the matrix at half width, accumulate fp32.
# ---------------------------------------------------------------------------


def test_bf16_stencil_legs_spmv():
    grid = (17, 19)
    A = generators.diffusion_matrix(
        grid, generators.diffusion_coefficients(grid, seed=4)
    )
    st16 = dia_to_stencil(A, grid).device_put(np.float32).astype(jnp.bfloat16)
    x = np.random.default_rng(1).standard_normal(A.n).astype(np.float32)
    y = spmv_stencil(st16, jnp.asarray(x).reshape(grid))
    # bf16 leg * f32 window promotes to f32: full-width accumulation
    assert y.dtype == jnp.float32
    y_or = oracle.spmv(A, x.astype(np.float64))
    rel = np.abs(np.asarray(y, np.float64).reshape(-1) - y_or).max() / np.abs(y_or).max()
    assert rel < 2e-2  # bf16 has ~8 mantissa bits
    assert rel > 1e-6  # and the legs really are rounded (not silently f32)


def test_refined_solve_bf16_stencil_legs():
    """fp64 tolerance via refinement with a bf16-leg stencil operator: the
    inner CG iterates the rounded operator, the fp64 outer loop corrects."""
    grid = (31, 33)
    system = generators.diffusion_system(grid, kind="smooth", seed=7)
    res = refined_solve(
        system.A,
        system.b,
        tol=1e-8,
        norm="l2",
        grid=grid,
        inner_tol=1e-4,
        matrix_dtype=jnp.bfloat16,
    )
    assert res.converged
    x_or = oracle.direct_solve(system.A, system.b)
    assert np.abs(res.x - x_or).max() < 1e-6


def test_refined_solve_const_detected_ignores_matrix_dtype():
    """The Poisson fine level const-detects (zero matrix bytes) — bf16 legs
    are a no-op there and refinement must still meet tol."""
    grid = (33, 31)
    system = generators.poisson_system(grid)
    res = refined_solve(
        system.A, system.b, tol=1e-8, norm="l2", grid=grid,
        inner_tol=1e-4, matrix_dtype=jnp.bfloat16,
    )
    assert res.converged


def test_refined_solve_bf16_out_of_envelope_reports_honestly():
    """kappa(A) * 2^-8 > 1 (1e4-contrast jump field): bf16-leg refinement
    cannot contract — it must terminate with converged=False (stalled or
    max_outer), never loop or claim success."""
    grid = (32, 32)
    system = generators.diffusion_system(grid, kind="jump", contrast=1e4, seed=1)
    res = refined_solve(
        system.A, system.b, tol=1e-9, grid=grid,
        inner_tol=1e-4, max_outer=6, matrix_dtype=jnp.bfloat16,
    )
    assert not res.converged
