"""IDR(s) (``solvers/idr.py``): convergence/accuracy vs the direct solve,
the s-ladder (matvec counts improve with s and beat BiCGStab's), facade
prefixes, and the psum-injected sharded twin (single-device parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
from conjugategradient_tpu.solvers.idr import idr_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy

POL = ConvergencePolicy(tol=1e-8, norm="rel_l2", max_iteration=40000)


def _convdiff(grid=(31, 31), eps=0.1):
    sys_ = generators.convection_diffusion_system(grid, eps=eps)
    return sys_, oracle.direct_solve(sys_.A, sys_.b)


def test_idr_converges_and_validates():
    sys_, x_true = _convdiff()
    res = idr_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=POL, s=4)
    assert bool(res.converged)
    rel = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-5
    # the true residual honors the claimed one
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-7


def test_idr_s_ladder_beats_bicgstab_matvecs():
    """Textbook behavior: matvec counts improve monotonically-ish with s
    and idr(4) needs fewer matvecs than BiCGStab (2 per iteration) on
    convection-diffusion."""
    sys_, _ = _convdiff((63, 63), eps=0.1)
    A = sys_.A.device_put()
    b = jnp.asarray(sys_.b)
    mv = {}
    for s in (1, 4):
        res = idr_solve(A, b, policy=POL, s=s)
        assert bool(res.converged)
        mv[s] = int(res.iterations)
    rb = bicgstab_solve(A, b, policy=POL)
    assert mv[4] < mv[1]
    assert mv[4] < 2 * int(rb.iterations)


def test_idr_facade_prefixes():
    sys_, x_true = _convdiff()
    res = solve(
        sys_.A, sys_.b, method="mg_idr", grid=(31, 31), tol=1e-8,
        norm="rel_l2",
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.1),
    )
    assert bool(res.converged)
    assert int(res.iterations) < 40  # V-cycle right preconditioning bites
    rel = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-6
    res_j = solve(sys_.A, sys_.b, method="jacobi_idr", tol=1e-8, norm="rel_l2")
    assert bool(res_j.converged)


def test_idr_sharded_matches_single_device():
    """The psum-injected sharded loop draws the SAME global shadow space
    and slices rows — matvec counts match single-device to within one
    cycle (the reliable-update replacement matvec introduces one extra
    reduction-order rounding site vs the single-device trajectory)."""
    sys_, x_true = _convdiff((32, 32))
    res_1 = solve(sys_.A, sys_.b, method="idr", tol=1e-8, norm="rel_l2", s=4)
    res_8 = solve(
        sys_.A, sys_.b, method="idr", mesh=make_mesh(8), tol=1e-8,
        norm="rel_l2", s=4,
    )
    assert bool(res_8.converged)
    assert abs(int(res_8.iterations) - int(res_1.iterations)) <= 5
    rel = np.linalg.norm(np.asarray(res_8.x) - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-5


def test_idr_nonconvergence_flag():
    sys_, _ = _convdiff((15, 15), eps=0.05)
    res = idr_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-30, max_iteration=10), s=2,
    )
    assert not bool(res.converged)


def test_idr_s1_short_recurrence_sanity():
    """s=1 is the BiCGStab-class method; it must still validate."""
    sys_, x_true = _convdiff((24, 24), eps=0.2)
    res = idr_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=POL, s=1)
    assert bool(res.converged)
    rel = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-5


def test_idr_gspmd_mg_mesh():
    """mg_idr + mesh=: the V-cycle + IDR(s) loop as one GSPMD program
    (rediscretized coarse ops riding through)."""
    sys_, x_true = _convdiff((32, 32))
    res = solve(
        sys_.A, sys_.b, method="mg_idr", grid=(32, 32), mesh=make_mesh(8),
        tol=1e-8, norm="rel_l2",
        coarse_operator=generators.convection_diffusion_coarse_operator(eps=0.1),
    )
    assert bool(res.converged)
    rel = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert rel < 1e-8


def test_idr_traced_matches_plain():
    """The traced (fixed-scan) form lands on the same solution and its
    history is monotone-ish to the final residual; frozen entries repeat."""
    from conjugategradient_tpu.solvers.idr import idr_solve_traced

    sys_, x_true = _convdiff((24, 24), eps=0.2)
    A = sys_.A.device_put()
    b = jnp.asarray(sys_.b)
    res_p = idr_solve(A, b, policy=POL, s=4)
    res_t, hist = idr_solve_traced(A, b, policy=POL, s=4, num_cycles=400)
    assert bool(res_t.converged)
    assert int(res_t.iterations) == int(res_p.iterations)
    np.testing.assert_allclose(np.asarray(res_t.x), np.asarray(res_p.x))
    h = np.asarray(hist)
    cycles = int(res_t.iterations) // 5
    assert h[cycles - 1] < POL.tol  # converged inside the trace
    np.testing.assert_allclose(h[cycles:], h[-1])  # frozen tail repeats
