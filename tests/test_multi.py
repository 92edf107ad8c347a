"""Multi-RHS CG tests: per-column agreement with single-RHS solves."""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.generators import banded_sin_matrix, poisson_system
from conjugategradient_tpu.solvers.multi import cg_solve_multi
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _rhs(n, k, seed=0):
    return np.random.default_rng(seed).standard_normal((n, k))


@pytest.mark.parametrize("norm", ["l2", "rel_l2"])
def test_multi_matches_per_column_oracle(norm):
    A = banded_sin_matrix(512, 8)
    B = _rhs(512, 5)
    tol = 1e-8 if norm == "l2" else 1e-10
    res = cg_solve_multi(A.device_put(), B, policy=ConvergencePolicy(tol=tol, norm=norm))
    assert bool(res.converged.all())
    for j in range(5):
        ref = oracle.cg(A, B[:, j], tol=tol, norm=norm)
        np.testing.assert_allclose(np.asarray(res.x[:, j]), ref.x, rtol=1e-6, atol=1e-9)
        # column iteration counts track the single-RHS solves
        assert abs(int(res.iterations[j]) - ref.iterations) <= 2


def test_multi_stencil_path():
    grid = (31, 31)
    sys_ = poisson_system(grid)
    st = formats.dia_to_stencil(sys_.A, grid).device_put()
    B = _rhs(sys_.n, 3, seed=1)
    res = cg_solve_multi(st, B, policy=ConvergencePolicy(tol=1e-8))
    assert bool(res.converged.all())
    for j in range(3):
        r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j]))
        assert np.linalg.norm(r) < 1e-7


def test_multi_mixed_convergence_rates():
    # one easy column (rhs in the dominant eigenspace direction ~ fast) and
    # hard ones; early-converged columns must freeze, not corrupt
    A = banded_sin_matrix(256, 8)
    dense = formats.dia_to_dense(A)
    w, V = np.linalg.eigh(np.asarray(dense.data))
    B = np.stack([V[:, -1], _rhs(256, 1, 2)[:, 0]], axis=1)
    res = cg_solve_multi(A.device_put(), B, policy=ConvergencePolicy(tol=1e-10))
    assert bool(res.converged.all())
    assert int(res.iterations[0]) <= int(res.iterations[1])
    for j in range(2):
        ref = oracle.cg(A, B[:, j], tol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x[:, j]), ref.x, rtol=1e-6, atol=1e-10)


def test_multi_nonconvergence_flags_per_column():
    A = banded_sin_matrix(128, 6)
    B = _rhs(128, 2)
    res = cg_solve_multi(A.device_put(), B, policy=ConvergencePolicy(tol=1e-30, max_iteration=5))
    assert not bool(res.converged.any())
    np.testing.assert_array_equal(np.asarray(res.iterations), [5, 5])
