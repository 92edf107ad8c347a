"""Block-Jacobi preconditioner: correctness + composition across solvers."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats, generators, oracle
from conjugategradient_tpu.precond import block_jacobi_preconditioner
from conjugategradient_tpu.solvers.cg import cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def test_blocks_exact_inverse():
    """M on a block-diagonal matrix IS its inverse: one application solves."""
    rng = np.random.default_rng(0)
    bs, nb = 4, 8
    blocks = []
    for _ in range(nb):
        Q = rng.standard_normal((bs, bs))
        blocks.append(Q @ Q.T + bs * np.eye(bs))  # SPD block
    import scipy.sparse as sp

    from conjugategradient_tpu.core.io import from_scipy

    A = from_scipy(sp.block_diag(blocks, format="csr"))
    M = block_jacobi_preconditioner(A, bs, dtype=jnp.float64)
    b = rng.standard_normal(bs * nb)
    x = np.asarray(M(jnp.asarray(b)))
    np.testing.assert_allclose(oracle.spmv(A, x), b, atol=1e-10)


def test_cuts_cg_iterations_vs_point_jacobi():
    sys_ = generators.banded_sin_system(1024, 16)
    A_dev = sys_.A.device_put()
    b = jnp.asarray(sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    plain = cg_solve(A_dev, b, policy=pol)
    inv_diag = jnp.asarray(1.0 / formats.matrix_diagonal(sys_.A))
    pj = cg_solve(A_dev, b, policy=pol, M=lambda r: inv_diag * r)
    bj = cg_solve(
        A_dev, b, policy=pol, M=block_jacobi_preconditioner(sys_.A, 16)
    )
    assert bool(bj.converged)
    assert int(bj.iterations) <= int(pj.iterations) <= int(plain.iterations)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    err = np.linalg.norm(np.asarray(bj.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8


def test_nondivisible_block_size():
    """Identity padding when block_size does not divide n."""
    sys_ = generators.banded_sin_system(1000, 8)  # 1000 % 16 != 0
    res = solve(
        sys_.A, sys_.b, method="bjacobi_cg", block_size=16, tol=1e-10,
        norm="rel_l2",
    )
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    assert bool(res.converged)
    assert np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true) < 1e-8


def test_nonsym_facade_methods():
    sys_ = generators.convection_diffusion_system((24, 24), eps=0.1)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    for method in ("bjacobi_bicgstab", "bjacobi_gmres"):
        res = solve(
            sys_.A, sys_.b, method=method, block_size=24, tol=1e-9,
            norm="rel_l2", max_iteration=5000,
        )
        assert bool(res.converged), method
        err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
        assert err < 1e-6, method


def test_multi_rhs_and_grid_shapes():
    """Shape-agnostic apply: (n, k) blocks and grid-shaped vectors."""
    A = generators.poisson2d_matrix(16)
    M = block_jacobi_preconditioner(A, 16, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.standard_normal((256, 3)))
    out = M(R)
    assert out.shape == (256, 3)
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(M(R[:, j])), np.asarray(out[:, j]), atol=1e-12
        )
    g = jnp.asarray(rng.standard_normal((16, 16)))
    np.testing.assert_allclose(
        np.asarray(M(g)), np.asarray(M(g.reshape(-1))).reshape(16, 16), atol=1e-12
    )


def test_spd_preserved_for_cg():
    """M must be symmetric (SPD blocks of an SPD matrix): M(r) . s == r . M(s)."""
    A = generators.banded_sin_matrix(256, 8)
    M = block_jacobi_preconditioner(A, 8, dtype=jnp.float64)
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal(256))
    s = jnp.asarray(rng.standard_normal(256))
    assert abs(float(jnp.vdot(M(r), s) - jnp.vdot(r, M(s)))) < 1e-10


def test_multi_rhs_facade():
    """(n, k) right-hand sides through method='bjacobi_cg'."""
    sys_ = generators.banded_sin_system(512, 16)
    rng = np.random.default_rng(7)
    B = rng.standard_normal((512, 3))
    res = solve(sys_.A, B, method="bjacobi_cg", block_size=16, tol=1e-10,
                norm="rel_l2")
    assert bool(np.asarray(res.converged).all())
    for j in range(3):
        r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j], np.float64))
        assert np.linalg.norm(r) / np.linalg.norm(B[:, j]) < 1e-8
