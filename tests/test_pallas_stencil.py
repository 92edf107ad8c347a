"""Differential tests for the Pallas big-const-stencil slab kernel
(``ops/pallas_stencil.py``) against the XLA pad+slice formulation.

The kernel exists because the XLA path stops reusing its shifted-window
reads at HBM-resident sizes (measured 180-216 GB/s implied at 16.6M rows
on chip); correctness is pinned here in interpret mode at CI sizes across
the shapes that exercise every boundary case: odd/ragged leading axes
(2^k-1 grids), 2-D sublane-block halos, slab sizes that divide and don't
divide the leading axis.
"""

import numpy as np
import pytest

from conjugategradient_tpu.core import generators
from conjugategradient_tpu.core.formats import dia_to_stencil, stencil_to_const
from conjugategradient_tpu.ops.pallas_stencil import (
    _supported,
    spmv_const_stencil_pallas,
)
from conjugategradient_tpu.ops.stencil import spmv_const_stencil


def _const_of(grid, dtype=np.float32):
    sys_ = generators.poisson_system(grid, dtype=dtype)
    A = stencil_to_const(dia_to_stencil(sys_.A, grid))
    assert A is not None
    return A


@pytest.mark.parametrize(
    "grid", [(17, 13, 11), (33, 31, 29), (25, 19), (128, 128), (260, 31)]
)
def test_matches_xla_path(grid):
    import jax.numpy as jnp

    A = _const_of(grid)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(grid).astype(np.float32))
    y_ref = np.asarray(spmv_const_stencil(A, x))
    for bz in (0, 4, 8):
        y_p = np.asarray(spmv_const_stencil_pallas(A, x, bz=bz, interpret=True))
        np.testing.assert_allclose(y_p, y_ref, rtol=1e-6, atol=1e-6)


def test_ragged_tail_and_boundaries():
    # leading axis not divisible by the slab: the tail program reads
    # garbage planes past L — the z-mask must zero them (plane L-1's
    # "down" neighbour) exactly like the zero-Dirichlet padding
    import jax.numpy as jnp

    grid = (23, 9, 12)
    A = _const_of(grid)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(grid).astype(np.float32))
    y_ref = np.asarray(spmv_const_stencil(A, x))
    for bz in (4, 5, 7, 23):
        y_p = np.asarray(spmv_const_stencil_pallas(A, x, bz=bz, interpret=True))
        np.testing.assert_allclose(y_p, y_ref, rtol=1e-6, atol=1e-6)


def test_supported_gate():
    A3 = _const_of((9, 9, 9))
    assert _supported(A3)
    # 1-D stencils and wide extents are out of scope
    sys1 = generators.poisson_system((65,), dtype=np.float32)
    A1 = stencil_to_const(dia_to_stencil(sys1.A, (65,)))
    assert not _supported(A1)
    with pytest.raises(ValueError, match="pallas"):
        spmv_const_stencil_pallas(A1, np.zeros(65, np.float32), interpret=True)


def test_dispatch_gate_cpu_keeps_xla():
    # on CPU the spmv_const_stencil dispatch must never route to the
    # kernel regardless of size (backend gate)
    from conjugategradient_tpu.ops.stencil import _pallas_const_ok

    import jax.numpy as jnp

    A = _const_of((33, 31, 29))
    x = jnp.zeros((33, 31, 29), jnp.float32)
    assert not _pallas_const_ok(A, x)


def test_cheb_fused_matches_reference_all_variants():
    """The fused Chebyshev kernel vs ``chebyshev_smooth``: zero/nonzero x0,
    with/without residual (the nonzero-x0 + want_resid combination needs a
    degree+1 halo — under-budgeting it corrupted slab-edge residual planes
    by ~1e-2, caught in review)."""
    import jax.numpy as jnp
    from functools import partial

    from conjugategradient_tpu.ops.pallas_stencil import cheb_smooth_const_pallas
    from conjugategradient_tpu.precond.smoothers import chebyshev_smooth

    g = (24, 9, 12)
    A = _const_of(g)
    invd = 1.0 / A.coeffs[list(A.shifts).index((0, 0, 0))]
    op = partial(spmv_const_stencil, A)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(g).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal(g).astype(np.float32))
    hi, lo = 1.9, 0.45
    for deg in (1, 2):
        for xin in (None, x0):
            x_ref = chebyshev_smooth(
                op, jnp.float32(invd), b,
                jnp.zeros_like(b) if xin is None else xin, deg, hi, lo,
            )
            r_ref = invd * (b - op(x_ref))
            for bz in (0, 6, 12):
                xk, rk = cheb_smooth_const_pallas(
                    A, b, xin, deg, hi, lo, invd, want_resid=True, bz=bz,
                    interpret=True,
                )
                np.testing.assert_allclose(
                    np.asarray(xk), np.asarray(x_ref), rtol=2e-5, atol=2e-5
                )
                np.testing.assert_allclose(
                    np.asarray(rk), np.asarray(r_ref), rtol=2e-5, atol=2e-5
                )
            xk2 = cheb_smooth_const_pallas(
                A, b, xin, deg, hi, lo, invd, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(xk2), np.asarray(x_ref), rtol=2e-5, atol=2e-5
            )


def test_variable_stencil_kernel_matches_xla():
    """Variable-coefficient slab kernel vs the XLA pad+slice path, fp32 and
    bf16 leg storage, ragged slabs (NaN-padding regression: interpret mode
    pads out-of-range blocks with NaN and 0 * NaN = NaN — the z-mask must
    zero garbage even though boundary legs are exact zeros)."""
    import jax.numpy as jnp

    from conjugategradient_tpu.core.formats import dia_to_stencil
    from conjugategradient_tpu.ops.pallas_stencil import spmv_stencil_pallas
    from conjugategradient_tpu.ops.stencil import spmv_stencil

    rng = np.random.default_rng(0)
    for g in [(17, 13, 11), (25, 19)]:
        sys_ = generators.diffusion_system(g, kind="jump", dtype=np.float32)
        A = dia_to_stencil(sys_.A, g)
        x = jnp.asarray(rng.standard_normal(g).astype(np.float32))
        y_ref = np.asarray(spmv_stencil(A, x))
        scale = np.abs(y_ref).max()
        for bz in (0, 8):
            y_p = np.asarray(spmv_stencil_pallas(A, x, bz=bz, interpret=True))
            assert np.abs(y_ref - y_p).max() / scale < 2e-6
        Ab = A.astype(jnp.bfloat16)
        y_b = np.asarray(spmv_stencil_pallas(Ab, x, interpret=True))
        y_br = np.asarray(spmv_stencil(Ab, x), np.float32)
        assert np.abs(y_b - y_br).max() / scale < 1e-6
