"""Grid-stencil format: conversions, SpMV/SpMM variants, MGCG stencil layout."""

import numpy as np
import pytest

from conjugategradient_tpu.core import formats, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil, stencil_to_dia
from conjugategradient_tpu.core.generators import (
    poisson2d_matrix,
    poisson3d_matrix,
    poisson_system,
    tridiagonal_matrix,
)
from conjugategradient_tpu.ops.stencil import spmm_stencil, spmv_stencil, spmv_stencil_roll
from conjugategradient_tpu.precond import build_hierarchy, galerkin_coarse, mgcg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@pytest.mark.parametrize(
    "A,grid",
    [
        (tridiagonal_matrix(100), (100,)),
        (poisson2d_matrix(13, 9), (9, 13)),
        (poisson3d_matrix(5, 7, 6), (6, 7, 5)),
    ],
)
def test_dia_stencil_roundtrip(A, grid):
    st = dia_to_stencil(A, grid)
    back = stencil_to_dia(st)
    np.testing.assert_allclose(
        np.asarray(formats.dia_to_dense(back).data),
        np.asarray(formats.dia_to_dense(A).data),
        atol=1e-14,
    )
    assert st.n == A.n
    # grid masking makes the stencil count exact (DIA's counts diagonal
    # lengths, which overcount across row seams)
    assert st.nnz == np.count_nonzero(formats.dia_to_dense(A).data)


def test_galerkin_coarse_is_stencil_too():
    # coarse 9-point operator decomposes onto the coarse grid
    A = poisson2d_matrix(17)
    Ac = galerkin_coarse(A, (17, 17))
    st = dia_to_stencil(Ac, (8, 8))
    assert len(st.shifts) == 9  # 9-point stencil after full-weighting Galerkin
    x = np.random.default_rng(0).standard_normal(64)
    np.testing.assert_allclose(
        np.asarray(spmv_stencil(st.device_put(), x.reshape(8, 8))).reshape(-1),
        oracle.spmv(Ac, x),
        rtol=1e-12,
    )


@pytest.mark.parametrize("fn", [spmv_stencil, spmv_stencil_roll])
def test_stencil_spmv_matches_dia(fn):
    A = poisson2d_matrix(23, 17)
    st = dia_to_stencil(A, (17, 23)).device_put()
    x = np.random.default_rng(1).standard_normal(A.n)
    got = np.asarray(fn(st, x.reshape(17, 23))).reshape(-1)
    np.testing.assert_allclose(got, oracle.spmv(A, x), rtol=1e-12, atol=1e-12)


def test_stencil_spmm():
    A = poisson2d_matrix(9)
    st = dia_to_stencil(A, (9, 9)).device_put()
    B = np.random.default_rng(2).standard_normal((81, 4))
    got = np.asarray(spmm_stencil(st, B.reshape(9, 9, 4))).reshape(81, 4)
    want = np.stack([oracle.spmv(A, B[:, j]) for j in range(4)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_stencil_rejects_wrapping_matrix():
    # the banded |sin| matrix on a 2-D grid it doesn't match must raise
    from conjugategradient_tpu.core.generators import banded_sin_matrix

    A = banded_sin_matrix(64, 8)
    with pytest.raises(ValueError):
        dia_to_stencil(A, (8, 8))


def test_mgcg_stencil_layout_matches_dia_layout():
    grid = (31, 31)
    sys_ = poisson_system(grid)
    pol = ConvergencePolicy(tol=1e-10)
    r_st, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, layout="stencil")
    r_dia, _ = mgcg_solve(sys_.A, sys_.b, grid, policy=pol, layout="dia")
    assert bool(r_st.converged) and bool(r_dia.converged)
    assert int(r_st.iterations) == int(r_dia.iterations)
    np.testing.assert_allclose(np.asarray(r_st.x), np.asarray(r_dia.x), rtol=1e-9, atol=1e-12)


def test_hierarchy_stencil_levels_have_grid_shapes():
    sys_ = poisson_system((31, 31))
    h = build_hierarchy(sys_.A, (31, 31), max_coarse=64, layout="stencil")
    for lvl in h.levels:
        assert isinstance(lvl.A, (formats.StencilMatrix, formats.ConstStencilMatrix))
        # const levels carry a scalar inv_diag (broadcasts through smoothers)
        assert lvl.inv_diag.shape in (lvl.grid, ())
    # the fine Dirichlet Laplacian IS constant-coefficient: must be detected
    assert isinstance(h.levels[0].A, formats.ConstStencilMatrix)

    # const detection must be exact: opt-out path keeps grid-shaped legs and
    # both hierarchies produce the same preconditioner action
    import jax.numpy as jnp
    import numpy as np

    from conjugategradient_tpu.precond.multigrid import v_cycle

    h2 = build_hierarchy(sys_.A, (31, 31), max_coarse=64, layout="stencil", const_detect=False)
    assert isinstance(h2.levels[0].A, formats.StencilMatrix)
    # const levels get ANALYTIC Gershgorin Chebyshev bounds (0.5, 2.0) while
    # the opt-out path power-iterates — both are valid smoothing intervals
    # but different polynomials, so pin h's bounds onto h2 to compare the
    # OPERATOR/transfer action itself bit-for-bit
    import dataclasses

    h2 = dataclasses.replace(
        h2,
        levels=tuple(
            dataclasses.replace(l2, cheb_bounds=l1.cheb_bounds)
            for l1, l2 in zip(h.levels, h2.levels)
        ),
    )
    r = jnp.asarray(np.random.default_rng(0).standard_normal((31, 31)))
    np.testing.assert_allclose(
        np.asarray(v_cycle(h, r)), np.asarray(v_cycle(h2, r)), rtol=1e-12, atol=1e-12
    )


def test_stencil_to_dia_rejects_aliased_shifts():
    import jax.numpy as jnp

    from conjugategradient_tpu.core.formats import StencilMatrix

    # (0, 5) and (1, 0) both flatten to offset 5 on a width-5 grid
    st = StencilMatrix(jnp.ones((2, 5, 5)), ((0, 5), (1, 0)), (5, 5))
    with pytest.raises(ValueError):
        stencil_to_dia(st)


def test_const_stencil_spmv_matches_oracle():
    """ConstStencilMatrix (zero matrix traffic) vs the fp64 oracle, both
    slice and roll formulations, 1-D/2-D/3-D grids."""
    import numpy as np

    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.core.formats import dia_to_stencil, stencil_to_const
    from conjugategradient_tpu.core.generators import (
        poisson2d_matrix,
        poisson3d_matrix,
        tridiagonal_matrix,
    )
    from conjugategradient_tpu.ops.stencil import (
        spmv_const_stencil,
        spmv_const_stencil_roll,
    )

    cases = [
        (tridiagonal_matrix(37, diag=2.0, off=-1.0), (37,)),
        (poisson2d_matrix(13), (13, 13)),
        (poisson3d_matrix(7), (7, 7, 7)),
    ]
    rng = np.random.default_rng(0)
    for A, grid in cases:
        st = dia_to_stencil(A, grid)
        cst = stencil_to_const(st)
        assert cst is not None, f"Poisson stencil on {grid} must const-detect"
        x = rng.standard_normal(grid)
        ref = oracle.spmv(A, x.reshape(-1)).reshape(grid)
        np.testing.assert_allclose(np.asarray(spmv_const_stencil(cst.device_put(), x)), ref, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(spmv_const_stencil_roll(cst.device_put(), x)), ref, atol=1e-12
        )
        np.testing.assert_allclose(oracle.spmv(cst, x.reshape(-1)).reshape(grid), ref, atol=1e-12)

    # variable-coefficient matrices must NOT const-detect
    from conjugategradient_tpu.core.generators import banded_sin_matrix

    st = dia_to_stencil(banded_sin_matrix(32, 4), (32,))
    assert stencil_to_const(st) is None


def test_stencil_to_const_shift_exceeding_extent():
    """Review finding (r4): a leg whose |shift| >= the axis extent has an
    EMPTY valid region; the unclamped hyperrectangle slice wrapped around
    (negative stop) and fabricated a coefficient.  Old-code behavior:
    coefficient 0.0."""
    import jax.numpy as jnp
    import numpy as np

    from conjugategradient_tpu.core.formats import StencilMatrix, stencil_to_const

    st = StencilMatrix(
        jnp.asarray(np.stack([np.full((2,), 3.0), np.full((2,), 5.0)])),
        ((3,), (0,)),
        (2,),
    )
    c = stencil_to_const(st)
    assert c is not None
    assert c.coeffs == (0.0, 5.0)


def test_const_near_null_probe_matches_host_probe():
    """Review finding (r4): the const-stencil near-null fast path must be
    EXACTLY the host probe's decision (an interior-symbol shortcut flipped
    7/2000 random coercive mixed-sign stencils).  Differential test over
    randomized const stencils, including boundary-sensitive mixed signs."""
    import numpy as np

    from conjugategradient_tpu.core.formats import (
        ConstStencilMatrix,
        const_to_stencil,
        stencil_to_dia,
    )
    from conjugategradient_tpu.precond.multigrid import _const_near_null

    rng = np.random.default_rng(0)
    grids = [(9,), (7, 9), (5, 7, 9)]
    flips = 0
    for trial in range(300):
        g = grids[trial % 3]
        nd = len(g)
        shifts = [(0,) * nd]
        for ax in range(nd):
            for d in (-1, 1):
                s = [0] * nd
                s[ax] = d
                shifts.append(tuple(s))
        offd = rng.uniform(-1.0, 1.3, len(shifts) - 1)
        c0 = float(np.abs(offd).sum() * rng.uniform(1.01, 1.6))
        coeffs = (c0,) + tuple(float(v) for v in offd)
        Ac = ConstStencilMatrix(coeffs, tuple(shifts), tuple(g))
        A_h = stencil_to_dia(const_to_stencil(Ac))
        ref = _const_near_null(A_h, g)

        # replicate build_hierarchy's exact closed form
        def q(signed):
            tot = 0.0
            for c, sh in zip(Ac.coeffs, Ac.shifts):
                cnt = 1.0
                for ax, d in enumerate(sh):
                    cnt *= max(0, g[ax] - abs(d))
                tot += float(c) * ((-1.0) ** sum(sh) if signed else 1.0) * cnt
            return tot

        got = q(False) <= q(True)
        flips += got != ref
    assert flips == 0
