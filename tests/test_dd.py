"""Double-float (two-fp32) arithmetic: fp64-grade device residuals.

Differential strategy: every dd result is compared against the fp64 numpy
oracle — and the cancellation cases additionally against what plain fp32
WOULD produce, to prove dd is load-bearing, not decorative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.core.formats import dia_to_stencil, stencil_to_const
from conjugategradient_tpu.ops import dd


def _rand(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n)


def test_dd_roundtrip_exact_to_2pow48():
    a = _rand(1000) * np.logspace(-8, 8, 1000)
    hi, lo = dd.dd_from_f64(a)
    back = dd.dd_to_f64((hi, lo))
    np.testing.assert_allclose(back, a, rtol=2**-45, atol=0)
    # and the pair is canonical: lo below half an ulp of hi
    assert np.all(np.abs(np.asarray(lo)) <= np.abs(np.spacing(np.asarray(hi))))


def test_dd_spmv_dia_matches_fp64_oracle():
    sys_ = generators.banded_sin_system(4096, 16)
    x = _rand(4096, 1)
    ddm = dd.dd_split_matrix(sys_.A)
    y = dd.dd_to_f64(jax.jit(dd.dd_spmv)(ddm, dd.dd_from_f64(x)))
    y64 = oracle.spmv(sys_.A, x)
    assert np.linalg.norm(y - y64) / np.linalg.norm(y64) < 1e-13


@pytest.mark.parametrize("const", [False, True])
def test_dd_spmv_stencil_matches_fp64_oracle(const):
    grid = (63, 63)
    sys_ = generators.poisson_system(grid)
    st = dia_to_stencil(sys_.A, grid)
    m = stencil_to_const(st) if const else st
    assert m is not None
    x = _rand(sys_.A.n, 2)
    ddm = dd.dd_split_matrix(m)
    y = dd.dd_to_f64(jax.jit(dd.dd_spmv)(ddm, dd.dd_from_f64(x.reshape(grid))))
    y64 = oracle.spmv(sys_.A, x)
    assert np.linalg.norm(y.reshape(-1) - y64) / np.linalg.norm(y64) < 1e-13


def test_dd_residual_survives_cancellation_where_fp32_cannot():
    """r = b - A x with x within 1e-9 of the solution: the residual is 9
    decades below b, pure cancellation.  dd must track fp64; fp32 is noise."""
    sys_ = generators.banded_sin_system(2048, 8)
    xs = oracle.direct_solve(sys_.A, sys_.b)
    xp = xs * (1 + 1e-9)
    r64 = sys_.b - oracle.spmv(sys_.A, xp)
    ddm = dd.dd_split_matrix(sys_.A)
    r = dd.dd_to_f64(
        jax.jit(dd.dd_residual)(ddm, dd.dd_from_f64(sys_.b), dd.dd_from_f64(xp))
    )
    rel = np.linalg.norm(r - r64) / np.linalg.norm(r64)
    assert rel < 1e-4  # dd floor ~2^-48 * ||b|| / ||r64||
    # fp32 evaluation of the same residual is garbage (catastrophic loss)
    A32 = sys_.A.astype(np.float32)
    r32 = (
        sys_.b.astype(np.float32)
        - np.asarray(oracle.spmv(A32, xp.astype(np.float32)))
    ).astype(np.float64)
    assert np.linalg.norm(r32 - r64) / np.linalg.norm(r64) > 1e-1


def test_dd_norm_sq_under_cancellation():
    sys_ = generators.banded_sin_system(2048, 8)
    xs = oracle.direct_solve(sys_.A, sys_.b)
    xp = xs * (1 + 1e-8)
    r64 = sys_.b - oracle.spmv(sys_.A, xp)
    ddm = dd.dd_split_matrix(sys_.A)
    r = jax.jit(dd.dd_residual)(ddm, dd.dd_from_f64(sys_.b), dd.dd_from_f64(xp))
    rr = float(jax.jit(dd.dd_norm_sq)(r))
    assert abs(rr - float(r64 @ r64)) / float(r64 @ r64) < 1e-5
    mx = float(jax.jit(dd.dd_max_abs)(r))
    assert abs(mx - np.abs(r64).max()) / np.abs(r64).max() < 1e-5


def test_dd_residual_partitions_over_the_mesh():
    """GSPMD: the dd residual is pads/slices/elementwise ops, so XLA
    partitions it over a 2-D mesh with neighbor exchanges only — the
    device-resident refinement outer loop is pod-compatible.  The sharded
    result must be BITWISE equal to single-device (error-free transforms
    are pure elementwise dataflow; no reduction reassociation)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from conjugategradient_tpu.core.formats import dia_to_stencil

    grid = (64, 64)
    sys_ = generators.poisson_system(grid)
    st = dia_to_stencil(sys_.A, grid)
    ddm = dd.dd_split_matrix(st)
    x = _rand(sys_.A.n, 5).reshape(grid)
    b_dd = dd.dd_from_f64(sys_.b.reshape(grid))
    x_dd = dd.dd_from_f64(x)

    ref = jax.jit(dd.dd_residual)(ddm, b_dd, x_dd)

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("x", "y"))
    sh = NamedSharding(mesh, P("x", "y"))
    shard = lambda p: (jax.device_put(p[0], sh), jax.device_put(p[1], sh))
    ddm_sh = dd.DDMatrix(
        type(ddm.hi)(jax.device_put(ddm.hi.data, NamedSharding(mesh, P(None, "x", "y"))), ddm.hi.shifts, ddm.hi.grid),
        type(ddm.lo)(jax.device_put(ddm.lo.data, NamedSharding(mesh, P(None, "x", "y"))), ddm.lo.shifts, ddm.lo.grid),
    )
    out = jax.jit(dd.dd_residual)(ddm_sh, shard(b_dd), shard(x_dd))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))


def test_dd_axpy_accumulates_below_fp32_resolution():
    """x += s*d with updates ~1e-9 of x: a plain fp32 += would drop them
    entirely; the dd pair must carry them exactly."""
    x64 = _rand(512, 3)
    d = (_rand(512, 4) * 1e-9).astype(np.float32)
    x = dd.dd_from_f64(x64)
    fn = jax.jit(dd.dd_axpy)
    for _ in range(10):
        x = fn(x, np.float32(1.0), jnp.asarray(d))
    want = x64 + 10 * d.astype(np.float64)
    got = dd.dd_to_f64(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-14
    # fp32 alone loses the updates (they are below half-ulp of x)
    x32 = x64.astype(np.float32)
    for _ in range(10):
        x32 = x32 + d
    assert np.linalg.norm(x32.astype(np.float64) - want) > 1e2 * np.linalg.norm(
        got - want
    )
