"""Distributed layer on the 8-device virtual CPU mesh.

Tests the properties SURVEY.md §7 flags as the hard parts: halo math at shard
boundaries, shard-count invariance (1/2/4/8 shards -> same solution), masked
ring wraparound, and collective-dot equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from conjugategradient_tpu.core import oracle
from conjugategradient_tpu.core.generators import (
    banded_sin_system,
    poisson2d_matrix,
    poisson_system,
)
from conjugategradient_tpu.core.partition import pad_system
from conjugategradient_tpu.parallel import make_mesh
from conjugategradient_tpu.parallel.halo import halo_exchange, spmv_dia_local
from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg, sharded_cg_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


def _sharded_spmv(A, x, num_shards, axis="x"):
    mesh = make_mesh(num_shards, axis=axis)
    halo = A.bandwidth
    fn = jax.shard_map(
        lambda data, p: spmv_dia_local(data, A.offsets, halo_exchange(p, halo, axis, num_shards), halo),
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )
    return np.asarray(jax.jit(fn)(jnp.asarray(np.asarray(A.data)), jnp.asarray(x)))


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_sharded_spmv_matches_oracle(num_shards):
    A = poisson2d_matrix(8, 16)  # n=128, bandwidth 8, n_local >= 16
    x = np.sin(np.arange(128.0))
    np.testing.assert_allclose(_sharded_spmv(A, x, num_shards), oracle.spmv(A, x), rtol=1e-13)


def test_wraparound_halo_is_masked():
    """Ring-wrapped halo values at the global edges must never leak: DIA's
    structural zeros outside [0, n) multiply them away."""
    A = banded_sin_system(64, 8).A
    x = np.full(64, 7.3)  # any wrap leakage would show up at the ends
    got = _sharded_spmv(A, x, 8)
    np.testing.assert_allclose(got, oracle.spmv(A, x), rtol=1e-13)


@pytest.mark.parametrize("num_shards", [1, 2, 4, 8])
def test_shard_count_invariance(num_shards):
    """Same system, any shard count -> same solution and iteration count
    (the property test SURVEY.md §7 'hard parts' #3 calls for)."""
    sys_ = poisson_system((16, 16))
    mesh = make_mesh(num_shards)
    res = sharded_cg_solve(
        sys_.A, sys_.b, sys_.x0, ConvergencePolicy(tol=1e-10, max_iteration=2000), mesh
    )
    ref = oracle.cg(sys_.A, sys_.b, sys_.x0, tol=1e-10, max_iteration=2000)
    assert bool(res.converged)
    assert abs(int(res.iterations) - ref.iterations) <= 1
    np.testing.assert_allclose(np.asarray(res.x), ref.x, rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("norm", ["l2", "linf", "rel_l2"])
def test_sharded_norm_conventions(norm):
    sys_ = banded_sin_system(512, 16)
    res = sharded_cg_solve(
        sys_.A, sys_.b, sys_.x0, ConvergencePolicy(tol=1e-9, norm=norm, max_iteration=2000), make_mesh(8)
    )
    assert bool(res.converged)
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x, dtype=np.float64))
    if norm == "linf":
        assert np.max(np.abs(r)) < 1e-9
    elif norm == "l2":
        assert np.linalg.norm(r) < 1e-9
    else:
        assert float(res.residual) < 1e-9


def test_pad_system_roundtrip_through_sharded_solver():
    """Non-divisible n: identity-padded rows keep the solution exact."""
    sys_raw = banded_sin_system(100, 6)  # 100 not divisible by 8
    sys_pad, n_orig = pad_system(sys_raw, 8)
    assert sys_pad.n == 104 and n_orig == 100
    res = sharded_cg_solve(
        sys_pad.A, sys_pad.b, sys_pad.x0, ConvergencePolicy(tol=1e-10, max_iteration=1000), make_mesh(8)
    )
    ref = oracle.cg(sys_raw.A, sys_raw.b, sys_raw.x0, tol=1e-10, max_iteration=1000)
    np.testing.assert_allclose(np.asarray(res.x)[:n_orig], ref.x, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x)[n_orig:], 0.0, atol=1e-12)


def test_sharded_divergence_flag():
    sys_ = banded_sin_system(256, 8)
    res = sharded_cg_solve(
        sys_.A, sys_.b, sys_.x0, ConvergencePolicy(tol=1e-15, max_iteration=3), make_mesh(4)
    )
    assert not bool(res.converged)
    assert int(res.iterations) == 3


def test_sharded_jacobi_preconditioner():
    """A local (row-sharded) Jacobi preconditioner matches the oracle's PCG
    trajectory and never loses to plain CG."""
    from conjugategradient_tpu.core.formats import dia_diagonal

    sys_ = banded_sin_system(512, 16)
    mesh = make_mesh(8)
    pol = ConvergencePolicy(tol=1e-9, max_iteration=4000)
    inv_diag = 1.0 / np.asarray(dia_diagonal(sys_.A))

    plain = sharded_cg_solve(sys_.A, sys_.b, sys_.x0, pol, mesh)
    pc = sharded_cg_solve(
        sys_.A, sys_.b, sys_.x0, pol, mesh,
        M_local=lambda r, d: r * d, M_aux=inv_diag,
    )
    assert bool(pc.converged)
    ref = oracle.cg(
        sys_.A, sys_.b, sys_.x0, tol=1e-9, max_iteration=4000,
        M=lambda r: r * inv_diag,
    )
    assert abs(int(pc.iterations) - ref.iterations) <= 1
    np.testing.assert_allclose(np.asarray(pc.x), ref.x, rtol=1e-6, atol=1e-9)
    assert int(pc.iterations) <= int(plain.iterations)


def test_overlap_spmv_matches_padded_formulation():
    """The halo-overlap SpMV must be numerically identical to the
    concatenate-then-multiply formulation, shard count invariant."""
    import jax
    from functools import partial

    from conjugategradient_tpu.core import oracle as _oracle
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.parallel.halo import (
        halo_exchange as _hx,
        spmv_dia_local as _loc,
        spmv_dia_local_overlap as _ovl,
    )
    from conjugategradient_tpu.parallel.mesh import make_mesh

    sys_ = banded_sin_system(512, 16)
    halo = sys_.A.bandwidth
    mesh = make_mesh(8)
    p_vec = np.linspace(-1, 1, 512)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(jax.P(None, "x"), jax.P("x")),
        out_specs=(jax.P("x"), jax.P("x")),
    )
    def both(data, p):
        a = _loc(data, sys_.A.offsets, _hx(p, halo, "x", 8), halo)
        b = _ovl(data, sys_.A.offsets, p, halo, "x", 8)
        return a, b

    import jax.numpy as jnp

    a, b = both(jnp.asarray(sys_.A.data), jnp.asarray(p_vec))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # bitwise
    np.testing.assert_allclose(np.asarray(b), _oracle.spmv(sys_.A, p_vec), rtol=1e-12)


def test_multihost_helpers_degrade_to_local():
    """Single-process environment: helpers build the local mesh; sharded
    arrays assemble per-block and the solve validates against the oracle."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.core import oracle as _oracle
    from conjugategradient_tpu.core.generators import banded_sin_system
    from conjugategradient_tpu.core.formats import dia_diagonal
    from conjugategradient_tpu.parallel import multihost
    from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    multihost.initialize_distributed()  # no-op locally
    assert multihost.host_count() == 1
    mesh = multihost.global_mesh()
    assert mesh.shape["x"] == 8

    sys_ = banded_sin_system(1024, 8)
    from jax.sharding import NamedSharding

    data = jax.make_array_from_callback(
        sys_.A.data.shape, NamedSharding(mesh, P(None, "x")),
        lambda idx: jnp.asarray(np.asarray(sys_.A.data)[idx]),
    )
    b = jax.make_array_from_callback(
        sys_.b.shape, NamedSharding(mesh, P("x")),
        lambda idx: jnp.asarray(sys_.b[idx]),
    )
    x0 = jax.make_array_from_callback(
        sys_.x0.shape, NamedSharding(mesh, P("x")),
        lambda idx: jnp.asarray(sys_.x0[idx]),
    )
    solve = make_sharded_cg(sys_.A, mesh, ConvergencePolicy(tol=1e-8), donate=False)
    res = solve(data, b, x0)
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)
    r = sys_.b - _oracle.spmv(sys_.A, x)
    assert np.linalg.norm(r) < 1e-7


def test_make_distributed_system_per_block_generation():
    """make_distributed_system assembles via per-row-block callbacks (no
    global host system), identity-padding odd sizes to the mesh multiple;
    the sharded solve on it must match the workload's full build."""
    import dataclasses

    import jax

    from conjugategradient_tpu.core import oracle as _oracle
    from conjugategradient_tpu.models import WORKLOADS
    from conjugategradient_tpu.parallel import multihost
    from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    mesh = multihost.global_mesh()
    # ViennaCL small scaled up, n=4099 prime-ish (not divisible by 8): pads
    w = dataclasses.replace(WORKLOADS["viennacl_large"], n=4099)
    import conjugategradient_tpu.models.workloads as wl

    wl.WORKLOADS["_test_block"] = w
    try:
        A, b, x0, n = multihost.make_distributed_system("_test_block", mesh)
    finally:
        del wl.WORKLOADS["_test_block"]
    assert n == 4099 and A.n == 4104  # padded to 8 | n
    # the sharded data must equal the full build + pad_system
    full = w.build()
    from conjugategradient_tpu.core.partition import pad_system

    padded, _ = pad_system(full, 8)
    np.testing.assert_allclose(np.asarray(A.data), np.asarray(padded.A.data), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(b), padded.b)
    np.testing.assert_allclose(np.asarray(x0), padded.x0)

    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4 * A.n)
    solve = make_sharded_cg(A, mesh, pol, donate=False)
    res = solve(A.data, b, x0)
    assert bool(res.converged)
    x = np.asarray(res.x, dtype=np.float64)[:n]
    r = full.b - _oracle.spmv(full.A, x)
    assert np.linalg.norm(r) / np.linalg.norm(full.b) < 1e-8


def test_sharded_factory_cache_reuses_jitted_program():
    """Round-4: one-call conveniences used to rebuild (and re-trace) the
    sharded factory per solve; the static-key cache must return the SAME
    jitted product for structurally identical systems, and distinct
    products when the static config differs."""
    import numpy as np

    from conjugategradient_tpu.core.generators import banded_sin_matrix
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.core import oracle

    mesh = make_mesh(4)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=2000)
    A1 = banded_sin_matrix(256, 8)
    # genuinely different values, same structure (pure scaling preserves
    # the DIA structural zeros the halo ring-wrap masking relies on)
    data2 = np.asarray(banded_sin_matrix(256, 8).data) * 1.5
    from conjugategradient_tpu.core.formats import DiaMatrix

    A2 = DiaMatrix(data2, A1.offsets, A1.shape)
    f1 = make_sharded_cg(A1, mesh, pol, donate=False)
    f2 = make_sharded_cg(A2, mesh, pol, donate=False)
    assert f1 is f2
    # the central risk: matrix DATA must be a runtime argument of the
    # cached program, never baked into the trace — solve BOTH systems
    # through the SAME cached factory and validate numerically
    rng = np.random.default_rng(0)
    b = rng.standard_normal(256)
    row = NamedSharding(mesh, P("x"))
    col = NamedSharding(mesh, P(None, "x"))
    for A in (A1, A2):
        res = f1(
            jax.device_put(jnp.asarray(np.asarray(A.data)), col),
            jax.device_put(jnp.asarray(b), row),
            jax.device_put(jnp.zeros(256), row),
        )
        assert bool(res.converged)
        x_ref = oracle.cg(A, b, tol=1e-12, norm="rel_l2").x
        rel = np.linalg.norm(np.asarray(res.x) - x_ref) / np.linalg.norm(x_ref)
        assert rel < 1e-8, rel
    f3 = make_sharded_cg(A1, mesh, pol, donate=False, variant="cg1")
    assert f3 is not f1

    from conjugategradient_tpu.parallel.shard_nonsym import (
        make_sharded_lsmr,
        make_sharded_nonsym,
    )

    g1 = make_sharded_nonsym(A1, mesh, pol, method="bicgstab", donate=False)
    g2 = make_sharded_nonsym(A2, mesh, pol, method="bicgstab", donate=False)
    assert g1 is g2
    # per-call lambdas must NOT be cached (never-hittable keys would
    # pollute the LRU and evict live programs — review finding)
    g3 = make_sharded_nonsym(
        A1, mesh, pol, method="bicgstab", donate=False,
        M_local=lambda r, aux: aux * r,
    )
    g4 = make_sharded_nonsym(
        A1, mesh, pol, method="bicgstab", donate=False,
        M_local=lambda r, aux: aux * r,
    )
    assert g3 is not g4
    l1, _ = make_sharded_lsmr(A1, mesh, pol, donate=False)
    l2, _ = make_sharded_lsmr(A2, mesh, pol, donate=False)
    assert l1 is l2
