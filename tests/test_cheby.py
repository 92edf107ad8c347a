"""Chebyshev iteration: the dot-free solver, single-device + sharded."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.solvers.cheby import chebyshev_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@pytest.fixture(scope="module")
def band():
    sys_ = generators.banded_sin_system(1024, 16)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


def test_converges_with_auto_bounds(band):
    sys_, x_true = band
    res = chebyshev_solve(
        sys_.A, jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=20000),
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8


def test_iteration_count_matches_theory(band):
    """With exact bounds, Chebyshev error contracts per iteration like
    (sqrt(kappa)-1)/(sqrt(kappa)+1) — the iteration count must sit within
    ~2x of that prediction (it cannot beat CG, which adapts)."""
    from conjugategradient_tpu.core import formats
    from conjugategradient_tpu.solvers.cg import cg_solve

    sys_, _ = band
    lam = np.linalg.eigvalsh(np.asarray(formats.dia_to_dense(sys_.A).data, np.float64))
    lo, hi = float(lam[0]), float(lam[-1])
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=20000)
    res = chebyshev_solve(sys_.A, jnp.asarray(sys_.b), policy=pol, bounds=(lo, hi))
    cg = cg_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    kappa = hi / lo
    rho = (np.sqrt(kappa) - 1) / (np.sqrt(kappa) + 1)
    pred = int(np.ceil(np.log(1e-10 / 2) / np.log(rho)))
    assert bool(res.converged)
    assert int(cg.iterations) <= int(res.iterations) <= 2 * pred + 16


def test_underestimated_upper_bound_diverges_honestly(band):
    """hi below lambda_max puts the polynomial outside [-1, 1]: the solve
    must report converged=False (not hang, not claim success)."""
    sys_, _ = band
    res = chebyshev_solve(
        sys_.A, jnp.asarray(sys_.b),
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=300),
        bounds=(1.0, 10.0),  # lambda_max of this family is ~60
    )
    assert not bool(res.converged)


def test_sharded_matches_single_device(band):
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import sharded_nonsym_solve

    sys_, x_true = band
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=20000)
    single = chebyshev_solve(sys_.A, jnp.asarray(sys_.b), policy=pol)
    # facade route estimates bounds itself
    shard = solve(
        sys_.A, sys_.b, method="chebyshev", tol=1e-10, norm="rel_l2",
        max_iteration=20000, mesh=make_mesh(8),
    )
    assert bool(shard.converged)
    err = np.linalg.norm(np.asarray(shard.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8
    # checks land on check_every boundaries; same chunk count
    assert abs(int(shard.iterations) - int(single.iterations)) <= 16


def test_hlo_one_allreduce_per_chunk(band):
    """The design claim in HLO: the while-body (= check_every SpMVs) has
    exactly ONE all-reduce."""
    import re

    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import make_sharded_nonsym

    sys_, _ = band
    mesh = make_mesh(8)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=20000)
    solve_fn = make_sharded_nonsym(
        sys_.A, mesh, pol, method="chebyshev", bounds=(0.01, 70.0), donate=False
    )
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(
        jnp.asarray(np.asarray(sys_.A.data)), NamedSharding(mesh, P(None, "x"))
    )
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.zeros(sys_.n), row)
    hlo = solve_fn.lower(data, b, x0).compile().as_text()
    body_ar = sum(
        1
        for line in hlo.splitlines()
        if re.search(r"\ball-reduce(?:-start)?\(", line) and "/while/body" in line
    )
    assert body_ar == 1, body_ar
    # extended-region stepping (round 3): the whole check_every-iteration
    # block also costs ONE fused halo pair — 2 collective-permutes per body
    # (the old per-SpMV exchange paid 2 * check_every = 32)
    body_cp = sum(
        1
        for line in hlo.splitlines()
        if re.search(r"\bcollective-permute(?:-start)?\(", line)
        and "/while/body" in line
    )
    assert body_cp == 2, body_cp


def test_block_loop_matches_plain_loop(band):
    """The extended-region block loop must follow the SAME trajectory as
    the per-SpMV-exchange loop (identical recurrence, different data
    motion): force the fallback with a tiny check_every*halo > n_local
    comparison via check_every choices and compare solutions."""
    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import sharded_nonsym_solve

    sys_, x_true = band
    pol_kw = dict(
        policy=ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=20000),
        method="chebyshev", bounds=(0.01, 70.0), mesh=make_mesh(8),
    )
    # n_local = 128, halo = 16: check_every=4 -> H=64 (block path);
    # check_every=16 -> H=256 > n_local (falls back to per-SpMV exchanges)
    blocked = sharded_nonsym_solve(sys_.A, sys_.b, check_every=4, **pol_kw)
    plain = sharded_nonsym_solve(sys_.A, sys_.b, check_every=16, **pol_kw)
    assert bool(blocked.converged) and bool(plain.converged)
    for r in (blocked, plain):
        err = np.linalg.norm(np.asarray(r.x) - x_true) / np.linalg.norm(x_true)
        assert err < 1e-8


def test_facade_single_device(band):
    sys_, x_true = band
    res = solve(
        sys_.A, sys_.b, method="chebyshev", tol=1e-9, norm="rel_l2",
        max_iteration=20000,
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
    assert err < 1e-7


def test_facade_dtype_override(band):
    """Review finding: facade chebyshev must apply dtype= to the MATRIX
    too (mixed fp64-matrix / fp32-state crashed the scan carry)."""
    sys_, x_true = band
    res = solve(
        sys_.A, sys_.b, method="chebyshev", tol=1e-5, norm="rel_l2",
        max_iteration=20000, dtype=np.float32,
    )
    assert res.x.dtype == jnp.float32
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x, np.float64) - x_true) / np.linalg.norm(
        x_true
    )
    assert err < 1e-3


def test_hlo_linf_no_wasted_reduce(band):
    """Review finding: the linf path must not ALSO pay the (unused) rr
    psum per chunk — its predicate pmax in `cond` is the only reduction."""
    import re

    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.shard_nonsym import make_sharded_nonsym

    sys_, _ = band
    mesh = make_mesh(8)
    pol = ConvergencePolicy(tol=1e-6, norm="linf", max_iteration=20000)
    solve_fn = make_sharded_nonsym(
        sys_.A, mesh, pol, method="chebyshev", bounds=(0.01, 70.0), donate=False
    )
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(
        jnp.asarray(np.asarray(sys_.A.data)), NamedSharding(mesh, P(None, "x"))
    )
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.zeros(sys_.n), row)
    hlo = solve_fn.lower(data, b, x0).compile().as_text()
    body_ar = sum(
        1
        for line in hlo.splitlines()
        if re.search(r"\ball-reduce(?:-start)?\(", line) and "/while/body" in line
    )
    assert body_ar == 0, body_ar
