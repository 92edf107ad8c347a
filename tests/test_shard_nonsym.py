"""Row-block-sharded BiCGStab / GMRES on the 8-device virtual mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from conjugategradient_tpu.core import generators, oracle
from conjugategradient_tpu.parallel.mesh import make_mesh
from conjugategradient_tpu.parallel.shard_nonsym import sharded_nonsym_solve
from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve
from conjugategradient_tpu.solvers.gmres import gmres_solve
from conjugategradient_tpu.solvers.policy import ConvergencePolicy


@pytest.fixture(scope="module")
def convdiff_flat():
    # 24x24 grid -> flat DIA, bandwidth 24 << n_local 72 on 8 shards
    sys_ = generators.convection_diffusion_system((24, 24), eps=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    return sys_, x_true


def _rel(x, x_true):
    return np.linalg.norm(np.asarray(x, np.float64) - x_true) / np.linalg.norm(x_true)


def test_sharded_bicgstab_matches_single_device(convdiff_flat):
    """Same Krylov sequence: iteration count equals the single-device solver
    and the solution validates against the dense direct solve."""
    sys_, x_true = convdiff_flat
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    single = bicgstab_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    mesh = make_mesh(8)
    shard = sharded_nonsym_solve(sys_.A, sys_.b, policy=pol, mesh=mesh)
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-7
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2


def test_sharded_gmres_matches_single_device(convdiff_flat):
    sys_, x_true = convdiff_flat
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=4000)
    single = gmres_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol, restart=30
    )
    mesh = make_mesh(8)
    shard = sharded_nonsym_solve(
        sys_.A, sys_.b, policy=pol, method="gmres", restart=30, mesh=mesh
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-6
    # psum reduction order shifts the last few ulps; trajectories match to
    # +-1 cycle boundary
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2


def test_shard_count_invariance():
    sys_ = generators.nonsymmetric_banded_system(512, 16)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    its = []
    for num in (1, 2, 4, 8):
        res = sharded_nonsym_solve(sys_.A, sys_.b, policy=pol, mesh=make_mesh(num))
        assert bool(res.converged), num
        assert _rel(res.x, x_true) < 1e-8, num
        its.append(int(res.iterations))
    assert max(its) - min(its) <= 2, its


def test_jacobi_preconditioned_sharded(convdiff_flat):
    from conjugategradient_tpu.core import formats

    sys_, x_true = convdiff_flat
    inv = 1.0 / formats.matrix_diagonal(sys_.A)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=5000)
    M_local = lambda r, aux: aux * r
    for method in ("bicgstab", "gmres"):
        res = sharded_nonsym_solve(
            sys_.A, sys_.b, policy=pol, method=method, mesh=make_mesh(8),
            M_local=M_local, M_aux=inv, restart=30,
        )
        assert bool(res.converged), method
        assert _rel(res.x, x_true) < 1e-6, method


def test_allgather_fallback_wide_band():
    """bandwidth > n_local: the all-gather operator path."""
    sys_ = generators.nonsymmetric_banded_system(256, 80)  # halo 39 > 256/8
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2")
    res = sharded_nonsym_solve(sys_.A, sys_.b, policy=pol, mesh=make_mesh(8))
    assert bool(res.converged)
    assert _rel(res.x, x_true) < 1e-8


def test_sharded_minres_indefinite():
    """Distributed symmetric-indefinite solve: sharded MINRES on the
    Helmholtz workload matches single-device and the direct solve."""
    from conjugategradient_tpu.solvers.minres import minres_solve

    sys_ = generators.helmholtz_system((512,), shift=0.05)
    x_true = oracle.direct_solve(sys_.A, sys_.b)
    pol = ConvergencePolicy(tol=1e-10, norm="rel_l2", max_iteration=4000)
    single = minres_solve(sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol)
    shard = sharded_nonsym_solve(
        sys_.A, sys_.b, policy=pol, method="minres", mesh=make_mesh(8)
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-7
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2


def test_linf_norm_sharded():
    sys_ = generators.nonsymmetric_banded_system(512, 16)
    pol = ConvergencePolicy(tol=1e-8, norm="linf")
    res = sharded_nonsym_solve(
        sys_.A, sys_.b, policy=pol, method="gmres", restart=40, mesh=make_mesh(4)
    )
    r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x, np.float64))
    assert bool(res.converged)
    assert np.max(np.abs(r)) < 1e-7


def test_hlo_two_allreduces_per_bicgstab_iteration():
    """The load-bearing comm claim, audited in HLO: the sharded BiCGStab
    while-body carries exactly TWO all-reduces (alpha's dot + the fused
    (5,)-psum) — versus four naive collective dots.  MINRES carries two
    (the Lanczos alfa/beta products).  Recorded as a round artifact."""
    import json
    import os
    import re

    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from conjugategradient_tpu.parallel.shard_nonsym import make_sharded_nonsym

    def while_body_allreduces(hlo):
        return sum(
            1
            for line in hlo.splitlines()
            if re.search(r"\ball-reduce(?:-start)?\(", line) and "/while/body" in line
        )

    sys_ = generators.nonsymmetric_banded_system(512, 16)
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=2000)
    mesh = make_mesh(8)
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(
        jnp.asarray(np.asarray(sys_.A.data)), NamedSharding(mesh, P(None, "x"))
    )
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.zeros(sys_.n), row)

    counts = {}
    for method in ("bicgstab", "minres"):
        solve_fn = make_sharded_nonsym(sys_.A, mesh, pol, method=method, donate=False)
        hlo = solve_fn.lower(data, b, x0).compile().as_text()
        counts[method] = while_body_allreduces(hlo)
    assert counts["bicgstab"] == 2, counts
    assert counts["minres"] <= 2, counts

    path = os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "collectives_nonsym.json"
    )
    payload = json.dumps(
        {
            "workload": "nonsym band-16 n=512, 8-device virtual mesh",
            "allreduce_per_while_body": counts,
            "note": "bicgstab: alpha dot + fused (5,)-psum replaces 4 naive "
                    "collective dots; minres: Lanczos alfa+beta products",
        },
        indent=1,
    )
    try:
        current = open(path).read()
    except OSError:
        current = None
    if current != payload:
        with open(path, "w") as f:
            f.write(payload)


def test_sharded_block_jacobi(convdiff_flat):
    """Distributed block-Jacobi: the (n, bs) aux carrier row-shards with
    the vectors, blocks stay shard-local (576 = 8 shards x 72, bs=24|72);
    matches the single-device block-Jacobi solve and beats point Jacobi."""
    from conjugategradient_tpu import solve as facade
    from conjugategradient_tpu.precond import block_jacobi_preconditioner

    sys_, x_true = convdiff_flat
    pol = ConvergencePolicy(tol=1e-9, norm="rel_l2", max_iteration=5000)
    single = bicgstab_solve(
        sys_.A.device_put(), jnp.asarray(sys_.b), policy=pol,
        M=block_jacobi_preconditioner(sys_.A, 24),
    )
    mesh = make_mesh(8)
    shard = facade(
        sys_.A, sys_.b, method="bjacobi_bicgstab", block_size=24,
        tol=1e-9, norm="rel_l2", max_iteration=5000, mesh=mesh,
    )
    assert bool(shard.converged)
    assert _rel(shard.x, x_true) < 1e-6
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2
    # misaligned block size refuses loudly
    with pytest.raises(ValueError, match="shard-local"):
        facade(
            sys_.A, sys_.b, method="bjacobi_gmres", block_size=32,
            tol=1e-6, norm="rel_l2", mesh=mesh,
        )
