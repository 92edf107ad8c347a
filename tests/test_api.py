"""High-level solve() facade + cross-method agreement + determinism.

Determinism doubles as the framework's race-condition sanitizer
(SURVEY.md §5.2): the reference's latent halo-exchange data race class is
excluded by SPMD semantics, and this pins it — same inputs, bitwise-same
outputs, across methods and shard counts.
"""

import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats
from conjugategradient_tpu.core.generators import banded_sin_system, poisson_system


@pytest.mark.parametrize("method", ["cg", "jacobi_cg", "oracle", "native"])
def test_all_methods_agree(method):
    sys_ = banded_sin_system(1024, 16)
    res = solve(sys_.A, sys_.b, sys_.x0, method=method, tol=1e-8)
    assert bool(res.converged)
    ref = solve(sys_.A, sys_.b, sys_.x0, method="oracle", tol=1e-8)
    np.testing.assert_allclose(np.asarray(res.x), ref.x, rtol=1e-7, atol=1e-9)


def test_mgcg_and_refined_methods():
    grid = (63, 63)
    sys_ = poisson_system(grid)
    mg = solve(sys_.A, sys_.b, method="mgcg", grid=grid, tol=1e-8)
    assert bool(mg.converged) and int(mg.iterations) <= 12
    rf = solve(sys_.A, sys_.b, method="refined", grid=grid, tol=1e-10,
               device_dtype=np.float32)
    assert rf.converged and rf.residual < 1e-10


def test_method_validation():
    sys_ = banded_sin_system(64, 8)
    with pytest.raises(ValueError):
        solve(sys_.A, sys_.b, method="nope")
    with pytest.raises(ValueError):
        solve(sys_.A, sys_.b, method="mgcg")  # no grid


def test_csr_input_through_facade():
    sys_ = banded_sin_system(512, 8)
    csr = formats.dia_to_csr(sys_.A)
    res = solve(csr, sys_.b, method="cg", tol=1e-8)
    assert bool(res.converged)


def test_device_solve_is_deterministic():
    sys_ = banded_sin_system(2048, 16)
    a = np.asarray(solve(sys_.A, sys_.b, sys_.x0, method="cg", tol=1e-10).x)
    b = np.asarray(solve(sys_.A, sys_.b, sys_.x0, method="cg", tol=1e-10).x)
    np.testing.assert_array_equal(a, b)  # bitwise


def test_sharded_solve_is_deterministic():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conjugategradient_tpu.parallel.mesh import make_mesh
    from conjugategradient_tpu.parallel.sharded_cg import make_sharded_cg
    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    sys_ = banded_sin_system(1024, 8)
    mesh = make_mesh(8)
    solve_fn = make_sharded_cg(sys_.A, mesh, ConvergencePolicy(tol=1e-10), donate=False)
    row = NamedSharding(mesh, P("x"))
    data = jax.device_put(jnp.asarray(sys_.A.data), NamedSharding(mesh, P(None, "x")))
    b = jax.device_put(jnp.asarray(sys_.b), row)
    x0 = jax.device_put(jnp.zeros(1024), row)
    a = np.asarray(solve_fn(data, b, x0).x)
    c = np.asarray(solve_fn(data, b, x0).x)
    np.testing.assert_array_equal(a, c)  # bitwise — the "race sanitizer"


def test_sharded_cg_through_facade():
    """method='sharded_cg' routes DIA to the halo solver and CSR to the
    exact-halo-range solver, accepting mesh/variant kwargs."""
    from conjugategradient_tpu.core.formats import dia_to_csr
    from conjugategradient_tpu.parallel import make_mesh

    from conjugategradient_tpu.core import oracle

    sys_ = banded_sin_system(512, 8)
    mesh = make_mesh(8)
    for A in (sys_.A, dia_to_csr(sys_.A)):
        res = solve(
            A, sys_.b, sys_.x0, method="sharded_cg", tol=1e-9, norm="rel_l2",
            mesh=mesh, variant="cg1",
        )
        assert bool(res.converged)
        r = sys_.b - oracle.spmv(sys_.A, np.asarray(res.x, np.float64))
        assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 1e-8


def test_multi_rhs_through_facade():
    """(n, k) b routes to the block solver for cg / jacobi_cg / mgcg."""
    from conjugategradient_tpu.core import oracle

    sys_ = poisson_system((16, 16))
    rng = np.random.default_rng(7)
    B = rng.standard_normal((sys_.n, 3))
    for method, kw in (("cg", {}), ("jacobi_cg", {}), ("mgcg", {"grid": (16, 16)})):
        res = solve(sys_.A, B, method=method, tol=1e-9, norm="rel_l2", **kw)
        assert bool(np.asarray(res.converged).all()), method
        for j in range(3):
            r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j], np.float64))
            assert np.linalg.norm(r) / np.linalg.norm(B[:, j]) < 1e-8, method


def test_auto_method_dispatch():
    """method='auto' picks by structure: SPD -> cg/mgcg, symmetric
    indefinite -> minres, nonsymmetric -> bicgstab/mg_bicgstab."""
    import numpy as np

    from conjugategradient_tpu.api import _auto_method
    from conjugategradient_tpu.core import generators, oracle

    spd = generators.banded_sin_matrix(128, 8)
    assert _auto_method(spd, None) == "cg"
    assert _auto_method(generators.poisson2d_matrix(16), (16, 16)) == "mgcg"
    indef = generators.helmholtz_matrix((128,), shift=0.05)
    assert _auto_method(indef, None) == "minres"
    nonsym = generators.convection_diffusion_matrix((12, 12), eps=0.1)
    # no grid -> IDR(s): fp32 plain BiCGStab measurably stagnates/diverges
    # at scale (see test_auto_nonsym_robust_where_bicgstab_diverges)
    assert _auto_method(nonsym, None) == "idr"
    assert _auto_method(nonsym, (12, 12)) == "mg_bicgstab"

    # end-to-end through the facade on each class
    for sys_, kw in (
        (generators.banded_sin_system(256, 8), {}),
        (generators.helmholtz_system((128,), shift=0.05), {"max_iteration": 2000}),
        (generators.convection_diffusion_system((12, 12), eps=0.1), {}),
    ):
        res = solve(sys_.A, sys_.b, method="auto", tol=1e-9, norm="rel_l2", **kw)
        x_true = oracle.direct_solve(sys_.A, sys_.b)
        assert bool(res.converged)
        err = np.linalg.norm(np.asarray(res.x) - x_true) / np.linalg.norm(x_true)
        assert err < 1e-6


def test_auto_handles_const_stencil_and_deep_indefinite():
    """Review findings: auto must probe ConstStencilMatrix (no .data leaf)
    and catch mildly indefinite 2-D Helmholtz shifts (needs the 120-step
    Lanczos probe — 30 steps misses them)."""
    import numpy as np

    from conjugategradient_tpu.api import _auto_method
    from conjugategradient_tpu.core import formats, generators

    A = generators.poisson2d_matrix(16)
    st = formats.dia_to_stencil(A, (16, 16))
    cst = formats.stencil_to_const(st)
    assert cst is not None
    assert _auto_method(cst, (16, 16)) == "mgcg"

    lam1 = 2 * 4 * np.sin(np.pi / 128) ** 2
    for mult in (1.5, 3.0):
        indef = generators.helmholtz_matrix((63, 63), shift=mult * lam1)
        assert _auto_method(indef, None) == "minres", mult


def test_mesh_aliasing_for_cg_jacobi_cg_mgcg_auto():
    """cg / jacobi_cg / mgcg / auto with mesh= must route to their
    distributed carriers instead of TypeError-ing on the mesh kw (the
    single-device solvers take no mesh; found via auto+mesh probing)."""
    from conjugategradient_tpu import solve
    from conjugategradient_tpu.core import oracle
    from conjugategradient_tpu.parallel.mesh import make_mesh

    sb = banded_sin_system(512, 8)
    xb = oracle.direct_solve(sb.A, sb.b)
    for m in ("auto", "cg", "jacobi_cg"):
        res = solve(sb.A, sb.b, method=m, mesh=make_mesh(8), tol=1e-9, norm="rel_l2")
        assert bool(res.converged), m
        err = np.linalg.norm(np.asarray(res.x, np.float64) - xb) / np.linalg.norm(xb)
        assert err < 1e-6, m

    sp = poisson_system((15, 15))
    xp = oracle.direct_solve(sp.A, sp.b)
    for m in ("mgcg", "auto"):
        res = solve(
            sp.A, sp.b, method=m, grid=(15, 15), mesh=make_mesh(8),
            tol=1e-9, norm="rel_l2",
        )
        assert bool(res.converged), m
        err = np.linalg.norm(
            np.asarray(res.x, np.float64).ravel() - xp
        ) / np.linalg.norm(xp)
        assert err < 1e-6, m


def test_auto_nonsym_robust_where_bicgstab_diverges():
    """VERDICT r3 weak-5: plain fp32 BiCGStab silently stagnates at scale.
    On the measured workload (255^2 convection-diffusion, eps=0.5, fp32,
    tol 2e-6) BiCGStab BLOWS UP to ~5e+16 by its iteration cap while IDR(4)
    converges — auto must dispatch nonsymmetric no-grid systems to IDR and
    converge here, and a stalled auto solve must surface a diagnosis."""
    import warnings

    import numpy as np

    from conjugategradient_tpu.core import generators, oracle
    from conjugategradient_tpu.solvers.bicgstab import bicgstab_solve

    sys_ = generators.convection_diffusion_system((255, 255), eps=0.5, dtype=np.float32)
    res = solve(
        sys_.A, sys_.b, method="auto", tol=2e-6, norm="rel_l2",
        max_iteration=20000, dtype=np.float32,
    )
    assert bool(res.converged), float(res.residual)
    r = np.asarray(sys_.b, np.float64) - oracle.spmv(
        sys_.A, np.asarray(res.x, np.float64)
    )
    assert np.linalg.norm(r) / np.linalg.norm(sys_.b) < 5e-6

    # the method auto replaced: plain fp32 BiCGStab fails this workload
    import jax.numpy as jnp

    from conjugategradient_tpu.solvers.policy import ConvergencePolicy

    rb = bicgstab_solve(
        sys_.A.device_put(dtype=np.float32),
        jnp.asarray(sys_.b, np.float32),
        policy=ConvergencePolicy(tol=2e-6, norm="rel_l2", max_iteration=6000),
    )
    assert not bool(rb.converged)

    # stall diagnosis: an auto solve that exhausts its budget warns
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res_stall = solve(
            sys_.A, sys_.b, method="auto", tol=1e-12, norm="rel_l2",
            max_iteration=50, dtype=np.float32,
        )
        assert not bool(res_stall.converged)
        assert any("stalled" in str(x.message) for x in w)


def test_auto_multi_rhs_nonsym_and_stall_guard():
    """Review findings (r4): auto with (n, k) RHS must not crash — the
    stall guard handles array-valued converged/residual, and nonsymmetric
    block systems fall back to block BiCGStab (no block-IDR carrier)."""
    import warnings

    import numpy as np

    from conjugategradient_tpu.core import generators, oracle

    sys_ = generators.convection_diffusion_system((15, 15), eps=0.1)
    B = np.random.default_rng(0).standard_normal((sys_.A.n, 3))
    res = solve(sys_.A, B, method="auto", tol=1e-9, norm="rel_l2")
    assert bool(np.asarray(res.converged).all())
    for j in range(3):
        r = B[:, j] - oracle.spmv(sys_.A, np.asarray(res.x[:, j], np.float64))
        assert np.linalg.norm(r) / np.linalg.norm(B[:, j]) < 1e-7
    # the stall guard itself must summarize (k,) arrays without raising
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res2 = solve(
            sys_.A, B, method="auto", tol=1e-30, norm="rel_l2", max_iteration=5
        )
        assert not bool(np.asarray(res2.converged).all())
        assert any("columns converged" in str(x.message) for x in w)


def test_eigs_symmetric_indefinite_not_misrouted():
    """Review finding (r4): eigs auto must NOT hand symmetric INDEFINITE
    operators to LOBPCG — its algebraic largest= mapping returns the wrong
    end of the spectrum for magnitude selections (measured: Helmholtz SM
    gave the most-negative modes).  Arnoldi handles them correctly."""
    import numpy as np

    from conjugategradient_tpu import eigs
    from conjugategradient_tpu.core import formats, generators

    # non-square grid: the square Laplacian's multiplicity-2 eigenvalues
    # would trip the documented single-vector-Krylov limitation instead of
    # the routing property under test
    A = generators.helmholtz_matrix((12, 13), shift=3.0)
    ev = np.linalg.eigvalsh(np.asarray(formats.dia_to_dense(A).data, np.float64))
    assert ev[0] < 0 < ev[-1]  # genuinely indefinite
    r = eigs(A, k=3, which="SM", tol=1e-8)
    ref = ev[np.argsort(np.abs(ev))[:3]]
    # plain Arnoldi converges slowly on interior-magnitude modes (sigma=0
    # shift-invert is the fast tool) — the property under test is the
    # ROUTING: the right three modes, not the most-negative ones
    assert np.max(np.abs(np.sort(r.values.real) - np.sort(ref))) < 5e-6
    r0 = eigs(A, k=3, sigma=0.0, tol=1e-9)  # the fast route for the same ask
    assert r0.converged and r0.inner_converged
    assert np.max(np.abs(np.sort(r0.values.real) - np.sort(ref))) < 1e-8


def test_eigs_fp32_default_tol_converges():
    """Review finding (r4): the default tol must be dtype-aware — fp32
    LOBPCG cannot reach 1e-8 and used to burn the full budget returning
    converged=False on an all-defaults call."""
    import numpy as np

    from conjugategradient_tpu import eigs
    from conjugategradient_tpu.core import generators

    r = eigs(generators.poisson2d_matrix(24, 24), k=4)  # all defaults, fp32
    assert bool(r.converged)
    assert int(r.restarts) < 200  # did not burn the whole budget
