"""Facade robustness sweep: every (method, norm, format) combination the
one-call API advertises, on small systems, each solution checked against
the fp64 oracle.  This is the routing-regression net — individual solver
tests cover depth; this file covers BREADTH (a facade branch that silently
starts mis-routing fails here first)."""

import numpy as np
import pytest

from conjugategradient_tpu import solve
from conjugategradient_tpu.core import formats, generators, oracle
from conjugategradient_tpu.core.io import from_scipy, to_scipy

GRID = (16, 16)
SPD = generators.poisson_system(GRID)
NONSYM = generators.convection_diffusion_system(GRID, eps=0.3)
X_SPD = oracle.direct_solve(SPD.A, SPD.b)
X_NONSYM = oracle.direct_solve(NONSYM.A, NONSYM.b)

SPD_METHODS = [
    ("cg", {}),
    ("jacobi_cg", {}),
    ("bjacobi_cg", {"block_size": 8}),
    ("cheb_cg", {"degree": 3}),
    ("mgcg", {"grid": GRID}),
    ("amg_cg", {}),
    ("deflated_cg", {"k": 4, "m": 16}),
    ("chebyshev", {}),
    ("cacg", {"s": 2}),
    ("jacobi_cacg", {"s": 2}),
    ("minres", {}),
    ("cgnr", {}),
    ("lsmr", {}),
    ("idr", {"s": 2}),
    ("bicgstab", {}),
    ("gmres", {"restart": 24}),
    ("oracle", {}),
    ("native", {}),
    ("auto", {"grid": GRID}),
]

NONSYM_METHODS = [
    ("bicgstab", {}),
    ("jacobi_bicgstab", {}),
    ("bjacobi_bicgstab", {"block_size": 8}),
    ("gmres", {"restart": 32}),
    ("jacobi_gmres", {"restart": 32}),
    ("fgmres", {"restart": 32}),
    ("fgmres", {"inner": "bicgstab", "inner_iterations": 8}),
    ("idr", {"s": 4}),
    ("jacobi_idr", {"s": 4}),
    ("mg_bicgstab", {"grid": GRID}),
    ("mg_gmres", {"grid": GRID}),
    ("mg_idr", {"grid": GRID}),
    ("amg_bicgstab", {}),
    ("amg_gmres", {}),
    ("amg_idr", {}),
    ("cgnr", {}),
    ("lsmr", {}),
    ("auto", {}),
]


@pytest.mark.parametrize("method,kw", SPD_METHODS, ids=lambda m: str(m))
def test_facade_spd_sweep(method, kw):
    res = solve(
        SPD.A, SPD.b, method=method, tol=1e-9, norm="rel_l2",
        max_iteration=20000, **kw,
    )
    assert bool(np.asarray(res.converged)), method
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(x - X_SPD) / np.linalg.norm(X_SPD)
    assert rel < 1e-6, f"{method}: rel err {rel:.2e}"


@pytest.mark.parametrize("method,kw", NONSYM_METHODS, ids=lambda m: str(m))
def test_facade_nonsym_sweep(method, kw):
    res = solve(
        NONSYM.A, NONSYM.b, method=method, tol=1e-9, norm="rel_l2",
        max_iteration=40000, **kw,
    )
    assert bool(np.asarray(res.converged)), method
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(x - X_NONSYM) / np.linalg.norm(X_NONSYM)
    assert rel < 1e-6, f"{method}: rel err {rel:.2e}"


@pytest.mark.parametrize("norm", ["l2", "linf", "rel_l2"])
def test_facade_norm_sweep(norm):
    res = solve(SPD.A, SPD.b, method="cg", tol=1e-8, norm=norm)
    assert bool(np.asarray(res.converged))
    x = np.asarray(res.x, np.float64)
    assert np.linalg.norm(x - X_SPD) / np.linalg.norm(X_SPD) < 1e-6


@pytest.mark.parametrize(
    "convert",
    ["dia", "csr", "ell", "coo", "dense", "stencil"],
)
def test_facade_format_sweep(convert):
    """Every storage family solves through the same facade call."""
    A = SPD.A
    if convert == "csr":
        A = formats.dia_to_csr(A)
    elif convert == "ell":
        A = formats.csr_to_ell(formats.dia_to_csr(A))
    elif convert == "coo":
        A = formats.csr_to_coo(formats.dia_to_csr(A))
    elif convert == "dense":
        A = formats.dia_to_dense(A)
    elif convert == "stencil":
        A = formats.dia_to_stencil(A, GRID)
    res = solve(A, SPD.b, method="cg", tol=1e-9, norm="rel_l2")
    assert bool(np.asarray(res.converged))
    x = np.asarray(res.x, np.float64).reshape(-1)
    assert np.linalg.norm(x - X_SPD) / np.linalg.norm(X_SPD) < 1e-6
