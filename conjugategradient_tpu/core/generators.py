"""Deterministic SPD system generators — the reference's synthetic fixtures.

These reproduce (numerically, not textually) the reference's benchmark
matrices, which serve as its "fake backends": reproducible inputs with known
solvability (SURVEY.md §4.5):

- banded ``|sin(i+j)|`` diagonally-dominant SPD matrix with row-sum diagonal
  (``Mgcg/cuBlas/Mgcg/MgcgMain.cs:53-84``, ``R/CG.R:8-24``),
- tridiagonal (2, 1) matrix
  (``SimpleConjugateGradient/SimpleConjugateGradient.cu:163-190``),
- plus *new* structured Poisson stencil matrices (1-D/2-D/3-D) that the
  multigrid preconditioner (BASELINE.json config ladder) is built around.

All generators are vectorized numpy producing fp64 ``DiaMatrix`` directly —
DIA is the natural container for every one of these banded systems.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from conjugategradient_tpu.core.formats import DiaMatrix


@dataclasses.dataclass(frozen=True)
class LinearSystem:
    """A = SPD matrix, b = RHS, x0 = initial guess (the reference's
    ``LinerEquations`` container, ``Mgcg/cuBlas/Mgcg/LinerEquations.cs:6-47``)."""

    A: DiaMatrix
    b: np.ndarray
    x0: np.ndarray

    @property
    def n(self) -> int:
        return self.A.n


def banded_sin_matrix(n: int, band: int, dtype=np.float64) -> DiaMatrix:
    """The ``a_ij = |sin(i+j)|`` banded matrix with row-sum diagonal.

    Off-diagonals live at ``j in [max(0, i - band/2 + 1), min(n, i + band/2))``
    with ``j != i`` and the diagonal is the sum of the row's off-diagonal
    magnitudes (diagonally dominant, symmetric, positive semi-definite in the
    limit / SPD in practice) — the generator every reference driver shares
    (``MgcgMain.cs:53-84``, ``MgcgCLMain.cs:52-95``, ``R/CG.R:8-24``).
    """
    if band < 2 or band % 2:
        raise ValueError("band must be an even integer >= 2")
    h = band // 2 - 1  # half-width of the off-diagonal band
    offsets = tuple(range(-h, h + 1))
    i = np.arange(n, dtype=np.int64)
    data = np.zeros((len(offsets), n), dtype=dtype)
    diag_k = offsets.index(0)
    for k, off in enumerate(offsets):
        if off == 0:
            continue
        valid = (i + off >= 0) & (i + off < n)
        vals = np.abs(np.sin((2 * i + off).astype(dtype)))
        data[k] = np.where(valid, vals, 0.0)
        data[diag_k] += data[k]
    return DiaMatrix(data, offsets, (n, n))


def banded_sin_system(
    n: int,
    band: int,
    b_kind: str = "cos10",
    x0_kind: str = "i/100",
    dtype=np.float64,
) -> LinearSystem:
    """Full workloads: matrix plus the drivers' RHS / initial-guess recipes.

    ``b_kind``:  ``cos10`` = 10*cos(i) (``MgcgMain.cs:94``);
                 ``one_plus`` = 1 + 0.1*i (ViennaCL small, ``MgcgCLMain.cs``);
                 ``asin`` = asin(i/n) (ViennaCL large, ``MgcgCL.cs``).
    ``x0_kind``: ``i/100`` (``MgcgMain.cs:99``), ``i/10`` (``R/CG.R:21``),
                 ``zeros``.
    """
    A = banded_sin_matrix(n, band, dtype=dtype)
    i = np.arange(n, dtype=dtype)
    if b_kind == "cos10":
        b = 10.0 * np.cos(i)
    elif b_kind == "one_plus":
        b = 1.0 + 0.1 * i
    elif b_kind == "asin":
        b = np.arcsin(i / n)
    else:
        raise ValueError(f"unknown b_kind {b_kind!r}")
    if x0_kind == "i/100":
        x0 = i / 100.0
    elif x0_kind == "i/10":
        x0 = i / 10.0
    elif x0_kind == "zeros":
        x0 = np.zeros(n, dtype=dtype)
    else:
        raise ValueError(f"unknown x0_kind {x0_kind!r}")
    return LinearSystem(A, b.astype(dtype), x0.astype(dtype))


def tridiagonal_matrix(n: int, diag: float = 2.0, off: float = 1.0, dtype=np.float64) -> DiaMatrix:
    """The (2, 1) tridiagonal SPD matrix of the standalone CUDA demo
    (``SimpleConjugateGradient.cu:163-190``)."""
    data = np.zeros((3, n), dtype=dtype)
    data[0, :-1] = off  # A[i, i-1] for i >= 1 -> data[k, i] = A[i, i-1], i in [1, n)
    data[0] = np.roll(data[0], 1)
    data[1, :] = diag
    data[2, : n - 1] = off
    return DiaMatrix(data, (-1, 0, 1), (n, n))


def tridiagonal_system(n: int, dtype=np.float64) -> LinearSystem:
    """Tridiagonal workload: ``b_i = i^2 / 2``, ``x0 = 0``
    (``SimpleConjugateGradient.cu:196,203``)."""
    i = np.arange(n, dtype=dtype)
    return LinearSystem(tridiagonal_matrix(n, dtype=dtype), 0.5 * i * i, np.zeros(n, dtype=dtype))


# ---------------------------------------------------------------------------
# Poisson stencil matrices (new capability: the multigrid config ladder).
# ---------------------------------------------------------------------------


def poisson1d_matrix(nx: int, dtype=np.float64) -> DiaMatrix:
    """1-D Laplacian (-1, 2, -1), Dirichlet, unit grid spacing."""
    data = np.zeros((3, nx), dtype=dtype)
    data[0, 1:] = -1.0
    data[1, :] = 2.0
    data[2, : nx - 1] = -1.0
    return DiaMatrix(data, (-1, 0, 1), (nx, nx))


def poisson2d_matrix(nx: int, ny: int | None = None, dtype=np.float64) -> DiaMatrix:
    """2-D 5-point Laplacian on an ``ny x nx`` grid (row-major, Dirichlet).

    Unknown ``i = y*nx + x``; offsets ``(-nx, -1, 0, 1, nx)``.  The ±1
    diagonals are zeroed across row seams — that zeroing is what makes the
    flat-DIA SpMV exact.
    """
    ny = nx if ny is None else ny
    n = nx * ny
    i = np.arange(n, dtype=np.int64)
    x = i % nx
    y = i // nx
    data = np.zeros((5, n), dtype=dtype)
    data[0] = np.where(y >= 1, -1.0, 0.0)  # A[i, i-nx]
    data[1] = np.where(x >= 1, -1.0, 0.0)  # A[i, i-1]
    data[2] = 4.0
    data[3] = np.where(x <= nx - 2, -1.0, 0.0)  # A[i, i+1]
    data[4] = np.where(y <= ny - 2, -1.0, 0.0)  # A[i, i+nx]
    return DiaMatrix(data, (-nx, -1, 0, 1, nx), (n, n))


def poisson3d_matrix(nx: int, ny: int | None = None, nz: int | None = None, dtype=np.float64) -> DiaMatrix:
    """3-D 7-point Laplacian on ``nz x ny x nx`` (row-major, Dirichlet)."""
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    n = nx * ny * nz
    i = np.arange(n, dtype=np.int64)
    x = i % nx
    y = (i // nx) % ny
    z = i // (nx * ny)
    data = np.zeros((7, n), dtype=dtype)
    data[0] = np.where(z >= 1, -1.0, 0.0)
    data[1] = np.where(y >= 1, -1.0, 0.0)
    data[2] = np.where(x >= 1, -1.0, 0.0)
    data[3] = 6.0
    data[4] = np.where(x <= nx - 2, -1.0, 0.0)
    data[5] = np.where(y <= ny - 2, -1.0, 0.0)
    data[6] = np.where(z <= nz - 2, -1.0, 0.0)
    return DiaMatrix(data, (-nx * ny, -nx, -1, 0, 1, nx, nx * ny), (n, n))


def poisson_system(grid_shape: Tuple[int, ...], seed: int = 0, dtype=np.float64) -> LinearSystem:
    """Poisson workload with a deterministic smooth RHS and zero initial guess."""
    if len(grid_shape) == 1:
        A = poisson1d_matrix(grid_shape[0], dtype=dtype)
    elif len(grid_shape) == 2:
        A = poisson2d_matrix(grid_shape[1], grid_shape[0], dtype=dtype)
    elif len(grid_shape) == 3:
        A = poisson3d_matrix(grid_shape[2], grid_shape[1], grid_shape[0], dtype=dtype)
    else:
        raise ValueError("grid_shape must be 1-, 2- or 3-D")
    n = A.n
    i = np.arange(n, dtype=dtype)
    b = np.sin(0.37 * i + seed) + 0.25 * np.cos(1.3 * i)
    return LinearSystem(A, b.astype(dtype), np.zeros(n, dtype=dtype))
