"""Grid-stencil SpMV — the TPU speed-of-light path for structured matrices.

Why this exists (measured on a real chip, 1M-row 2-D Poisson, fp32):

=====================  =========  ==========
formulation             time       GFLOP/s
=====================  =========  ==========
flat DIA, XLA slices     995 us      10.5
flat DIA, XLA rolls      779 us      13.4
flat DIA, Pallas         427 us      24.5
**2-D grid stencil**    **31 us**  **342** (~950 GB/s = HBM roofline)
=====================  =========  ==========

Flat 1-D layouts starve the VPU's (8, 128) registers; keeping unknowns in
their natural grid shape makes every shifted window a 2-D tiled array and XLA
fuses the whole stencil into one roofline-bound streaming loop.  All
grid-stencil ops therefore take and return *grid-shaped* arrays; the solver
stack is shape-agnostic (dots/norms reduce over all axes), so CG state simply
stays grid-shaped end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from conjugategradient_tpu.core.formats import ConstStencilMatrix, StencilMatrix


def _as_grid(x: jnp.ndarray, grid):
    """Accept a FLAT (n,) vector (or (n, k) block) where a grid-shaped array
    is the native layout: reshape in, and hand back the inverse reshape.
    A reshape is metadata-only under jit (row-major flat order == grid
    order), so the convenience costs nothing; grid-shaped input passes
    through untouched.  Keeps the solver stack's shape-agnostic contract
    (CLAUDE.md) true for stencil operators driven with flat Krylov state.
    """
    nd = len(grid)
    if x.ndim == nd + 1 and x.shape[:nd] == tuple(grid):
        return x, (lambda y: y)  # (*grid, k) block
    if x.ndim == nd and x.shape == tuple(grid):
        return x, (lambda y: y)
    if x.ndim == 1 and x.size == int(np.prod(grid)):
        return x.reshape(grid), (lambda y: y.reshape(-1))
    if x.ndim == 2 and nd > 1 and x.shape[0] == int(np.prod(grid)):
        k = x.shape[1]
        return x.reshape(tuple(grid) + (k,)), (lambda y: y.reshape(-1, k))
    raise ValueError(f"array of shape {x.shape} is not compatible with grid {grid}")


def _pallas_var_ok(A: StencilMatrix, x) -> bool:
    """Measured dispatch (255^3 jump diffusion on chip): with VARIABLE legs
    the leg arrays dominate traffic and XLA already streams them once, so
    the slab kernel only wins where the wire format matters — bf16-stored
    legs (906 vs 1055 us); for fp32 legs XLA is 5% FASTER (1379 vs 1455)
    and keeps the dispatch.  Contrast the const-stencil case, where the
    x-window re-reads ARE the traffic and the kernel is 2.7x."""
    if A.n < PALLAS_MIN_N or x.dtype != jnp.float32:
        return False
    if A.data.dtype != jnp.bfloat16:
        return False
    from conjugategradient_tpu.ops.pallas_stencil import _supported

    if not _supported(A):  # shared scope predicate: 2/3-D, |shift| <= 1
        return False
    return jax.default_backend() == "tpu"


def spmv_stencil(A: StencilMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x on grid-shaped ``x`` via zero-pad + static slices.
    Flat (n,) input is reshaped in/out for free (``_as_grid``).
    HBM-resident sizes on TPU route through the variable-coefficient
    Pallas slab kernel (legs stream once, halo-free; bf16 legs stay bf16
    on the wire) — see ``spmv_const_stencil``'s gate rationale."""
    x, back = _as_grid(x, A.grid)
    if x.ndim == len(A.grid) and _pallas_var_ok(A, x):
        from conjugategradient_tpu.ops.pallas_stencil import spmv_stencil_pallas

        return back(spmv_stencil_pallas(A, x))
    halo = A.halo
    xp = jnp.pad(x, [(h, h) for h in halo])
    y = None
    for k, shift in enumerate(A.shifts):
        sl = tuple(
            slice(h + s, h + s + g) for h, s, g in zip(halo, shift, A.grid)
        )
        term = A.data[k] * xp[sl]
        y = term if y is None else y + term
    return back(y)


def spmv_stencil_roll(A: StencilMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Same product with cyclic rolls per axis — the GSPMD-friendly variant
    (rolls partition into neighbor collective-permutes; wraparound lands on
    the legs' structural zeros, as in ``ops.spmv.spmv_dia_roll``)."""
    x, back = _as_grid(x, A.grid)
    y = None
    for k, shift in enumerate(A.shifts):
        xs = x
        for ax, s in enumerate(shift):
            if s:
                xs = jnp.roll(xs, -s, axis=ax)
        term = A.data[k] * xs
        y = term if y is None else y + term
    return back(y)


#: HBM-residency threshold for the Pallas slab kernel: below it the XLA
#: pad+slice loop keeps the whole working set VMEM-resident and measures at
#: roofline; above it the seven shifted-window reads stop being reused and
#: XLA moves ~9-10 passes per SpMV (measured 180-216 GB/s implied at 16.6M
#: rows vs the kernel's ~2-pass minimum — see ops/pallas_stencil.py).
PALLAS_MIN_N = 8_000_000
_PALLAS_MIN_N = PALLAS_MIN_N  # back-compat alias


def _pallas_const_ok(A: ConstStencilMatrix, x) -> bool:
    if A.n < _PALLAS_MIN_N or x.dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu":
        return False
    from conjugategradient_tpu.ops.pallas_stencil import _supported

    return _supported(A)


def spmv_const_stencil(A: ConstStencilMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with zero matrix traffic: per-leg SCALAR coefficients times
    statically shifted windows (boundary behaviour = the zero padding).
    2n bytes per SpMV vs (nlegs + 2) n for the variable-coefficient form —
    the fine-level Laplacian runs ~3x faster on chip.  HBM-resident sizes
    on TPU route through the Pallas slab kernel (one pass over x; the XLA
    window reads stop being VMEM-reused past ~8M rows — measured 2.7x on
    the op at 255^3)."""
    x, back = _as_grid(x, A.grid)
    if x.ndim == len(A.grid) and _pallas_const_ok(A, x):
        from conjugategradient_tpu.ops.pallas_stencil import (
            spmv_const_stencil_pallas,
        )

        return back(spmv_const_stencil_pallas(A, x))
    halo = A.halo
    xp = jnp.pad(x, [(h, h) for h in halo])
    y = None
    for k, shift in enumerate(A.shifts):
        sl = tuple(slice(h + s, h + s + g) for h, s, g in zip(halo, shift, A.grid))
        term = A.coeffs[k] * xp[sl]
        y = term if y is None else y + term
    return back(y)


def spmv_const_stencil_roll(A: ConstStencilMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """Cyclic-roll variant for GSPMD — BUT a plain roll wraps real values
    around the global edges with nothing to mask them (no grid-shaped legs
    holding structural zeros), so edge-crossing legs zero the wrapped slab
    explicitly via a positional mask (an iota compare per sharded axis —
    negligible next to the SpMV itself)."""
    x, back = _as_grid(x, A.grid)
    y = None
    for k, shift in enumerate(A.shifts):
        xs = x
        for ax, s in enumerate(shift):
            if s:
                xs = jnp.roll(xs, -s, axis=ax)
                i = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
                g = x.shape[ax]
                ok = (i + s >= 0) & (i + s < g)
                xs = jnp.where(ok, xs, 0)
        term = A.coeffs[k] * xs
        y = term if y is None else y + term
    return back(y)


def spmm_const_stencil(A: ConstStencilMatrix, B: jnp.ndarray) -> jnp.ndarray:
    """A @ B for B of shape (*grid, k), constant-coefficient legs.
    Flat (n, k) input is reshaped in/out for free (``_as_grid``)."""
    B, back = _as_grid(B, A.grid)
    halo = A.halo
    pad = [(h, h) for h in halo] + [(0, 0)]
    Bp = jnp.pad(B, pad)
    y = None
    for k, shift in enumerate(A.shifts):
        sl = tuple(
            slice(h + s, h + s + g) for h, s, g in zip(halo, shift, A.grid)
        ) + (slice(None),)
        term = A.coeffs[k] * Bp[sl]
        y = term if y is None else y + term
    return back(y)


def spmm_stencil(A: StencilMatrix, B: jnp.ndarray) -> jnp.ndarray:
    """A @ B for B of shape (*grid, k) — k right-hand sides at once.
    Flat (n, k) input is reshaped in/out for free (``_as_grid``)."""
    B, back = _as_grid(B, A.grid)
    halo = A.halo
    pad = [(h, h) for h in halo] + [(0, 0)]
    Bp = jnp.pad(B, pad)
    y = None
    for k, shift in enumerate(A.shifts):
        sl = tuple(
            slice(h + s, h + s + g) for h, s, g in zip(halo, shift, A.grid)
        ) + (slice(None),)
        term = A.data[k][..., None] * Bp[sl]
        y = term if y is None else y + term
    return back(y)
