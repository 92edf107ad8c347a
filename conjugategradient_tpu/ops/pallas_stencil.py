"""Pallas slab kernel for BIG const-stencil SpMV: one HBM pass over x.

Why this exists (measured r5, VERDICT r4 #6): XLA's fused pad+slice stencil
formulation (``ops.stencil.spmv_const_stencil``) reads a SHIFTED WINDOW of
the padded array per leg — at HBM-resident sizes those seven window reads
are not reused through VMEM, so a 7-point SpMV moves ~9-10 full passes
instead of two.  On chip at 16.6M rows: 735 us (implied 180 GB/s against
the 745 GB/s canary) in 3-D and 621 us (216 GB/s) for the same-n 2-D grid
— while every sub-VMEM size measures at "roofline" only because the whole
working set is VMEM-resident.  The r4 255^3 V-cycle decomposition traced
8.9 ms/iteration almost entirely to this: level-0 cheb(2,2) smoothing alone
was 3.75 ms (`artifacts/vcycle3d_profile_r05.json`).

Design (the Pallas playbook: aligned slab loads + static in-register
shifts): the grid runs over the LEADING axis in ``bz``-plane slabs; each
program DMAs its ``bz + 2`` halo-inclusive planes from HBM into a VMEM
scratch (per-plane copies, boundary planes zeroed — uniform ragged-tail
handling), computes every leg as a static slice of the scratch with
edge-masked in-plane shifts (concat-with-zeros, no pad materialisation),
and writes its ``bz`` output planes once.  Total HBM traffic: read x once
(+ one halo plane per slab boundary), write y once — the 2-pass minimum.

Scope: ``ConstStencilMatrix`` with per-axis shifts in {-1, 0, 1} (every
fw/hyb discretization here), 2-D/3-D grids, fp32.  Used by
``ops.stencil.spmv_const_stencil`` above the HBM-residency threshold on
TPU; compiled-vs-interpret is revalidated in ``bench.py``'s validation
section alongside the DIA kernels.

Reference capability being outperformed: the reference's only stencil-like
workload is its Poisson generator solved through generic CSR/DIA kernels
(``Mgcg/cuBlas/MgcgGpu/Mgcg.cu:201-270``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conjugategradient_tpu.core.formats import ConstStencilMatrix


def _supported(A: ConstStencilMatrix) -> bool:
    if len(A.grid) not in (2, 3):
        return False
    return all(all(abs(s) <= 1 for s in shift) for shift in A.shifts)


def _plane_shift(t, shift_rest):
    """Static in-plane shift with zero fill: t[..., i + s, ...] semantics
    (matching the pad+slice formulation's zero boundary)."""
    for ax_rel, s in enumerate(shift_rest):
        ax = 1 + ax_rel  # axis 0 is the slab axis
        if s == 0:
            continue
        zshape = list(t.shape)
        zshape[ax] = 1
        z = jnp.zeros(zshape, t.dtype)
        if s == 1:
            body = jax.lax.slice_in_dim(t, 1, t.shape[ax], axis=ax)
            t = jax.lax.concatenate([body, z], ax)
        else:
            body = jax.lax.slice_in_dim(t, 0, t.shape[ax] - 1, axis=ax)
            t = jax.lax.concatenate([z, body], ax)
    return t


def _kernel(x_hbm, y_ref, s_ref, sem, *, bz, L, coeffs, shifts):
    i = pl.program_id(0)
    z0 = i * bz
    # halo-inclusive slab load: per-plane guarded DMAs (uniform boundary +
    # ragged-tail handling; ~bz+2 copies of one (rest...) plane each)
    for j in range(bz + 2):
        zj = z0 - 1 + j
        valid = (zj >= 0) & (zj < L)

        @pl.when(valid)
        def _(j=j, zj=zj):
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(zj, 1)], s_ref.at[pl.ds(j, 1)], sem
            )
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(valid))
        def _(j=j):
            s_ref[pl.ds(j, 1)] = jnp.zeros_like(s_ref[pl.ds(j, 1)])

    acc = None
    for c, shift in zip(coeffs, shifts):
        sz = shift[0]
        t = s_ref[pl.ds(1 + sz, bz)]
        t = _plane_shift(t, shift[1:])
        term = jnp.float32(c) * t
        acc = term if acc is None else acc + term
    y_ref[...] = acc


@functools.lru_cache(maxsize=32)
def _build(grid: Tuple[int, ...], coeffs: Tuple[float, ...],
           shifts: Tuple[Tuple[int, ...], ...], bz: int, interpret: bool):
    L, rest = grid[0], grid[1:]
    nprog = pl.cdiv(L, bz)
    kern = functools.partial(
        _kernel, bz=bz, L=L, coeffs=coeffs, shifts=shifts
    )
    return pl.pallas_call(
        kern,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (bz,) + rest, lambda i: (i,) + (0,) * len(rest),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(grid, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bz + 2,) + rest, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


def spmv_const_stencil_pallas(
    A: ConstStencilMatrix, x: jnp.ndarray, bz: int = 0, interpret: bool = False
) -> jnp.ndarray:
    """y = A x for a big const stencil, one HBM pass over x (see module
    docstring).  ``x`` grid-shaped; extents beyond ±1 or dims outside 2/3-D
    raise (callers gate via ``_supported``)."""
    if not _supported(A):
        raise ValueError(
            "spmv_const_stencil_pallas: needs a 2-D/3-D const stencil with "
            f"per-axis shifts in {{-1,0,1}}; got grid={A.grid}"
        )
    if bz <= 0:
        # slab sizing: big enough to amortise halo planes (2/bz redundant
        # reads) and per-program overhead, small enough that the scratch
        # (bz+2 planes) stays comfortably inside VMEM
        plane = int(np.prod(A.grid[1:])) * 4
        bz = int(min(max(4 * 1024 * 1024 // max(plane, 1), 4), 64, A.grid[0]))
    fn = _build(
        tuple(A.grid),
        tuple(float(c) for c in A.coeffs),
        tuple(tuple(int(s) for s in sh) for sh in A.shifts),
        int(bz),
        bool(interpret),
    )
    return fn(x.astype(jnp.float32))
