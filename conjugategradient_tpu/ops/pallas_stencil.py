"""Pallas slab kernel for BIG const-stencil SpMV: one HBM pass over x.

Why this exists (measured r5, VERDICT r4 #6): XLA's fused pad+slice stencil
formulation (``ops.stencil.spmv_const_stencil``) reads a SHIFTED WINDOW of
the padded array per leg — at HBM-resident sizes those seven window reads
are not reused through VMEM, so a 7-point SpMV moves ~9-10 full passes
instead of two.  On chip at 16.6M rows: 735 us (implied 180 GB/s against
the 745 GB/s canary) in 3-D and 621 us (216 GB/s) for the same-n 2-D grid
— while every sub-VMEM size measures at "roofline" only because the whole
working set is VMEM-resident.  The r5 255^3 V-cycle decomposition traced
8.9 ms/iteration almost entirely to this: level-0 cheb(2,2) smoothing alone
was 3.75 ms (``artifacts/vcycle3d_profile_r05.json``).

Design: the grid runs over the LEADING axis in ``bz``-plane slabs.  Each
program receives its slab THREE ways — the ``bz``-plane center block plus
two single-plane halo blocks (block shape ``(1, ...)``, whose block index
IS the plane index, mapped to ``z0 - 1`` / ``z0 + bz`` with clamping) — so
the per-step fetch traffic is ``(bz + 2)/bz`` of the slab, not 3x.  A
z-iota mask zeroes out-of-range planes (this one mask handles the global
z boundaries AND the ragged tail, where Pallas pads reads with garbage).
Every leg is then a static in-register slice of the ``(bz+2, ...)`` stack
with concat-with-zeros in-plane shifts — no pad materialisation, no
gathers.  Total HBM traffic: ~1.06 reads of x + 1 write of y.

Manual per-plane DMA was tried first and REJECTED by Mosaic: HBM memref
slices must cover whole (8, 128) tiles in the trailing dims, which 2^k-1
grids never do; blocked specs handle the unaligned trailing dims for us.

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
    """Static in-plane shift with zero fill: neighbour ``i + s`` semantics
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


def _kernel(xu_ref, xc_ref, xd_ref, y_ref, *, bz, L, coeffs, shifts):
    i = pl.program_id(0)
    if xu_ref.shape[0] == 1:  # 3-D: one-plane halo blocks
        up, dn = xu_ref[...], xd_ref[...]
    else:  # 2-D: 8-row halo blocks (sublane-divisibility) — the needed row
        # is the block's last (up) / first (down) one
        up = xu_ref[7:8]
        dn = xd_ref[0:1]
    stack = jnp.concatenate([up, xc_ref[...], dn], axis=0)
    # one mask kills the global z boundaries (plane -1 / plane L reads were
    # index-clamped) AND the ragged-tail garbage planes beyond L
    z_ids = jax.lax.broadcasted_iota(
        jnp.int32, (bz + 2,) + (1,) * (stack.ndim - 1), 0
    ) + (i * bz - 1)
    stack = jnp.where((z_ids >= 0) & (z_ids < L), stack, jnp.float32(0.0))
    acc = None
    for c, shift in zip(coeffs, shifts):
        t = jax.lax.slice_in_dim(stack, 1 + shift[0], 1 + shift[0] + bz, axis=0)
        t = _plane_shift(t, shift[1:])
        term = jnp.float32(c) * t
        acc = term if acc is None else acc + term
    y_ref[...] = acc


@functools.lru_cache(maxsize=32)
def _build(grid: Tuple[int, ...], coeffs: Tuple[float, ...],
           shifts: Tuple[Tuple[int, ...], ...], bz: int, interpret: bool):
    L, rest = grid[0], grid[1:]
    nprog = pl.cdiv(L, bz)
    zeros_rest = (0,) * len(rest)
    kern = functools.partial(
        _kernel, bz=bz, L=L, coeffs=coeffs, shifts=shifts
    )
    if len(rest) == 2:
        # 3-D: one-plane halo blocks — block shape (1, ny, nx) makes the
        # block index the PLANE index (last two dims are full, so the
        # sublane/lane divisibility rule is satisfied); clamp keeps it
        # legal, the kernel's z-mask keeps it correct
        halo = (1,) + rest
        up_map = lambda i: (jnp.maximum(i * bz - 1, 0),) + zeros_rest
        dn_map = lambda i: (jnp.minimum(i * bz + bz, L - 1),) + zeros_rest
    else:
        # 2-D: rows are the sublane dim, so halo blocks must be 8 rows;
        # block index is in 8-row units and the kernel picks the edge row
        assert bz % 8 == 0, "2-D slab size must be sublane-divisible"
        nb8 = pl.cdiv(L, 8)
        halo = (8,) + rest
        up_map = lambda i: (jnp.maximum(i * (bz // 8) - 1, 0),) + zeros_rest
        dn_map = lambda i: (
            jnp.minimum(i * (bz // 8) + bz // 8, nb8 - 1),
        ) + zeros_rest
    return pl.pallas_call(
        kern,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(halo, up_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bz,) + rest, lambda i: (i,) + zeros_rest,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(halo, dn_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bz,) + rest, lambda i: (i,) + zeros_rest,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(grid, jnp.float32),
        # the default 16 MB scoped-VMEM budget is Mosaic's conservative
        # floor; v5e has 128 MB — double-buffered center/out blocks plus
        # the (bz+2)-plane stack want ~5x the block size
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
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
        # slab sizing: big enough to amortise the 2 halo planes and
        # per-program overhead, small enough that the center + halo + out
        # blocks (double-buffered) stay comfortably inside VMEM
        plane = int(np.prod(A.grid[1:])) * 4
        cap = 64 if len(A.grid) == 3 else 512
        bz = int(min(max(4 * 1024 * 1024 // max(plane, 1), 4), cap, A.grid[0]))
    if len(A.grid) == 2:
        bz = max(8 * (bz // 8), 8)  # sublane-divisible rows
    fn = _build(
        tuple(A.grid),
        tuple(float(c) for c in A.coeffs),
        tuple(tuple(int(s) for s in sh) for sh in A.shifts),
        int(bz),
        bool(interpret),
    )
    return fn(x.astype(jnp.float32), x.astype(jnp.float32), x.astype(jnp.float32))
