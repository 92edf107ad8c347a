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


def _domain_mask(ndim: int, bz: int, hw: int, L: int):
    """(bz + 2*hw, 1, ...) boolean mask of globally valid z planes for the
    current program's slab — kills clamped-halo reads, global boundaries,
    and ragged-tail padding garbage in one place."""
    i = pl.program_id(0)
    z_ids = jax.lax.broadcasted_iota(
        jnp.int32, (bz + 2 * hw,) + (1,) * (ndim - 1), 0
    ) + (i * bz - hw)
    return (z_ids >= 0) & (z_ids < L)


def _stack_masked(up_ref, c_ref, dn_ref, bz: int, L: int):
    """Concat [halo, center, halo] IN FULL and zero out-of-domain planes.
    The halo blocks may be wider than the stencil needs (2-D uses 8-row
    sublane-divisible blocks): they are concatenated whole — Mosaic cannot
    concat a sublane-OFFSET slice ("result/input offset mismatch on
    non-concat dimension", measured on the compiled 2-D path) — and the
    kernels slice their leg windows at base offset ``hb`` instead.  The
    extra halo rows are masked like any other out-of-window plane would
    be: the domain mask spans [z0 - hb, z0 + bz + hb)."""
    hb = up_ref.shape[0]
    s = jnp.concatenate([up_ref[...], c_ref[...], dn_ref[...]], axis=0)
    return jnp.where(_domain_mask(s.ndim, bz, hb, L), s, jnp.float32(0.0))


def _halo_specs(rest, bz: int, hb: int, L: int):
    """(halo_shape, up_map, dn_map) for halo blocks of ``hb`` planes in
    hb-plane block units (requires hb | bz): up holds plane z0-1 as its
    LAST row, down holds plane z0+bz as its FIRST; index clamping keeps the
    maps legal, the kernel's domain mask keeps them correct.  For 2-D
    grids ``hb`` must be sublane-divisible (8)."""
    zeros_rest = (0,) * len(rest)
    nb = pl.cdiv(L, hb)
    halo = (hb,) + rest
    up_map = lambda i: (jnp.maximum(i * (bz // hb) - 1, 0),) + zeros_rest
    dn_map = lambda i: (
        jnp.minimum(i * (bz // hb) + bz // hb, nb - 1),
    ) + zeros_rest
    return halo, up_map, dn_map


def _center_spec(rest, bz: int):
    zeros_rest = (0,) * len(rest)
    return pl.BlockSpec(
        (bz,) + rest, lambda i: (i,) + zeros_rest, memory_space=pltpu.VMEM
    )


def _kernel(xu_ref, xc_ref, xd_ref, y_ref, *, bz, L, coeffs, shifts):
    hb = xu_ref.shape[0]
    stack = _stack_masked(xu_ref, xc_ref, xd_ref, bz, L)
    acc = None
    for c, shift in zip(coeffs, shifts):
        t = jax.lax.slice_in_dim(stack, hb + shift[0], hb + shift[0] + bz, axis=0)
        t = _plane_shift(t, shift[1:])
        term = jnp.float32(c) * t
        acc = term if acc is None else acc + term
    y_ref[...] = acc


@functools.lru_cache(maxsize=32)
def _build(grid: Tuple[int, ...], coeffs: Tuple[float, ...],
           shifts: Tuple[Tuple[int, ...], ...], bz: int, interpret: bool):
    L, rest = grid[0], grid[1:]
    kern = functools.partial(
        _kernel, bz=bz, L=L, coeffs=coeffs, shifts=shifts
    )
    # 3-D: one-plane halo blocks (the full trailing dims satisfy the
    # sublane/lane divisibility rule); 2-D: 8-row sublane-divisible blocks
    hb = 1 if len(rest) == 2 else 8
    if hb == 8:
        assert bz % 8 == 0, "2-D slab size must be sublane-divisible"
    halo, up_map, dn_map = _halo_specs(rest, bz, hb, L)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(L, bz),),
        in_specs=[
            pl.BlockSpec(halo, up_map, memory_space=pltpu.VMEM),
            _center_spec(rest, bz),
            pl.BlockSpec(halo, dn_map, memory_space=pltpu.VMEM),
        ],
        out_specs=_center_spec(rest, bz),
        out_shape=jax.ShapeDtypeStruct(grid, jnp.float32),
        # the default 16 MB scoped-VMEM budget is Mosaic's conservative
        # floor; v5e has 128 MB — double-buffered center/out blocks plus
        # the (bz+2)-plane stack want ~5x the block size
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# variable-coefficient slab SpMV
# ---------------------------------------------------------------------------


def _kernel_var(xu_ref, xc_ref, xd_ref, legs_ref, y_ref, *, bz, L, shifts):
    """Variable-coefficient twin of ``_kernel``: legs stream in output-slab
    blocks (no leg halo — a leg is read only at its own row, and boundary
    legs hold exact zeros where the neighbour exits the grid).  The domain
    mask still applies to x: NON-FINITE padding garbage survives a zero leg
    (0 * NaN = NaN)."""
    hb = xu_ref.shape[0]
    stack = _stack_masked(xu_ref, xc_ref, xd_ref, bz, L)
    acc = None
    for k, shift in enumerate(shifts):
        t = jax.lax.slice_in_dim(stack, hb + shift[0], hb + shift[0] + bz, axis=0)
        t = _plane_shift(t, shift[1:])
        leg = legs_ref[k].astype(jnp.float32)  # bf16 legs upcast in-register
        term = leg * t
        acc = term if acc is None else acc + term
    y_ref[...] = acc


@functools.lru_cache(maxsize=32)
def _build_var(grid: Tuple[int, ...], shifts: Tuple[Tuple[int, ...], ...],
               nlegs: int, leg_dtype: str, bz: int, interpret: bool):
    L, rest = grid[0], grid[1:]
    zeros_rest = (0,) * len(rest)
    kern = functools.partial(_kernel_var, bz=bz, L=L, shifts=shifts)
    hb = 1 if len(rest) == 2 else 8
    if hb == 8:
        assert bz % 8 == 0
    halo, up_map, dn_map = _halo_specs(rest, bz, hb, L)
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(L, bz),),
        in_specs=[
            pl.BlockSpec(halo, up_map, memory_space=pltpu.VMEM),
            _center_spec(rest, bz),
            pl.BlockSpec(halo, dn_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nlegs, bz) + rest, lambda i: (0, i) + zeros_rest,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=_center_spec(rest, bz),
        out_shape=jax.ShapeDtypeStruct(grid, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def spmv_stencil_pallas(A, x: jnp.ndarray, bz: int = 0,
                        interpret: bool = False) -> jnp.ndarray:
    """y = A x for a big VARIABLE-coefficient stencil (``StencilMatrix``):
    x streams once with slab halos, the leg arrays stream once in output
    blocks (fp32 or bf16 storage — bf16 legs upcast in-register, halving
    the dominant matrix traffic).  Same scope rules as the const kernel."""
    from conjugategradient_tpu.core.formats import StencilMatrix

    if not isinstance(A, StencilMatrix) or len(A.grid) not in (2, 3):
        raise ValueError("spmv_stencil_pallas: 2-D/3-D StencilMatrix only")
    if not all(all(abs(s) <= 1 for s in shift) for shift in A.shifts):
        raise ValueError("spmv_stencil_pallas: per-axis shifts must be <= 1")
    nlegs = A.nlegs
    if bz <= 0:
        # legs dominate VMEM: (nlegs + ~4) slab-sized arrays live
        plane = int(np.prod(A.grid[1:])) * 4
        bz = 24 * 1024 * 1024 // max((nlegs + 4) * plane, 1)
        bz = int(min(max(bz, 4), 64, A.grid[0]))
    if len(A.grid) == 2:
        bz = max(8 * (bz // 8), 8)
    fn = _build_var(
        tuple(A.grid),
        tuple(tuple(int(s) for s in sh) for sh in A.shifts),
        int(nlegs), str(jnp.dtype(A.data.dtype)), int(bz), bool(interpret),
    )
    return fn(
        x.astype(jnp.float32), x.astype(jnp.float32), x.astype(jnp.float32),
        A.data,
    )


# ---------------------------------------------------------------------------
# fused Chebyshev smoothing (3-D const levels)
# ---------------------------------------------------------------------------


def _apply_slab(t, coeffs, shifts):
    """A t on a FULL slab: z-shifts as concat-zero plane shifts (the slab's
    edge planes go stale by one per application — the halo budget), in-plane
    shifts as the usual masked static slices."""
    acc = None
    for c, shift in zip(coeffs, shifts):
        # z-shift via concat-zero along axis 0, then the in-plane shifts
        u = t
        sz = shift[0]
        if sz:
            zshape = (1,) + t.shape[1:]
            z = jnp.zeros(zshape, t.dtype)
            if sz == 1:
                u = jax.lax.concatenate(
                    [jax.lax.slice_in_dim(t, 1, t.shape[0], axis=0), z], 0
                )
            else:
                u = jax.lax.concatenate(
                    [z, jax.lax.slice_in_dim(t, 0, t.shape[0] - 1, axis=0)], 0
                )
        u = _plane_shift(u, shift[1:])
        term = jnp.float32(c) * u
        acc = term if acc is None else acc + term
    return acc


def _cheb_kernel(invd_ref, *refs, bz, h, L, coeffs, shifts, degree,
                 lam_max, lam_min, zero_x, want_resid):
    """Whole degree-``degree`` Chebyshev smoothing sweep on one slab.

    Inputs (per slab, after the scalar ref): b halo/center/halo
    [, x halo/center/halo].  Outputs: x [, r = D^{-1}(b - A x)].  The slab
    carries ``h = degree`` halo planes per side; every stencil application
    goes one plane stale at the slab edges, and the recurrence performs
    exactly ``degree`` applications on the deepest-consumed path, so the
    central ``bz`` output planes stay exact.
    """
    invd = invd_ref[0, 0]
    nin = 3 if zero_x else 6
    ins, outs = refs[:nin], refs[nin:]

    dom = _domain_mask(3, bz, h, L)

    def stack_of(up_ref, c_ref, dn_ref):
        return _stack_masked(up_ref, c_ref, dn_ref, bz, L)

    def apply_dom(t):
        # Dirichlet semantics at EVERY application: the operator input must
        # be zero outside the global domain (only the first application is
        # covered by the input mask; later ones see recurrence state)
        return _apply_slab(jnp.where(dom, t, jnp.float32(0.0)), coeffs, shifts)

    b = stack_of(*ins[:3])
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta
    rho = 1.0 / sigma
    if zero_x:
        x = jnp.zeros_like(b)
        r = invd * b
    else:
        x = stack_of(*ins[3:6])
        r = invd * (b - apply_dom(x))
    d = r / jnp.float32(theta)
    for k in range(degree):
        x = x + d
        last = k == degree - 1
        if not (last and not want_resid):
            r = r - invd * apply_dom(d)
        if not last:
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = jnp.float32(rho_new * rho) * d + jnp.float32(
                2.0 * rho_new / delta
            ) * r
            rho = rho_new
    outs[0][...] = jax.lax.slice_in_dim(x, h, h + bz, axis=0)
    if want_resid:
        outs[1][...] = jax.lax.slice_in_dim(r, h, h + bz, axis=0)


def _cheb_halo(degree: int, zero_x: bool, want_resid: bool) -> int:
    """Deepest operator-application chain the outputs consume: the zero-x
    recurrence costs ``degree`` applications; with a NONZERO x0 the init
    ``A x0`` adds one to the residual path (the x path still erodes only
    ``degree`` deep) — under-budgeting it corrupted slab-edge residual
    planes by ~1e-2 (caught in review, pinned by test)."""
    return degree + (1 if (want_resid and not zero_x) else 0)


@functools.lru_cache(maxsize=32)
def _build_cheb(grid, coeffs, shifts, bz, degree, lam_max, lam_min,
                zero_x, want_resid, interpret):
    L, rest = grid[0], grid[1:]
    h = _cheb_halo(degree, zero_x, want_resid)
    assert bz % h == 0, "slab size must be a multiple of the halo depth"
    kern = functools.partial(
        _cheb_kernel, bz=bz, h=h, L=L, coeffs=coeffs, shifts=shifts,
        degree=degree, lam_max=lam_max, lam_min=lam_min, zero_x=zero_x,
        want_resid=want_resid,
    )
    halo, up_map, dn_map = _halo_specs(rest, bz, h, L)

    def specs_for_one():
        return [
            pl.BlockSpec(halo, up_map, memory_space=pltpu.VMEM),
            _center_spec(rest, bz),
            pl.BlockSpec(halo, dn_map, memory_space=pltpu.VMEM),
        ]

    in_specs = [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] + specs_for_one()
    if not zero_x:
        in_specs += specs_for_one()
    out_spec = _center_spec(rest, bz)
    n_out = 2 if want_resid else 1
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(L, bz),),
        in_specs=in_specs,
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct(grid, jnp.float32)] * n_out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def cheb_smooth_const_pallas(
    A: ConstStencilMatrix,
    b: jnp.ndarray,
    x: "jnp.ndarray | None",
    degree: int,
    lam_max: float,
    lam_min: float,
    inv_diag,
    want_resid: bool = False,
    bz: int = 0,
    interpret: bool = False,
):
    """One FUSED degree-``degree`` Chebyshev smoothing application for a big
    3-D const stencil: the whole three-term recurrence (``precond.smoothers.
    chebyshev_smooth``, bitwise-same schedule) runs slab-resident in VMEM —
    HBM traffic is read b [+ read x] + write x [+ write r], vs the unfused
    form's ~10 passes per degree step.  ``x=None`` = zero initial guess (the
    V-cycle's pre-smoothing: no A x0 application, no x read).
    ``want_resid=True`` also emits ``r = D^{-1}(b - A x_out)`` — the
    pre-smooth + residual of a V-cycle level in ONE kernel.

    ``inv_diag``: scalar (const-stencil levels have a constant diagonal).
    Returns ``x_out`` or ``(x_out, r_scaled)``.
    """
    if not _supported(A) or len(A.grid) != 3:
        raise ValueError("cheb_smooth_const_pallas: 3-D const stencil only")
    if degree < 1:
        raise ValueError("degree must be >= 1")
    if bz <= 0:
        # slab sizing by PLANE bytes: Mosaic's measured liveness is ~11
        # slab-sized arrays for the nonzero-x variant (b and x stacks, r, d,
        # apply temporaries — 351^3's level-1 OOM'd at a 9.9 MB slab:
        # 106.6 > 100 MB), so target ~7 MB of slab
        plane = int(np.prod(A.grid[1:])) * 4
        h_need = _cheb_halo(degree, x is None, want_resid)
        bz = 7 * 1024 * 1024 // max(plane, 1) - 2 * h_need
        bz = int(min(max(bz, h_need), 32))
        bz = max(h_need * (bz // h_need), h_need)  # halo-depth divisible
    fn = _build_cheb(
        tuple(A.grid),
        tuple(float(c) for c in A.coeffs),
        tuple(tuple(int(s) for s in sh) for sh in A.shifts),
        int(bz), int(degree), float(lam_max), float(lam_min),
        x is None, bool(want_resid), bool(interpret),
    )
    invd = jnp.asarray(inv_diag, jnp.float32).reshape(1, 1)
    b = b.astype(jnp.float32)
    args = [invd, b, b, b]
    if x is not None:
        x = x.astype(jnp.float32)
        args += [x, x, x]
    out = fn(*args)
    return (out[0], out[1]) if want_resid else out[0]


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
