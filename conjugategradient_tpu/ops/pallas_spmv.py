"""Hand-written Pallas TPU kernels for banded (DIA) SpMV — column-major.

The analogue of the reference's handmade OpenCL SpMV
(``Mgcg/HandmadeCL/MgcgCL/Mgcg.cl:171-216``), which tiles a window of the
vector into local memory per work-group.  Where a *grid-structured* matrix
exists, the XLA stencil path (``ops/stencil.py``) is already at HBM roofline;
this kernel targets **flat 1-D banded matrices** (the reference's band-160
``|sin|`` family has no grid structure).

Round-1 lesson (measured on a v5e-class chip): the row-major layout
``x2[r, l] = x[128 r + l]`` makes every diagonal shift a LANE rotation —
two slices + two rolls + a lane select *per diagonal*, ~3x the FMA work, and
the kernel sat at 92 GFLOP/s, far off roofline.  This rewrite flips the
layout:

- **Column-major ("segment-per-lane") view.**  ``X[r, l] = x[l * segp + r]``
  — each lane owns a contiguous segment of x.  A diagonal offset is now a
  *sublane* shift: ``x[i + off] = X[r + off, l]``, so every window is a
  STATIC SLICE of a loaded slab — zero rolls, zero selects, the exact op
  structure of the roofline stencil path.  Segment-crossing values are baked
  into a halo'd expansion ``Xt[r, l] = x[l * segp + r - H]`` built by cheap
  lane-shifted concats (O(n) per SpMV vs the O(ndiags * n) matrix stream).
- **Streamed, not VMEM-resident.**  x rides ordinary blocked BlockSpecs:
  each program reads 3 consecutive (R, 128) blocks of ``Xt`` (the slab),
  the coefficient block streams alongside, and diagonals are chunked into
  groups of <= ``Lmax`` so the VMEM working set stays ~4 MB regardless of
  n.  The round-1 kernel's whole-x-in-VMEM design (and its silent 2.5M-row
  XLA fallback) is gone — there is NO fallback path.
- **Chained accumulation + fused dot.**  Diagonal groups accumulate into y
  in place (``input_output_aliases``); the final group's call also writes
  per-program partials of ``p . Ap`` into SMEM (the CG hot pair fused —
  the reference needed multi-pass reduction kernel chains per dot,
  ``Mgcg.cl:53-102``).  The dot rides data already in VMEM, so fused is
  never slower than the unfused pair.

The kernel is shape-specialised at trace time on ``(offsets, n, dtype)`` —
the moral equivalent of the reference baking ``-D REAL= -D
MAX_NONZERO_COUNT=`` into its OpenCL build.

Measured (v5e-class chip, band-160 |sin| family, fp32, scan-differenced):

===========================  ==========  =========  ====================
formulation                   n=207,360   n=2.07M    notes
===========================  ==========  =========  ====================
XLA flat DIA (best)            1503 us    17868 us   44 / 37 GFLOP/s
this kernel                      74 us     1771 us   **10-20x**, 365+ GFLOP/s
this kernel, fused SpMV.dot      80 us     1807 us   fused <= unfused+dot
===========================  ==========  =========  ====================

At n=2.07M the coefficient stream is 1.32 GB: 1771 us = 739 GB/s of
minimum traffic — **at the chip's empirically achievable HBM bandwidth**
(725 GB/s measured on a pure XLA read-reduction, 601 GB/s on a copy), i.e.
the kernel is roofline-bound with zero formulation overhead.  The n=207k
number rides partial on-chip residency of the 132 MB working set and lands
above the nominal HBM rate; the honest sizing for roofline claims is the
1.32 GB case.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conjugategradient_tpu.core.formats import DiaMatrix

_LANE = 128
#: rows per program (output block is (R, 128) = 16384 elements)
_R = 128
#: max diagonals per group: caps the coefficient block at
#: Lmax * R * 128 * 4B = 2 MB so double-buffering fits comfortably in VMEM
_LMAX = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class CmPlan:
    """Static layout plan for one (offsets, n) shape — hashable trace key."""

    offsets: Tuple[int, ...]
    n: int
    segp: int  # per-lane segment length (multiple of R)
    tiles: int  # segp // R output tiles
    H: int  # leading halo rows in Xt (multiple of R)
    xrows: int  # total Xt rows = (tiles + smax + 2) * R
    #: per group: (s, rels, idx) — X-block shift, static in-slab offsets,
    #: rows of the DIA data belonging to this group.  The group containing
    #: offset 0 is ordered LAST (the fused dot reads the center window there).
    groups: Tuple[Tuple[int, Tuple[int, ...], Tuple[int, ...]], ...]

    @property
    def n_pad(self) -> int:
        return self.segp * _LANE


@functools.lru_cache(maxsize=64)
def plan_dia_cm(offsets: Tuple[int, ...], n: int, lmax: int = _LMAX) -> CmPlan:
    segp = _round_up(max(-(-n // _LANE), 1), _R)
    tiles = segp // _R
    off_min = min(offsets)
    H = _round_up(max(0, -off_min), _R)
    order = sorted(range(len(offsets)), key=lambda k: offsets[k])
    groups = []
    cur_idx: list = []
    cur_rels: list = []
    s = 0
    for k in order:
        off = offsets[k]
        if not cur_idx:
            s = (off + H) // _R
        rel = (off + H) - s * _R
        if cur_idx and (rel > 2 * _R or len(cur_idx) >= lmax):
            groups.append((s, tuple(cur_rels), tuple(cur_idx)))
            cur_idx, cur_rels = [], []
            s = (off + H) // _R
            rel = (off + H) - s * _R
        cur_idx.append(k)
        cur_rels.append(rel)
    if cur_idx:
        groups.append((s, tuple(cur_rels), tuple(cur_idx)))
    # move the 0-offset group last (fused-dot center window lives there)
    if 0 in offsets:
        zi = next(i for i, g in enumerate(groups) if 0 in (offsets[k] for k in g[2]))
        groups.append(groups.pop(zi))
    smax = max(g[0] for g in groups)
    xrows = (tiles + smax + 2) * _R
    return CmPlan(tuple(offsets), n, segp, tiles, H, xrows, tuple(groups))


def to_cm(x: jnp.ndarray, plan: CmPlan) -> jnp.ndarray:
    """Flat (n,) -> column-major (segp, 128): lane l holds x[l*segp : (l+1)*segp]."""
    xp = jnp.pad(x.reshape(-1), (0, plan.n_pad - plan.n))
    return xp.reshape(_LANE, plan.segp).T


def from_cm(y: jnp.ndarray, plan: CmPlan) -> jnp.ndarray:
    """Column-major (segp, 128) -> flat (n,)."""
    return y.T.reshape(-1)[: plan.n]


def expand_cm(v: jnp.ndarray, plan: CmPlan) -> jnp.ndarray:
    """Halo'd expansion: Xt[r, l] = x[l*segp + r - H] (0 outside [0, n_pad)).

    Values from neighbouring segments are lane-shifted copies of ``v``:
    rows [H + d*segp, H + (d+1)*segp) of Xt equal ``v`` shifted d lanes.
    A concat of cropped shifted copies — O(n * xrows/segp) total, one cheap
    pass vs the O(ndiags * n) coefficient stream.
    """
    segp, H, xrows = plan.segp, plan.H, plan.xrows

    def shifted(d: int) -> jnp.ndarray:
        if d == 0:
            return v
        if d > 0:
            if d >= _LANE:
                return jnp.zeros_like(v)
            return jnp.pad(v[:, d:], ((0, 0), (0, d)))
        d = -d
        if d >= _LANE:
            return jnp.zeros_like(v)
        return jnp.pad(v[:, :-d], ((0, 0), (d, 0)))

    parts = []
    d = (-H) // segp  # floor((0 - H) / segp)
    row = 0
    while row < xrows:
        lo = H + d * segp  # Xt row where this shifted copy starts
        rho_lo = row - lo
        rho_hi = min(segp, xrows - lo)
        parts.append(shifted(d)[rho_lo:rho_hi])
        row = lo + rho_hi
        d += 1
    return jnp.concatenate(parts, axis=0)


def dia_data_cm(A: DiaMatrix, plan: CmPlan, dtype) -> Tuple[jnp.ndarray, ...]:
    """Per-group coefficient blocks, column-major: Dg[k][r, l] = data[idx_k,
    l*segp + r].  Depends only on A — hoisted out of solver loops by XLA."""
    data = jnp.asarray(A.data, dtype)
    dp = jnp.pad(data, ((0, 0), (0, plan.n_pad - plan.n)))
    dt = dp.reshape(len(plan.offsets), _LANE, plan.segp).transpose(0, 2, 1)
    return tuple(dt[jnp.asarray(idx)] for (_, _, idx) in plan.groups)


def _cm_kernel(*refs, rels, has_yin: bool, fused: bool, center_rel: int, acc_dtype):
    x0, x1, x2, d = refs[:4]
    slab = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)  # (3R, 128)
    # mixed precision: bf16 STREAMS (the HBM traffic), acc_dtype (fp32) math —
    # the casts are per-block register converts, free next to the FMAs
    slab = slab.astype(acc_dtype)
    acc = None
    for k, rel in enumerate(rels):
        w = jax.lax.slice(slab, (rel, 0), (rel + _R, _LANE))
        t = d[k].astype(acc_dtype) * w
        acc = t if acc is None else acc + t
    pos = 4
    if has_yin:
        acc = acc + refs[pos][...]
        pos += 1
    y_out = refs[pos]
    y_out[...] = acc
    if fused:
        # per-program (8, 128) partial block of p.Ap — VMEM-blocked so the
        # grid stays provably parallel (an unblocked SMEM partials buffer
        # measured ~3% slower: Mosaic must schedule it conservatively)
        part = refs[pos + 1]
        center = jax.lax.slice(slab, (center_rel, 0), (center_rel + _R, _LANE))
        prod = acc * center
        part[0] = jnp.sum(prod.reshape(_R // 8, 8, _LANE), axis=0)


@functools.partial(
    jax.jit, static_argnames=("plan", "gi", "has_yin", "fused", "interpret")
)
def _group_spmv(Xt, Dg, y_in, plan: CmPlan, gi: int, has_yin: bool, fused: bool, interpret: bool):
    s, rels, idx = plan.groups[gi]
    L = len(idx)
    tiles = plan.tiles
    acc_dtype = jnp.result_type(Dg.dtype, Xt.dtype)
    if acc_dtype == jnp.bfloat16:
        acc_dtype = jnp.dtype(jnp.float32)
    # center window = the off=0 slice; in [0, 2R] by group construction
    center_rel = plan.H - s * _R if fused else 0

    def xspec(k):
        return pl.BlockSpec(
            (_R, _LANE), lambda i, k=k: (i + s + k, 0), memory_space=pltpu.VMEM
        )

    in_specs = [xspec(0), xspec(1), xspec(2)]
    in_specs.append(
        pl.BlockSpec((L, _R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    )
    args = [Xt, Xt, Xt, Dg]
    aliases = {}
    if has_yin:
        in_specs.append(
            pl.BlockSpec((_R, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        args.append(y_in)
        aliases = {4: 0}
    out_shape = [jax.ShapeDtypeStruct((plan.segp, _LANE), acc_dtype)]
    out_specs = [pl.BlockSpec((_R, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if fused:
        out_shape.append(jax.ShapeDtypeStruct((tiles, 8, _LANE), acc_dtype))
        out_specs.append(
            pl.BlockSpec((1, 8, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(
            _cm_kernel, rels=rels, has_yin=has_yin, fused=fused,
            center_rel=center_rel, acc_dtype=acc_dtype,
        ),
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    return out


def _should_interpret() -> bool:
    """Pallas TPU kernels only compile for TPU; interpret elsewhere (tests run
    on the virtual CPU mesh — same numerics, interpreted)."""
    return jax.default_backend() != "tpu"


def _run_groups(A: DiaMatrix, x, interpret, fused: bool):
    plan = plan_dia_cm(tuple(A.offsets), A.n)
    if interpret is None:
        interpret = _should_interpret()
    # streams keep their ORIGINAL dtypes (a bf16 matrix rides HBM at half
    # width); the kernel casts per-block to the fp32 accumulator, which is
    # exact for float widening — results are identical to host upcasting.
    # The RETURNED dtype is the usual promotion result (bf16 in -> bf16 out,
    # rounded once from the fp32 accumulator), so Krylov loops that carry
    # bf16 state through this operator keep a stable while_loop carry.
    d_dtype = jax.dtypes.canonicalize_dtype(A.data.dtype)
    Dgs = dia_data_cm(A, plan, d_dtype)
    v = to_cm(jnp.asarray(x), plan)
    Xt = expand_cm(v, plan)
    out_dtype = jnp.result_type(d_dtype, v.dtype)
    y = None
    part = None
    ng = len(plan.groups)
    for gi in range(ng):
        is_last = gi == ng - 1
        out = _group_spmv(
            Xt,
            Dgs[gi],
            y if gi else None,
            plan,
            gi,
            has_yin=gi > 0,
            fused=fused and is_last,
            interpret=interpret,
        )
        if fused and is_last:
            y, part = out
        else:
            y = out
    if part is not None:
        part = part.astype(out_dtype)
    return plan, y.astype(out_dtype), part


def spmv_dia_pallas(
    A: DiaMatrix, x: jnp.ndarray, tile: int | None = None, interpret: Optional[bool] = None
) -> jnp.ndarray:
    """y = A @ x via the column-major Pallas kernel (any n — x streams
    through blocked specs; the round-1 VMEM cap and its silent XLA fallback
    are gone).  ``tile`` is accepted for back-compat and ignored (the block
    geometry is fixed at the measured-optimal (128, 128))."""
    plan, y, _ = _run_groups(A, x, interpret, fused=False)
    return from_cm(y, plan)


def spmv_dot_dia_pallas(
    A: DiaMatrix, p: jnp.ndarray, tile: int | None = None, interpret: Optional[bool] = None
):
    """Fused ``(Ap, p . Ap)`` — the dot rides the final diagonal-group pass
    (its y block and center window are already in VMEM), so one matrix pass
    serves both.  Exact with padding: tail rows of Ap are zero (zero
    coefficients) and multiply zero-padded p entries."""
    if 0 not in tuple(A.offsets):
        y = spmv_dia_pallas(A, p, interpret=interpret)
        return y, jnp.vdot(jnp.asarray(p, y.dtype), y)
    plan, y, part = _run_groups(A, p, interpret, fused=True)
    return from_cm(y, plan), jnp.sum(part)


def cm_apply(A: DiaMatrix, v: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Traced-friendly column-major apply: y_cm = A @ v_cm, both (segp, 128).

    ``A`` may be a traced pytree argument (offsets/shape are static
    metadata, so the plan is a trace-time constant); the coefficient
    re-layout ``dia_data_cm`` depends only on ``A`` and is hoisted out of
    solver loops by XLA.
    """
    plan = plan_dia_cm(tuple(A.offsets), A.n)
    itp = _should_interpret() if interpret is None else interpret
    d_dtype = jax.dtypes.canonicalize_dtype(A.data.dtype)
    Dgs = dia_data_cm(A, plan, d_dtype)
    Xt = expand_cm(v, plan)
    y = None
    for gi in range(len(plan.groups)):
        y = _group_spmv(
            Xt, Dgs[gi], y, plan, gi, has_yin=gi > 0, fused=False, interpret=itp
        )
    # stable carry dtype for Krylov loops over this operator (see _run_groups)
    return y.astype(jnp.result_type(d_dtype, v.dtype))


def make_cm_operator(A: DiaMatrix, interpret: Optional[bool] = None):
    """(op, to_cm, from_cm) keeping CG state column-major end-to-end.

    ``op`` maps (segp, 128) -> (segp, 128); dots/axpys in the solver stack
    are shape-agnostic, so passing ``to_cm(b)`` / ``to_cm(x0)`` into
    ``cg_solve`` with this operator avoids the per-iteration layout
    round-trip entirely (layout conversion happens twice per SOLVE, not
    twice per SpMV)."""
    plan = plan_dia_cm(tuple(A.offsets), A.n)
    op = functools.partial(cm_apply, A, interpret=interpret)
    return op, functools.partial(to_cm, plan=plan), functools.partial(from_cm, plan=plan)


# ---------------------------------------------------------------------------
# Multi-RHS: one coefficient stream serves k right-hand sides.  The matrix
# block (up to 2 MB/group) is read ONCE per program while k (R, 128) x-slabs
# ride beside it, so the dominant HBM traffic drops k-fold versus k single
# SpMVs — the Pallas twin of ops/spmm.py's stencil SpMM and the reason
# cg_solve_multi(use_pallas=True) exists for flat banded systems.
# Measured (band-160 |sin|, n=414,720, k=8, fp32, on chip): 711 us vs
# 2675 us for 8 sequential single-RHS kernel passes — 3.8x at 1485
# useful-GFLOP/s.  The gap to the ideal 8x is slab+y re-streaming per
# diagonal GROUP (the k slabs ride past once per group): fatter groups
# (_LMAX_MULTI = 48 vs 32; 64 exceeds the 16 MB scoped-VMEM limit) cut
# groups 5 -> 4 and bought 13% — the remaining traffic model
# (matrix + groups*3k slabs + 2(groups-1)k y) puts the kernel at the HBM
# roofline (artifacts/spmm_multirhs_r02.json, scripts/spmm_multirhs_bench.py).
# The obvious next step — ONE call with a sequential group grid dimension and
# the y block revisited in VMEM — measured 2.2x SLOWER (the sequential dim
# defeats the pipeliner); see scripts/spmm_acc_experiment.py for the
# reproducible negative result (artifacts/spmm_acc_experiment_r02.json).
# ---------------------------------------------------------------------------


#: max diagonals per group for the multi-RHS kernel: the k x-slabs re-stream
#: once per GROUP, so fewer/fatter groups cut the dominant overhead (the
#: coefficient block grows to lmax * R * 128 * 4B = 3 MB — still
#: double-buffered beside the k slabs)
_LMAX_MULTI = 48


def plan_dia_cm_multi(offsets: Tuple[int, ...], n: int) -> CmPlan:
    """The multi-RHS plan: identical layout (segp/H), fatter diagonal groups."""
    return plan_dia_cm(offsets, n, lmax=_LMAX_MULTI)


def to_cm_multi(X: jnp.ndarray, plan: CmPlan) -> jnp.ndarray:
    """(n, k) columns -> (k, segp, 128) stacked column-major views."""
    return jax.vmap(lambda col: to_cm(col, plan), in_axes=1, out_axes=0)(X)


def from_cm_multi(Y: jnp.ndarray, plan: CmPlan) -> jnp.ndarray:
    """(k, segp, 128) -> (n, k)."""
    return jax.vmap(lambda y: from_cm(y, plan), in_axes=0, out_axes=1)(Y)


def _cm_kernel_multi(*refs, rels, has_yin: bool, k: int, acc_dtype):
    x0, x1, x2, d = refs[:4]
    slab = jnp.concatenate([x0[...], x1[...], x2[...]], axis=1)  # (k, 3R, 128)
    slab = slab.astype(acc_dtype)
    acc = None
    for j, rel in enumerate(rels):
        w = jax.lax.slice(slab, (0, rel, 0), (k, rel + _R, _LANE))  # (k, R, 128)
        t = d[j][None].astype(acc_dtype) * w  # coefficients broadcast over RHS
        acc = t if acc is None else acc + t
    pos = 4
    if has_yin:
        acc = acc + refs[pos][...]
        pos += 1
    refs[pos][...] = acc


@functools.partial(jax.jit, static_argnames=("plan", "gi", "has_yin", "interpret"))
def _group_spmm(Xt, Dg, y_in, plan: CmPlan, gi: int, has_yin: bool, interpret: bool):
    s, rels, idx = plan.groups[gi]
    L = len(idx)
    k = Xt.shape[0]
    tiles = plan.tiles
    acc_dtype = jnp.result_type(Dg.dtype, Xt.dtype)
    if acc_dtype == jnp.bfloat16:
        acc_dtype = jnp.dtype(jnp.float32)

    def xspec(f):
        return pl.BlockSpec(
            (k, _R, _LANE), lambda i, f=f: (0, i + s + f, 0), memory_space=pltpu.VMEM
        )

    in_specs = [xspec(0), xspec(1), xspec(2)]
    in_specs.append(
        pl.BlockSpec((L, _R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    )
    args = [Xt, Xt, Xt, Dg]
    aliases = {}
    if has_yin:
        in_specs.append(
            pl.BlockSpec((k, _R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        )
        args.append(y_in)
        aliases = {4: 0}
    out = pl.pallas_call(
        functools.partial(_cm_kernel_multi, rels=rels, has_yin=has_yin, k=k, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((k, plan.segp, _LANE), acc_dtype),
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, _R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    return out


def cm_apply_multi(A: DiaMatrix, V: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Column-major multi-RHS apply: (k, segp, 128) -> (k, segp, 128), one
    coefficient stream for all k columns.  Traced-friendly like ``cm_apply``."""
    plan = plan_dia_cm_multi(tuple(A.offsets), A.n)
    itp = _should_interpret() if interpret is None else interpret
    d_dtype = jax.dtypes.canonicalize_dtype(A.data.dtype)
    Dgs = dia_data_cm(A, plan, d_dtype)
    Xt = jax.vmap(lambda v: expand_cm(v, plan))(V)
    y = None
    for gi in range(len(plan.groups)):
        y = _group_spmm(Xt, Dgs[gi], y, plan, gi, has_yin=gi > 0, interpret=itp)
    # stable carry dtype for block-Krylov loops over this operator
    return y.astype(jnp.result_type(d_dtype, V.dtype))


def spmm_dia_pallas(A: DiaMatrix, X: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Y = A @ X for (n, k) right-hand sides via the multi-RHS column-major
    kernel (k-fold amortisation of the matrix stream)."""
    plan = plan_dia_cm_multi(tuple(A.offsets), A.n)
    return from_cm_multi(cm_apply_multi(A, to_cm_multi(X, plan), interpret), plan)


def spmv_dia_cm_xla(A: DiaMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """The same column-major formulation as ONE fused XLA expression (no
    Pallas): static sublane-slice windows over the halo'd expansion.  The
    library-path twin of the handmade kernel — benchmarked side by side."""
    plan = plan_dia_cm(tuple(A.offsets), A.n)
    dtype = jnp.result_type(A.data.dtype, x.dtype)
    data = jnp.asarray(A.data, dtype)
    dp = jnp.pad(data, ((0, 0), (0, plan.n_pad - plan.n)))
    dt = dp.reshape(len(plan.offsets), _LANE, plan.segp).transpose(0, 2, 1)
    Xt = expand_cm(to_cm(jnp.asarray(x, dtype), plan), plan)
    y = None
    for k, off in enumerate(plan.offsets):
        w = jax.lax.slice(Xt, (off + plan.H, 0), (off + plan.H + plan.segp, _LANE))
        t = dt[k] * w
        y = t if y is None else y + t
    return from_cm(y, plan)


# ---------------------------------------------------------------------------
# CSR / ELL entry points (SURVEY §7 layer 2: "Pallas CSR/ELL SpMV ...
# N11 equivalent, Mgcg.cl:171-216").  The reference's handmade ELL kernel
# assumes a BOUNDED vector window per work-group (local memory tile of
# [groupStart - buffer, groupEnd + buffer], buffer = MaxNonzeroCountPerRow/2)
# — i.e. bounded bandwidth.  A bounded-band ELL/CSR matrix IS a DIA matrix
# in disguise (B[r, w] = A[r, r - h + w] — the DIA data array transposed),
# and arbitrary-index gathers are exactly what the MXU/VPU cannot do well.
# So the TPU-native answer is a SETUP-TIME relayout to DIA and the shared
# column-major kernel: same windows, zero gathers, measured at the HBM
# roofline.  Conversion is host-side numpy, done once per matrix (cached on
# the operator), never in the iteration path.
# ---------------------------------------------------------------------------


def _dia_of(A) -> DiaMatrix:
    from conjugategradient_tpu.core.formats import CsrMatrix, EllMatrix, csr_to_dia, ell_to_csr

    if isinstance(A, DiaMatrix):
        return A
    if isinstance(A, EllMatrix):
        return csr_to_dia(ell_to_csr(A))
    if isinstance(A, CsrMatrix):
        return csr_to_dia(A)
    raise TypeError(f"no Pallas DIA relayout for {type(A)}")


def make_pallas_operator(A, interpret: Optional[bool] = None):
    """x -> A @ x through the column-major Pallas kernel, for DIA, ELL or
    CSR inputs (ELL/CSR relayout to DIA once, at setup).  Requires concrete
    (non-traced) data for the relayout — call outside jit, use the returned
    operator inside."""
    import numpy as np

    Ad = _dia_of(A)
    if isinstance(Ad.data, np.ndarray):
        Ad = Ad.device_put()
    return functools.partial(spmv_dia_pallas, Ad, interpret=interpret)


def spmv_ell_pallas(A, x, interpret: Optional[bool] = None):
    """ELL SpMV via the Pallas kernel (setup-time ELL->DIA relayout; see
    module note — bounded-band ELL is DIA in disguise)."""
    return make_pallas_operator(A, interpret=interpret)(x)


def spmv_csr_pallas(A, x, interpret: Optional[bool] = None):
    """CSR SpMV via the Pallas kernel (setup-time CSR->DIA relayout)."""
    return make_pallas_operator(A, interpret=interpret)(x)
