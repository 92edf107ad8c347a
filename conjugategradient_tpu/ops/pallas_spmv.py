"""Hand-written Pallas TPU kernels for banded (DIA) SpMV.

The analogue of the reference's handmade OpenCL SpMV
(``Mgcg/HandmadeCL/MgcgCL/Mgcg.cl:171-216``), which tiles a
``[groupStart - buffer, groupEnd + buffer]`` window of the vector into local
memory per work-group and accumulates over the row's nonzeros.  On TPU the
same two-level structure becomes: the *grid* walks row blocks, each program
holding its ``(ndiags, TILE)`` slab of diagonal data in VMEM plus one
*aligned* ``TILE + 2*halo_pad`` window of the (zero-padded) vector, and the
inner accumulation is a static unrolled sum of shifted element-wise products
on the VPU — zero gathers, the whole benefit of DIA storage.

Alignment design (the part Mosaic forces): TPU vector loads must start at a
lane-aligned (multiple-of-128) address, but diagonal shifts are ±1, ±nx, … —
arbitrary.  So the kernel loads one aligned slab per row block
(``halo_pad = round_up(bandwidth, 128)`` zeros pre-padded on the host) and
realises each diagonal's shift as a *static* sub-vector slice of the loaded
slab — static shifts lower to cheap lane rotations in registers, no memory
traffic.  The kernel is shape-specialised at trace time on
``(offsets, n, TILE, dtype)`` — the moral equivalent of the reference baking
``-D REAL= -D MAX_NONZERO_COUNT=`` into its OpenCL build
(``ConjugateGradientSingleGpu.cs:160-166``).

The full padded vector lives in VMEM (fits to ~2-3M fp32 on a 16 MB core);
``spmv_dia_pallas`` falls back to the XLA path above that budget (the sharded
solvers keep per-shard vectors VMEM-sized by construction).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conjugategradient_tpu.core.formats import DiaMatrix

_LANE = 128
#: above this many fp32 elements the padded vector no longer comfortably fits
#: VMEM next to a data slab; fall back to the XLA path.
VMEM_X_ELEMS = 2_500_000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dia_kernel(x_ref, data_ref, o_ref, *, offsets: Tuple[int, ...], halo_pad: int, tile: int):
    """One row block: o[t] = sum_k data[k, t] * x[base + t + off_k].

    ``x_ref`` holds the full vector pre-padded with ``halo_pad`` zeros on the
    left (so global x[j] sits at column ``halo_pad + j``); one aligned dynamic
    load per program, static in-register shifts per diagonal.
    """
    i = pl.program_id(0)
    start = pl.multiple_of(i * tile, _LANE)
    slab = x_ref[:, pl.ds(start, tile + 2 * halo_pad)]  # (1, tile + 2*halo_pad)
    acc = data_ref[0:1, :] * jax.lax.slice(
        slab, (0, halo_pad + offsets[0]), (1, halo_pad + offsets[0] + tile)
    )
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[k : k + 1, :] * jax.lax.slice(
            slab, (0, halo_pad + off), (1, halo_pad + off + tile)
        )
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n", "tile", "halo_pad", "interpret"))
def _spmv_dia_padded(data_pad, x_pad, offsets: Tuple[int, ...], n: int, tile: int, halo_pad: int, interpret: bool):
    """data_pad: (ndiags, n_pad); x_pad: (1, n_pad + 2*halo_pad) with halo_pad
    zeros on both ends; returns y (n,)."""
    ndiags = len(offsets)
    n_pad = data_pad.shape[1]
    grid = (n_pad // tile,)
    y = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, halo_pad=halo_pad, tile=tile),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), data_pad.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x
            pl.BlockSpec((ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, data_pad)
    return y[0, :n]


def _should_interpret() -> bool:
    """Pallas TPU kernels only compile for TPU; interpret elsewhere (tests run
    on the virtual CPU mesh — same numerics, interpreted)."""
    return jax.default_backend() != "tpu"


def _prepare(A: DiaMatrix, x, tile: int):
    if tile % _LANE:
        raise ValueError(f"tile must be a multiple of {_LANE}")
    n = A.n
    halo_pad = _round_up(max(A.bandwidth, 1), _LANE)
    n_pad = _round_up(max(n, tile), tile)
    dtype = jnp.result_type(A.data.dtype, x.dtype)
    data = jnp.asarray(A.data, dtype)
    x = jnp.asarray(x, dtype)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    # halo_pad zeros both ends; tail padding beyond n is zero in data, so
    # reads into [n, n_pad + halo_pad) contribute nothing.
    x_pad = jnp.pad(x, (halo_pad, n_pad - n + halo_pad)).reshape(1, -1)
    return data_pad, x_pad, n, n_pad, halo_pad


def spmv_dia_pallas(A: DiaMatrix, x: jnp.ndarray, tile: int = 512, interpret: bool | None = None) -> jnp.ndarray:
    """y = A @ x via the Pallas row-block kernel (XLA fallback above the VMEM
    budget)."""
    if A.n > VMEM_X_ELEMS:
        from conjugategradient_tpu.ops.spmv import spmv_dia

        return spmv_dia(A, x)
    data_pad, x_pad, n, n_pad, halo_pad = _prepare(A, x, tile)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dia_padded(data_pad, x_pad, A.offsets, n, tile, halo_pad, interpret)


# ---------------------------------------------------------------------------
# Fused DIA SpMV + dot:  (Ap, p.Ap) in one pass — the CG hot pair.
# ---------------------------------------------------------------------------


def _dia_dot_kernel(x_ref, data_ref, o_ref, acc_ref, *, offsets, halo_pad, tile):
    """Same row-block SpMV, plus a running scalar accumulation of p . Ap.

    The partial dot accumulates across the (sequential on TPU) grid into a
    (1, 1) SMEM cell — the reference needed a separate multi-pass reduction
    kernel chain for every dot (``Mgcg.cl:53-102``); here it rides the SpMV's
    data pass for free.
    """
    i = pl.program_id(0)
    start = pl.multiple_of(i * tile, _LANE)
    slab = x_ref[:, pl.ds(start, tile + 2 * halo_pad)]
    acc = data_ref[0:1, :] * jax.lax.slice(
        slab, (0, halo_pad + offsets[0]), (1, halo_pad + offsets[0] + tile)
    )
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[k : k + 1, :] * jax.lax.slice(
            slab, (0, halo_pad + off), (1, halo_pad + off + tile)
        )
    o_ref[:, :] = acc

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

    center = jax.lax.slice(slab, (0, halo_pad), (1, halo_pad + tile))
    acc_ref[0, 0] += jnp.sum(acc * center)


@functools.partial(jax.jit, static_argnames=("offsets", "n", "tile", "halo_pad", "interpret"))
def _spmv_dot_dia_padded(data_pad, x_pad, offsets, n: int, tile: int, halo_pad: int, interpret: bool):
    ndiags = len(offsets)
    n_pad = data_pad.shape[1]
    grid = (n_pad // tile,)
    y, pAp = pl.pallas_call(
        functools.partial(_dia_dot_kernel, offsets=offsets, halo_pad=halo_pad, tile=tile),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), data_pad.dtype),
            jax.ShapeDtypeStruct((1, 1), data_pad.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiags, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(x_pad, data_pad)
    return y[0, :n], pAp[0, 0]


def spmv_dot_dia_pallas(A: DiaMatrix, p: jnp.ndarray, tile: int = 512, interpret: bool | None = None):
    """Fused ``(Ap, p.Ap)`` — one HBM pass over the matrix data instead of two.

    p.Ap is exact even with padding: tail rows of Ap are zero (zero data) and
    multiply zero-padded p entries.
    """
    if A.n > VMEM_X_ELEMS:
        from conjugategradient_tpu.ops.spmv import spmv_dia

        y = spmv_dia(A, p)
        return y, jnp.dot(p, y, preferred_element_type=y.dtype)
    data_pad, x_pad, n, n_pad, halo_pad = _prepare(A, p, tile)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dot_dia_padded(data_pad, x_pad, A.offsets, n, tile, halo_pad, interpret)
