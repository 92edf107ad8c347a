"""Hand-written Pallas TPU kernels for banded (DIA) SpMV.

The analogue of the reference's handmade OpenCL SpMV
(``Mgcg/HandmadeCL/MgcgCL/Mgcg.cl:171-216``), which tiles a
``[groupStart - buffer, groupEnd + buffer]`` window of the vector into local
memory per work-group and accumulates over the row's nonzeros.  On TPU the
same two-level structure becomes: the *grid* walks row blocks, each program
holding its ``(ndiags, TILE)`` slab of diagonal data in VMEM plus the matching
``TILE + 2*bandwidth`` window of the (zero-padded) vector, and the inner
accumulation is a static unrolled sum of shifted element-wise products on the
VPU — zero gathers, the whole benefit of DIA storage.

Layout note: TPU vector registers are (8, 128) lanes, so all 1-D vectors are
processed as ``(1, n)`` 2-D arrays and tiles are lane-aligned (TILE % 128 == 0).
The dynamic window starts ``base + off`` are *not* 128-aligned for arbitrary
diagonal offsets — that unaligned read is the price of the shifted-window
formulation and is still far cheaper than a gather.

The kernel is shape-specialised at trace time on ``(offsets, n, TILE, dtype)``
— the moral equivalent of the reference baking ``-D REAL= -D
MAX_NONZERO_COUNT=`` into its OpenCL build
(``Mgcg/HandmadeCL/MgcgCL/ConjugateGradientSingleGpu.cs:160-166``).
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dia_kernel(x_ref, data_ref, o_ref, *, offsets: Tuple[int, ...], halo: int, tile: int):
    """One row block: o[t] = sum_k data[k, t] * x[base + t + off_k].

    ``x_ref`` is the full zero-padded vector (1, n_pad + 2*halo) resident in
    VMEM; ``data_ref`` is this block's (ndiags, tile) slab; ``o_ref`` (1, tile).
    """
    i = pl.program_id(0)
    base = i * tile + halo
    acc = data_ref[0, :] * x_ref[0, pl.ds(base + offsets[0], tile)]
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[k, :] * x_ref[0, pl.ds(base + off, tile)]
    o_ref[0, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "n", "tile", "interpret"))
def _spmv_dia_padded(data_pad, x_pad, offsets: Tuple[int, ...], n: int, tile: int, interpret: bool):
    """data_pad: (ndiags, n_pad); x_pad: (1, n_pad + 2*halo) with halo zeros on
    both ends; returns y (n,)."""
    ndiags = len(offsets)
    halo = max(abs(o) for o in offsets) if offsets else 0
    n_pad = data_pad.shape[1]
    grid = (n_pad // tile,)
    y = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, halo=halo, tile=tile),
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


def spmv_dia_pallas(A: DiaMatrix, x: jnp.ndarray, tile: int = 512, interpret: bool | None = None) -> jnp.ndarray:
    """y = A @ x via the Pallas row-block kernel.

    Falls back to interpret mode off-TPU.  ``tile`` must be lane-aligned; the
    vector (padded) must fit in VMEM alongside one data slab — for larger
    systems use the sharded path, which keeps per-shard vectors VMEM-sized.
    """
    if tile % _LANE:
        raise ValueError(f"tile must be a multiple of {_LANE}")
    n = A.n
    halo = A.bandwidth
    n_pad = _round_up(max(n, tile), tile)
    dtype = jnp.result_type(A.data.dtype, x.dtype)
    data = jnp.asarray(A.data, dtype)
    x = jnp.asarray(x, dtype)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    # halo zeros both ends; tail padding beyond n is zero in data, so reads
    # into [n, n_pad + halo) contribute nothing.
    x_pad = jnp.pad(x, (halo, n_pad - n + halo)).reshape(1, -1)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dia_padded(data_pad, x_pad, A.offsets, n, tile, interpret)


# ---------------------------------------------------------------------------
# Fused DIA SpMV + dot:  (Ap, p.Ap) in one pass — the CG hot pair.
# ---------------------------------------------------------------------------


def _dia_dot_kernel(x_ref, data_ref, o_ref, acc_ref, *, offsets, halo, tile):
    """Same row-block SpMV, plus a running scalar accumulation of p . Ap.

    The partial dot accumulates across the (sequential on TPU) grid into a
    (1, 1) SMEM cell — the reference needed a separate multi-pass reduction
    kernel chain for every dot (``Mgcg.cl:53-102``); here it rides the SpMV's
    data pass for free.
    """
    i = pl.program_id(0)
    base = i * tile + halo
    acc = data_ref[0, :] * x_ref[0, pl.ds(base + offsets[0], tile)]
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + data_ref[k, :] * x_ref[0, pl.ds(base + off, tile)]
    o_ref[0, :] = acc

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

    acc_ref[0, 0] += jnp.sum(acc * x_ref[0, pl.ds(base, tile)])


@functools.partial(jax.jit, static_argnames=("offsets", "n", "tile", "interpret"))
def _spmv_dot_dia_padded(data_pad, x_pad, offsets, n: int, tile: int, interpret: bool):
    ndiags = len(offsets)
    halo = max(abs(o) for o in offsets) if offsets else 0
    n_pad = data_pad.shape[1]
    grid = (n_pad // tile,)
    y, pAp = pl.pallas_call(
        functools.partial(_dia_dot_kernel, offsets=offsets, halo=halo, tile=tile),
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
    if tile % _LANE:
        raise ValueError(f"tile must be a multiple of {_LANE}")
    n = A.n
    halo = A.bandwidth
    n_pad = _round_up(max(n, tile), tile)
    dtype = jnp.result_type(A.data.dtype, p.dtype)
    data = jnp.asarray(A.data, dtype)
    p = jnp.asarray(p, dtype)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n)))
    x_pad = jnp.pad(p, (halo, n_pad - n + halo)).reshape(1, -1)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dot_dia_padded(data_pad, x_pad, A.offsets, n, tile, interpret)
