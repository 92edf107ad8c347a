"""Hand-written Pallas TPU kernels for banded (DIA) SpMV.

The analogue of the reference's handmade OpenCL SpMV
(``Mgcg/HandmadeCL/MgcgCL/Mgcg.cl:171-216``), which tiles a window of the
vector into local memory per work-group.  Where a *grid-structured* matrix
exists, the XLA stencil path (``ops/stencil.py``) is already at HBM roofline
and nothing hand-written can beat it; this kernel targets the case XLA
handles poorly — **flat 1-D banded matrices** (the reference's band-160
``|sin|`` family has no grid structure), where XLA's flat formulations run
~7x off roofline.

Design (all constraints measured/learned on a real v5e-class chip):

- **2-D internal layout.**  The vector is viewed as ``(rows, 128)`` lanes —
  flat 1-D layouts starve the (8, 128) vector registers.  Each program loads
  an aligned slab of ``R + 2*QP`` rows (``QP`` guard rows of zeros absorb the
  band's row reach) and the ``(ndiags, R, 128)`` coefficient block.
- **Static shifts in registers.**  A flat offset ``off = 128*a + c`` becomes:
  two *static* row slices (``a`` and ``a+1``), a lane roll by ``c``, and a
  lane-index select between them — no unaligned memory operations, which
  Mosaic rejects ("cannot statically prove index is a multiple of 128"), and
  no gathers.
- The kernel is shape-specialised at trace time on ``(offsets, n, R, dtype)``
  — the moral equivalent of the reference baking ``-D REAL= -D
  MAX_NONZERO_COUNT=`` into its OpenCL build.

The full padded vector lives in VMEM (fits to ~2-3M fp32 on a 16 MB core);
``spmv_dia_pallas`` falls back to the XLA path above that budget (sharded
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
_SUB = 8  # fp32 sublane granule
#: above this many fp32 elements the padded vector no longer comfortably fits
#: VMEM next to a coefficient block; fall back to the XLA path.
VMEM_X_ELEMS = 2_500_000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window(slab, off: int, qp: int, R: int):
    """The shifted (R, 128) window: win[r, l] = slab_flat[(qp + r)*128 + l + off]."""
    a, c = divmod(off, _LANE)
    base = qp + a
    w1 = jax.lax.slice(slab, (base, 0), (base + R, _LANE))
    if c == 0:
        return w1
    w2 = jax.lax.slice(slab, (base + 1, 0), (base + 1 + R, _LANE))
    r1 = jnp.roll(w1, -c, axis=1)
    r2 = jnp.roll(w2, -c, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    return jnp.where(lane < _LANE - c, r1, r2)


def _dia_kernel(x_ref, d_ref, o_ref, *, offsets: Tuple[int, ...], qp: int, R: int):
    i = pl.program_id(0)
    start = pl.multiple_of(i * R, _SUB)
    slab = x_ref[pl.ds(start, R + 2 * qp), :]
    acc = d_ref[0] * _window(slab, offsets[0], qp, R)
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + d_ref[k] * _window(slab, off, qp, R)
    o_ref[...] = acc


def _dia_dot_kernel(x_ref, d_ref, o_ref, part_ref, *, offsets, qp: int, R: int):
    """SpMV block plus this block's p.Ap partial — the fused CG hot pair
    (the reference needed multi-pass reduction kernel chains per dot,
    ``Mgcg.cl:53-102``; here the dot rides the SpMV's data pass).

    Each program writes its own partial slot (no cross-program SMEM
    accumulation — a serializing ``+=`` after every tile measured 2.4x slower
    than the unfused pair); the tiny (grid,) partial vector reduces outside.
    """
    i = pl.program_id(0)
    start = pl.multiple_of(i * R, _SUB)
    slab = x_ref[pl.ds(start, R + 2 * qp), :]
    acc = d_ref[0] * _window(slab, offsets[0], qp, R)
    for k, off in enumerate(offsets[1:], start=1):
        acc = acc + d_ref[k] * _window(slab, off, qp, R)
    o_ref[...] = acc
    center = jax.lax.slice(slab, (qp, 0), (qp + R, _LANE))
    part_ref[i, 0] = jnp.sum(acc * center)


def _qp_for(halo: int) -> int:
    """Guard rows: the band's row reach (±ceil(halo/128) + 1 carry row),
    rounded to the sublane granule."""
    return _round_up(halo // _LANE + 2, _SUB)


def _prepare(A: DiaMatrix, x, R: int):
    n = A.n
    qp = _qp_for(A.bandwidth)
    rows = _round_up(max(n, 1), R * _LANE) // _LANE
    n_pad = rows * _LANE
    dtype = jnp.result_type(A.data.dtype, x.dtype)
    data = jnp.asarray(A.data, dtype)
    x = jnp.asarray(x, dtype)
    data_pad = jnp.pad(data, ((0, 0), (0, n_pad - n))).reshape(A.ndiags, rows, _LANE)
    x_pad = jnp.pad(x, (qp * _LANE, n_pad - n + qp * _LANE)).reshape(rows + 2 * qp, _LANE)
    return data_pad, x_pad, n, rows, qp


@functools.partial(jax.jit, static_argnames=("offsets", "n", "R", "qp", "interpret"))
def _spmv_dia_2d(data_pad, x_pad, offsets, n: int, R: int, qp: int, interpret: bool):
    ndiags, rows, _ = data_pad.shape
    grid = (rows // R,)
    y = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=offsets, qp=qp, R=R),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), data_pad.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x (2-D view)
            pl.BlockSpec((ndiags, R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_pad, data_pad)
    return y.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("offsets", "n", "R", "qp", "interpret"))
def _spmv_dot_dia_2d(data_pad, x_pad, offsets, n: int, R: int, qp: int, interpret: bool):
    ndiags, rows, _ = data_pad.shape
    grid = (rows // R,)
    y, parts = pl.pallas_call(
        functools.partial(_dia_dot_kernel, offsets=offsets, qp=qp, R=R),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANE), data_pad.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), data_pad.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((ndiags, R, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # whole partials buffer in SMEM for every program; each writes
            # its own slot (blocked SMEM outputs are not lowerable)
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(x_pad, data_pad)
    return y.reshape(-1)[:n], jnp.sum(parts)


def _should_interpret() -> bool:
    """Pallas TPU kernels only compile for TPU; interpret elsewhere (tests run
    on the virtual CPU mesh — same numerics, interpreted)."""
    return jax.default_backend() != "tpu"


def spmv_dia_pallas(A: DiaMatrix, x: jnp.ndarray, tile: int = 1024, interpret: bool | None = None) -> jnp.ndarray:
    """y = A @ x via the Pallas row-block kernel (XLA fallback above the VMEM
    budget).  ``tile`` is the per-program element count (R = tile/128 rows)."""
    R = max(_SUB, _round_up(tile // _LANE, _SUB))
    if A.n > VMEM_X_ELEMS:
        from conjugategradient_tpu.ops.spmv import spmv_dia

        return spmv_dia(A, x)
    data_pad, x_pad, n, rows, qp = _prepare(A, x, R)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dia_2d(data_pad, x_pad, A.offsets, n, R, qp, interpret)


def spmv_dot_dia_pallas(A: DiaMatrix, p: jnp.ndarray, tile: int = 1024, interpret: bool | None = None):
    """Fused ``(Ap, p.Ap)`` — one pass over the matrix data instead of two.

    p.Ap is exact even with padding: tail rows of Ap are zero (zero
    coefficients) and multiply zero-padded p entries.
    """
    R = max(_SUB, _round_up(tile // _LANE, _SUB))
    if A.n > VMEM_X_ELEMS:
        from conjugategradient_tpu.ops.spmv import spmv_dia

        y = spmv_dia(A, p)
        return y, jnp.dot(p, y, preferred_element_type=y.dtype)
    data_pad, x_pad, n, rows, qp = _prepare(A, p, R)
    if interpret is None:
        interpret = _should_interpret()
    return _spmv_dot_dia_2d(data_pad, x_pad, A.offsets, n, R, qp, interpret)
