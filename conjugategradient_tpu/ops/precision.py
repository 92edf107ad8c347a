"""Extended-precision reductions for fp64-less TPU cores.

The reference is fp64 end-to-end (CUDA ``double``, OpenCL ``-D REAL=double``).
TPU vector units have no native fp64, so reaching the reference's tolerances
in fp32 storage needs compensated arithmetic on the *reductions* (dots are
where CG loses accuracy; the axpy updates are benign).

Two tools, both fully vectorized (no sequential scans — a lesson measured on
chip: a lane-serial compensation loop costs ~1 ms per dot at n=1M, turning
the entire CG iteration into dot-bound):

- ``dot2``     — error-free transformed dot: Dekker-split TwoProduct per
  element (captures every product rounding error exactly), then two tree
  sums.  Error ~ tree-sum error (O(log n * eps)) instead of the naive
  O(sqrt(n) * eps) random walk.  ~3x the FLOPs of a plain dot, same memory
  traffic, all VPU-parallel.
- ``kahan_sum`` — Neumaier-compensated sequential combine over wide chunk
  partials, for small-count host-style exact sums (not the hot path).
"""

from __future__ import annotations

import jax.numpy as jnp

#: Dekker split factors: 2^ceil(m/2) + 1 for an m-bit mantissa.
_SPLIT = {jnp.dtype(jnp.float32): 4097.0, jnp.dtype(jnp.float64): 134217729.0}


def _split(a):
    f = _SPLIT.get(jnp.dtype(a.dtype), 4097.0)
    c = a * f
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: a*b = p + e exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def dd_sum(p: jnp.ndarray, e: jnp.ndarray | None = None):
    """Double-float (hi, lo) binary-tree sum — vectorized, log2(n) steps.

    Maintains a compensated (s, c) pair through a halving tree: every level is
    one vectorized TwoSum over the full remaining width, so the whole
    reduction is ~4n element ops with error O(n * eps^2) — fp64-grade
    accuracy from fp32 lanes, with no sequential scan.
    """
    s = p.reshape(-1)
    c = jnp.zeros_like(s) if e is None else e.reshape(-1)
    while s.shape[0] > 1:
        m = s.shape[0]
        if m % 2:
            s = jnp.pad(s, (0, 1))
            c = jnp.pad(c, (0, 1))
            m += 1
        s2 = s.reshape(m // 2, 2)
        c2 = c.reshape(m // 2, 2)
        t, err = _two_sum(s2[:, 0], s2[:, 1])
        s = t
        c = c2[:, 0] + c2[:, 1] + err
    return s[0] + c[0]


def dot2(a: jnp.ndarray, b: jnp.ndarray):
    """Compensated inner product for the solver hot path: error-free products,
    plain tree accumulation of (p, e).  One fused pass, ~3x a naive dot,
    error ~ tree-sum error — ample for recurrence dots (ultimate accuracy is
    the iterative-refinement outer loop's job, ``solvers/refine.py``)."""
    p, e = two_prod(a, b)
    return jnp.sum(p) + jnp.sum(e)


def dd_dot(a: jnp.ndarray, b: jnp.ndarray):
    """Near-fp64 inner product: error-free products + double-float tree
    accumulation (error O(n * eps^2)).  ~2x dot2's cost; use when the dot
    itself is the deliverable (norm reporting, validation)."""
    p, e = two_prod(a, b)
    return dd_sum(p, e)


def kahan_sum(x: jnp.ndarray):
    """Compensated sum — delegates to the ``dd_sum`` tree (every pairwise add
    is an error-free TwoSum, so large/small cancellation survives exactly;
    strictly more accurate than chunked Neumaier and fully parallel)."""
    return dd_sum(x)


def kahan_dot(a: jnp.ndarray, b: jnp.ndarray):
    """Compensated inner product — alias for ``dot2`` (the vectorized
    error-free-transform formulation; the name is kept for API continuity)."""
    return dot2(a, b)


def promote_dot(a: jnp.ndarray, b: jnp.ndarray, dtype=jnp.float32):
    """Dot with explicit accumulation dtype (e.g. bf16 storage, fp32 accum)."""
    return jnp.vdot(a.astype(dtype), b.astype(dtype), preferred_element_type=dtype)
