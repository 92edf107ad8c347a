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

import jax
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


def dot2(a: jnp.ndarray, b: jnp.ndarray):
    """Compensated inner product, fully vectorized (see module docstring)."""
    p, e = two_prod(a, b)
    return jnp.sum(p) + jnp.sum(e)


def kahan_sum(x: jnp.ndarray):
    """Neumaier-compensated sum via a scan over lane-width chunks.

    Exact-leaning but *sequential* in n/chunk — use for modest n or when the
    compensation itself must be error-free; the solver hot path uses ``dot2``.
    """
    x = x.reshape(-1)
    n = x.shape[0]
    chunk = 2048
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, (0, pad))
    parts = x.reshape(-1, chunk).sum(axis=1)

    def step(carry, p):
        s, c = carry
        s2, e = _two_sum(s, p)
        return (s2, c + e), None

    (s, c), _ = jax.lax.scan(step, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)), parts)
    return s + c


def kahan_dot(a: jnp.ndarray, b: jnp.ndarray):
    """Compensated inner product — alias for ``dot2`` (the vectorized
    error-free-transform formulation; the name is kept for API continuity)."""
    return dot2(a, b)


def promote_dot(a: jnp.ndarray, b: jnp.ndarray, dtype=jnp.float32):
    """Dot with explicit accumulation dtype (e.g. bf16 storage, fp32 accum)."""
    return jnp.vdot(a.astype(dtype), b.astype(dtype), preferred_element_type=dtype)
