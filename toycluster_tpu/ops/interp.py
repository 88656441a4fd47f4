"""Device-side spline/table interpolation (jnp).

Tables are built host-side in float64 (utils/splines.py) and shipped to the
device as a `SplineTable` pytree; evaluation uses searchsorted + the natural
cubic spline formula, vectorised over query arrays, replacing the
per-particle gsl_spline_eval calls of the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SplineTable(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    m2: jnp.ndarray

    @classmethod
    def from_host(cls, spline, dtype=jnp.float32) -> "SplineTable":
        return cls(x=jnp.asarray(np.asarray(spline.x), dtype),
                   y=jnp.asarray(np.asarray(spline.y), dtype),
                   m2=jnp.asarray(np.asarray(spline.m2), dtype))


def spline_eval(table: SplineTable, xq):
    """Natural-cubic-spline evaluation, clamped to the knot span."""
    x, y, m2 = table
    i = jnp.clip(jnp.searchsorted(x, xq) - 1, 0, x.shape[0] - 2)
    h = x[i + 1] - x[i]
    A = (x[i + 1] - xq) / h
    B = 1.0 - A
    return (A * y[i] + B * y[i + 1]
            + ((A ** 3 - A) * m2[i] + (B ** 3 - B) * m2[i + 1]) * h * h / 6.0)


def flat_gather(tab, row, col):
    """tab[(row, col)] for 2-D tab with 1-D index vectors (flat gather —
    keeps XLA from materializing (n, K) intermediates)."""
    return tab.reshape(-1)[row * tab.shape[1] + col]


def batched_spline_eval(table: SplineTable, hid, xq):
    """spline_eval against per-halo knot rows: table fields are (H, K),
    hid/xq are (n,).  Manual bisection with flat gathers replaces
    searchsorted (which cannot index a different row per query)."""
    x, y, m2 = table
    k = x.shape[1]
    lo = jnp.zeros_like(hid)
    hi = jnp.full_like(hid, k - 1)
    for _ in range(10):  # 2^10 >= NTABLE
        mid = (lo + hi) // 2
        go_hi = xq >= flat_gather(x, hid, mid)
        lo = jnp.where(go_hi, mid, lo)
        hi = jnp.where(go_hi, hi, mid)
    i = jnp.clip(lo, 0, k - 2)
    x0 = flat_gather(x, hid, i)
    x1 = flat_gather(x, hid, i + 1)
    h = x1 - x0
    A = jnp.clip((x1 - xq) / h, 0.0, 1.0)  # clamp to knot span
    B = 1.0 - A
    return (A * flat_gather(y, hid, i) + B * flat_gather(y, hid, i + 1)
            + ((A ** 3 - A) * flat_gather(m2, hid, i)
               + (B ** 3 - B) * flat_gather(m2, hid, i + 1)) * h * h / 6.0)


def linear_eval(xs, ys, xq):
    """jnp.interp twin kept for cheap monotone tables."""
    return jnp.interp(xq, xs, ys)
