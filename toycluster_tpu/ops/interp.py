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


def linear_eval(xs, ys, xq):
    """jnp.interp twin kept for cheap monotone tables."""
    return jnp.interp(xq, xs, ys)
