"""SPH smoothing kernels (jnp, branch-free).

Wendland C6 (default), cubic spline M4 (SPH_CUBIC_SPLINE), Wendland C2
(bulk-velocity taper).  Forms match the reference bit-for-bit
(sph.c:426-466, wvt_relax.c:258-294) but are written masked/vectorised:
support u = r/h < 1 enforced with a multiplicative mask so out-of-support
pairs contribute exactly zero.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const

_WC6_NORM = 1365.0 / (64.0 * const.PI)


def wc6(r, h):
    """W_WC6(r,h) with 1/h^3 normalisation (sph.c:426-432)."""
    u = r / h
    m = u < 1.0
    t = jnp.where(m, 1.0 - u, 0.0)
    t2 = t * t
    t4 = t2 * t2
    poly = 1.0 + u * (8.0 + u * (25.0 + 32.0 * u))
    return _WC6_NORM / (h * h * h) * t4 * t4 * poly


def wc6_flat(u):
    """1365/(64 pi) t^8 (1 + 8u + 25u^2 + 32u^3) — no 1/h^3 factor
    (wvt_relax.c:275-281)."""
    m = u < 1.0
    t = jnp.where(m, 1.0 - u, 0.0)
    t2 = t * t
    t4 = t2 * t2
    return _WC6_NORM * t4 * t4 * (1.0 + u * (8.0 + u * (25.0 + 32.0 * u)))


def wc6_deriv(r, h):
    """dW_WC6/dr (sph.c:434-440)."""
    u = r / h
    m = u < 1.0
    t = jnp.where(m, 1.0 - u, 0.0)
    t2 = t * t
    t3 = t2 * t
    h4 = h * h * h * h
    return (_WC6_NORM / h4 * (-22.0) * t3 * t3 * t * u
            * (16.0 * u * u + 7.0 * u + 1.0))


def m4(r, h):
    """Cubic spline (sph.c:442-453)."""
    u = r / h
    inner = 2.546479089470 + 15.278874536822 * (u - 1.0) * u * u
    outer = 5.092958178941 * (1.0 - u) ** 3
    wk = jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, 0.0))
    return wk / (h * h * h)


def m4_flat(u):
    """Dimensionless M4 weight (wvt_relax.c:283-294 uses wk/h^3; the WVT
    displacement form multiplies by h^3 implicitly through its box-unit
    metric, so we expose the h-free polynomial)."""
    inner = 2.546479089470 + 15.278874536822 * (u - 1.0) * u * u
    outer = 5.092958178941 * (1.0 - u) ** 3
    return jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, 0.0))


def m4_deriv(r, h):
    """dM4/dr (sph.c:455-466)."""
    u = r / h
    inner = u * (45.836623610466 * u - 30.557749073644)
    outer = -15.278874536822 * (1.0 - u) ** 2
    dwk = jnp.where(u < 0.5, inner, jnp.where(u < 1.0, outer, 0.0))
    return dwk / (h * h * h * h)


def wc2(r, h):
    """WC2 with 1/h^3, used for subhalo gas velocity taper
    (velocities.c:161-167)."""
    u = r / h
    t = jnp.maximum(1.0 - u, 0.0)
    return 21.0 / (2.0 * const.PI) / (h * h * h) * t**4 * (1.0 + 4.0 * u)


def kernel_fns(kind: str):
    """(W, dW/dr, flat W) triplet for 'wc6' or 'm4'."""
    if kind == "m4":
        return m4, m4_deriv, m4_flat
    return wc6, wc6_deriv, wc6_flat
