"""O(N^2) reference implementations (test oracles).

The jnp analogue of the reference's `Find_ngb_simple` brute-force fallback
(wvt_relax.c:296-340): every operator of pair_ops.py re-implemented with a
full pairwise-distance matrix, for cross-validation on small N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as const
from .kernels import kernel_fns


def _pair_diffs(pos, boxsize):
    d = pos[:, None, :] - pos[None, :, :]
    d = d - boxsize * jnp.round(d / boxsize)
    return d


def brute_density(pos, hsml0, mpart, boxsize, *, kernel="wc6",
                  desnngb=295, max_iter=64):
    """Same Newton/bisection hsml solve as pair_ops.solve_density but over
    all pairs, bounds [0, sqrt3*h0] like the reference (sph.c:86)."""
    w_fn, dw_fn, _ = kernel_fns(kernel)
    d = _pair_diffs(pos, boxsize)
    r = jnp.sqrt((d * d).sum(-1))

    def sums(h):
        w = w_fn(r, h[:, None])
        dw = dw_fn(r, h[:, None])
        wk_ngb = const.FOURPITHIRD * h**3 * w.sum(-1)
        rho = mpart * w.sum(-1)
        drho = -mpart * ((3.0 / h)[:, None] * w
                         + (r / h[:, None]) * dw).sum(-1)
        return wk_ngb, rho, drho

    def body(it, state):
        h, lo, hi, done = state
        wk_ngb, rho, drho = sums(h)
        dev = jnp.abs(wk_ngb - desnngb)
        now = dev < const.NNGBDEV
        omega = 1.0 + drho * h / (3.0 * jnp.maximum(rho, 1e-30))
        fac = jnp.clip(1.0 - (wk_ngb - desnngb)
                       / (3.0 * jnp.maximum(wk_ngb, 1e-30) * omega),
                       1.0 / 1.24, 1.24)
        hi_b = jnp.where(wk_ngb > desnngb, h, hi)
        lo_b = jnp.where(wk_ngb < desnngb, h, lo)
        h_new = jnp.where(dev < 0.5 * desnngb, h * fac,
                          (0.5 * (lo_b**3 + hi_b**3)) ** (1.0 / 3.0))
        h = jnp.where(done | now, h, h_new)
        return h, lo_b, hi_b, done | now

    state = (hsml0, jnp.zeros_like(hsml0), hsml0 * const.SQRT3 * 4,
             jnp.zeros(hsml0.shape, bool))
    h, _, _, done = jax.lax.fori_loop(0, max_iter, body, state)
    wk_ngb, rho, drho = sums(h)
    var_fac = 1.0 / (1.0 + h / (3.0 * rho) * drho)
    if kernel == "wc6":
        rho = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236) * mpart
                     * w_fn(jnp.zeros_like(h), h))
    return rho, h, var_fac, wk_ngb, done


def density_at(pos_q, h_q, pos_src, mpart, boxsize, *, kernel="wc6",
               desnngb=295, chunk=65536):
    """Direct-summation SPH density at given (positions, smoothing lengths)
    against all sources — the production `--check` auditor (the analogue of
    swapping Find_ngb_simple for the tree, wvt_relax.c:134)."""
    w_fn, _, _ = kernel_fns(kernel)
    nq = pos_q.shape[0]
    rho = jnp.zeros((nq,), jnp.float32)
    n_src = pos_src.shape[0]
    for start in range(0, n_src, chunk):
        src = pos_src[start:start + chunk]
        d = pos_q[:, None, :] - src[None, :, :]
        d = d - boxsize * jnp.round(d / boxsize)
        r = jnp.sqrt((d * d).sum(-1))
        rho = rho + mpart * w_fn(r, h_q[:, None]).sum(-1)
    if kernel == "wc6":
        rho = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236) * mpart
                     * w_fn(jnp.zeros_like(h_q), h_q))
    return rho


def brute_wvt_displacement(pos, hsml_box, step, boxsize, *, kernel="wc6"):
    _, _, wflat = kernel_fns(kernel)
    d = _pair_diffs(pos, boxsize) / boxsize
    r2 = (d * d).sum(-1)
    r = jnp.sqrt(r2)
    hbar = 0.5 * (hsml_box[:, None] + hsml_box[None, :])
    mask = (r2 < hbar * hbar) & (r2 > 0)
    w = jnp.where(mask, wflat(r / hbar), 0.0)
    inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    coef = step * hsml_box[:, None] * w * inv_r
    return (coef[..., None] * d).sum(axis=1)


def brute_curl(pos, hsml, rho, var_fac, apot, mpart, boxsize, *,
               kernel="wc6"):
    _, dw_fn, _ = kernel_fns(kernel)
    d = _pair_diffs(pos, boxsize)
    r2 = (d * d).sum(-1)
    r = jnp.sqrt(r2)
    h = hsml[:, None]
    mask = (r2 < h * h) & (r2 > 0)
    dw = jnp.where(mask, dw_fn(r, h), 0.0)
    inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    weight = (-mpart / rho[:, None]) * dw * inv_r * var_fac[:, None]
    dA = apot[:, None, :] - apot[None, :, :]
    bx = (weight * (d[..., 2] * dA[..., 1] - d[..., 1] * dA[..., 2])).sum(1)
    by = (weight * (d[..., 0] * dA[..., 2] - d[..., 2] * dA[..., 0])).sum(1)
    bz = (weight * (d[..., 1] * dA[..., 0] - d[..., 0] * dA[..., 1])).sum(1)
    return jnp.stack([bx, by, bz], axis=-1)
