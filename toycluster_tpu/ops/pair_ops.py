"""Fixed-shape pair operators over the block-sparse neighbour structure.

Each operator processes receiver blocks in chunks: gather the candidate
blocks' particles ((G, M*B) source lanes per chunk), build the masked
periodic pairwise-distance matrix, and accumulate.  This is the XLA
reference path; ops/pallas_pair.py provides the fused TPU kernels for the
same contracts.

Operators (reference counterparts):
* solve_density — SPH density + adaptive hsml Newton/bisection solve with
  the |wkNgb - DESNNGB| < NNGBDEV contract and Dehnen+12 bias correction
  (sph.c:13-214)
* wvt_displacement — WVT repulsion step (wvt_relax.c:126-171)
* sph_curl — B = rot(A), Price JCP 2010 eq. 79 (sph.c:216-300)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from .blocks import BLOCK, BlockIndex, CandidateList
from .kernels import kernel_fns

_G = 4  # receiver blocks per map step


def _pad_chunks(arr, nb, fill=None):
    """Pad leading dim from nb to a multiple of _G and reshape to chunks."""
    nchunk = -(-nb // _G)
    pad = nchunk * _G - nb
    if pad:
        filler = (jnp.broadcast_to(arr[-1:], (pad,) + arr.shape[1:])
                  if fill is None else
                  jnp.full((pad,) + arr.shape[1:], fill, arr.dtype))
        arr = jnp.concatenate([arr, filler])
    return arr.reshape((nchunk, _G) + arr.shape[1:])


def _gather_pairs(bi: BlockIndex):
    """For one chunk: (G,B,3) receiver coords, (G,M*B,3) source coords,
    (G,M*B) source-valid mask, (G,M*B) source indices into sorted order."""
    def fn(chunk_block_ids, chunk_cand):
        pos_b = bi.pos.reshape(-1, BLOCK, 3)
        valid_b = bi.valid.reshape(-1, BLOCK)
        xi = pos_b[chunk_block_ids]                      # (G,B,3)
        cc = jnp.maximum(chunk_cand, 0)                  # (G,M)
        xj = pos_b[cc].reshape(_G, -1, 3)                # (G,M*B,3)
        vj = (valid_b[cc] & (chunk_cand >= 0)[:, :, None]
              ).reshape(_G, -1)                          # (G,M*B)
        src = (cc[:, :, None] * BLOCK
               + jnp.arange(BLOCK, dtype=jnp.int32)).reshape(_G, -1)
        return xi, xj, vj, src
    return fn


def _min_image(d, boxsize):
    return d - boxsize * jnp.round(d / boxsize)


def _r2_matrix(xi, xj, boxsize):
    """(G,B,M*B) squared min-image distances, built per-dimension to keep
    the (G,B,M*B,3) intermediate out of memory (XLA fuses)."""
    r2 = 0.0
    for d in range(3):
        dd = _min_image(xi[:, :, None, d] - xj[:, None, :, d], boxsize)
        r2 = r2 + dd * dd
    return r2


class DensityResult(NamedTuple):
    rho: jnp.ndarray           # (P,) SPH density (bias-corrected)
    hsml: jnp.ndarray          # (P,)
    var_hsml_fac: jnp.ndarray  # (P,) grad-h factor (sph.c:66)
    wk_ngb: jnp.ndarray        # (P,) kernel-weighted neighbour number
    done: jnp.ndarray          # (P,) converged within [0, h_cap]
    saturated: jnp.ndarray     # (P,) wanted h >= h_cap -> enlarge & retry


@partial(jax.jit, static_argnames=("kernel", "desnngb", "max_iter"))
def solve_density(bi: BlockIndex, cand: CandidateList, hsml0, h_cap,
                  mpart, boxsize, *, kernel="wc6", desnngb=295,
                  max_iter=32) -> DensityResult:
    """Adaptive-hsml SPH density over the block structure.

    Per receiver particle, solves (4pi/3) h^3 sum_j W(r_ij,h) = DESNNGB to
    |wkNgb - DESNNGB| < NNGBDEV by guarded Newton-Raphson with bisection
    bounds (the reference's scheme, sph.c:156-195), as masked fixed-shape
    sweeps over the precomputed candidate distances.  `h_cap` is the radius
    the candidate lists were built for; particles pushing h to the cap are
    flagged `saturated` (the caller rebuilds with a larger cap — the
    analogue of the reference's grow-and-research loop, sph.c:36-64).
    """
    w_fn, dw_fn, _ = kernel_fns(kernel)
    nngbdev = const.NNGBDEV
    nb = bi.n_blocks
    block_ids = _pad_chunks(jnp.arange(nb, dtype=jnp.int32), nb)
    cand_chunks = _pad_chunks(cand.idx, nb, fill=-1)
    h0_chunks = _pad_chunks(hsml0.reshape(nb, BLOCK), nb)
    cap_chunks = _pad_chunks(h_cap.reshape(nb, BLOCK), nb)
    gather = _gather_pairs(bi)

    def chunk_fn(args):
        ids, cidx, h0, cap = args
        xi, xj, vj, _ = gather(ids, cidx)
        r2 = _r2_matrix(xi, xj, boxsize)                 # (G,B,MB)
        # self-pairs keep their W(0,h) contribution, like the reference
        r = jnp.sqrt(r2)
        vjf = vj[:, None, :].astype(r.dtype)

        def sums(h):
            w = w_fn(r, h[..., None]) * vjf
            dw = dw_fn(r, h[..., None]) * vjf
            wk_ngb = const.FOURPITHIRD * h**3 * w.sum(-1)
            rho = mpart * w.sum(-1)
            drho = -mpart * ((3.0 / h)[..., None] * w
                             + (r / h[..., None]) * dw).sum(-1)
            return wk_ngb, rho, drho

        def body(state):
            it, h, lo, hi, done = state
            wk_ngb, rho, drho = sums(h)
            ngb_dev = jnp.abs(wk_ngb - desnngb)
            now_done = ngb_dev < nngbdev
            # Newton near the root (sph.c:175-184)
            omega = 1.0 + drho * h / (3.0 * jnp.maximum(rho, 1e-30))
            fac = 1.0 - (wk_ngb - desnngb) / (
                3.0 * jnp.maximum(wk_ngb, 1e-30) * omega)
            fac = jnp.clip(fac, 1.0 / 1.24, 1.24)
            h_newton = h * fac
            # bisection elsewhere (sph.c:186-195)
            hi_b = jnp.where(wk_ngb > desnngb, h, hi)
            lo_b = jnp.where(wk_ngb < desnngb, h, lo)
            h_bisect = (0.5 * (lo_b**3 + hi_b**3)) ** (1.0 / 3.0)
            use_newton = ngb_dev < 0.5 * desnngb
            h_new = jnp.where(use_newton, h_newton, h_bisect)
            h_new = jnp.minimum(h_new, cap)
            h = jnp.where(done | now_done, h, h_new)
            return it + 1, h, lo_b, hi_b, done | now_done

        def cond(state):
            it, _, _, _, done = state
            return (~jnp.all(done)) & (it < max_iter)

        h = jnp.minimum(h0, cap)
        state = (0, h, jnp.zeros_like(h), cap,
                 jnp.zeros(h.shape, bool))
        _, h, _, _, done = jax.lax.while_loop(cond, body, state)

        wk_ngb, rho, drho = sums(h)
        var_fac = 1.0 / (1.0 + h / (3.0 * jnp.maximum(rho, 1e-30)) * drho)
        if kernel == "wc6":  # Dehnen+12 WC6 bias correction (sph.c:202-210)
            rho = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236)
                         * mpart * w_fn(jnp.zeros_like(h), h))
        saturated = (~done) | (h >= cap * 0.999)
        return rho, h, var_fac, wk_ngb, done, saturated

    out = jax.lax.map(chunk_fn,
                      (block_ids, cand_chunks, h0_chunks, cap_chunks))
    flat = [o.reshape(-1)[: bi.n_padded] for o in out]
    return DensityResult(*flat)


@partial(jax.jit, static_argnames=("kernel",))
def wvt_displacement(bi: BlockIndex, cand: CandidateList, hsml_box, step,
                     boxsize, *, kernel="wc6"):
    """WVT repulsion: delta_i = sum_j step * h_i * W(r/hbar) * (dx/r) in box
    units, pair cut r < hbar = (h_i+h_j)/2 (wvt_relax.c:126-171).
    `hsml_box` is the dimensionless metric hsml; returns (P,3) box-unit
    displacements."""
    _, _, wflat = kernel_fns(kernel)
    nb = bi.n_blocks
    block_ids = _pad_chunks(jnp.arange(nb, dtype=jnp.int32), nb)
    cand_chunks = _pad_chunks(cand.idx, nb, fill=-1)
    h_chunks = _pad_chunks(hsml_box.reshape(nb, BLOCK), nb)
    gather = _gather_pairs(bi)
    h_sorted = hsml_box  # (P,)

    def chunk_fn(args):
        ids, cidx, h_i = args
        xi, xj, vj, src = gather(ids, cidx)
        h_j = h_sorted[src]                              # (G,MB)
        hbar = 0.5 * (h_i[:, :, None] + h_j[:, None, :])  # box units
        dx = [
            _min_image(xi[:, :, None, d] - xj[:, None, :, d], boxsize)
            / boxsize for d in range(3)]
        r2 = dx[0] ** 2 + dx[1] ** 2 + dx[2] ** 2
        r = jnp.sqrt(r2)
        mask = ((r2 < hbar * hbar) & (r2 > 0.0)
                & vj[:, None, :])                        # excl. self
        w = jnp.where(mask, wflat(r / hbar), 0.0)
        inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
        coef = step * h_i[:, :, None] * w * inv_r
        return jnp.stack([(coef * dx[d]).sum(-1) for d in range(3)],
                         axis=-1)                        # (G,B,3)

    out = jax.lax.map(chunk_fn, (block_ids, cand_chunks, h_chunks))
    return out.reshape(-1, 3)[: bi.n_padded]


@partial(jax.jit, static_argnames=("kernel",))
def sph_curl(bi: BlockIndex, cand: CandidateList, hsml, rho, var_fac,
             apot, mpart, boxsize, *, kernel="wc6"):
    """B_i = sum_j (-m/rho_i) dW(r,h_i)/r varHsmlFac_i (d x dA), Price JCP
    2010 eq. 79 (sph.c:216-300).  Inputs in sorted layout; returns (P,3)."""
    _, dw_fn, _ = kernel_fns(kernel)
    nb = bi.n_blocks
    block_ids = _pad_chunks(jnp.arange(nb, dtype=jnp.int32), nb)
    cand_chunks = _pad_chunks(cand.idx, nb, fill=-1)
    h_chunks = _pad_chunks(hsml.reshape(nb, BLOCK), nb)
    rho_chunks = _pad_chunks(rho.reshape(nb, BLOCK), nb)
    vf_chunks = _pad_chunks(var_fac.reshape(nb, BLOCK), nb)
    gather = _gather_pairs(bi)

    def chunk_fn(args):
        ids, cidx, h_i, rho_i, vf_i = args
        xi, xj, vj, src = gather(ids, cidx)
        dx = [_min_image(xi[:, :, None, d] - xj[:, None, :, d], boxsize)
              for d in range(3)]
        r2 = dx[0] ** 2 + dx[1] ** 2 + dx[2] ** 2
        r = jnp.sqrt(r2)
        h = h_i[:, :, None]
        mask = (r2 < h * h) & (r2 > 0.0) & vj[:, None, :]
        dw = jnp.where(mask, dw_fn(r, h), 0.0)
        inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
        weight = (-mpart / rho_i[:, :, None]) * dw * inv_r \
            * vf_i[:, :, None]
        pos_b_idx = ids[:, None] * BLOCK + jnp.arange(BLOCK,
                                                      dtype=jnp.int32)
        ai = apot[pos_b_idx]                             # (G,B,3)
        aj = apot[src]                                   # (G,MB,3)
        dA = [ai[:, :, None, d] - aj[:, None, :, d] for d in range(3)]
        bx = (weight * (dx[2] * dA[1] - dx[1] * dA[2])).sum(-1)
        by = (weight * (dx[0] * dA[2] - dx[2] * dA[0])).sum(-1)
        bz = (weight * (dx[1] * dA[0] - dx[0] * dA[1])).sum(-1)
        return jnp.stack([bx, by, bz], axis=-1)

    out = jax.lax.map(chunk_fn, (block_ids, cand_chunks, h_chunks,
                                 rho_chunks, vf_chunks))
    return out.reshape(-1, 3)[: bi.n_padded]
