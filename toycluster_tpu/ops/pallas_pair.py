"""Fused Pallas TPU kernels for the block-sparse pair operators.

The XLA path (ops/pair_ops.py) materialises a (B, M*B) distance matrix per
receiver-block chunk in HBM; these kernels instead stream candidate blocks
through VMEM with the grid (receiver block s, sweep k, candidate m):

* the candidate block index for (s, m) comes from a scalar-prefetched list,
  so the pipeline's double-buffered DMA fetches exactly the blocks the
  bbox search selected (the reference's tree walk, tree.c:25-111, recast
  as data movement);
* all sweeps of a receiver block run before the grid moves to the next
  block, so the whole Newton/bisection state (h, lo, hi, done) plus the
  per-receiver accumulators live in one small VMEM scratch tile;
* distances are recomputed per sweep (8 extra flops/pair) so VMEM holds
  only one (3, B) candidate tile at a time — candidate lists of any M fit.

The solve contract is identical to pair_ops.solve_density
(sph.c:156-195): |wkNgb - DESNNGB| < NNGBDEV via guarded Newton with
bisection bounds, Dehnen+12 WC6 bias correction, grad-h factor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from .blocks import BLOCK

_SWEEPS = 8  # Newton/bisection sweeps (warm starts converge in <= ~4;
#              unconverged lanes re-enter via the saturation retry loop)
_SMEM_BUDGET = 1 << 17  # scalar-prefetch candidate lists ride in SMEM —
#                         keep well under the physical size (~1MB shared
#                         with grid machinery; larger budgets produced
#                         sporadic TPU runtime faults at scale)


def _row_chunks(S: int, M: int) -> int:
    """Receiver-row chunk size so the (S_c, M) int32 prefetch fits SMEM."""
    sc = max(1, _SMEM_BUDGET // (4 * M))
    sc = 1 << (sc.bit_length() - 1)  # floor pow2 for shape stability
    return min(S, sc)


def _pad_rows(arr, s_pad):
    pad = s_pad - arr.shape[0]
    if pad:
        filler = jnp.zeros((pad,) + arr.shape[1:], arr.dtype)
        if arr.dtype == jnp.int32:
            filler = filler - 1  # candidate padding marker
        arr = jnp.concatenate([arr, filler])
    return arr

# scratch rows: 0 wk-accum, 1 r*dW-accum, 2 h, 3 lo, 4 hi, 5 done
_ACC_W, _ACC_RDW, _H, _LO, _HI, _DONE = range(6)


def _wc6_w_dw(r, h):
    """WC6 kernel and derivative (sph.c:426-440), support mask built in."""
    u = r / h
    m = u < 1.0
    t = jnp.where(m, 1.0 - u, 0.0)
    t2 = t * t
    t4 = t2 * t2
    norm = 1365.0 / (64.0 * const.PI)
    w = norm / (h * h * h) * t4 * t4 * (
        1.0 + u * (8.0 + u * (25.0 + 32.0 * u)))
    dw = (norm / (h * h * h * h) * (-22.0) * t4 * t2 * t * u
          * (16.0 * u * u + 7.0 * u + 1.0))
    return w, dw


def _m4_w_dw(r, h):
    """Cubic spline kernel and derivative (sph.c:442-466)."""
    u = r / h
    wi = 2.546479089470 + 15.278874536822 * (u - 1.0) * u * u
    wo = 5.092958178941 * (1.0 - u) ** 3
    w = jnp.where(u < 0.5, wi, jnp.where(u < 1.0, wo, 0.0)) / (h * h * h)
    di = u * (45.836623610466 * u - 30.557749073644)
    do = -15.278874536822 * (1.0 - u) ** 2
    dw = jnp.where(u < 0.5, di, jnp.where(u < 1.0, do, 0.0)) \
        / (h * h * h * h)
    return w, dw


_FAN = 8  # candidate blocks streamed per grid step (amortises step cost)


def _density_kernel(kernel_kind, desnngb, mpart, boxsize, n_sweeps,
                    sb_nb,                       # >0: superblock mode
                    cand_ref,                    # (S, M) scalar prefetch
                    xi_ref,                      # (1, 3, B)
                    *rest):
    # rest: _FAN x xj_ref (1,3,B), _FAN x vj_ref (1,1,B), h0, cap,
    #       5 outputs, scratch
    xj_refs = rest[:_FAN]
    vj_refs = rest[_FAN:2 * _FAN]
    h0_ref, cap_ref = rest[2 * _FAN:2 * _FAN + 2]
    rho_ref, h_out, vf_ref, wk_ref, done_ref = rest[2 * _FAN + 2:
                                                    2 * _FAN + 7]
    st_ref = rest[2 * _FAN + 7]

    s = pl.program_id(0)
    k = pl.program_id(1)
    m = pl.program_id(2)
    n_m = pl.num_programs(2)

    @pl.when((k == 0) & (m == 0))
    def _():
        st_ref[_H, :] = jnp.minimum(h0_ref[0, 0, :], cap_ref[0, 0, :])
        st_ref[_LO, :] = jnp.zeros((BLOCK,), jnp.float32)
        st_ref[_HI, :] = cap_ref[0, 0, :]
        st_ref[_DONE, :] = jnp.zeros((BLOCK,), jnp.float32)

    @pl.when(m == 0)
    def _():
        st_ref[_ACC_W, :] = jnp.zeros((BLOCK,), jnp.float32)
        st_ref[_ACC_RDW, :] = jnp.zeros((BLOCK,), jnp.float32)

    h = st_ref[_H, :]
    done = st_ref[_DONE, :] > 0.5
    # lists are sorted: slot 0 first.  sb mode: one superblock per m step
    any_valid = (cand_ref[s, m] >= 0 if sb_nb
                 else cand_ref[s, m * _FAN] >= 0)
    last_sweep = k == n_sweeps - 1

    # skip converged blocks, but the last sweep always accumulates — it
    # records rho/wkNgb/varHsmlFac at the frozen h
    @pl.when(any_valid & (jnp.logical_not(jnp.all(done)) | last_sweep))
    def _():
        xi = xi_ref[0]                   # (3, B) receivers on lanes
        # stack _FAN candidate blocks along sublanes: tile (F*B, B)
        r2 = jnp.zeros((_FAN * BLOCK, BLOCK), jnp.float32)
        for d in range(3):
            xjd = jnp.concatenate([xj[0, d][:, None] for xj in xj_refs],
                                  axis=0)                 # (F*B, 1)
            dd = xjd - xi[d][None, :]
            dd = dd - boxsize * jnp.round(dd / boxsize)
            r2 += dd * dd
        if sb_nb:
            ok = [((cand_ref[s, m] >= 0)
                   & (cand_ref[s, m] * _FAN + f < sb_nb))
                  for f in range(_FAN)]
        else:
            ok = [cand_ref[s, m * _FAN + f] >= 0 for f in range(_FAN)]
        vj = jnp.concatenate(
            [vj_refs[f][0, 0, :][:, None] * ok[f].astype(jnp.float32)
             for f in range(_FAN)], axis=0)               # (F*B, 1)
        r = jnp.sqrt(r2)
        hb = h[None, :]
        if kernel_kind == "m4":
            w, dw = _m4_w_dw(r, hb)
        else:
            w, dw = _wc6_w_dw(r, hb)
        wv = w * vj
        st_ref[_ACC_W, :] += wv.sum(axis=0)
        st_ref[_ACC_RDW, :] += (r * dw * vj).sum(axis=0)

    @pl.when(m == n_m - 1)
    def _():
        cap = cap_ref[0, 0, :]
        lo = st_ref[_LO, :]
        hi = st_ref[_HI, :]
        sum_w = st_ref[_ACC_W, :]
        sum_rdw = st_ref[_ACC_RDW, :]
        wk_ngb = const.FOURPITHIRD * h**3 * sum_w
        rho = mpart * sum_w
        drho = -mpart * (3.0 / h * sum_w + sum_rdw / h)
        ngb_dev = jnp.abs(wk_ngb - desnngb)
        now_done = ngb_dev < const.NNGBDEV

        # Newton / bisection update (sph.c:175-195)
        omega = 1.0 + drho * h / (3.0 * jnp.maximum(rho, 1e-30))
        fac = 1.0 - (wk_ngb - desnngb) / (
            3.0 * jnp.maximum(wk_ngb, 1e-30) * omega)
        fac = jnp.clip(fac, 1.0 / 1.24, 1.24)
        hi_n = jnp.where(wk_ngb > desnngb, h, hi)
        lo_n = jnp.where(wk_ngb < desnngb, h, lo)
        h_bis = (0.5 * (lo_n**3 + hi_n**3)) ** (1.0 / 3.0)
        h_new = jnp.where(ngb_dev < 0.5 * desnngb, h * fac, h_bis)
        h_new = jnp.minimum(h_new, cap)
        freeze = done | now_done
        st_ref[_H, :] = jnp.where(freeze, h, h_new)
        st_ref[_LO, :] = lo_n
        st_ref[_HI, :] = hi_n
        st_ref[_DONE, :] = jnp.where(freeze, 1.0, 0.0)

        @pl.when(k == n_sweeps - 1)
        def _():
            # record at the current h: frozen lanes are at their solved h
            rho_out = rho
            if kernel_kind == "wc6":  # Dehnen+12 (sph.c:202-210)
                w0 = 1365.0 / (64.0 * const.PI) / (h * h * h)
                rho_out = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236)
                                 * mpart * w0)
            rho_ref[0, 0, :] = rho_out
            wk_ref[0, 0, :] = wk_ngb
            vf_ref[0, 0, :] = 1.0 / (
                1.0 + h / (3.0 * jnp.maximum(rho, 1e-30)) * drho)
            h_out[0, 0, :] = h
            done_ref[0, 0, :] = jnp.where(done | now_done, 1.0, 0.0)


# -------------------------------------------------------------------------
# fused WVT iteration kernel (v2): candidate blocks are DMA-streamed ONCE
# into a VMEM scratch cache, then the whole adaptive-hsml Newton/bisection
# solve runs as an in-kernel while_loop over the cached tiles (true
# early-exit: converged receiver blocks stop sweeping at zero cost), and
# the WVT displacement pass (wvt_relax.c:126-171) reuses the same cache —
# one kernel, one candidate stream, no per-sweep HBM traffic or grid
# overhead.  Receivers live on SUBLANES (column vectors), sources on
# LANES, so cached (3,B) tiles are used without relayouts.
# -------------------------------------------------------------------------

def _fused_kernel(kernel_kind, desnngb, mpart, boxsize, n_sweeps, m_pad,
                  sb_nb,                     # >0: superblock mode, = nb
                  do_disp,                   # False: density solve only
                  cand_ref,                  # (S, M) scalar prefetch
                  cnt_ref,                   # (S,) true candidate counts
                  *rest):
    # rest: 6 x receiver columns (1,B,1) [x0,x1,x2,h0,cap,hm_i],
    #       F x pos (1,3,B), F x hm (1,1,B), out (1,B,8),
    #       x0/x1/x2 scratch (M,B), hm scratch (M,B)
    # NB receiver scalars ride as separate (B,1) columns — slicing lanes
    # out of a packed (B,8) block gives lane-offset register layouts that
    # Mosaic cannot legalize through the while_loop carry (scf.yield)
    recv_refs = rest[:6]
    pos_refs = rest[6:6 + _FAN]
    hm_refs = rest[6 + _FAN:6 + 2 * _FAN]
    out_ref = rest[6 + 2 * _FAN]
    xsc = rest[6 + 2 * _FAN + 1:6 + 2 * _FAN + 4]
    hsc = rest[6 + 2 * _FAN + 4]

    s = pl.program_id(0)
    m = pl.program_id(1)
    n_m = pl.num_programs(1)
    f32 = jnp.float32

    # cache this fan of candidate tiles (aligned 8-row group stores);
    # groups entirely past the true count are never read — skip the copy.
    # In superblock mode each grid step m holds ONE superblock: slot f is
    # block cand[s,m]*FAN+f, masked where it runs past the real blocks.
    @pl.when((m * _FAN < cnt_ref[s]) if sb_nb == 0 else (m < cnt_ref[s]))
    def _():
        row = pl.multiple_of(m * _FAN, _FAN)
        for d in range(3):
            xsc[d][pl.ds(row, _FAN), :] = jnp.concatenate(
                [pos_refs[f][0, d:d + 1, :] for f in range(_FAN)], axis=0)
        if sb_nb == 0:
            ok = [(cand_ref[s, m * _FAN + f] >= 0).astype(f32)
                  for f in range(_FAN)]
        else:
            ok = [((cand_ref[s, m] >= 0)
                   & (cand_ref[s, m] * _FAN + f < sb_nb)).astype(f32)
                  for f in range(_FAN)]
        hsc[pl.ds(row, _FAN), :] = jnp.concatenate(
            [hm_refs[f][0, 0:1, :] * ok[f] for f in range(_FAN)], axis=0)

    @pl.when((m == n_m - 1) & (cnt_ref[s] > 0))
    def _():
        xi = [recv_refs[d][0] for d in range(3)]      # (B,1) each
        h0 = recv_refs[3][0]
        cap = recv_refs[4][0]
        hm_i = recv_refs[5][0]
        # dynamic trip count: only the groups that hold real candidates
        # (in superblock mode one group == one superblock == one m step)
        n_grp = (cnt_ref[s] if sb_nb else
                 (cnt_ref[s] + _FAN - 1) // _FAN)

        def pair_sums(h):
            """Kernel-weight sums at h: per-lane factors (1/h powers, the
            WC6 norm, the -22 of dW) are folded OUT of the pair loop —
            the per-pair work is u, t-powers, two short Horner polys."""
            inv_h = 1.0 / h
            inv_h2 = inv_h * inv_h

            def jbody(j, acc):
                accw, accrdw = acc
                jr = pl.multiple_of(j * _FAN, _FAN)
                xd = [xsc[d][pl.ds(jr, _FAN), :] for d in range(3)]
                hj = hsc[pl.ds(jr, _FAN), :]
                for f in range(_FAN):
                    r2 = jnp.zeros((BLOCK, BLOCK), f32)
                    for d in range(3):
                        dd = xi[d] - xd[d][f:f + 1, :]
                        dd = dd - boxsize * jnp.round(dd / boxsize)
                        r2 += dd * dd
                    vj = (hj[f:f + 1, :] > 0).astype(f32)
                    if kernel_kind == "m4":
                        r = jnp.sqrt(r2)
                        w, dw = _m4_w_dw(r, h)
                        accw += (w * vj).sum(axis=1, keepdims=True)
                        accrdw += (r * dw * vj).sum(axis=1,
                                                    keepdims=True)
                    else:
                        u = jnp.sqrt(r2 * inv_h2)
                        t = jnp.maximum(1.0 - u, 0.0) * vj
                        t2 = t * t
                        t4 = t2 * t2
                        t7 = t4 * t2 * t
                        wpoly = 1.0 + u * (8.0 + u * (25.0 + 32.0 * u))
                        dpoly = u * u * (1.0 + u * (7.0 + 16.0 * u))
                        accw += (t4 * t4 * wpoly).sum(axis=1,
                                                      keepdims=True)
                        accrdw += (t7 * dpoly).sum(axis=1, keepdims=True)
                return accw, accrdw

            zero = jnp.zeros((BLOCK, 1), f32)
            aw, ardw = jax.lax.fori_loop(0, n_grp, jbody, (zero, zero))
            if kernel_kind != "m4":
                norm_h3 = (1365.0 / (64.0 * const.PI)) * inv_h * inv_h2
                aw = aw * norm_h3
                ardw = ardw * (-22.0 * norm_h3)
            return aw, ardw

        def newton(state):
            # `done` rides as f32 0/1 — Mosaic cannot legalize i1 vectors
            # through the while_loop carry (scf.yield); sums are carried
            # so the post-loop record needs no extra pair pass (frozen
            # lanes' sums were computed at their final h)
            k, h, lo, hi, done, _, _ = state
            sum_w, sum_rdw = pair_sums(h)
            wk_ngb = const.FOURPITHIRD * h**3 * sum_w
            rho = mpart * sum_w
            drho = -mpart * (3.0 / h * sum_w + sum_rdw / h)
            ngb_dev = jnp.abs(wk_ngb - desnngb)
            now_done = ngb_dev < const.NNGBDEV
            # guarded Newton + bisection on h^3 (sph.c:175-195)
            omega = 1.0 + drho * h / (3.0 * jnp.maximum(rho, 1e-30))
            fac = 1.0 - (wk_ngb - desnngb) / (
                3.0 * jnp.maximum(wk_ngb, 1e-30) * omega)
            fac = jnp.clip(fac, 1.0 / 1.24, 1.24)
            hi_n = jnp.where(wk_ngb > desnngb, h, hi)
            lo_n = jnp.where(wk_ngb < desnngb, h, lo)
            h_bis = (0.5 * (lo_n**3 + hi_n**3)) ** (1.0 / 3.0)
            h_new = jnp.where(ngb_dev < 0.5 * desnngb, h * fac, h_bis)
            h_new = jnp.minimum(h_new, cap)
            freeze = (done > 0.5) | now_done
            return (k + 1, jnp.where(freeze, h, h_new), lo_n, hi_n,
                    jnp.where(freeze, 1.0, 0.0).astype(f32),
                    sum_w, sum_rdw)

        def cond(state):
            k, _, _, _, done = state[:5]
            return (k < n_sweeps) & jnp.logical_not(jnp.all(done > 0.5))

        h0c = jnp.minimum(h0, cap)
        zero = jnp.zeros((BLOCK, 1), f32)
        state = (0, h0c, zero, cap, zero, zero, zero)
        _, h, _, _, done_f, sum_w, sum_rdw = jax.lax.while_loop(
            cond, newton, state)
        done = done_f > 0.5

        # record at the solved h: every frozen lane's carried sums were
        # computed at exactly its final h (unconverged lanes re-enter via
        # the saturation retry, so their slight inconsistency is moot)
        wk_ngb = const.FOURPITHIRD * h**3 * sum_w
        rho = mpart * sum_w
        drho = -mpart * (3.0 / h * sum_w + sum_rdw / h)
        now_done = jnp.abs(wk_ngb - desnngb) < const.NNGBDEV
        rho_out = rho
        if kernel_kind == "wc6":  # Dehnen+12 (sph.c:202-210)
            w0 = 1365.0 / (64.0 * const.PI) / (h * h * h)
            rho_out = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236)
                             * mpart * w0)

        # displacement pass over the same cache (metric hsml, box units);
        # the per-lane factor hm_i and the kernel norm are applied after
        # the loop
        inv_box = 1.0 / boxsize

        def dbody(j, acc):
            jr = pl.multiple_of(j * _FAN, _FAN)
            xd = [xsc[d][pl.ds(jr, _FAN), :] for d in range(3)]
            hj = hsc[pl.ds(jr, _FAN), :]
            for f in range(_FAN):
                dx = []
                r2 = jnp.zeros((BLOCK, BLOCK), f32)
                for d in range(3):
                    dd = xi[d] - xd[d][f:f + 1, :]
                    dd = (dd - boxsize * jnp.round(dd * inv_box)) \
                        * inv_box
                    dx.append(dd)
                    r2 += dd * dd
                hmj = hj[f:f + 1, :]
                hbar = 0.5 * (hm_i + hmj)
                mask = (r2 < hbar * hbar) & (r2 > 0.0) & (hmj > 0.0)
                r = jnp.sqrt(r2)
                u = jnp.where(mask, r / hbar, 1.0)
                if kernel_kind == "m4":
                    wflat = _m4_flat(u)
                else:  # WC6 shape without the norm (folded out)
                    t = jnp.maximum(1.0 - u, 0.0)
                    t2 = t * t
                    t4 = t2 * t2
                    wflat = t4 * t4 * (
                        1.0 + u * (8.0 + u * (25.0 + 32.0 * u)))
                w = jnp.where(mask, wflat, 0.0)
                inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
                coef = w * inv_r
                acc = tuple(acc[d] + (coef * dx[d]).sum(axis=1,
                                                        keepdims=True)
                            for d in range(3))
            return acc

        zero3 = (zero, zero, zero)
        if do_disp:
            delta = jax.lax.fori_loop(0, n_grp, dbody, zero3)
            dnorm = hm_i * (1.0 if kernel_kind == "m4"
                            else 1365.0 / (64.0 * const.PI))
            delta = tuple(dnorm * delta[d] for d in range(3))
        else:
            delta = zero3

        out_ref[0, :, 0:1] = rho_out
        out_ref[0, :, 1:2] = h
        out_ref[0, :, 2:3] = 1.0 / (
            1.0 + h / (3.0 * jnp.maximum(rho, 1e-30)) * drho)
        out_ref[0, :, 3:4] = wk_ngb
        out_ref[0, :, 4:5] = jnp.where(done | now_done, 1.0, 0.0)
        out_ref[0, :, 5:6] = delta[0]
        out_ref[0, :, 6:7] = delta[1]
        out_ref[0, :, 7:8] = delta[2]


@partial(jax.jit,
         static_argnames=("kernel", "desnngb", "n_sweeps", "interpret",
                          "mpart", "boxsize", "sb_mode", "do_disp"))
def fused_wvt_pallas(pos_blocks, hm_blocks, cand, cnt, xi, h0, cap, hm_i,
                     mpart, boxsize, *, kernel="wc6", desnngb=295,
                     n_sweeps=16, interpret=False, sb_mode=False,
                     do_disp=True):
    """Fused density-solve + WVT-displacement for one count class.

    pos_blocks: (nb, 3, B) sorted coords; hm_blocks: (nb, 1, B) source
    metric hsml in box units, 0 on invalid/padding lanes.
    cand: (S, M) candidate ids (-1 padded); cnt: (S,) true candidate
    counts (0 on padded receiver rows); xi: (S, 3, B) receiver coords;
    h0, cap, hm_i: (S, B).
    With sb_mode, cand holds SUPERBLOCK ids (ops/blocks.SUPER == _FAN
    blocks each) — the far-tail rows whose block-granular lists would
    overflow ride at 8x list compression with exact coverage.
    Returns (rho, hsml, var_fac, wk_ngb, done, delta) — delta is (S, B, 3)
    in box units, WITHOUT the step factor (caller applies step after the
    convergence decision, wvt_relax.c:100-101 ordering).
    """
    S, M = cand.shape
    nb = pos_blocks.shape[0]
    f32 = jnp.float32
    if not sb_mode and M % _FAN:
        pad = _FAN - M % _FAN
        cand = jnp.concatenate(
            [cand, jnp.full((S, pad), -1, cand.dtype)], axis=1)
        M += pad

    # receiver columns as SEPARATE (S, B, 1) arrays (canonical layouts —
    # see the kernel note on while_loop carries)
    xi_t = xi.transpose(0, 2, 1)
    recvs = [xi_t[:, :, d:d + 1] for d in range(3)] + [
        h0[..., None].astype(f32), cap[..., None].astype(f32),
        hm_i[..., None].astype(f32)]

    m_cache = M * _FAN if sb_mode else M
    kern = partial(_fused_kernel, kernel, float(desnngb), float(mpart),
                   float(boxsize), n_sweeps, m_cache,
                   nb if sb_mode else 0, do_disp)

    def imap_s(s, m, cand_ref, cnt_ref):
        return (s, 0, 0)

    def make_imap_cand(f):
        if sb_mode:
            def imap(s, m, cand_ref, cnt_ref):
                return (jnp.minimum(
                    jnp.maximum(cand_ref[s, m], 0) * _FAN + f, nb - 1),
                    0, 0)
        else:
            def imap(s, m, cand_ref, cnt_ref):
                return (jnp.maximum(cand_ref[s, m * _FAN + f], 0), 0, 0)
        return imap

    sc = _row_chunks(S, M)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    cnt_c = jnp.concatenate(
        [cnt.astype(jnp.int32),
         jnp.zeros((s_pad - S,), jnp.int32)]).reshape(nchunk, sc)
    recv_c = [_pad_rows(r, s_pad).reshape(nchunk, sc, BLOCK, 1)
              for r in recvs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sc, M if sb_mode else M // _FAN),
        in_specs=(
            [pl.BlockSpec((1, BLOCK, 1), imap_s) for _ in range(6)]
            + [pl.BlockSpec((1, 3, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                              # xj
            + [pl.BlockSpec((1, 1, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                              # hm_j
        ),
        out_specs=[pl.BlockSpec((1, BLOCK, 8), imap_s)],
        scratch_shapes=[pltpu.VMEM((m_cache, BLOCK), f32)
                        for _ in range(4)],
    )

    def run_chunk(chunk):
        cand_k, cnt_k = chunk[0], chunk[1]
        args = (list(chunk) + [pos_blocks] * _FAN
                + [hm_blocks] * _FAN)
        (o,) = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sc, BLOCK, 8), f32)],
            interpret=interpret,
        )(*args)
        return o

    out = jax.lax.map(run_chunk, tuple([cand_c, cnt_c] + recv_c))
    out = out.reshape(-1, BLOCK, 8)[:S]
    rho, h, vf, wk, done_f = (out[:, :, k] for k in range(5))
    delta = out[:, :, 5:8]
    return rho, h, vf, wk, done_f > 0.5, delta


def _wc6_flat(u):
    m = u < 1.0
    t = jnp.where(m, 1.0 - u, 0.0)
    t2 = t * t
    t4 = t2 * t2
    return (1365.0 / (64.0 * const.PI)) * t4 * t4 * (
        1.0 + u * (8.0 + u * (25.0 + 32.0 * u)))


def _m4_flat(u):
    wi = 2.546479089470 + 15.278874536822 * (u - 1.0) * u * u
    wo = 5.092958178941 * (1.0 - u) ** 3
    return jnp.where(u < 0.5, wi, jnp.where(u < 1.0, wo, 0.0))


def _displacement_kernel(kernel_kind, boxsize, sb_nb,
                         cand_ref,                   # (S, M) prefetch
                         xi_ref,                     # (1, 3, B)
                         *rest):
    # rest: _FAN x xj (1,3,B), _FAN x vj (1,1,B), _FAN x hj (1,1,B),
    #       hi (1,1,B), out (1,3,B), scratch (8,B)
    xj_refs = rest[:_FAN]
    vj_refs = rest[_FAN:2 * _FAN]
    hj_refs = rest[2 * _FAN:3 * _FAN]
    hi_ref = rest[3 * _FAN]
    out_ref = rest[3 * _FAN + 1]
    acc_ref = rest[3 * _FAN + 2]

    s = pl.program_id(0)
    m = pl.program_id(1)
    n_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(cand_ref[s, m] >= 0 if sb_nb
             else cand_ref[s, m * _FAN] >= 0)
    def _():
        xi = xi_ref[0]
        h_i = hi_ref[0, 0, :]                       # (B,) receivers/lanes
        # stacked tile (F*B source sublanes, B receiver lanes); dx=x_i-x_j
        dx = []
        r2 = jnp.zeros((_FAN * BLOCK, BLOCK), jnp.float32)
        for d in range(3):
            xjd = jnp.concatenate([xj[0, d][:, None] for xj in xj_refs],
                                  axis=0)
            dd = xi[d][None, :] - xjd
            dd = dd - boxsize * jnp.round(dd / boxsize)
            dd = dd / boxsize                        # box units
            dx.append(dd)
            r2 += dd * dd
        if sb_nb:
            ok = [((cand_ref[s, m] >= 0)
                   & (cand_ref[s, m] * _FAN + f < sb_nb))
                  for f in range(_FAN)]
        else:
            ok = [cand_ref[s, m * _FAN + f] >= 0 for f in range(_FAN)]
        vj = jnp.concatenate(
            [vj_refs[f][0, 0, :][:, None] * ok[f].astype(jnp.float32)
             for f in range(_FAN)], axis=0)
        h_j = jnp.concatenate([hj[0, 0, :][:, None] for hj in hj_refs],
                              axis=0)
        hbar = 0.5 * (h_j + h_i[None, :])
        r = jnp.sqrt(r2)
        mask = (r2 < hbar * hbar) & (r2 > 0.0) & (vj > 0.5)
        u = jnp.where(mask, r / hbar, 1.0)
        wflat = _m4_flat(u) if kernel_kind == "m4" else _wc6_flat(u)
        w = jnp.where(mask, wflat, 0.0)
        inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
        coef = h_i[None, :] * w * inv_r  # step applied by the caller
        for d in range(3):
            acc_ref[d, :] += (coef * dx[d]).sum(axis=0)

    @pl.when(m == n_m - 1)
    def _():
        out_ref[0, 0, :] = acc_ref[0, :]
        out_ref[0, 1, :] = acc_ref[1, :]
        out_ref[0, 2, :] = acc_ref[2, :]


@partial(jax.jit,
         static_argnames=("kernel", "boxsize", "interpret", "sb_mode"))
def wvt_displacement_pallas(pos_blocks, valid_blocks, h_blocks, cand, xi,
                            h_i, step, boxsize, *, kernel="wc6",
                            interpret=False, sb_mode=False):
    """Pallas twin of pair_ops.wvt_displacement for one count class.

    pos_blocks: (nb, 3, B); valid_blocks, h_blocks: (nb, 1, B)
    cand: (S, M) block ids (SUPERBLOCK ids with sb_mode);
    xi: (S, 3, B); h_i: (S, B) metric hsml (box units)
    Returns (S, B, 3) box-unit displacements.
    """
    S, M = cand.shape
    nb = pos_blocks.shape[0]
    f32 = jnp.float32
    if not sb_mode and M % _FAN:
        pad = _FAN - M % _FAN
        cand = jnp.concatenate(
            [cand, jnp.full((S, pad), -1, cand.dtype)], axis=1)
        M += pad
    kern = partial(_displacement_kernel, kernel, float(boxsize),
                   nb if sb_mode else 0)

    def imap_s(s, m, cand_ref):
        return (s, 0, 0)

    def make_imap_cand(f):
        if sb_mode:
            def imap(s, m, cand_ref):
                return (jnp.minimum(
                    jnp.maximum(cand_ref[s, m], 0) * _FAN + f, nb - 1),
                    0, 0)
        else:
            def imap(s, m, cand_ref):
                return (jnp.maximum(cand_ref[s, m * _FAN + f], 0), 0, 0)
        return imap

    n_m = M if sb_mode else M // _FAN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, n_m),
        in_specs=(
            [pl.BlockSpec((1, 3, BLOCK), imap_s)]            # xi
            + [pl.BlockSpec((1, 3, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                         # xj
            + [pl.BlockSpec((1, 1, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                         # vj
            + [pl.BlockSpec((1, 1, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                         # hj
            + [pl.BlockSpec((1, 1, BLOCK), imap_s)]          # hi
        ),
        out_specs=[pl.BlockSpec((1, 3, BLOCK), imap_s)],
        scratch_shapes=[pltpu.VMEM((8, BLOCK), f32)],
    )

    # chunk receiver rows so the candidate prefetch fits SMEM
    sc = _row_chunks(S, M)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    xi_c = _pad_rows(xi, s_pad).reshape(nchunk, sc, 3, BLOCK)
    hi_c = _pad_rows(h_i.astype(f32), s_pad).reshape(nchunk, sc, 1, BLOCK)

    def run_chunk(chunk):
        cand_k, xi_k, hi_k = chunk
        args = ([cand_k, xi_k] + [pos_blocks] * _FAN
                + [valid_blocks] * _FAN + [h_blocks] * _FAN + [hi_k])
        (o,) = pl.pallas_call(
            kern, grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(sc, n_m),
                in_specs=grid_spec.in_specs,
                out_specs=grid_spec.out_specs,
                scratch_shapes=grid_spec.scratch_shapes,
            ),
            out_shape=[jax.ShapeDtypeStruct((sc, 3, BLOCK), f32)],
            interpret=interpret,
        )(*args)
        return o

    out = jax.lax.map(run_chunk, (cand_c, xi_c, hi_c))
    out = out.reshape(-1, 3, BLOCK)[:S]
    return out.transpose(0, 2, 1) * step  # (S, B, 3)


@partial(jax.jit,
         static_argnames=("kernel", "desnngb", "n_sweeps", "interpret",
                          "mpart", "boxsize", "sb_mode"))
def solve_density_pallas(pos_blocks, valid_blocks, cand, xi, h0, cap,
                         mpart, boxsize, *, kernel="wc6", desnngb=295,
                         n_sweeps=_SWEEPS, interpret=False,
                         sb_mode=False):
    """Pallas twin of pair_ops.solve_density for one count class.

    pos_blocks:   (nb, 3, B) sorted coords, transposed block layout
    valid_blocks: (nb, 1, B) f32 source validity
    cand:         (S, M) candidate block ids (-1 padded); SUPERBLOCK ids
                  with sb_mode (far-tail rows, 8x list compression)
    xi:           (S, 3, B) receiver coords (pre-gathered)
    h0, cap:      (S, B)
    Returns (rho, hsml, var_fac, wk_ngb, done, saturated), each (S, B).
    """
    S, M = cand.shape
    nb = pos_blocks.shape[0]
    f32 = jnp.float32
    # pad candidate lists to a multiple of the per-step fan-out
    if not sb_mode and M % _FAN:
        pad = _FAN - M % _FAN
        cand = jnp.concatenate(
            [cand, jnp.full((S, pad), -1, cand.dtype)], axis=1)
        M += pad
    kern = partial(_density_kernel, kernel, float(desnngb), float(mpart),
                   float(boxsize), n_sweeps, nb if sb_mode else 0)

    def imap_s(s, k, m, cand_ref):
        return (s, 0, 0)

    def make_imap_cand(f):
        if sb_mode:
            def imap(s, k, m, cand_ref):
                return (jnp.minimum(
                    jnp.maximum(cand_ref[s, m], 0) * _FAN + f, nb - 1),
                    0, 0)
        else:
            def imap(s, k, m, cand_ref):
                return (jnp.maximum(cand_ref[s, m * _FAN + f], 0), 0, 0)
        return imap

    def imap_flat(s, k, m, cand_ref):
        return (s, 0, 0)

    n_m = M if sb_mode else M // _FAN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, n_sweeps, n_m),
        in_specs=(
            [pl.BlockSpec((1, 3, BLOCK), imap_s)]            # xi
            + [pl.BlockSpec((1, 3, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                         # xj
            + [pl.BlockSpec((1, 1, BLOCK), make_imap_cand(f))
               for f in range(_FAN)]                         # vj
            + [pl.BlockSpec((1, 1, BLOCK), imap_flat),       # h0
               pl.BlockSpec((1, 1, BLOCK), imap_flat)]       # cap
        ),
        out_specs=[pl.BlockSpec((1, 1, BLOCK), imap_flat)
                   for _ in range(5)],
        scratch_shapes=[pltpu.VMEM((8, BLOCK), f32)],
    )

    # chunk receiver rows so the candidate prefetch fits SMEM
    sc = _row_chunks(S, M)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    xi_c = _pad_rows(xi, s_pad).reshape(nchunk, sc, 3, BLOCK)
    h0_c = _pad_rows(h0.astype(f32), s_pad).reshape(nchunk, sc, 1, BLOCK)
    cap_c = _pad_rows(cap.astype(f32), s_pad).reshape(nchunk, sc, 1,
                                                      BLOCK)

    # flat per-block arrays ride as (S_c, 1, B): Mosaic requires the last
    # two block dims be (8k, 128m) or match the array dims
    out_shape = [jax.ShapeDtypeStruct((sc, 1, BLOCK), f32)
                 for _ in range(5)]

    def run_chunk(chunk):
        cand_k, xi_k, h0_k, cap_k = chunk
        args = ([cand_k, xi_k]
                + [pos_blocks] * _FAN + [valid_blocks] * _FAN
                + [h0_k, cap_k])
        return pl.pallas_call(
            kern, grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(sc, n_sweeps, n_m),
                in_specs=grid_spec.in_specs,
                out_specs=grid_spec.out_specs,
                scratch_shapes=grid_spec.scratch_shapes,
            ), out_shape=out_shape, interpret=interpret,
        )(*args)

    outs = jax.lax.map(run_chunk, (cand_c, xi_c, h0_c, cap_c))
    rho, h, vf, wk, done_f = (a.reshape(-1, BLOCK)[:S]
                              for a in outs)

    done = done_f > 0.5
    saturated = (~done) | (h >= cap * 0.999)
    return rho, h, vf, wk, done, saturated
