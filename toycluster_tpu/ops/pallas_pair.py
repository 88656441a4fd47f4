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

# speculative-accept safety factor for the stream kernel's h solve: a
# lane with |wkNgb - DESNNGB| < sqrt(NNGBDEV * DESNNGB / _SPEC_KAPPA)
# takes its Newton step without paying the confirming density sweep.
# The Newton contraction is quadratic, |e1| ~= kappa e0^2 / DESNNGB with
# kappa measured brute-force at 0.4 (cluster.par cusp, DESNNGB=295) and
# 2.25 worst-case (harsh test cusp, DESNNGB=64); _SPEC_KAPPA=5 keeps
# accepted lanes within the |wkNgb-DESNNGB| < 0.05 contract with >2x
# margin in the worst measured geometry.  <=0 disables (A/B escape).
_SPEC_KAPPA = float(__import__("os").environ.get("TOYCLUSTER_SPEC_KAPPA",
                                                 "5.0"))


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
                  qscale,                    # world-dist -> int quantizer
                  fixed_sweeps,              # True: fori, per-lane freeze
                  cand_ref,                  # (S, M) scalar prefetch
                  cnt_ref,                   # (S,) true candidate counts
                  gq_ref,                    # (S, m_pad) packed per-block
                  #                            bounds: (dist_q<<1)|dkeep
                  hq_ref,                    # (S,) per-row density skip
                  #                            threshold (ceil(cap*q))
                  *rest):
    # rest: 6 x receiver columns (1,B,1) [x0,x1,x2,h0,cap,hm_i],
    #       F x pos (1,3,B), F x hm (1,1,B), out (1,B,8),
    #       x0/x1/x2 scratch (M,B), hm scratch (M,B), acc scratch (B,8)
    # NB receiver scalars ride as separate (B,1) columns — slicing lanes
    # out of a packed (B,8) block gives lane-offset register layouts that
    # Mosaic cannot legalize through the while_loop carry (scf.yield)
    recv_refs = rest[:6]
    pos_refs = rest[6:6 + _FAN]
    hm_refs = rest[6 + _FAN:6 + 2 * _FAN]
    out_ref = rest[6 + 2 * _FAN]
    xsc = rest[6 + 2 * _FAN + 1:6 + 2 * _FAN + 4]
    hsc = rest[6 + 2 * _FAN + 4]
    acc_ref = rest[6 + 2 * _FAN + 5]

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
            """RAW kernel-weight sums at h (norm applied by callers):
            per-lane factors (1/h powers, the WC6 norm, the -22 of dW)
            are folded OUT of the pair loop — the per-pair work is u,
            t-powers, two short Horner polys.  Candidate blocks whose
            bbox distance bound (gq_ref, computed fresh against current
            positions by the caller) exceeds the block's max h are
            skipped: every pair they hold has u>1 and contributes an
            exact 0, so the skip is a pure flop saving."""
            inv_h = 1.0 / h
            inv_h2 = inv_h * inv_h
            acc_ref[:, 0:2] = jnp.zeros((BLOCK, 2), f32)
            # per-row static threshold (ceil-quantized max cap, from the
            # prologue): a vector->scalar max over the live h each sweep
            # would be tighter but costs a cross-vector extraction that
            # dominates low-count rows (measured ~3x the tile work)
            hq = hq_ref[s]

            def jbody(j, carry):
                for f in range(_FAN):
                    @pl.when((gq_ref[s, j * _FAN + f] >> 1) <= hq)
                    def _(f=f):
                        jf = pl.multiple_of(j * _FAN, _FAN) + f
                        r2 = jnp.zeros((BLOCK, BLOCK), f32)
                        for d in range(3):
                            dd = xi[d] - xsc[d][pl.ds(jf, 1), :]
                            dd = dd - boxsize * jnp.round(dd / boxsize)
                            r2 += dd * dd
                        hjf = hsc[pl.ds(jf, 1), :]
                        vj = (hjf > 0).astype(f32)
                        if kernel_kind == "m4":
                            r = jnp.sqrt(r2)
                            w, dw = _m4_w_dw(r, h)
                            acc_ref[:, 0:1] += (w * vj).sum(
                                axis=1, keepdims=True)
                            acc_ref[:, 1:2] += (r * dw * vj).sum(
                                axis=1, keepdims=True)
                        else:
                            u = jnp.sqrt(r2 * inv_h2)
                            t = jnp.maximum(1.0 - u, 0.0) * vj
                            t2 = t * t
                            t4 = t2 * t2
                            t7 = t4 * t2 * t
                            wpoly = 1.0 + u * (
                                8.0 + u * (25.0 + 32.0 * u))
                            dpoly = u * u * (1.0 + u * (7.0 + 16.0 * u))
                            acc_ref[:, 0:1] += (t4 * t4 * wpoly).sum(
                                axis=1, keepdims=True)
                            acc_ref[:, 1:2] += (t7 * dpoly).sum(
                                axis=1, keepdims=True)
                return carry

            jax.lax.fori_loop(0, n_grp, jbody, 0)
            return acc_ref[:, 0:1], acc_ref[:, 1:2]

        def norm_sums(h, raw_w, raw_rdw):
            if kernel_kind == "m4":
                return raw_w, raw_rdw
            inv_h = 1.0 / h
            norm_h3 = (1365.0 / (64.0 * const.PI)) * inv_h**3
            return raw_w * norm_h3, raw_rdw * (-22.0 * norm_h3)

        def newton(state):
            # `done` rides as f32 0/1 — Mosaic cannot legalize i1 vectors
            # through the while_loop carry (scf.yield); sums live in the
            # acc scratch so the post-loop record needs no extra pair
            # pass (frozen lanes keep their h, so the last sweep's sums
            # are exactly their final-h sums)
            k, h, lo, hi, done = state
            raw_w, raw_rdw = pair_sums(h)
            sum_w, sum_rdw = norm_sums(h, raw_w, raw_rdw)
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
                    jnp.where(freeze, 1.0, 0.0).astype(f32))

        def cond(state):
            k, _, _, _, done = state
            return (k < n_sweeps) & jnp.logical_not(jnp.all(done > 0.5))

        h0c = jnp.minimum(h0, cap)
        zero = jnp.zeros((BLOCK, 1), f32)
        state = (0, h0c, zero, cap, zero)
        if fixed_sweeps:
            # fixed trip count with per-lane freeze: drops the per-sweep
            # all-done vector->scalar reduction (the early exit it buys
            # fires after ~the same sweep count anyway on warm starts);
            # unrolled when short, fori otherwise
            if n_sweeps <= 4:
                for _ in range(n_sweeps):
                    state = newton(state)
            else:
                state = jax.lax.fori_loop(
                    0, n_sweeps, lambda _, st: newton(st), state)
            _, h, _, _, done_f = state
        else:
            _, h, _, _, done_f = jax.lax.while_loop(cond, newton, state)
        done = done_f > 0.5
        sum_w, sum_rdw = norm_sums(h, acc_ref[:, 0:1], acc_ref[:, 1:2])

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
        # the loop.  Blocks whose prologue-computed bound says every pair
        # has r > (hm_i + hm_j)/2 (keep bit 0 in gq) contribute exact 0
        # and are skipped.
        inv_box = 1.0 / boxsize

        def dbody(j, carry):
            for f in range(_FAN):
                @pl.when((gq_ref[s, j * _FAN + f] & 1) == 1)
                def _(f=f):
                    jf = pl.multiple_of(j * _FAN, _FAN) + f
                    dx = []
                    r2 = jnp.zeros((BLOCK, BLOCK), f32)
                    for d in range(3):
                        dd = xi[d] - xsc[d][pl.ds(jf, 1), :]
                        dd = (dd - boxsize * jnp.round(dd * inv_box)) \
                            * inv_box
                        dx.append(dd)
                        r2 += dd * dd
                    hmj = hsc[pl.ds(jf, 1), :]
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
                    inv_r = jnp.where(mask,
                                      1.0 / jnp.maximum(r, 1e-30), 0.0)
                    coef = w * inv_r
                    for d in range(3):
                        acc_ref[:, 2 + d:3 + d] += (coef * dx[d]).sum(
                            axis=1, keepdims=True)
            return carry

        zero3 = (zero, zero, zero)
        if do_disp:
            for d in range(3):
                acc_ref[:, 2 + d:3 + d] = zero
            jax.lax.fori_loop(0, n_grp, dbody, 0)
            dnorm = hm_i * (1.0 if kernel_kind == "m4"
                            else 1365.0 / (64.0 * const.PI))
            delta = tuple(dnorm * acc_ref[:, 2 + d:3 + d]
                          for d in range(3))
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
                          "mpart", "boxsize", "sb_mode", "do_disp",
                          "fixed_sweeps"))
def fused_wvt_pallas(pos_blocks, hm_blocks, cand, cnt, xi, h0, cap, hm_i,
                     mpart, boxsize, *, kernel="wc6", desnngb=295,
                     n_sweeps=16, interpret=False, sb_mode=False,
                     do_disp=True, gdist=None, dkeep=None,
                     fixed_sweeps=False):
    """Fused density-solve + WVT-displacement for one count class.

    pos_blocks: (nb, 3, B) sorted coords; hm_blocks: (nb, 1, B) source
    metric hsml in box units, 0 on invalid/padding lanes.
    cand: (S, M) candidate ids (-1 padded); cnt: (S,) true candidate
    counts (0 on padded receiver rows); xi: (S, 3, B) receiver coords;
    h0, cap, hm_i: (S, B).
    With sb_mode, cand holds SUPERBLOCK ids (ops/blocks.SUPER == _FAN
    blocks each) — the far-tail rows whose block-granular lists would
    overflow ride at 8x list compression with exact coverage.
    gdist (optional, (S, M_blocks) f32, world units): per-candidate-BLOCK
    lower bound on the receiver-to-block pair distance (bbox distance at
    CURRENT positions — callers recompute it every iteration, so there is
    no drift hazard); blocks farther than the running max h are skipped
    inside the Newton sweeps.  In sb_mode M_blocks = M*SUPER (one bound
    per expanded block).  dkeep (optional, same shape, bool): False where
    the bound already exceeds the largest possible displacement pair
    range 0.5*(max_i hm_i + max_j hm_j) — those blocks are skipped in the
    displacement pass.  Both prune exact-zero contributions only.
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
        if gdist is not None:
            gdist = jnp.concatenate(
                [gdist, jnp.full((S, pad), jnp.inf, gdist.dtype)],
                axis=1)
        if dkeep is not None:
            dkeep = jnp.concatenate(
                [dkeep, jnp.zeros((S, pad), bool)], axis=1)
        M += pad

    # packed per-block bounds: (floor(dist*qscale) << 1) | disp_keep
    m_blocks = M * _FAN if sb_mode else M
    qscale = float(2 ** 22) / float(boxsize)
    if gdist is None:
        gq = jnp.ones((S, m_blocks), jnp.int32)  # dist 0, keep: no-op
    else:
        dq = jnp.minimum(gdist * qscale, float((1 << 29) - 1))
        dq = jnp.maximum(dq, 0.0).astype(jnp.int32)
        keep = (jnp.ones((S, m_blocks), bool) if dkeep is None
                else dkeep)
        gq = (dq << 1) | keep.astype(jnp.int32)
    # per-row static density-skip threshold: ceil-quantized max cap (h
    # never exceeds cap, so `dist_q > hq` implies no pair within range)
    hq = (jnp.minimum(cap.max(axis=1) * qscale,
                      float(2 ** 30)).astype(jnp.int32) + 1)

    # receiver columns as SEPARATE (S, B, 1) arrays (canonical layouts —
    # see the kernel note on while_loop carries)
    xi_t = xi.transpose(0, 2, 1)
    recvs = [xi_t[:, :, d:d + 1] for d in range(3)] + [
        h0[..., None].astype(f32), cap[..., None].astype(f32),
        hm_i[..., None].astype(f32)]

    m_cache = M * _FAN if sb_mode else M
    kern = partial(_fused_kernel, kernel, float(desnngb), float(mpart),
                   float(boxsize), n_sweeps, m_cache,
                   nb if sb_mode else 0, do_disp, qscale, fixed_sweeps)

    def imap_s(s, m, cand_ref, cnt_ref, gq_ref, hq_ref):
        return (s, 0, 0)

    def make_imap_cand(f):
        if sb_mode:
            def imap(s, m, cand_ref, cnt_ref, gq_ref, hq_ref):
                return (jnp.minimum(
                    jnp.maximum(cand_ref[s, m], 0) * _FAN + f, nb - 1),
                    0, 0)
        else:
            def imap(s, m, cand_ref, cnt_ref, gq_ref, hq_ref):
                return (jnp.maximum(cand_ref[s, m * _FAN + f], 0), 0, 0)
        return imap

    sc = _row_chunks(S, M + m_blocks)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    cnt_c = jnp.concatenate(
        [jnp.minimum(cnt.astype(jnp.int32), M),  # width-truncated lists
         jnp.zeros((s_pad - S,), jnp.int32)]).reshape(nchunk, sc)
    gq_c = _pad_rows(gq, s_pad).reshape(nchunk, sc, m_blocks)
    hq_c = jnp.concatenate(
        [hq, jnp.zeros((s_pad - S,), jnp.int32)]).reshape(nchunk, sc)
    recv_c = [_pad_rows(r, s_pad).reshape(nchunk, sc, BLOCK, 1)
              for r in recvs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
                        for _ in range(4)]
        + [pltpu.VMEM((BLOCK, 8), f32)],
    )

    def run_chunk(chunk):
        args = (list(chunk) + [pos_blocks] * _FAN
                + [hm_blocks] * _FAN)
        (o,) = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sc, BLOCK, 8), f32)],
            interpret=interpret,
        )(*args)
        return o

    out = jax.lax.map(run_chunk,
                      tuple([cand_c, cnt_c, gq_c, hq_c] + recv_c))
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


# ---------------------------------------------------------------------------
# v3 "stream" kernel: grid over receiver rows ONLY, candidate blocks fetched
# by in-kernel double-buffered DMA with a DYNAMIC trip count (ceil(cnt/8)
# groups — the paged-attention gather pattern).  The v2 fused kernel pays a
# fixed pipeline cost for every (row, m) grid step of its static class
# width; with the skewed candidate-count distribution that tax measured
# ~3x the real tile work at 1e6 (most steps hold no data).  Streaming to
# the true count also removes the count-class machinery entirely — one
# call covers all rows, so the WVT iteration program has ONE shape (no
# recompile churn when class memberships drift, the dominant cost of the
# 1e7 flagship run).
#
# Per-block skip bounds ride as 2 bits packed 16-blocks/word in SMEM:
#   bit0: block beyond the row's max cap          -> skip density tiles
#   bit1: block within the displacement pair range -> compute disp tiles
# (computed fresh each iteration by the caller from current positions;
# both prune exact-zero contributions only).
# ---------------------------------------------------------------------------

_SLOTS = 2  # DMA double buffer

_BITS_CHUNK = 1024  # rows per chunk in stream_skip_bits (bounds temps)

_N_CHUNKS = int(__import__("os").environ.get(
    "TOYCLUSTER_N_CHUNKS", "8"))  # sub-chunks per block (chunk test)


def build_chunk_tab(pos_t, hm_src_b, n_chunks=_N_CHUNKS):
    """(nb, n_chunks*8) f32 chunk-geometry table for stream_skip_bits'
    chunk cross test: per 16-particle chunk of each 128-particle block,
    [cen xyz, ext xyz, chunk max source hm, 0].  Pad lanes are copies
    of a real particle (position) with hm zeroed, so chunk hulls stay
    exact bounds of the block's real content.

    Takes the kernel's (nb, 3, B) source layout so the 16-element
    min/max runs over the MINOR axis (the (nb, B, 3) form reduced over
    the middle axis measured 27 ms at 1e6)."""
    nb, _, B = pos_t.shape
    csz = B // n_chunks
    pc = pos_t.reshape(nb, 3, n_chunks, csz)
    lo = pc.min(axis=3)
    hi = pc.max(axis=3)                       # (nb, 3, nc)
    bh = hm_src_b.reshape(nb, n_chunks, csz).max(axis=2)
    tab = jnp.concatenate(
        [(0.5 * (lo + hi)).transpose(0, 2, 1),
         (0.5 * (hi - lo)).transpose(0, 2, 1),
         bh[..., None], jnp.zeros_like(bh[..., None])], axis=-1)
    return tab.reshape(nb, n_chunks * 8).astype(jnp.float32)


@partial(jax.jit, static_argnames=("boxsize", "sb", "margin_frac",
                                   "bucket_widths", "agg"))
def stream_skip_bits(bb_lo, bb_hi, bhm, idc, block_rows, cap_rows,
                     hm_rows, boxsize, sb=False, margin_frac=0.0,
                     bucket_ids=None, bucket_widths=None, agg=False,
                     chunk_tab=None):
    """Packed per-candidate-block skip words for the stream kernel.

    Two bits per block, 16 blocks per int32 word:
      bit0: the block's bbox distance to the receiver block exceeds the
            row's max cap -> every density pair is out of range, skip;
      bit1: within the displacement pair range 0.5*(max hm_i + max hm_j)
            -> compute the displacement tile.
    Chunked over rows (lax.map) so the (rows, M, 3) gather/arithmetic
    temporaries stay bounded — the eager/fused form OOMed at 1e6+.

    bb_lo/bb_hi: (nb, 3) CURRENT-position block bboxes; bhm: (nb,)
    per-block max source hm in box units (None -> disp bit 0 everywhere);
    idc: (S,) receiver block ids (clamped); block_rows: (S, Mb) candidate
    BLOCK ids, -1 invalid — or SUPERBLOCK ids with sb=True (expanded to
    member blocks inside the row chunks, never materialised whole);
    cap_rows: (S, B) world-unit caps; hm_rows: (S, B) receiver hm in box
    units (ignored when bhm is None).  Returns (S, ceil(Mb*/16)) int32
    where Mb* is the (expanded) block count padded to 16.

    bucket_ids / bucket_widths (optional, build-time count bucketing):
    matched tuples of row-id arrays (-1 padded, sticky-quantized sizes;
    dynamic) and their static candidate-list widths.  Rows run at their
    bucket's width instead of the full padded width — the per-candidate
    bbox gather is the dominant cost and scales with the processed
    width, while p50 counts sit ~10x below the padded width.

    margin_frac inflates both thresholds by (1+margin_frac): callers that
    reuse the bits across several WVT iterations (XLA gathers make this
    computation too slow to rerun every iteration) pick a margin covering
    the worst-case position/hm drift until the next rebuild, and enforce
    it with an accumulated-drift rebuild trigger.

    Returns (bits, safe): `safe` is a (S,) int32 flag, 1 where the
    receiver block's half-extent plus its maximum pair range stays below
    ~box/2 on every axis — the validity condition of the stream kernel's
    hoisted periodic wrap (sources wrapped once against the row centre).
    Rows with safe=0 fall back to per-pair min-image wrapping in-kernel.

    agg=True (stage A of the in-kernel-bits path): block_rows carry
    SUPERBLOCK ids tested against _FAN-group HULLS of the member-block
    geometry — 1/_FAN the gather rows of the member-level pass, and a
    conservative superset of it (a hull in range does not imply any
    member is).  One 2-bit field per superblock; feed
    compact_sb_lists_agg.

    chunk_tab (sb mode only): (nb, CHUNKS*8) f32 per-16-particle-chunk
    geometry [cen xyz, ext xyz, chunk max hm, 0] built by
    build_chunk_tab.  Replaces the member-level block-bbox test with an
    8x8 chunk-bbox CROSS test per (receiver, member) pair, against
    per-RECEIVER-CHUNK max cap/hm instead of the row max: strictly
    tighter (the r05 audit measured union kept/needed = 1.80x at 1e6
    from bbox + row-max-cap slack; chunk boxes span ~1/4 the block
    extent), still conservative (a chunk bbox bounds its particles, so
    any true in-range pair keeps its member).
    """
    assert not (sb and agg), "agg operates on unexpanded superblock ids"
    assert chunk_tab is None or sb, "chunk test needs superblock lists"
    S, Mb = block_rows.shape
    nb_blocks = bb_lo.shape[0]
    qscale = float(2 ** 22) / float(boxsize)
    mf = 1.0 + float(margin_frac)
    pad16 = (-Mb) % (2 if sb else 16)
    if pad16:
        block_rows = jnp.concatenate(
            [block_rows, jnp.full((S, pad16), -1, block_rows.dtype)],
            axis=1)
        Mb += pad16
    hq = (jnp.minimum(cap_rows.max(axis=1) * mf * qscale,
                      float(2 ** 30)).astype(jnp.int32) + 1)
    hmi = (hm_rows.max(axis=1) if bhm is not None
           else jnp.zeros((S,), jnp.float32))
    if chunk_tab is not None:
        ncc = chunk_tab.shape[1] // 8      # receiver/source chunks per block
        csz = cap_rows.shape[1] // ncc
        hq8 = (jnp.minimum(
            cap_rows.reshape(S, ncc, csz).max(axis=2) * mf * qscale,
            float(2 ** 30)).astype(jnp.int32) + 1)
        hm8 = (hm_rows.reshape(S, ncc, csz).max(axis=2)
               if bhm is not None else jnp.zeros((S, ncc), jnp.float32))
    else:
        hq8 = hm8 = None

    # hoisted-wrap validity (see stream_wvt_pallas): receiver half-extent
    # + max pair range must stay below box/2 on every axis
    r_pair = cap_rows.max(axis=1) * mf
    if bhm is not None:
        r_pair = jnp.maximum(
            r_pair, 0.5 * (hmi + bhm.max()) * float(boxsize) * mf)
    half_ext = 0.5 * (bb_hi[jnp.minimum(idc, nb_blocks - 1)]
                      - bb_lo[jnp.minimum(idc, nb_blocks - 1)])
    safe = jnp.all(half_ext + r_pair[:, None] < 0.49 * float(boxsize),
                   axis=1).astype(jnp.int32)

    # ONE packed gather row per candidate block — three narrow gathers
    # (lo, hi, bhm) cost ~3x as much as one 8-wide row (TPU gathers pay
    # per row, not per byte at this width)
    cen = 0.5 * (bb_lo + bb_hi)
    ext = 0.5 * (bb_hi - bb_lo)
    packed = jnp.concatenate(
        [cen, ext,
         (bhm if bhm is not None
          else jnp.zeros((nb_blocks,), bb_lo.dtype))[:, None],
         jnp.zeros((nb_blocks, 1), bb_lo.dtype)], axis=1)   # (nb, 8)
    if agg:
        # superblock-hull source table (receivers stay block-level)
        padm = (-nb_blocks) % _FAN
        lo_a = (jnp.concatenate([bb_lo, jnp.full((padm, 3), jnp.inf,
                                                 bb_lo.dtype)])
                if padm else bb_lo)
        hi_a = (jnp.concatenate([bb_hi, jnp.full((padm, 3), -jnp.inf,
                                                 bb_hi.dtype)])
                if padm else bb_hi)
        lo_sb = lo_a.reshape(-1, _FAN, 3).min(axis=1)
        hi_sb = hi_a.reshape(-1, _FAN, 3).max(axis=1)
        n_src = lo_sb.shape[0]
        if bhm is not None:
            bhm_sb = (jnp.concatenate([bhm, jnp.zeros((padm,),
                                                      bhm.dtype)])
                      if padm else bhm).reshape(-1, _FAN).max(axis=1)
        else:
            bhm_sb = jnp.zeros((n_src,), bb_lo.dtype)
        psrc = jnp.concatenate(
            [0.5 * (lo_sb + hi_sb), 0.5 * (hi_sb - lo_sb),
             bhm_sb[:, None], jnp.zeros((n_src, 1), bb_lo.dtype)],
            axis=1)
    else:
        psrc = packed

    if sb:
        # member geometry re-laid as ONE 64-f32 row per superblock: the
        # pass is gather-ROW-tax bound (~19 cy per 8-f32 row measured),
        # and a superblock's member rows are contiguous, so gathering
        # (m_w,) superblock rows of 256 B instead of (m_w*_FAN,) member
        # rows of 32 B moves the same bytes at 1/_FAN the row count.
        # Zero padding is safe: member validity is derived from ids
        # alone and forces dens_skip/no-disp on padded entries.
        padm = (-nb_blocks) % _FAN
        psrc_sb = (jnp.concatenate(
            [psrc, jnp.zeros((padm, 8), psrc.dtype)]) if padm
            else psrc).reshape(-1, 8 * _FAN)

    if chunk_tab is not None:
        # member chunk geometry as ONE wide row per member block
        ctab = chunk_tab                       # (nb, ncc*8)
        ncc_s = chunk_tab.shape[1] // 8

    def run_rows(idc_b, rows_b, hq_b, hmi_b, hq8_b=None, hm8_b=None):
        """Chunked skip-word computation for one bucket of rows —
        bounds the (rows, Mb, 3) gather/arithmetic temporaries."""
        s_rows, m_w = rows_b.shape
        mbx = m_w * _FAN if sb else m_w
        if chunk_tab is not None:
            mbx *= ncc_s * ncc_s               # 8x8 cross-test temps
        chunk = min(_BITS_CHUNK, s_rows,
                    max(32, (8 << 20) // max(mbx, 1)))
        nchunk = -(-s_rows // chunk)
        s_pad = nchunk * chunk

        def pad(x, fill=0):
            p = s_pad - x.shape[0]
            if not p:
                return x
            return jnp.concatenate(
                [x, jnp.full((p,) + x.shape[1:], fill, x.dtype)])

        def chunk_fn(args):
            idc_c, rows_c, hq_c, hmi_c = args[:4]
            if sb:
                e = (jnp.maximum(rows_c, 0)[:, :, None] * _FAN
                     + jnp.arange(_FAN, dtype=jnp.int32))
                ok = (rows_c >= 0)[:, :, None] & (e < nb_blocks)
                rows_c = jnp.where(ok, e, -1).reshape(
                    rows_c.shape[0], -1)
            rowsc = jnp.maximum(rows_c, 0)
            valid = rows_c >= 0
            if chunk_tab is not None:
                hq8_c, hm8_c = args[4], args[5]
                C, Mbx = rows_c.shape
                cj = ctab[rowsc].reshape(C, Mbx, ncc_s, 8)
                ci = ctab[idc_c].reshape(C, ncc_s, 8)
                # (C, Mbx, rc, mc, 3) pairwise chunk-bbox gaps
                d = (ci[:, None, :, None, :3]
                     - cj[:, :, None, :, :3])
                d = d - boxsize * jnp.round(d / boxsize)
                gap = jnp.maximum(
                    jnp.abs(d) - (ci[:, None, :, None, 3:6]
                                  + cj[:, :, None, :, 3:6]), 0.0)
                gd = jnp.sqrt((gap * gap).sum(-1))    # (C,Mbx,rc,mc)
                dq = jnp.minimum(gd * qscale,
                                 float(2 ** 30)).astype(jnp.int32)
                dens_any = (dq <= hq8_c[:, None, :, None]).any(
                    axis=(2, 3))
                dens_skip = ~dens_any | ~valid
                if bhm is None:
                    dk = jnp.zeros(rows_c.shape, bool)
                else:
                    thr = (0.5 * (hm8_c[:, None, :, None]
                                  + cj[:, :, None, :, 6])
                           * boxsize * mf)
                    dk = (gd <= thr).any(axis=(2, 3)) & valid
            else:
                pj = psrc[rowsc]                # (C, Mb, 8) one gather
                pi = packed[idc_c]              # (C, 8)
                d = pi[:, None, :3] - pj[:, :, :3]
                d = d - boxsize * jnp.round(d / boxsize)
                gap = jnp.maximum(jnp.abs(d) - (pi[:, None, 3:6]
                                                + pj[:, :, 3:6]), 0.0)
                gd = jnp.sqrt((gap * gap).sum(-1))
                dq = jnp.minimum(gd * qscale,
                                 float(2 ** 30)).astype(jnp.int32)
                dens_skip = (dq > hq_c[:, None]) | ~valid
                if bhm is None:
                    dk = jnp.zeros(rows_c.shape, bool)
                else:
                    dk = (gd <= 0.5 * (hmi_c[:, None] + pj[:, :, 6])
                          * boxsize * mf) & valid
            b2 = (dens_skip.astype(jnp.int32)
                  | (dk.astype(jnp.int32) << 1))
            b2 = b2.reshape(b2.shape[0], -1, 16)
            shifts = jnp.arange(16, dtype=jnp.int32) * 2
            return (b2 << shifts).sum(axis=2).astype(jnp.int32)

        mapped = [
            pad(idc_b).reshape(nchunk, chunk),
            pad(rows_b, -1).reshape(nchunk, chunk, m_w),
            pad(hq_b).reshape(nchunk, chunk),
            pad(hmi_b).reshape(nchunk, chunk)]
        if chunk_tab is not None:
            mapped += [
                pad(hq8_b).reshape(nchunk, chunk, ncc_s),
                pad(hm8_b).reshape(nchunk, chunk, ncc_s)]
        words = jax.lax.map(chunk_fn, tuple(mapped))
        return words.reshape(s_pad, -1)[:s_rows]

    idc_cl = jnp.minimum(idc, nb_blocks - 1)
    nw_full = (Mb * _FAN if sb else Mb) // 16
    if bucket_ids is None:
        return run_rows(idc_cl, block_rows, hq, hmi, hq8, hm8), safe

    out = jnp.zeros((S, nw_full), jnp.int32)
    for ids, w in zip(bucket_ids, bucket_widths):
        idr = jnp.maximum(ids, 0)
        wb = run_rows(idc_cl[idr], block_rows[:, :w][idr], hq[idr],
                      hmi[idr],
                      None if hq8 is None else hq8[idr],
                      None if hm8 is None else hm8[idr])
        tgt = jnp.where(ids >= 0, ids, S)
        out = out.at[tgt, :wb.shape[1]].set(wb, mode="drop")
    return out, safe


def compact_sb_lists(cand, cnt, bits, *, do_disp=True):
    """Per-iteration superblock-list compaction from the skip bits.

    The stream kernel pays ~60-100 cycles of bits-decode/branch/DMA-wait
    per VISITED member block whether or not its tile runs; at 1e6 the
    p50 row streams 224 member blocks but computes only ~81.  Reorder
    each row's superblock list so the superblocks with at least one
    useful member come FIRST (stable sort keeps the distance order) and
    shrink the dynamic trip count to just those — the kernel maps
    compacted slots back to their original skip-bit positions through
    `pos_it`.  No shapes change, so no recompiles.

    A superblock is useless iff every member's 2-bit field is 1
    (dens-skip, no disp-keep): its 16-bit half-word equals 0x5555.
    Density-only callers test just the dens bits (& 0x5555 == 0x5555).

    Returns (cand_it, pos_it, cnt_it).
    """
    S, M = cand.shape
    w = bits
    if do_disp:
        lo_use = (w & 0xFFFF) != 0x5555
        hi_use = jax.lax.shift_right_logical(w, 16) != 0x5555
    else:
        lo_use = (w & 0x5555) != 0x5555
        hi_use = (jax.lax.shift_right_logical(w, 16) & 0x5555) != 0x5555
    sb_useful = jnp.stack([lo_use, hi_use], axis=2).reshape(S, -1)[:, :M]
    in_list = (jnp.arange(M, dtype=jnp.int32)[None, :]
               < jnp.minimum(cnt, M)[:, None])
    keep = sb_useful & in_list & (cand >= 0)
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (S, M))
    _, cand_it, pos_it = jax.lax.sort(
        ((~keep).astype(jnp.int32), cand.astype(jnp.int32), pos),
        dimension=1, is_stable=True, num_keys=1)
    cnt_it = keep.sum(axis=1).astype(jnp.int32)
    return cand_it, pos_it, cnt_it


def compact_sb_lists_agg(cand, cnt, bits_sb, *, do_disp=True):
    """Compaction from STAGE-A superblock-hull bits (one 2-bit field
    per superblock from stream_skip_bits(agg=True), a conservative
    superset of the member-level test) for the in-kernel-bits stream
    path: keep a superblock unless its field is dens-skip with no
    disp-keep.  Returns (cand_it, cnt_it) — the in-kernel member test
    keys its SMEM cache by list position, so no slot map is needed."""
    S, M = cand.shape
    idxs = jnp.arange(M, dtype=jnp.int32)
    fields = (bits_sb[:, idxs >> 4] >> (2 * (idxs & 15))) & 3
    if do_disp:
        useful = fields != 1
    else:
        useful = (fields & 1) == 0
    in_list = idxs[None, :] < jnp.minimum(cnt, M)[:, None]
    keep = useful & in_list & (cand >= 0)
    _, cand_it = jax.lax.sort(
        ((~keep).astype(jnp.int32), cand.astype(jnp.int32)),
        dimension=1, is_stable=True, num_keys=1)
    cnt_it = keep.sum(axis=1).astype(jnp.int32)
    return cand_it, cnt_it


def _stream_kernel(kernel_kind, desnngb, mpart, boxsize, n_sweeps,
                   sb_nb, do_disp, ik_bits,
                   cand_ref,                 # (S, M) scalar prefetch
                   cnt_ref,                  # (S,)
                   bits_ref,                 # (S, ceil(Mb/16)) packed skip
                   cen_ref,                  # (S, 4) quantized row centre
                   #                           + hoisted-wrap safe flag
                   pos_ref,                  # (S, M) original list slot of
                   #                           each (compacted) cand slot
                   rowq_ref,                 # (S, 8) f32 receiver bbox
                   #                           cen/ext + hq/hmi (ik_bits)
                   mtab_ref,                 # (nb_pad, 8) f32 member bbox
                   #                           cen/ext + bhm (ik_bits)
                   *rest):
    # rest: 6 receiver columns (1,B,1) [x0,x1,x2,h0,cap,hm_i],
    #       src_ref (nb, 4, B) in ANY (rows 0-2 coords, row 3 source hm),
    #       out (1, B, 8), csc scratch (SLOTS*FAN*4, B), acc (B, 8),
    #       sem (SLOTS*FAN,) DMA semaphores
    recv_refs = rest[:6]
    src_ref = rest[6]
    out_ref = rest[7]
    csc = rest[8]
    acc_ref = rest[9]
    acc2 = rest[10]     # (5*B, B) full-tile accumulators (see below)
    bsc = rest[11]      # (nw,) int32 SMEM cache of in-kernel skip words
    sem = rest[12]

    s = pl.program_id(0)
    f32 = jnp.float32

    _GROUP_ROWS = _FAN * 4

    def copy_of(g, f):
        """Group DMA: in sb mode one descriptor moves the whole
        superblock (its _FAN member blocks are CONTIGUOUS rows of the
        flattened source — the big win of superblock lists); block mode
        issues one descriptor per block (f)."""
        slot = jax.lax.rem(g, _SLOTS)
        if sb_nb:
            sb = jnp.maximum(cand_ref[s, g], 0)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(sb * _GROUP_ROWS, _GROUP_ROWS), :],
                csc.at[pl.ds(slot * _GROUP_ROWS, _GROUP_ROWS), :],
                sem.at[slot])
        b = jnp.maximum(cand_ref[s, g * _FAN + f], 0)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(b * 4, 4), :],
            csc.at[pl.ds((slot * _FAN + f) * 4, 4), :],
            sem.at[slot * _FAN + f])

    def bits(g, f):
        # pos_ref maps the (possibly compacted) cand slot back to its
        # original list position — the skip bits stay full-width
        idx = (pos_ref[s, g] * _FAN + f if sb_nb
               else pos_ref[s, g * _FAN + f])
        word = bits_ref[s, idx >> 4]
        return (word >> (2 * (idx & 15))) & 3

    def bits_cached(g, f):
        # ik_bits mode: sweep 0 computed the member tests in-kernel and
        # cached the packed words in SMEM scratch, keyed by LIST
        # position (the compacted list needs no slot map back)
        idx = g * _FAN + f
        word = bsc[idx >> 4]
        return (word >> (2 * (idx & 15))) & 3

    @pl.when(cnt_ref[s] > 0)
    def _():
        xi = [recv_refs[d][0] for d in range(3)]      # (B,1) each
        h0 = recv_refs[3][0]
        cap = recv_refs[4][0]
        hm_i = recv_refs[5][0]
        n_grp = (cnt_ref[s] if sb_nb else
                 (cnt_ref[s] + _FAN - 1) // _FAN)
        inv_box = 1.0 / boxsize
        qinv = boxsize / float(2 ** 22)
        xref = [cen_ref[s, d].astype(f32) * qinv for d in range(3)]
        # hoisted-wrap validity flag (stream_skip_bits): rows whose
        # half-extent + max pair range could reach box/2 re-wrap per pair
        safe = cen_ref[s, 3] > 0

        # ---- in-kernel member skip test (ik_bits mode) ----
        # Replaces the per-iteration XLA member-level stream_skip_bits
        # pass (gather-row-tax bound over the FULL list width) with ~35
        # scalar-unit ops per VISITED member of the stage-A-compacted
        # list, computed during sweep 0 and cached in SMEM scratch for
        # the later density sweeps.  Conservative bbox tests keep a
        # superset of in-range blocks; extra tiles contribute exact
        # zeros (the property compaction already relies on), so outputs
        # are unchanged.  Scalar work overlaps the VPU tile stream.
        if ik_bits:
            hqw = rowq_ref[s, 6]
            hq2 = hqw * hqw
            hmi_row = rowq_ref[s, 7]
        half_box = 0.5 * boxsize

        def member_test(g, f):
            """2-bit skip field for member f of the g-th listed
            candidate, from receiver/member bbox hulls (same geometry
            as stream_skip_bits, float instead of quantized — both are
            conservative bounds on the true pair distances)."""
            if sb_nb:
                b = jnp.maximum(cand_ref[s, g], 0) * _FAN + f
                invalid = jnp.int32(0)   # g < n_grp entries are real;
                #                          past-nb members have hm=0
                #                          sources -> zero contribution
            else:
                c = cand_ref[s, g * _FAN + f]
                b = jnp.maximum(c, 0)
                invalid = (c < 0).astype(jnp.int32)
            gd2 = jnp.float32(0.0)
            for d in range(3):
                dd = rowq_ref[s, d] - mtab_ref[b, d]
                dd = jnp.where(dd > half_box, dd - boxsize, dd)
                dd = jnp.where(dd < -half_box, dd + boxsize, dd)
                gp = (jnp.abs(dd) - rowq_ref[s, 3 + d]
                      - mtab_ref[b, 3 + d])
                gp = jnp.maximum(gp, 0.0)
                gd2 = gd2 + gp * gp
            dens_skip = (gd2 > hq2).astype(jnp.int32) | invalid
            if do_disp:
                thr = (hmi_row + mtab_ref[b, 6]) * half_box
                disp_keep = ((gd2 <= thr * thr).astype(jnp.int32)
                             & (1 - invalid))
                return dens_skip | (disp_keep << 1)
            return dens_skip

        # receiver coords centred on the row's reference point — pairs
        # with the centred source rows built in stream_pass need no
        # per-pair reference subtraction.
        # NB an MXU r2 tile via the augmented quadratic identity
        # ([-2x|1||x|^2] @ [x;|x|^2;1], K=8) was tried and REVERTED:
        # measured 898 ms vs 615 ms per fused pass at 1e6 (the K=8
        # matmul wastes 15/16 of the systolic depth while the operand
        # augmentation adds VPU work), and its quadratic-identity
        # roundoff created spurious saturated lanes (n_sat 3 vs 0)
        # that triggered rebuild storms in the WVT loop.
        xi_c = [xi[d] - xref[d] for d in range(3)]

        def issue(g):
            if sb_nb:
                copy_of(g, 0).start()
            else:
                for f in range(_FAN):
                    copy_of(g, f).start()

        def stream_pass(tile_fn, keep_bit, wrap, ik_mode=None):
            """fori over candidate groups: double-buffered DMA, per-block
            skip via the packed bits (keep_bit 0: density, 1: disp,
            2: union — the fused sweep-0 pass streams a block if EITHER
            consumer needs it; the tile gates each part on its own bit).
            `wrap` (python bool): re-wrap pair separations per pair —
            the fallback for rows where the hoisted wrap could alias.
            `ik_mode` (static): None reads the prefetched bits;
            "first" computes member_test in-kernel and caches the packed
            words in bsc; "cached" reads them back."""
            issue(0)

            def body(g, carry):
                @pl.when(g + 1 < n_grp)
                def _():
                    issue(g + 1)
                slot = jax.lax.rem(g, _SLOTS)
                if sb_nb:
                    copy_of(g, 0).wait()
                word = carry
                for f in range(_FAN):
                    if not sb_nb:
                        copy_of(g, f).wait()
                    if ik_mode == "first":
                        b2 = member_test(g, f)
                        word = word | (b2 << (2 * ((g & 1) * _FAN + f)))
                    elif ik_mode == "cached":
                        b2 = bits_cached(g, f)
                    else:
                        b2 = bits(g, f)
                    if keep_bit == 0:
                        cond = (b2 & 1) == 0
                    elif keep_bit == 1:
                        cond = (b2 & 2) == 2
                    else:
                        cond = ((b2 & 1) == 0) | ((b2 & 2) == 2)
                    @pl.when(cond)
                    def _(f=f, slot=slot, b2=b2):
                        row = (slot * _FAN + f) * 4
                        # hoist the periodic min-image wrap out of the
                        # (B,B) tile: wrap the CENTRED source row once
                        # against the row's reference point.  Valid when
                        # half-extent + pair range < box/2 (checked per
                        # row by stream_skip_bits): any in-range pair
                        # then lands at its true min-image separation,
                        # and far sources can only come out FARTHER
                        # (never aliased into kernel support).  Unsafe
                        # rows keep the centred-but-unwrapped rows and
                        # re-wrap per pair in the tile.
                        t = [csc[pl.ds(row + d, 1), :] - xref[d]
                             for d in range(3)]
                        if not wrap:
                            t = [x - boxsize * jnp.round(x * inv_box)
                                 for x in t]
                        hj = csc[pl.ds(row + 3, 1), :]
                        tile_fn(t, hj, wrap, b2)
                if ik_mode == "first":
                    # two groups (16 members x 2 bits) share a word:
                    # flush after every odd group and at the tail
                    @pl.when(((g & 1) == 1) | (g == n_grp - 1))
                    def _(word=word):
                        bsc[g >> 1] = word
                    return jnp.where((g & 1) == 1, 0, word)
                return word

            jax.lax.fori_loop(0, n_grp, body, jnp.int32(0))

        def branch_pass(tile_fn, keep_bit, ik_mode=None):
            """Row-level branch on the hoisted-wrap validity: the safe
            variant (no per-pair wrap) runs for ~all rows; oversized
            sparse-outskirt rows pay the per-pair min-image re-wrap."""
            @pl.when(safe)
            def _():
                stream_pass(tile_fn, keep_bit, False, ik_mode)

            @pl.when(jnp.logical_not(safe))
            def _():
                stream_pass(tile_fn, keep_bit, True, ik_mode)

        # ------------- fused density solve + displacement -------------
        # sweep 0 is hoisted out of the Newton while_loop as a UNION
        # pass: the displacement needs no solved h (it runs on the
        # metric hsml, wvt_relax.c:126-171), so it shares the sweep-0
        # DMA stream and the pair distances (dd, r2, rsqrt) with the
        # first density sweep.  Later sweeps (unconverged lanes only)
        # stream density-only blocks with the cheaper sqrt form.
        # NB per-32-receiver sub-row gating was tried and REVERTED: the
        # 4x scf.if regions per streamed block cost ~26 cycles each,
        # exceeding the ~25% pair-volume saving (measured 992 ms vs
        # 579 ms per fused pass at 1e6).
        #
        # Per-pair sums accumulate into FULL (B,B) tiles (acc2) and are
        # lane-reduced ONCE at the end of each pass: the per-tile
        # sum(axis=1) lane reduction (~7 shuffle steps over 16 vregs
        # per quantity) was ~10-15% of the pass's issue slots.
        def dens_accum(u, vj, h, r=None):
            """WC6 density accumulation from the pair u; m4 takes r."""
            if kernel_kind == "m4":
                w, dw = _m4_w_dw(r, h)
                acc2[0:BLOCK, :] += w * vj
                acc2[BLOCK:2 * BLOCK, :] += (r * dw) * vj
            else:
                t = jnp.maximum(1.0 - u, 0.0) * vj
                t2 = t * t
                t4 = t2 * t2
                t7 = t4 * t2 * t
                wpoly = 1.0 + u * (8.0 + u * (25.0 + 32.0 * u))
                dpoly = u * u * (1.0 + u * (7.0 + 16.0 * u))
                acc2[0:BLOCK, :] += t4 * t4 * wpoly
                acc2[BLOCK:2 * BLOCK, :] += t7 * dpoly

        def tile_r2(xjc, wrap):
            """(B,B) pair separations for one streamed block.  Safe rows
            use the hoisted wrap (sources pre-wrapped once per block in
            stream_pass); oversized rows re-wrap per pair."""
            dx = []
            r2 = jnp.zeros((BLOCK, BLOCK), f32)
            for d in range(3):
                dd = xi_c[d] - xjc[d]
                if wrap:
                    dd = dd - boxsize * jnp.round(dd * inv_box)
                dx.append(dd)
                r2 += dd * dd
            return r2, dx

        def reduce_dens():
            acc_ref[:, 0:1] = acc2[0:BLOCK, :].sum(
                axis=1, keepdims=True)
            acc_ref[:, 1:2] = acc2[BLOCK:2 * BLOCK, :].sum(
                axis=1, keepdims=True)

        def density_pass(h, ik_mode=None):
            inv_h2 = 1.0 / (h * h)
            acc2[0:2 * BLOCK, :] = jnp.zeros((2 * BLOCK, BLOCK), f32)

            def tile(xjc, hj, wrap, b2):
                r2, _dx = tile_r2(xjc, wrap)
                vj = (hj > 0).astype(f32)
                if kernel_kind == "m4":
                    dens_accum(None, vj, h, r=jnp.sqrt(r2))
                else:
                    dens_accum(jnp.sqrt(r2 * inv_h2), vj, h)

            branch_pass(tile, 0, ik_mode)
            reduce_dens()

        def disp_coef(r2, r, inv_r, hj, noise_floor):
            """masked flat-kernel displacement coefficient w(u)/r —
            all in WORLD units (w * dx/r is unit-free, so no box
            conversions are needed per pair)."""
            hbar = (hm_i + hj) * (0.5 * boxsize)   # hm rides box units
            mask = (r2 < hbar * hbar) & (r2 > noise_floor) & (hj > 0.0)
            u = jnp.where(mask, r / hbar, 1.0)
            if kernel_kind == "m4":
                wflat = _m4_flat(u)
            else:
                t = jnp.maximum(1.0 - u, 0.0)
                t2 = t * t
                t4 = t2 * t2
                wflat = t4 * t4 * (
                    1.0 + u * (8.0 + u * (25.0 + 32.0 * u)))
            return jnp.where(mask, wflat, 0.0) * inv_r

        def union_pass(h, inv_h):
            """sweep 0 with do_disp: one stream over the union of the
            density and displacement block sets; each part gated by its
            own skip bit, sharing the r2 tile between the consumers."""
            acc2[...] = jnp.zeros((5 * BLOCK, BLOCK), f32)

            def tile(xjc, hj, wrap, b2):
                r2, dx = tile_r2(xjc, wrap)
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
                r = r2 * inv_r                  # exact enough; 0 -> 0

                @pl.when((b2 & 1) == 0)
                def _():
                    vj = (hj > 0).astype(f32)
                    if kernel_kind == "m4":
                        dens_accum(None, vj, h, r=r)
                    else:
                        dens_accum(r * inv_h, vj, h)

                @pl.when((b2 & 2) == 2)
                def _():
                    # r2 is exact: r2 == 0 only for self pairs
                    coef = disp_coef(r2, r, inv_r, hj, 0.0)
                    for d in range(3):
                        acc2[(2 + d) * BLOCK:(3 + d) * BLOCK, :] += (
                            coef * dx[d])

            branch_pass(tile, 2, "first" if ik_bits else None)
            reduce_dens()
            for d in range(3):
                acc_ref[:, 2 + d:3 + d] = acc2[
                    (2 + d) * BLOCK:(3 + d) * BLOCK, :].sum(
                    axis=1, keepdims=True)

        def norm_sums(h, raw_w, raw_rdw):
            if kernel_kind == "m4":
                return raw_w, raw_rdw
            inv_h = 1.0 / h
            norm_h3 = (1365.0 / (64.0 * const.PI)) * inv_h**3
            return raw_w * norm_h3, raw_rdw * (-22.0 * norm_h3)

        def update(state):
            """Newton/bisection h update from the accumulated sums
            (sph.c:175-195), with SPECULATIVE ACCEPT: the measured
            Newton contraction of wkNgb(h) is quadratic (|e0|<4 -> one
            step lands at |e1|<0.022, brute-force measured on the
            cluster.par cusp), so a lane whose deviation is already
            < _SPEC_WIN takes its unclamped in-range Newton step and
            freezes WITHOUT paying the confirming density sweep — the
            epilogue first-order-extrapolates its sums over
            h - h_meas.  The reference always re-measures
            (sph.c:159-166); the contract |wkNgb-295|<0.05 still holds
            with >2x margin at the kappa-scaled window (see
            _SPEC_KAPPA) and is asserted red/green by bench.py on the
            clean find_sph_quantities pass."""
            k, h, hm_meas, lo, hi, done = state
            sum_w, sum_rdw = norm_sums(h, acc_ref[:, 0:1],
                                       acc_ref[:, 1:2])
            wk_ngb = const.FOURPITHIRD * h**3 * sum_w
            rho = mpart * sum_w
            drho = -mpart * (3.0 / h * sum_w + sum_rdw / h)
            ngb_dev = jnp.abs(wk_ngb - desnngb)
            now_done = ngb_dev < const.NNGBDEV
            omega = 1.0 + drho * h / (3.0 * jnp.maximum(rho, 1e-30))
            fac = 1.0 - (wk_ngb - desnngb) / (
                3.0 * jnp.maximum(wk_ngb, 1e-30) * omega)
            fac = jnp.clip(fac, 1.0 / 1.24, 1.24)
            hi_n = jnp.where(wk_ngb > desnngb, h, hi)
            lo_n = jnp.where(wk_ngb < desnngb, h, lo)
            h_bis = (0.5 * (lo_n**3 + hi_n**3)) ** (1.0 / 3.0)
            h_new = jnp.where(ngb_dev < 0.5 * desnngb, h * fac, h_bis)
            h_new = jnp.minimum(h_new, cap)
            spec_win = ((const.NNGBDEV * desnngb / _SPEC_KAPPA) ** 0.5
                        if _SPEC_KAPPA > 0 else 0.0)
            spec = ((done < 0.5) & ~now_done & (ngb_dev < spec_win)
                    & (h * fac < cap))
            freeze = (done > 0.5) | now_done
            keep = freeze | spec
            # every pass recomputes the sums at each lane's CURRENT h
            # (already-accepted lanes included), so the sums always
            # correspond to this update's input h; only lanes that
            # continue move to h_new before their next measurement
            del hm_meas
            return (k + 1, jnp.where(freeze, h, h_new),
                    jnp.where(keep, h, h_new), lo_n, hi_n,
                    jnp.where(keep, 1.0, 0.0).astype(f32))

        def newton(state):
            density_pass(state[1], "cached" if ik_bits else None)
            return update(state)

        def cond(state):
            k = state[0]
            done = state[5]
            return (k < n_sweeps) & jnp.logical_not(jnp.all(done > 0.5))

        h0c = jnp.minimum(h0, cap)
        zero = jnp.zeros((BLOCK, 1), f32)
        # sweep 0 (fused when do_disp), then the remaining sweeps
        if do_disp:
            union_pass(h0c, 1.0 / h0c)
        else:
            density_pass(h0c, "first" if ik_bits else None)
        state = update((0, h0c, h0c, zero, cap, zero))
        _, h, h_meas, _, _, done_f = jax.lax.while_loop(cond, newton,
                                                        state)
        done = done_f > 0.5
        # the sums correspond to h_meas (== h except for speculatively
        # accepted lanes); extrapolate sum_w to h first-order through
        # d(sum_w)/dh = -(3 sum_w + sum_rdw)/h
        sum_w, sum_rdw = norm_sums(h_meas, acc_ref[:, 0:1],
                                   acc_ref[:, 1:2])
        sum_w = sum_w - (3.0 * sum_w + sum_rdw) / h_meas * (h - h_meas)

        wk_ngb = const.FOURPITHIRD * h**3 * sum_w
        rho = mpart * sum_w
        drho = -mpart * (3.0 / h * sum_w + sum_rdw / h)
        now_done = jnp.abs(wk_ngb - desnngb) < const.NNGBDEV
        rho_out = rho
        if kernel_kind == "wc6":  # Dehnen+12 (sph.c:202-210)
            w0 = 1365.0 / (64.0 * const.PI) / (h * h * h)
            rho_out = rho + (-0.0116 * (desnngb * 0.01) ** (-2.236)
                             * mpart * w0)

        if do_disp:
            dnorm = hm_i * (1.0 if kernel_kind == "m4"
                            else 1365.0 / (64.0 * const.PI))
            delta = tuple(dnorm * acc_ref[:, 2 + d:3 + d]
                          for d in range(3))
        else:
            delta = (zero, zero, zero)

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
                          "mpart", "boxsize", "sb_mode", "do_disp",
                          "inkernel_bits"))
def stream_wvt_pallas(src_blocks, cand, cnt, xi, h0, cap, hm_i,
                      mpart, boxsize, gdist=None, dkeep=None, *,
                      kernel="wc6", desnngb=295, n_sweeps=16,
                      interpret=False, sb_mode=False, do_disp=True,
                      bits=None, safe=None, cand_pos=None,
                      rowq=None, mtab=None, inkernel_bits=False):
    """v3 dynamic-streaming density solve + WVT displacement.

    src_blocks: (nb, 4, B) sorted sources — rows 0-2 coords (world), row
    3 the metric hsml in box units (0 on invalid lanes; doubles as the
    validity mask).  cand (S, M) block ids (-1 padded) or superblock ids
    with sb_mode; cnt (S,) true counts; xi (S, 3, B), h0/cap/hm_i (S, B)
    receivers.  gdist (S, M_blocks) world-unit per-block distance lower
    bounds and dkeep (S, M_blocks) displacement-range keeps are REQUIRED
    (computed fresh per iteration by the callers; prune exact zeros).
    Returns (rho, hsml, var_fac, wk_ngb, done, delta) like
    fused_wvt_pallas.

    `safe` (S,) int32 (from stream_skip_bits) marks rows where the
    hoisted periodic wrap is valid; None computes it here.  Candidate
    counts are clamped to the list width in all modes, so callers whose
    counts reflect pre-truncation hits (the _SB_WIDTH_CAP nearest-
    superblock truncation) are safe by construction.

    `inkernel_bits=True` (requires `rowq` (S, 8) receiver bbox
    cen/ext/max-cap/max-hm and `mtab` (nb, 8) member bbox cen/ext/bhm)
    computes the member skip test IN-KERNEL during sweep 0 — caching
    the packed words in SMEM scratch for later sweeps — instead of
    reading a precomputed member-level `bits` array.  Callers pair it
    with stage-A superblock-hull bits (stream_skip_bits(agg=True)) +
    compact_sb_lists_agg, eliminating the full-width member-level XLA
    bits pass.  Outputs are exactly equal either way: the conservative
    hull tests only decide which all-zero tiles are skipped.
    """
    S, M = cand.shape
    nb = src_blocks.shape[0]
    f32 = jnp.float32
    if inkernel_bits and (rowq is None or mtab is None):
        raise ValueError("inkernel_bits=True requires rowq and mtab")
    # pad the list width so expanded block counts land on 16 (the skip
    # word packing) and on _FAN (the group loop)
    mult = 2 if sb_mode else 16
    if M % mult:
        pad = mult - M % mult
        cand = jnp.concatenate(
            [cand, jnp.full((S, pad), -1, cand.dtype)], axis=1)
        if cand_pos is not None:
            cand_pos = jnp.concatenate(
                [cand_pos, jnp.zeros((S, pad), jnp.int32)], axis=1)
        if gdist is not None:
            gdist = jnp.concatenate(
                [gdist, jnp.full((S, pad * (_FAN if sb_mode else 1)),
                                 jnp.inf, gdist.dtype)], axis=1)
        if dkeep is not None:
            dkeep = jnp.concatenate(
                [dkeep, jnp.zeros((S, pad * (_FAN if sb_mode else 1)),
                                  bool)], axis=1)
        M += pad
    m_blocks = M * _FAN if sb_mode else M
    nw = m_blocks // 16

    if inkernel_bits:
        bits = jnp.zeros((S, 1), jnp.int32)   # unused; computed in-kernel
    elif bits is None:
        # pack per-block skips inline (small problems / tests; at scale
        # callers precompute via stream_skip_bits to bound temporaries)
        qscale = float(2 ** 22) / float(boxsize)
        hq = jnp.minimum(cap.max(axis=1) * qscale,
                         float(2 ** 30)).astype(jnp.int32) + 1
        if gdist is None:
            gdist = jnp.zeros((S, m_blocks), f32)
        if dkeep is None:
            dkeep = jnp.ones((S, m_blocks), bool)
        # the v3 kernel has no in-kernel candidate-validity mask — the
        # bits carry it: padded (-1) entries and past-nb superblock
        # members MUST be skipped or block 0 is double-counted
        if sb_mode:
            e = (jnp.maximum(cand, 0)[:, :, None] * _FAN
                 + jnp.arange(_FAN, dtype=jnp.int32))
            validb = ((cand >= 0)[:, :, None] & (e < nb)).reshape(
                S, m_blocks)
        else:
            validb = cand >= 0
        dq = jnp.minimum(gdist * qscale,
                         float(2 ** 30)).astype(jnp.int32)
        b2 = (((dq > hq[:, None]) | ~validb).astype(jnp.int32)
              | ((dkeep & validb).astype(jnp.int32) << 1))
        b2 = b2.reshape(S, nw, 16)
        shifts = jnp.arange(16, dtype=jnp.int32) * 2
        bits = (b2 << shifts).sum(axis=2).astype(jnp.int32)
    elif bits.shape[1] != nw:
        raise ValueError(
            f"skip-bit width {bits.shape[1]} != expected {nw} "
            f"(m_blocks={m_blocks})")

    xi_t = xi.transpose(0, 2, 1)
    recvs = [xi_t[:, :, d:d + 1] for d in range(3)] + [
        h0[..., None].astype(f32), cap[..., None].astype(f32),
        hm_i[..., None].astype(f32)]

    kern = partial(_stream_kernel, kernel, float(desnngb), float(mpart),
                   float(boxsize), n_sweeps, nb if sb_mode else 0,
                   do_disp, inkernel_bits)

    def imap_s(s, *prefetch):
        return (s, 0, 0)

    if inkernel_bits:
        # the in-kernel test keys the SMEM cache by LIST position —
        # no slot map back to original bits positions is needed
        cand_pos = jnp.zeros((S, 1), jnp.int32)
    elif cand_pos is None:
        cand_pos = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32), (S, M))
    pw = cand_pos.shape[1]
    bw = bits.shape[1]
    sc = _row_chunks(S, 2 * M + nw)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    pos_c = _pad_rows(cand_pos.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, pw)
    # clamp counts to the list width: rows truncated at build time
    # (_SB_WIDTH_CAP nearest-superblock lists) report their TRUE hit
    # count — without the clamp the group loop would index past the
    # prefetched row (garbage DMAs / misaligned skip bits)
    cnt_c = jnp.concatenate(
        [jnp.minimum(cnt.astype(jnp.int32), M),
         jnp.zeros((s_pad - S,), jnp.int32)]).reshape(nchunk, sc)
    bits_c = _pad_rows(bits, s_pad).reshape(nchunk, sc, bw)
    if rowq is None:
        rowq = jnp.zeros((S, 8), f32)
    rowq_c = _pad_rows(rowq.astype(f32), s_pad).reshape(nchunk, sc, 8)
    # per-row reference point for the in-kernel wrap hoisting (the row
    # bbox centre, crudely quantized — it only needs to be well inside
    # box/2 of every in-range pair) + the hoisted-wrap validity flag
    qs = float(2 ** 22) / float(boxsize)
    xlo = xi.min(axis=2)
    xhi = xi.max(axis=2)
    if safe is None:
        r_pair = cap.max(axis=1)
        if do_disp:
            r_pair = jnp.maximum(
                r_pair, 0.5 * (hm_i.max(axis=1)
                               + src_blocks[:, 3, :].max())
                * float(boxsize))
        safe = jnp.all(0.5 * (xhi - xlo) + r_pair[:, None]
                       < 0.49 * float(boxsize), axis=1)
    cen = jnp.concatenate(
        [(0.5 * (xlo + xhi) * qs).astype(jnp.int32),
         safe.astype(jnp.int32)[:, None]], axis=1)
    cen_c = _pad_rows(cen, s_pad).reshape(nchunk, sc, 4)
    recv_c = [_pad_rows(r, s_pad).reshape(nchunk, sc, BLOCK, 1)
              for r in recvs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(sc,),
        in_specs=(
            [pl.BlockSpec((1, BLOCK, 1), imap_s) for _ in range(6)]
            + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]  # src
        ),
        out_specs=[pl.BlockSpec((1, BLOCK, 8), imap_s)],
        scratch_shapes=[
            pltpu.VMEM((_SLOTS * _FAN * 4, BLOCK), f32),
            pltpu.VMEM((BLOCK, 8), f32),
            pltpu.VMEM((5 * BLOCK, BLOCK), f32),
            pltpu.SMEM((max(nw, 1),), jnp.int32),
            pltpu.SemaphoreType.DMA(
                (_SLOTS,) if sb_mode else (_SLOTS * _FAN,)),
        ],
    )

    src_flat = src_blocks.reshape(-1, src_blocks.shape[-1])
    if sb_mode:
        # group DMA reads whole superblocks: pad so a partial last
        # superblock cannot read past the end (zero hm -> masked out,
        # and the skip bits mark past-nb members invalid anyway)
        need = -(-nb // _FAN) * _FAN * 4
        if src_flat.shape[0] < need:
            src_flat = jnp.concatenate(
                [src_flat, jnp.zeros((need - src_flat.shape[0],
                                      src_flat.shape[1]), f32)])
    if inkernel_bits:
        # member geometry table, padded to the (superblock-aligned)
        # source grid; padded members carry bhm=0 and contribute only
        # zero-hm masked tiles if ever kept
        nbt = src_flat.shape[0] // 4 if sb_mode else nb
        mtab_pad = mtab.astype(f32)
        if mtab_pad.shape[0] < nbt:
            mtab_pad = jnp.concatenate(
                [mtab_pad, jnp.zeros((nbt - mtab_pad.shape[0], 8), f32)])
    else:
        mtab_pad = jnp.zeros((8, 8), f32)

    def run_chunk(chunk):
        args = list(chunk[:6]) + [mtab_pad] + list(chunk[6:]) + [src_flat]
        (o,) = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sc, BLOCK, 8), f32)],
            interpret=interpret,
        )(*args)
        return o

    out = jax.lax.map(run_chunk,
                      tuple([cand_c, cnt_c, bits_c, cen_c, pos_c, rowq_c]
                            + recv_c))
    out = out.reshape(-1, BLOCK, 8)[:S]
    rho, h, vf, wk, done_f = (out[:, :, k] for k in range(5))
    # density-only callers never read delta; at 1e8 the extra (S, B, 3)
    # extraction is 1.2 GB of HBM
    delta = out[:, :, 5:8] if do_disp else None
    return rho, h, vf, wk, done_f > 0.5, delta


# --------------------------- stream SPH curl ---------------------------
# B_i = (-m/rho_i) varHsmlFac_i sum_j dW(r,h_i)/r (d x (A_i - A_j)),
# Price JCP 2010 eq. 79 (sph.c:216-300) — the magnetic-field curl as a
# dynamic-streaming kernel on the same superblock candidate machinery as
# the WVT density.  The pair difference dA = A_i - A_j is formed PER
# PAIR inside the (B, B) tile (receiver column minus source row): a
# split into receiver/source partial sums (S0 x A_i - T) was tried
# first and REVERTED — the two partial sums nearly cancel wherever A
# varies slowly, costing up to 5e-2 relative error in f32, while the
# per-pair dA is small and cancellation-free (matches the XLA pair
# operator to ~1e-5 median).  Sources stream once carrying (x, valid,
# A); three (B,B) tile accumulators produce the field.  Replaces the
# slabbed XLA expansion path (_curl_superblock), measured 564 s at 5e7
# vs ~106 s for the equivalent-pair-volume density pass
# (DIAG_CURL_r05.json).

_CROWS = 8  # source rows per block in the curl stream: x0 x1 x2 valid
#             a0 a1 a2 pad


def _curl_stream_kernel(kernel_kind, mpart, boxsize, sb_nb,
                        cand_ref, cnt_ref, bits_ref, cen_ref, pos_ref,
                        *rest):
    recv_refs = rest[:8]    # x0 x1 x2 h wfac a0 a1 a2, each (1, B, 1)
    src_ref = rest[8]       # (nb*_CROWS, B) in ANY
    out_ref = rest[9]       # (1, B, 4)
    csc = rest[10]          # (_SLOTS*_FAN*_CROWS, B)
    acc2 = rest[11]         # (3*B, B)
    sem = rest[12]

    s = pl.program_id(0)
    f32 = jnp.float32
    _GR = _FAN * _CROWS

    def copy_of(g):
        slot = jax.lax.rem(g, _SLOTS)
        if sb_nb:
            sb = jnp.maximum(cand_ref[s, g], 0)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(sb * _GR, _GR), :],
                csc.at[pl.ds(slot * _GR, _GR), :], sem.at[slot])
        b = jnp.maximum(cand_ref[s, g], 0)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(b * _CROWS, _CROWS), :],
            csc.at[pl.ds(slot * _CROWS, _CROWS), :], sem.at[slot])

    def bits(g, f):
        idx = (pos_ref[s, g] * _FAN + f if sb_nb else pos_ref[s, g])
        word = bits_ref[s, idx >> 4]
        return (word >> (2 * (idx & 15))) & 3

    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(cnt_ref[s] > 0)
    def _():
        xi = [recv_refs[d][0] for d in range(3)]
        h_i = recv_refs[3][0]
        wfac = recv_refs[4][0]
        ai = [recv_refs[5 + d][0] for d in range(3)]
        n_grp = cnt_ref[s]
        inv_box = 1.0 / boxsize
        qinv = boxsize / float(2 ** 22)
        xref = [cen_ref[s, d].astype(f32) * qinv for d in range(3)]
        safe = cen_ref[s, 3] > 0
        xi_c = [xi[d] - xref[d] for d in range(3)]
        inv_h = 1.0 / h_i
        h2 = h_i * h_i
        if kernel_kind == "m4":
            inv_h5 = inv_h * inv_h * inv_h * inv_h * inv_h
        else:
            norm_h5 = (1365.0 / (64.0 * const.PI)) * (
                inv_h * inv_h * inv_h * inv_h * inv_h)

        acc2[...] = jnp.zeros((3 * BLOCK, BLOCK), f32)

        def tile(xjc, vj, aj, wrap):
            dx = []
            r2 = jnp.zeros((BLOCK, BLOCK), f32)
            for d in range(3):
                dd = xi_c[d] - xjc[d]
                if wrap:
                    dd = dd - boxsize * jnp.round(dd * inv_box)
                dx.append(dd)
                r2 += dd * dd
            mask = (r2 < h2) & (r2 > 0.0) & (vj > 0.0)
            u = jnp.sqrt(r2) * inv_h
            # w = dW(r, h_i)/dr / r, with dW/dr per ops/kernels.py
            if kernel_kind == "m4":
                inv_u = jax.lax.rsqrt(jnp.maximum(r2, 1e-30)) * h_i
                inner = 45.836623610466 * u - 30.557749073644
                t = jnp.maximum(1.0 - u, 0.0)
                outer = -15.278874536822 * t * t * inv_u
                w = jnp.where(u < 0.5, inner, outer) * inv_h5
            else:
                t = jnp.maximum(1.0 - u, 0.0)
                t2 = t * t
                t3 = t2 * t
                w = (norm_h5 * (-22.0) * t3 * t3 * t
                     * (16.0 * u * u + 7.0 * u + 1.0))
            w = jnp.where(mask, w, 0.0)
            dA = [ai[d] - aj[d] for d in range(3)]   # per-pair (B, B)
            acc2[0 * BLOCK:1 * BLOCK, :] += w * (
                dx[2] * dA[1] - dx[1] * dA[2])
            acc2[1 * BLOCK:2 * BLOCK, :] += w * (
                dx[0] * dA[2] - dx[2] * dA[0])
            acc2[2 * BLOCK:3 * BLOCK, :] += w * (
                dx[1] * dA[0] - dx[0] * dA[1])

        def stream_pass(wrap):
            copy_of(0).start()

            def body(g, _):
                @pl.when(g + 1 < n_grp)
                def _():
                    copy_of(g + 1).start()
                slot = jax.lax.rem(g, _SLOTS)
                copy_of(g).wait()
                for f in range(_FAN if sb_nb else 1):
                    b2 = bits(g, f)

                    @pl.when((b2 & 1) == 0)
                    def _(f=f, slot=slot):
                        row = (slot * _FAN + f) * _CROWS if sb_nb \
                            else slot * _CROWS
                        t = [csc[pl.ds(row + d, 1), :] - xref[d]
                             for d in range(3)]
                        if not wrap:
                            t = [x - boxsize * jnp.round(x * inv_box)
                                 for x in t]
                        vj = csc[pl.ds(row + 3, 1), :]
                        aj = [csc[pl.ds(row + 4 + d, 1), :]
                              for d in range(3)]
                        tile(t, vj, aj, wrap)
                return 0

            jax.lax.fori_loop(0, n_grp, body, jnp.int32(0))

        @pl.when(safe)
        def _():
            stream_pass(False)

        @pl.when(jnp.logical_not(safe))
        def _():
            stream_pass(True)

        for d in range(3):
            out_ref[0, :, d:d + 1] = wfac * acc2[
                d * BLOCK:(d + 1) * BLOCK, :].sum(axis=1, keepdims=True)


@partial(jax.jit,
         static_argnames=("kernel", "mpart", "boxsize", "sb_mode",
                          "interpret"))
def stream_curl_pallas(src_blocks, cand, cnt, xi, hsml, wfac, apot_t,
                       mpart, boxsize, *, kernel="wc6", sb_mode=False,
                       bits=None, safe=None, interpret=False):
    """Dynamic-streaming SPH curl.

    src_blocks: (nb, 8, B) sorted sources — rows 0-2 coords (world),
    row 3 validity (1/0), rows 4-6 the vector potential, row 7 padding.
    cand (S, M) block ids (-1 padded) or superblock ids with sb_mode;
    cnt (S,); xi (S, 3, B); hsml/wfac (S, B) solved smoothing length
    and the per-receiver factor -mpart*varHsmlFac/rho; apot_t (S, 3, B)
    receiver vector potential.  `bits`/`safe` as in stream_wvt_pallas
    (density bit only; None packs inline with no distance pruning).
    Returns (S, B, 3) curl in receiver order."""
    S, M = cand.shape
    nb = src_blocks.shape[0]
    f32 = jnp.float32
    mult = 2 if sb_mode else 16
    if M % mult:
        pad = mult - M % mult
        cand = jnp.concatenate(
            [cand, jnp.full((S, pad), -1, cand.dtype)], axis=1)
        M += pad
    m_blocks = M * _FAN if sb_mode else M
    nw = m_blocks // 16

    if bits is None:
        if sb_mode:
            e = (jnp.maximum(cand, 0)[:, :, None] * _FAN
                 + jnp.arange(_FAN, dtype=jnp.int32))
            validb = ((cand >= 0)[:, :, None] & (e < nb)).reshape(
                S, m_blocks)
        else:
            validb = cand >= 0
        b2 = (~validb).astype(jnp.int32).reshape(S, nw, 16)
        shifts = jnp.arange(16, dtype=jnp.int32) * 2
        bits = (b2 << shifts).sum(axis=2).astype(jnp.int32)
    elif bits.shape[1] != nw:
        raise ValueError(
            f"skip-bit width {bits.shape[1]} != expected {nw}")

    xi_t = xi.transpose(0, 2, 1)
    ap_t = apot_t.transpose(0, 2, 1)
    recvs = ([xi_t[:, :, d:d + 1] for d in range(3)]
             + [hsml[..., None].astype(f32), wfac[..., None].astype(f32)]
             + [ap_t[:, :, d:d + 1] for d in range(3)])

    kern = partial(_curl_stream_kernel, kernel, float(mpart),
                   float(boxsize), nb if sb_mode else 0)

    def imap_s(s, *prefetch):
        return (s, 0, 0)

    cand_pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (S, M))
    sc = _row_chunks(S, 2 * M + nw)
    nchunk = -(-S // sc)
    s_pad = nchunk * sc
    cand_c = _pad_rows(cand.astype(jnp.int32), s_pad).reshape(
        nchunk, sc, M)
    pos_c = _pad_rows(cand_pos, s_pad).reshape(nchunk, sc, M)
    cnt_c = jnp.concatenate(
        [jnp.minimum(cnt.astype(jnp.int32), M),
         jnp.zeros((s_pad - S,), jnp.int32)]).reshape(nchunk, sc)
    bits_c = _pad_rows(bits, s_pad).reshape(nchunk, sc, nw)
    qs = float(2 ** 22) / float(boxsize)
    xlo = xi.min(axis=2)
    xhi = xi.max(axis=2)
    if safe is None:
        r_pair = hsml.max(axis=1)
        safe = jnp.all(0.5 * (xhi - xlo) + r_pair[:, None]
                       < 0.49 * float(boxsize), axis=1)
    cen = jnp.concatenate(
        [(0.5 * (xlo + xhi) * qs).astype(jnp.int32),
         safe.astype(jnp.int32)[:, None]], axis=1)
    cen_c = _pad_rows(cen, s_pad).reshape(nchunk, sc, 4)
    recv_c = [_pad_rows(r, s_pad).reshape(nchunk, sc, BLOCK, 1)
              for r in recvs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(sc,),
        in_specs=(
            [pl.BlockSpec((1, BLOCK, 1), imap_s) for _ in range(8)]
            + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
        ),
        out_specs=[pl.BlockSpec((1, BLOCK, 4), imap_s)],
        scratch_shapes=[
            pltpu.VMEM((_SLOTS * _FAN * _CROWS, BLOCK), f32),
            pltpu.VMEM((3 * BLOCK, BLOCK), f32),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
    )

    src_flat = src_blocks.reshape(-1, src_blocks.shape[-1])
    if sb_mode:
        need = -(-nb // _FAN) * _FAN * _CROWS
        if src_flat.shape[0] < need:
            src_flat = jnp.concatenate(
                [src_flat, jnp.zeros((need - src_flat.shape[0],
                                      src_flat.shape[1]), f32)])

    def run_chunk(chunk):
        args = list(chunk) + [src_flat]
        (o,) = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((sc, BLOCK, 4), f32)],
            interpret=interpret,
        )(*args)
        return o

    out = jax.lax.map(run_chunk,
                      tuple([cand_c, cnt_c, bits_c, cen_c, pos_c]
                            + recv_c))
    return out.reshape(-1, BLOCK, 4)[:S, :, :3]
