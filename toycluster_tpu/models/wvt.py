"""Weighted-Voronoi-Tessellation particle regularisation
(reference wvt_relax.c:25-225, after Diehl+ 2012) — the benchmark hot loop.

Each iteration: (1) SPH density + adaptive hsml over the rebuilt block
structure, (2) relative error vs the analytic model density with the
reference's data-dependent early-stop / step-shrink heuristics (host-side
scalars), (3) a per-particle metric length from the model density globally
renormalised to unit box volume, (4) a kernel-weighted repulsion step with
periodic wrap.  Relaxation is done in units of the boxsize.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import constants as const
from ..ops import blocks as blk
from ..ops import pair_ops
from ..particles import HaloArrays, Particles
from ..scene import Scene
from ..utils.logging import stage_log
from . import sph as sph_mod

NUMITER = 64            # wvt_relax.c:7
ERRDIFF_LIMIT = 0.01    # wvt_relax.c:8
TREEBUILDFREQUENCY = 1  # wvt_relax.c:6


@jax.jit
def _error_stats(rho_sph, rho_model):
    err = jnp.abs(rho_sph - rho_model) / rho_model
    return err.max(), err.mean()


def _metric_hsml(rho_model, mpart, desnngb):
    """h_i = (NNGB m / rho / (4pi/3))^(1/3), renormalised so the total
    kernel volume matches the unit box (wvt_relax.c:108-124)."""
    h = (desnngb * mpart / rho_model / const.FOURPITHIRD) ** (1.0 / 3.0)
    v_sum = (h ** 3).sum()
    return h * (desnngb / v_sum / const.FOURPITHIRD) ** (1.0 / 3.0)


@jax.jit
def _move(pos_gas, delta_box, boxsize):
    pos = pos_gas + delta_box * boxsize
    return pos - jnp.floor(pos / boxsize) * boxsize


def regularise_sph_particles(scene: Scene, ha: HaloArrays,
                             parts: Particles, *, log=stage_log,
                             checkpoint_path: str | None = None,
                             checkpoint_every: int = 16) -> Particles:
    """`checkpoint_path` enables WVT checkpoint/resume (absent in the
    reference — SURVEY.md §5): loop state (gas positions, step, error
    history, iteration) is saved as NPZ every `checkpoint_every`
    iterations and restored on restart."""
    import numpy as _np
    import os as _os

    cfg = scene.config
    n_gas = parts.n_gas
    if n_gas == 0:
        return parts
    boxsize = scene.boxsize
    mpart = scene.mpart_gas
    desnngb = cfg.desnngb
    cool_core = ((cfg.rho0_fac, cfg.rc_fac)
                 if cfg.double_beta_cool_cores else None)

    # step size (wvt_relax.c:48-56)
    if cfg.sph_kernel == "m4":
        step = 0.035
    else:
        step = 0.0085
        if scene.mtotal < 1e5:
            step /= 2.0

    err_last = math.inf
    err_diff_last = math.inf
    max_iter = min(cfg.wvt_max_iter, NUMITER)
    err_limit = cfg.wvt_err_diff_limit
    it0 = 0

    if checkpoint_path and _os.path.exists(checkpoint_path):
        ck = _np.load(checkpoint_path)
        parts = parts._replace(
            pos=parts.pos.at[:n_gas].set(jnp.asarray(ck["pos_gas"])))
        step = float(ck["step"])
        err_last = float(ck["err_last"])
        err_diff_last = float(ck["err_diff_last"])
        it0 = int(ck["it"]) + 1
        log("wvt_resume", it=it0, step=step)

    for it in range(it0, max_iter + 1):
        if it % TREEBUILDFREQUENCY == 0:
            parts = sph_mod.find_sph_quantities(scene, ha, parts)

        pos_gas = parts.pos[:n_gas]
        rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize,
                                                 cool_core)
        err_max, err_mean = _error_stats(parts.rho, rho_model)
        err_max = float(err_max)
        err_mean = float(err_mean)
        err_diff = (err_last - err_mean) / err_mean

        log("wvt", it=it, err_max=round(err_max, 4),
            err_mean=round(err_mean, 5), err_diff=round(err_diff, 5),
            step=step)

        # stopping rules (wvt_relax.c:94-101)
        if err_diff < err_limit and it > 25:
            break
        if err_diff < 0 and err_diff_last < 0 and it > 10:
            break
        if err_diff < 0.01 and it > 1:
            step *= 0.8
        err_last = err_mean
        err_diff_last = err_diff

        parts = parts._replace(rho_model=rho_model)
        h_box = _metric_hsml(rho_model, mpart, desnngb)

        # displacement pass with gather candidates at radius h_i — exactly
        # the reference's tree-search radius (wvt_relax.c:135); pairs with
        # h_i < r < hbar_ij are dropped on both sides of the parity line
        # (their WC6 weight is (1-u)^8-suppressed)
        state = sph_mod.build_neighbours(pos_gas, h_box * boxsize, boxsize)
        bi = state.index
        h_sorted = sph_mod._pad_sorted(h_box, bi.order, bi.n_padded)

        if sph_mod._engine() == "pallas":
            from ..ops.pallas_pair import wvt_displacement_pallas
            nb = bi.n_blocks
            pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
            valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(
                jnp.float32)
            h_b = h_sorted.reshape(nb, blk.BLOCK)
            h_b3 = h_sorted.reshape(nb, 1, blk.BLOCK)

            def disp_class(sel, m):
                idc = jnp.maximum(sel.ids, 0)
                out = wvt_displacement_pallas(
                    pos_t, valid_t, h_b3, sel.cand, pos_t[idc], h_b[idc],
                    float(step), float(boxsize), kernel=cfg.sph_kernel)
                return (out.reshape(-1, 3),)
        else:
            def disp_class(sel, m):
                return (pair_ops.wvt_displacement(
                    bi, sel, h_sorted, step, boxsize,
                    kernel=cfg.sph_kernel),)

        (delta_sorted,) = sph_mod.run_classed(state, disp_class)
        delta = jnp.zeros((n_gas, 3), jnp.float32).at[bi.order].set(
            delta_sorted[:n_gas])

        new_pos = _move(pos_gas, delta, boxsize)
        parts = parts._replace(
            pos=parts.pos.at[:n_gas].set(new_pos))

        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            with open(checkpoint_path, "wb") as fh:
                _np.savez(fh, pos_gas=_np.asarray(new_pos), step=step,
                          err_last=err_last, err_diff_last=err_diff_last,
                          it=it)

    return parts
