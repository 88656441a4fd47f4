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
from ..particles import HaloArrays, Particles
from ..scene import Scene
from ..utils.logging import stage_log
from . import sph as sph_mod

NUMITER = 64            # wvt_relax.c:7
ERRDIFF_LIMIT = 0.01    # wvt_relax.c:8
# The reference rebuilds its tree every iteration (TREEBUILDFREQUENCY=1,
# wvt_relax.c:6) because its neighbour lists are exact-radius.  Our
# candidate lists carry >=20% radius slack (sph._CAP_FACTOR, _SYM_MARGIN)
# while particles move <~1% of h per step, so the block/candidate
# structure is reused across iterations; correctness is guarded by the
# hsml cap: a particle whose h outgrows the build-time search radius is
# flagged `saturated`, which forces a rebuild.
REBUILD_EVERY = 8
_SYM_MARGIN = 1.1       # displacement-radius slack for inter-build drift


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

    state = None
    its_since_build = 0
    identity = None

    for it in range(it0, max_iter + 1):
        # --- fused iteration: ONE neighbour structure serves the density
        # solve AND the displacement pass (the reference builds one tree
        # per iteration and walks it twice, wvt_relax.c:66-171), and the
        # structure itself is reused across REBUILD_EVERY iterations ---
        pos_gas = parts.pos[:n_gas]
        rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize,
                                                 cool_core)
        h_box = _metric_hsml(rho_model, mpart, desnngb)
        h0_model = (desnngb * mpart / rho_model
                    / const.FOURPITHIRD) ** (1.0 / 3.0)
        h_prev = parts.hsml[:n_gas]
        h0 = jnp.where(h_prev > 0, h_prev, h0_model)
        if its_since_build >= REBUILD_EVERY:
            state = None

        cap_factor = sph_mod._CAP_FACTOR
        for attempt in range(sph_mod._MAX_REBUILDS + 1):
            if state is None:
                h_cap_gas = jnp.minimum(
                    jnp.maximum(h0, h0_model) * cap_factor,
                    boxsize / 3.0)
                state = sph_mod.build_neighbours(
                    pos_gas, h_cap_gas, boxsize,
                    radius_sym_gas=h_box * boxsize * _SYM_MARGIN)
                order = state.index.order
                # adopt the sorted layout once per build
                # (peano.c:85-126 permutation analogue)
                parts = sph_mod.permute_gas(parts, order)
                pos_gas = parts.pos[:n_gas]
                rho_model = rho_model[order]
                h_box = h_box[order]
                h0_model = h0_model[order]
                h0 = h0[order]
                identity = jnp.arange(n_gas, dtype=order.dtype)
                state = state._replace(
                    index=state.index._replace(order=identity),
                    sels=tuple(sph_mod.classed_selections(state)))
                its_since_build = 0
            else:
                # refresh the cached structure with the moved positions
                # (order, caps, candidates stay — slack covers the drift)
                bi0 = state.index
                pad = bi0.n_padded - n_gas
                spos = (jnp.concatenate(
                    [pos_gas, jnp.broadcast_to(pos_gas[-1], (pad, 3))])
                    if pad else pos_gas)
                state = state._replace(index=bi0._replace(pos=spos))

            bi = state.index
            h0_sorted = sph_mod._pad_sorted(h0, identity, bi.n_padded)
            hm_sorted = sph_mod._pad_sorted(h_box, identity, bi.n_padded)
            res, delta_sorted = sph_mod.fused_pass(
                state, h0_sorted, hm_sorted, mpart, boxsize,
                kernel=cfg.sph_kernel, desnngb=desnngb)
            still_growable = state.h_cap < (boxsize / 3.0) * 0.999
            n_sat = int((res.saturated & still_growable)[:n_gas].sum())
            if n_sat == 0:
                break
            # saturation: the build-time search radius no longer covers
            # the needed h — rebuild (with a grown cap after the first
            # rebuilt attempt)
            h0 = res.hsml[:n_gas]
            if its_since_build == 0:
                cap_factor *= 1.6
            state = None
        else:
            raise RuntimeError(
                f"hsml solve saturated for {n_sat} particles after "
                f"{sph_mod._MAX_REBUILDS} rebuilds")
        its_since_build += 1

        rho_model_s = rho_model
        parts = parts._replace(
            rho=res.rho[:n_gas], hsml=res.hsml[:n_gas],
            var_hsml_fac=res.var_hsml_fac[:n_gas],
            rho_model=rho_model_s)

        err_max, err_mean = _error_stats(parts.rho, rho_model_s)
        err_max = float(err_max)
        err_mean = float(err_mean)
        err_diff = (err_last - err_mean) / err_mean

        log("wvt", it=it, err_max=round(err_max, 4),
            err_mean=round(err_mean, 5), err_diff=round(err_diff, 5),
            step=step)

        # stopping rules, then the step factor — the displacement is
        # applied only when the loop continues, with the post-shrink step
        # (wvt_relax.c:94-101 ordering)
        if err_diff < err_limit and it > 25:
            break
        if err_diff < 0 and err_diff_last < 0 and it > 10:
            break
        if err_diff < 0.01 and it > 1:
            step *= 0.8
        err_last = err_mean
        err_diff_last = err_diff

        delta = delta_sorted[:n_gas] * step
        new_pos = _move(parts.pos[:n_gas], delta, boxsize)
        parts = parts._replace(
            pos=parts.pos.at[:n_gas].set(new_pos))

        if checkpoint_path and (it + 1) % checkpoint_every == 0:
            with open(checkpoint_path, "wb") as fh:
                _np.savez(fh, pos_gas=_np.asarray(new_pos), step=step,
                          err_last=err_last, err_diff_last=err_diff_last,
                          it=it)

    return parts
