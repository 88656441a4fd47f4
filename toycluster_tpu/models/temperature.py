"""Gas internal energy from hydrostatic equilibrium
(reference temperature.c:8-44, Donnert 2014 eq. 9).

The u(r) tables are built host-side per halo (models/tables.py, QUADPACK +
natural spline, 1024-point log grid) and evaluated on device over the gas
block, selected by halo membership.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.tables import build_energy_table
from ..ops.interp import SplineTable, batched_spline_eval, spline_eval
from ..particles import Particles
from ..scene import Scene


def build_energy_tables_stacked(scene: Scene):
    """Per-halo u(r) spline tables stacked to (H, K) rows for one
    batched per-particle gather-eval.  Every halo shares the same log
    knot grid (rmin=0.1 .. sqrt(3) boxsize, models/tables.py), so halos
    without a mass table get a zero y/m2 row — their gas evaluates to
    u=0, exactly like the masked per-halo loop the reference runs
    (temperature.c:8-44)."""
    cfg = scene.config
    cool_core = ((cfg.rho0_fac, cfg.rc_fac)
                 if cfg.double_beta_cool_cores else None)
    rows = []
    x_ref = None
    for h in scene.halos:
        if h.mass_table is None:
            rows.append(None)
            continue
        etab = build_energy_table(
            h.mass_table, rho0=h.rho0, beta=h.beta, rc=h.rcore,
            rcut=h.rcut, is_cuspy=h.have_cuspy, a_hernq=h.a_hernq,
            mdm=h.mass_dm, boxsize=scene.boxsize, G=scene.units.G,
            no_rcut_in_t=cfg.no_rcut_in_t, cool_core=cool_core)
        rows.append((np.asarray(etab.spline.x, np.float32),
                     np.asarray(etab.spline.y, np.float32),
                     np.asarray(etab.spline.m2, np.float32)))
        x_ref = rows[-1][0]
    if x_ref is None:
        return None
    zero = (x_ref, np.zeros_like(x_ref), np.zeros_like(x_ref))
    rows = [r if r is not None else zero for r in rows]
    return SplineTable(
        x=jnp.asarray(np.stack([r[0] for r in rows])),
        y=jnp.asarray(np.stack([r[1] for r in rows])),
        m2=jnp.asarray(np.stack([r[2] for r in rows])))


@jax.jit
def _temperature_eval(tables: SplineTable, d_com, boxhalf, pos, halo):
    """u per gas particle: radius to the OWN halo's centre, evaluated
    against that halo's stacked table row.  Per-column gathers (see
    _shift_origin_jit: an (N, 3) gather gets tile-padded 3->128 lanes
    on this backend)."""
    hid = jnp.maximum(halo, 0)  # halo<0 (out of box) masked to u=0 below
    r2 = jnp.zeros_like(pos[:, 0])
    for d in range(3):
        dd = pos[:, d] - (jnp.take(d_com[:, d], hid) + boxhalf)
        r2 = r2 + dd * dd
    u = batched_spline_eval(tables, hid, jnp.sqrt(r2))
    return jnp.where(halo < 0, 0.0, u).astype(jnp.float32)


def make_temperatures(scene: Scene, parts: Particles) -> Particles:
    n_gas = parts.n_gas
    if n_gas == 0:
        return parts
    tables = build_energy_tables_stacked(scene)
    if tables is None:
        return parts
    d_com = jnp.asarray(np.stack([h.d_com for h in scene.halos]),
                        jnp.float32)
    u = _temperature_eval(tables, d_com, scene.boxhalf,
                          parts.pos[:n_gas], parts.halo[:n_gas])
    return parts._replace(u=u)


def internal_energy_analytic(scene: Scene, i: int, r):
    """Donnert+2016 closed-form u(r) for the untapered beta=2/3 model
    (temperature.c:51-83) — the reference evaluates it per particle as a
    cross-check oracle next to the tabulated hydrostatic solution; we use
    it the same way in tests (valid where r << rcut)."""
    import numpy as np

    from .. import constants as const

    h = scene.halos[i]
    G = scene.units.G
    rho0, a, rc = h.rho0, h.a_hernq, h.rcore
    rmax = scene.boxsize              # "open" T boundary
    mdm = h.mass_dm
    r = np.asarray(r, np.float64)

    def f1(x):
        rc2, a2 = rc * rc, a * a
        res = ((a2 - rc2) * np.arctan(x / rc) - rc * (a2 + rc2) / (a + x)
               + a * rc * np.log((a + x) ** 2 / (rc2 + x * x)))
        return res * rc / (a2 + rc2) ** 2

    def f2(x):
        return (np.arctan(x / rc) ** 2 / (2 * rc)
                + np.arctan(x / rc) / x)

    return (G / (const.ADIABATIC_INDEX - 1.0) * (1.0 + (r / rc) ** 2)
            * (mdm * (f1(rmax) - f1(r))
               + 4.0 * const.PI * rho0 * rc ** 3 * (f2(rmax) - f2(r))))
