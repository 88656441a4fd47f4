"""Gas internal energy from hydrostatic equilibrium
(reference temperature.c:8-44, Donnert 2014 eq. 9).

The u(r) tables are built host-side per halo (models/tables.py, QUADPACK +
natural spline, 1024-point log grid) and evaluated on device over the gas
block, selected by halo membership.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.tables import build_energy_table
from ..ops.interp import SplineTable, spline_eval
from ..particles import Particles
from ..scene import Scene


def make_temperatures(scene: Scene, parts: Particles) -> Particles:
    cfg = scene.config
    n_gas = parts.n_gas
    if n_gas == 0:
        return parts
    boxhalf = scene.boxhalf
    cool_core = ((cfg.rho0_fac, cfg.rc_fac)
                 if cfg.double_beta_cool_cores else None)

    u = jnp.zeros((n_gas,), jnp.float32)
    gas_halo = parts.halo[:n_gas]
    pos = parts.pos[:n_gas]

    for i, h in enumerate(scene.halos):
        if h.mass_table is None:
            continue
        etab = build_energy_table(
            h.mass_table, rho0=h.rho0, beta=h.beta, rc=h.rcore,
            rcut=h.rcut, is_cuspy=h.have_cuspy, a_hernq=h.a_hernq,
            mdm=h.mass_dm, boxsize=scene.boxsize, G=scene.units.G,
            no_rcut_in_t=cfg.no_rcut_in_t, cool_core=cool_core)
        table = SplineTable.from_host(etab.spline)
        d = pos - (jnp.asarray(h.d_com, jnp.float32) + boxhalf)
        r = jnp.linalg.norm(d, axis=-1)
        u = jnp.where(gas_halo == i,
                      spline_eval(table, r).astype(jnp.float32), u)

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
