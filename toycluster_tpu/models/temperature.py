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
