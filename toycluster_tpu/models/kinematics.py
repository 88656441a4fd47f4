"""Merger-orbit kinematics (reference setup.c:355-424).

COMET (recommended): the infalling cluster's velocity is stamped on a
ball+tail region around halo 1; PARABOLA uses a cone behind the R200 touch
point; "direct" applies bulk velocities at setup time (handled in
scene/shift_origin).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..particles import Particles
from ..scene import Scene


def apply_kinematics(scene: Scene, parts: Particles) -> Particles:
    if scene.config.mass_ratio == 0 or scene.config.orbit == "direct":
        return parts

    vx_host = jnp.float32(scene.vel_merger[0])
    vx_infa = jnp.float32(scene.vel_merger[1])
    h1 = scene.halos[1]
    boxhalf = scene.boxhalf
    pos = parts.pos

    if scene.config.orbit == "parabola":
        # move origin to the R200 touch point (setup.c:360-376)
        x = pos[:, 0] - h1.d_com[0] + boxhalf + h1.r200
        y = pos[:, 1] - h1.d_com[1] + boxhalf
        z = pos[:, 2] - h1.d_com[2] + boxhalf
        infalling = (y * y + z * z < x * x) & (x > 0)
        dvx = jnp.where(infalling, vx_infa, vx_host)
    else:  # comet (setup.c:379-421)
        dx = pos[:, 0] - (h1.d_com[0] + boxhalf)
        dy = pos[:, 1] - (h1.d_com[1] + boxhalf)
        dz = pos[:, 2] - (h1.d_com[2] + boxhalf)
        r2_cyl = dy * dy + dz * dz
        r2 = dx * dx + r2_cyl
        rvir2 = jnp.float32(h1.r200 ** 2)
        in_comet = ((dx > 0) & (r2_cyl < rvir2)) | (r2 < rvir2)
        # the reference's front-side WC2 slow-down is disabled (wk=1,
        # setup.c:404-410), so the comet region uniformly gets vx_infa
        dvx = jnp.where(in_comet, vx_infa, vx_host)

    vel = parts.vel.at[:, 0].add(dvx)
    return parts._replace(vel=vel)
