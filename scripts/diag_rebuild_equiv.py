"""Diagnose REBUILD_EVERY=8 vs =1 equivalence: print err trajectories,
pid-matched position / rho deltas, and the rebuild cadence."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from toycluster_tpu import parse_par_file
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

cfg = parse_par_file("/root/reference/cluster.par").replace(
    ntotal=8000, wvt_max_iter=9, sph_kernel="m4")
scene = build_scene(cfg)
ha = halo_arrays_from_scene(scene)


def run(rebuild_every):
    wvt.REBUILD_EVERY = rebuild_every
    key = jax.random.PRNGKey(11)
    parts = pos_mod.make_positions(key, scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    # real pids (the pipeline assigns them after WVT; slot-matching
    # would compare different particles across sort cadences)
    ng = parts.n_gas
    parts = parts._replace(pid=parts.pid.at[:ng].set(
        jnp.arange(1, ng + 1, dtype=parts.pid.dtype)))
    errs = []
    builds = []

    def log(stage, **kw):
        if stage == "wvt":
            errs.append(kw["err_mean"])
        elif stage == "wvt_build":
            builds.append(kw["it"])

    parts = wvt.regularise_sph_particles(scene, ha, parts, log=log)
    n_gas = parts.n_gas
    order = np.argsort(np.asarray(parts.pid[:n_gas]))
    return (np.asarray(parts.pos[:n_gas])[order],
            np.asarray(parts.rho)[order], errs, builds)


pos8, rho8, errs8, builds8 = run(8)
pos1, rho1, errs1, builds1 = run(1)
box = scene.boxsize
d = np.abs(pos8 - pos1)
d = np.minimum(d, box - d)
dmax = d.max() / box
print("builds8:", builds8)
print("builds1:", builds1)
print("errs8:", [round(e, 5) for e in errs8])
print("errs1:", [round(e, 5) for e in errs1])
print(f"pos dmax/box = {dmax:.5f}  (tol 2e-3)")
print(f"pos d p50/p99 = {np.median(d)/box:.2e} {np.quantile(d, 0.99)/box:.2e}")
print(f"rho max rel dev = {np.abs(rho8/rho1 - 1).max():.4f}")
