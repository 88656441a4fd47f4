"""Warm-process WVT stage cost (VERDICT r4 weak #2 follow-up): run the
config-3 relaxation TWICE in one process from the identical initial
particle set.  The first pass pays the per-process program
first-execution tax of the axon tunnel (10-100+ s across the ~10
programs of the loop); the second pass is the steady-state serving
figure — what the stage costs once a process is warm.

    python scripts/wvt_warm_process.py [ntotal]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

NTOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def main():
    from toycluster_tpu import parse_par_file
    from toycluster_tpu.scene import build_scene
    from toycluster_tpu.particles import halo_arrays_from_scene
    from toycluster_tpu.models import positions as pos_mod
    from toycluster_tpu.models import wvt
    from configs.run_configs import PRESETS, PAR

    cfg = parse_par_file(PAR, **{**PRESETS[3], "ntotal": NTOTAL})
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(cfg.seed), scene,
                                   ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    pos0 = jnp.array(parts.pos)   # retain the initial state

    out = {"ntotal": NTOTAL, "n_gas": parts.n_gas, "passes": []}
    for k in range(2):
        p = parts._replace(pos=jnp.array(pos0),
                           hsml=jnp.zeros_like(parts.hsml))
        n_iter = [0]

        def log(stage, **kw):
            if stage == "wvt":
                n_iter[0] += 1

        t0 = time.perf_counter()
        res = wvt.regularise_sph_particles(scene, ha, p, log=log)
        jax.block_until_ready(res.pos)
        dt = time.perf_counter() - t0
        ups = parts.n_gas * n_iter[0] / dt
        out["passes"].append({
            "pass": "cold-process" if k == 0 else "warm-process",
            "wall_s": round(dt, 1), "iterations": n_iter[0],
            "effective_updates_per_sec": round(ups, 1)})
        del p, res

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "WARMPROC_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
