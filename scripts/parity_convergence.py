"""Convergence-parity study (VERDICT r2 #6): is the WVT landing error
at 1e7/1e8 (err_mean 0.095 / 0.080) the reference ALGORITHM's own
landing point at those N, or a regression from the stream engine's
pair truncation?

Two experiments on the config-3 SCENE (equal-mass two-cluster merger,
the geometry whose landing error is in question):

  scale   — run the relaxation to its natural early-stop at several
            ntotal (the heuristics are the reference's verbatim,
            wvt_relax.c:94-101); if err_final varies smoothly with N
            on the SAME scene, the landing point is a property of the
            model's density dynamic range at that resolution, not of
            engine truncation.

  margin  — at one N, re-run with every pair-coverage margin inflated
            (solve-cap warm margin 1.1 -> 1.4, build cap factor +30%,
            displacement slack 1.1 -> 1.25).  Wider margins stream
            strictly MORE pairs; if the trajectory digits match the
            default run, the default margins truncate nothing the
            physics needed.

    python scripts/parity_convergence.py scale <ntotal>
    python scripts/parity_convergence.py margin <ntotal>

Each invocation runs ONE arm in a fresh process (margin constants are
read at trace time) and appends one JSON line to
PARITY_CONVERGENCE_r05.jsonl at the repo root.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

MODE = sys.argv[1]
NTOTAL = int(sys.argv[2])


def main():
    import jax

    from toycluster_tpu import parse_par_file
    from toycluster_tpu.models import positions as pos_mod
    from toycluster_tpu.models import sph as sph_mod
    from toycluster_tpu.models import wvt
    from toycluster_tpu.particles import halo_arrays_from_scene
    from toycluster_tpu.scene import build_scene

    if MODE == "margin":
        wvt._BITS_MARGIN_WARM = 1.4
        wvt._SYM_MARGIN = 1.25
        sph_mod._CAP_FACTOR = sph_mod._CAP_FACTOR * 1.3

    cfg = parse_par_file(
        "/root/reference/cluster.par", ntotal=NTOTAL, mass_ratio=1.0,
        zero_e_orbit_frac=1.0, orbit="comet")
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)

    traj = []

    def log(stage, **kw):
        if stage == "wvt":
            traj.append({k: kw[k] for k in
                         ("it", "err_max", "err_mean", "err_diff",
                          "step")})
        print(stage, kw, file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    parts = wvt.regularise_sph_particles(scene, ha, parts, log=log)
    jax.block_until_ready(parts.pos)
    rec = {
        "mode": MODE,
        "ntotal": NTOTAL,
        "n_gas": parts.n_gas,
        "iterations": len(traj),
        "err_mean_final": traj[-1]["err_mean"] if traj else None,
        "wall_s": round(time.perf_counter() - t0, 1),
        "margins": {
            "bits_margin_warm": wvt._BITS_MARGIN_WARM,
            "sym_margin": wvt._SYM_MARGIN,
            "cap_factor": sph_mod._CAP_FACTOR,
        },
        "trajectory": traj,
        "device": str(jax.devices()[0]),
    }
    with open(os.path.join(_REPO, "PARITY_CONVERGENCE_r05.jsonl"),
              "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("mode", "ntotal", "iterations", "err_mean_final",
                       "wall_s")}))


if __name__ == "__main__":
    main()
