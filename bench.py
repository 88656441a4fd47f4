"""Headline benchmark: WVT-relax particle-updates/sec on one chip.

Runs the hot loop of the pipeline (SPH density + adaptive hsml solve +
kernel-weighted displacement + move, i.e. one full WVT iteration,
wvt_relax.c:61-218) on a single-cluster gas distribution and reports
throughput as one JSON line.

`vs_baseline` compares against the measured single-core CPU throughput of
a faithful C/OpenMP re-implementation of the same iteration (the reference
publishes no numbers — BASELINE.md); see bench_ref/ and
BASELINE_MEASURED.json for methodology.
"""

import json
import os
import sys
import time

# Default N matches the BASELINE.json north star (converged 1e7-particle
# two-cluster IC -> n_gas = 5e6; BASELINE.md).  The CPU baseline
# denominator is N-independent (cell lists, BASELINE_MEASURED.json
# measured at 1e5); r3-measured TPU throughput at 1e6 gas is ~12% lower
# than at 5e6 (2.83M vs 3.23M updates/s) from fixed per-iteration duty.
N_GAS = int(os.environ.get("BENCH_N_GAS", 5_000_000))
# 16 timed iterations: two full REBUILD_EVERY=8 build cycles, so the
# amortised build cost is represented at its production duty cycle —
# the reference's converged runs take 25-64 iterations
ITERS = int(os.environ.get("BENCH_ITERS", 16))


def main():
    import jax
    import jax.numpy as jnp
    from toycluster_tpu import parse_par_file
    from toycluster_tpu.scene import build_scene
    from toycluster_tpu.particles import halo_arrays_from_scene
    from toycluster_tpu.models import positions as pos_mod
    from toycluster_tpu.models import sph as sph_mod
    from toycluster_tpu.models import wvt
    from toycluster_tpu.utils.logging import silent_log

    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS, wvt_max_iter=ITERS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    key = jax.random.PRNGKey(1)

    parts = pos_mod.make_positions(key, scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    n_gas = parts.n_gas

    # warmup: one full pass compiles every program in the loop
    # (stage logs go to stderr; stdout stays the single JSON line)
    from toycluster_tpu.utils.logging import stage_log
    parts = wvt.regularise_sph_particles(scene, ha, parts, log=stage_log)
    # timed: fixed number of iterations, no early stop
    cfg_t = cfg.replace(wvt_max_iter=ITERS)
    scene_t = scene  # same tables

    t0 = time.perf_counter()
    stamps = [t0]

    def log(stage, **kw):
        if stage == "wvt":
            stamps.append(time.perf_counter())

    parts = wvt.regularise_sph_particles(scene_t, ha, parts, log=log)
    jax.block_until_ready(parts.pos)
    dt = time.perf_counter() - t0

    # red/green neighbour contract (sph.c:159-166): a perf change that
    # breaks |wkNgb-DESNNGB|<NNGBDEV for >0.1% of lanes must FAIL the
    # bench, not just dent a JSON field in some artifact
    parts = sph_mod.find_sph_quantities(scene_t, ha, parts)
    contract = sph_mod.last_contract_frac
    assert contract >= 0.999, (
        f"WC6/{cfg.desnngb} contract violated: {contract:.5f} < 0.999")
    iters = max(len(stamps) - 1, 1)

    # robust throughput: one-off XLA compiles landing in the timed
    # window (remote compile service, shape drift at a rebuild) show up
    # as >5x-median spikes and are capped to the median; genuine
    # rebuild iterations (~2-3x median, the production duty cycle)
    # stay in the mean.  The raw wall-clock is also reported.
    import statistics
    it_times = [b - a for a, b in zip(stamps, stamps[1:])] or [dt]
    med = statistics.median(it_times)
    capped = [t if t < 5 * med else med for t in it_times]
    n_capped = sum(1 for t in it_times if t >= 5 * med)
    updates_per_sec = n_gas * len(capped) / sum(capped)

    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE_MEASURED.json")) as f:
            baseline = json.load(f).get("ref_updates_per_sec")
    except Exception:
        pass
    vs = updates_per_sec / baseline if baseline else None
    # vs a 16-core OpenMP node: ESTIMATED — the host exposes one core, so
    # BASELINE_MEASURED.json measured 1 core and documents an assumed
    # ~x13 multi-core scaling ("divide by ~13"); every node-level claim
    # inherits that unmeasured factor (BASELINE.md's bar: >=50x a node)
    vs_node = vs / 13.0 if vs else None

    print(json.dumps({
        "metric": "wvt_relax_particle_updates_per_sec_per_chip",
        "value": round(updates_per_sec, 1),
        "unit": "particle-updates/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "vs_node_est_x13": round(vs_node, 2) if vs_node else None,
        "n_gas": n_gas, "iters": iters, "seconds": round(dt, 3),
        "median_iter_s": round(med, 4), "compile_capped": n_capped,
        "contract_frac": round(contract, 5),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
