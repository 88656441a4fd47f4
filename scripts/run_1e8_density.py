"""1e8-particle scaling probe (BASELINE config 5 scale): sample a 1e8-gas
single cluster and run ONE full SPH density + adaptive-hsml pass on the
chip, recording wall-clock, the WC6/295 contract, and the HBM budget.

    python scripts/run_1e8_density.py [n_gas]

Memory budget at n_gas=1e8 (f32): positions 1.2 GB, sorted copy + keys +
argsort workspace ~3 GB, candidate lists (nb=781250, max_cand M) 3.1 GB
at M=1024, per-class receiver gathers ~1.3 GB, outputs ~2.4 GB.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file, constants as const
from toycluster_tpu.scene import build_scene
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    # sample gas only (the DM half is irrelevant to the density pass)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    pos, _ = pos_mod.sample_halo_gas(key, ha, 0, N_GAS, scene.boxsize)
    pos = (pos + ha.d_com[0] + scene.boxhalf) % scene.boxsize
    jax.block_until_ready(pos)
    t_sample = time.perf_counter() - t0
    print(f"sampled {N_GAS} gas in {t_sample:.1f}s", flush=True)

    from toycluster_tpu.particles import empty_particles
    parts = empty_particles(N_GAS, 0)
    parts = parts._replace(pos=pos)

    t0 = time.perf_counter()
    parts = sph_mod.find_sph_quantities(scene, ha, parts)
    jax.block_until_ready(parts.rho)
    t_warm = time.perf_counter() - t0
    # second pass = warm-started production cost
    t0 = time.perf_counter()
    parts = sph_mod.find_sph_quantities(scene, ha, parts)
    jax.block_until_ready(parts.rho)
    t_pass = time.perf_counter() - t0

    h = parts.hsml
    rho = parts.rho
    w0 = 1365.0 / (64.0 * const.PI) / (h ** 3)
    rho_raw = rho - (-0.0116 * (cfg.desnngb * 0.01) ** (-2.236)
                     * scene.mpart_gas * w0)
    wk = const.FOURPITHIRD * h ** 3 * rho_raw / scene.mpart_gas
    dev = np.abs(np.asarray(wk) - cfg.desnngb)
    mem = jax.local_devices()[0].memory_stats() or {}
    out = {
        "n_gas": N_GAS,
        "sample_s": round(t_sample, 1),
        "density_pass_cold_s": round(t_warm, 1),
        "density_pass_warm_s": round(t_pass, 1),
        "particles_per_sec_warm": round(N_GAS / t_pass, 0),
        "contract_frac_ok": round(
            float((dev < const.NNGBDEV + 1e-3).mean()), 5),
        "contract_p999_dev": round(float(np.percentile(dev, 99.9)), 4),
        "hbm_peak_gib": round(
            mem.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_1e8_r03.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
