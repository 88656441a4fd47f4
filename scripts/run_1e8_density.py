"""1e8-particle scaling probe (BASELINE config 5 scale): sample 1e8 gas
positions for a single cluster and run the full SPH density +
adaptive-hsml pass on one chip, recording wall-clock, the WC6/295
contract, and memory feasibility.

    python scripts/run_1e8_density.py [n_gas]

Uses the minimal direct path (superblock build + stream kernel,
density-only) rather than the full Particles pipeline: at 1e8 the
standing-memory budget on a 16 GB chip is
  pos 1.2 + sorted pos 1.2 + (4,B)-packed source 1.6 + h0/cap/hm 1.2
  + superblock lists ~0.6 + skip bits ~0.3 + kernel out 3.2
  + sweep/argsort transients ~2-3  ->  ~12 GB.
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
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops.pallas_pair import (stream_skip_bits,
                                            stream_wvt_pallas)

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    pos, _ = pos_mod.sample_halo_gas(key, ha, 0, N_GAS, scene.boxsize)
    pos = (pos + ha.d_com[0] + scene.boxhalf) % scene.boxsize
    jax.block_until_ready(pos)
    t_sample = time.perf_counter() - t0
    print(f"sampled {N_GAS} gas in {t_sample:.1f}s", flush=True)

    def density_pass(pos, h_warm):
        h0_model = sph_mod.model_hsml(pos, ha, mpart, desnngb, boxsize)
        h0 = jnp.where(h_warm > 0, h_warm, h0_model)
        h_cap = jnp.minimum(
            jnp.maximum(h0, h0_model) * sph_mod._CAP_FACTOR,
            boxsize / 3.0)
        state = sph_mod.build_neighbours(pos, h_cap, boxsize)
        bi = state.index
        nb = bi.n_blocks
        print(f"  built: nb={nb} m_sb={state.cand.idx.shape[1]}",
              flush=True)
        h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
        pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
        vm = bi.valid.astype(jnp.float32).reshape(nb, 1, blk.BLOCK)
        src = jnp.concatenate([pos_t, vm], axis=1)
        h0_b = h0_s.reshape(nb, blk.BLOCK)
        cap_b = state.h_cap.reshape(nb, blk.BLOCK)
        # slab the call over receiver rows: at 781k rows the receiver
        # columns + the (S, B, 8) output alone are ~6 GB of HBM
        slab = 98304
        outs = [[] for _ in range(4)]
        for s0 in range(0, nb, slab):
            s1 = min(s0 + slab, nb)
            ids = jnp.arange(s0, s1, dtype=jnp.int32)
            rows = state.cand.idx[s0:s1]
            bits, safe = stream_skip_bits(
                bi.bb_lo, bi.bb_hi, None, ids, rows, cap_b[s0:s1],
                None, float(boxsize), sb=True)
            rho, h, vf, wk, done, _ = stream_wvt_pallas(
                src, rows, state.cand.count[s0:s1], pos_t[s0:s1],
                h0_b[s0:s1], cap_b[s0:s1], h0_b[s0:s1], float(mpart),
                float(boxsize), kernel=cfg.sph_kernel, desnngb=desnngb,
                do_disp=False, sb_mode=True, bits=bits, safe=safe)
            for o, r in zip(outs, (rho, h, wk, done)):
                o.append(r.reshape(-1))
        rho, h, wk, done = (jnp.concatenate(o) for o in outs)
        return rho, h, wk, done, bi, state

    t0 = time.perf_counter()
    zeros_h = jnp.zeros((N_GAS,), jnp.float32)
    rho, h, wk, done, bi, state = density_pass(pos, zeros_h)
    del zeros_h
    jax.block_until_ready(rho)
    t_cold = time.perf_counter() - t0
    print(f"cold pass {t_cold:.1f}s (incl. compiles)", flush=True)

    # warm production pass: fresh build at warm-started h
    inv = jnp.zeros_like(bi.order).at[bi.order].set(
        jnp.arange(N_GAS, dtype=bi.order.dtype))
    h_warm = h[:N_GAS][inv]
    pos_sorted = bi.pos[:N_GAS]
    pos_unsorted = pos_sorted[inv]
    del rho, wk, done, state, bi, pos, pos_sorted, inv, h
    t0 = time.perf_counter()
    rho, h, wk, done, bi, state = density_pass(pos_unsorted, h_warm)
    jax.block_until_ready(rho)
    t_warm = time.perf_counter() - t0
    print(f"warm pass {t_warm:.1f}s", flush=True)

    v = np.asarray(bi.valid)
    wk_v = np.asarray(wk)[v]
    done_v = np.asarray(done)[v]
    dev = np.abs(wk_v - desnngb)
    out = {
        "n_gas": N_GAS,
        "sample_s": round(t_sample, 1),
        "density_pass_cold_s": round(t_cold, 1),
        "density_pass_warm_s": round(t_warm, 1),
        "particles_per_sec_warm": round(N_GAS / t_warm, 0),
        "m_sb_width": int(state.cand.idx.shape[1]),
        "n_blocks": int(bi.n_blocks),
        "done_frac": round(float(done_v.mean()), 6),
        "contract_frac_ok": round(
            float((dev < const.NNGBDEV + 1e-3).mean()), 5),
        "contract_p999_dev": round(float(np.percentile(dev, 99.9)), 4),
        "device": str(jax.devices()[0]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_1e8_r03.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
