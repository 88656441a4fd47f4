"""B-field curl at config-5 scale (5e7 gas) on one chip.

PROFILE_r05 §5: both 1e8 runs with a B-field died with `TPU worker
process crashed or restarted` one-to-two stages after make_magnetic_field
— the block-granular candidate rebuild the old curl path performed is a
~13 GB table at 5e7 gas.  This probe runs the NEW superblock curl path
(models/bfield._curl_superblock: bounded receiver slabs over expanded
superblock lists) at full config-5 gas count and records wall-clock,
HBM stats, and field sanity.

    python scripts/diag_curl_large.py [n_gas]
"""

import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu.scene import build_scene
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.models import bfield, positions as pos_mod
from toycluster_tpu.models import sph as sph_mod

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
PAR_FILE = (sys.argv[2] if len(sys.argv) > 2 else
            os.environ.get("TOYCLUSTER_PAR_FILE",
                           "/root/reference/cluster.par"))


def main():
    cfg = parse_par_file(PAR_FILE).replace(
        ntotal=2 * N_GAS, bfld_norm=5e-6, bfld_eta=0.5)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    pos, _ = pos_mod.sample_halo_gas(key, ha, 0, N_GAS, scene.boxsize)
    pos = (pos + ha.d_com[0] + scene.boxhalf) % scene.boxsize
    jax.block_until_ready(pos)
    print(f"sampled {N_GAS} gas in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # density + adaptive hsml (the curl's inputs), stream engine
    t0 = time.perf_counter()
    h0 = sph_mod.model_hsml(pos, ha, mpart, desnngb, boxsize)
    h_cap = jnp.minimum(h0 * sph_mod._CAP_FACTOR, boxsize / 3.0)
    state = sph_mod.build_neighbours(pos, h_cap, boxsize)
    bi = state.index
    from toycluster_tpu.ops import blocks as blk
    from toycluster_tpu.ops.pallas_pair import (stream_skip_bits,
                                                stream_wvt_pallas)
    nb = bi.n_blocks
    h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    vm = bi.valid.astype(jnp.float32).reshape(nb, 1, blk.BLOCK)
    src = jnp.concatenate([pos_t, vm], axis=1)
    h0_b = h0_s.reshape(nb, blk.BLOCK)
    cap_b = state.h_cap.reshape(nb, blk.BLOCK)
    slab = 98304
    outs = [[] for _ in range(3)]
    for s0 in range(0, nb, slab):
        s1 = min(s0 + slab, nb)
        ids = jnp.arange(s0, s1, dtype=jnp.int32)
        rows = state.cand.idx[s0:s1]
        bits, safe = stream_skip_bits(
            bi.bb_lo, bi.bb_hi, None, ids, rows, cap_b[s0:s1], None,
            float(boxsize), sb=True)
        rho, h, vf, wk, done, _ = stream_wvt_pallas(
            src, rows, state.cand.count[s0:s1], pos_t[s0:s1],
            h0_b[s0:s1], cap_b[s0:s1], h0_b[s0:s1], float(mpart),
            float(boxsize), kernel=cfg.sph_kernel, desnngb=desnngb,
            do_disp=False, sb_mode=True, bits=bits, safe=safe)
        for o, r in zip(outs, (rho, h, vf)):
            o.append(r.reshape(-1))
    rho_s, h_s, vf_s = (jnp.concatenate(o) for o in outs)
    jax.block_until_ready(rho_s)
    t_dens = time.perf_counter() - t0
    print(f"density pass {t_dens:.1f}s", flush=True)

    # unsorted gas fields for the stage-level call
    inv = jnp.zeros_like(bi.order).at[bi.order].set(
        jnp.arange(N_GAS, dtype=bi.order.dtype))
    rho_u, h_u, vf_u = rho_s[:N_GAS][inv], h_s[:N_GAS][inv], \
        vf_s[:N_GAS][inv]
    pos_u = bi.pos[:N_GAS][inv]
    del rho_s, h_s, vf_s, inv, pos, h0_s, pos_t, vm, src, h0_b, cap_b

    # vector potential (single halo, closed form)
    a = (bfield.gas_density_device(
        jnp.linalg.norm(pos_u - (ha.d_com[0] + scene.boxhalf), axis=-1),
        ha, 0, None) / ha.rho0[0]) ** jnp.float32(cfg.bfld_eta)
    apot = jnp.repeat(a[:, None], 3, axis=1)
    jax.block_until_ready(apot)

    parts = SimpleNamespace(n_gas=N_GAS, pos=pos_u, hsml=h_u, rho=rho_u,
                            var_hsml_fac=vf_u, apot=apot)
    # stream-kernel curl first (the production path), then the slabbed
    # XLA expansion on the SAME structure for an apples-to-apples wall
    t0 = time.perf_counter()
    b = bfield._curl_stream(scene, parts, state)
    b = bfield.normalise_field(scene, ha, b, pos_u)
    jax.block_until_ready(b)
    t_stream = time.perf_counter() - t0
    print(f"stream curl + normalise {t_stream:.1f}s", flush=True)

    t0 = time.perf_counter()
    b2 = bfield._curl_superblock(scene, parts, state)
    b2 = bfield.normalise_field(scene, ha, b2, pos_u)
    jax.block_until_ready(b2)
    t_curl = time.perf_counter() - t0
    print(f"superblock curl + normalise {t_curl:.1f}s", flush=True)
    bmag2 = jnp.sqrt((b2 ** 2).sum(axis=-1))

    bmag = jnp.sqrt((b ** 2).sum(axis=-1))
    ms = jax.devices()[0].memory_stats() or {}
    out = {
        "n_gas": N_GAS,
        "density_pass_s": round(t_dens, 1),
        "curl_stream_s": round(t_stream, 1),
        "curl_s": round(t_curl, 1),
        "b_max_uG_slab": round(float(bmag2.max()) * 1e6, 4),
        "b_max_uG": round(float(bmag.max()) * 1e6, 4),
        "b_median_uG": round(float(jnp.median(bmag)) * 1e6, 6),
        "finite_frac": round(float(jnp.isfinite(bmag).mean()), 6),
        "peak_bytes_in_use": int(ms.get("peak_bytes_in_use", -1)),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
