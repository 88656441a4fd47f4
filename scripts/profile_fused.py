"""Phase breakdown of the FUSED WVT iteration (one build + fused kernel).
Run on the TPU: PYTHONPATH=... python scripts/profile_fused.py [N]."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu import constants as const
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(name, fn, *args, reps=3, **kw):
    fn(*args, **kw)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:9.1f} ms")
    return out, min(ts)


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    n_gas = parts.n_gas
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb
    print(f"N_gas={n_gas} kernel={cfg.sph_kernel} desnngb={desnngb} "
          f"device={jax.devices()[0]}")

    parts = sph_mod.find_sph_quantities(scene, ha, parts)
    pos_gas = parts.pos[:n_gas]
    total = 0.0

    def model_metric():
        rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize)
        return wvt._metric_hsml(rho_model, mpart, desnngb)

    h_box, dt = timed("rho_model + metric", model_metric)
    total += dt
    rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize)
    h0_model = (desnngb * mpart / rho_model
                / const.FOURPITHIRD) ** (1.0 / 3.0)
    h0 = jnp.where(parts.hsml[:n_gas] > 0, parts.hsml[:n_gas], h0_model)
    h_cap = jnp.minimum(jnp.maximum(h0, h0_model) * sph_mod._CAP_FACTOR,
                        boxsize / 3.0)

    _, dt = timed("build_blocks (sort+bbox)", blk.build_blocks, pos_gas,
                  boxsize)
    total += dt
    _, dt = timed("build_neighbours (combined)",
                  lambda: sph_mod.build_neighbours(
                      pos_gas, h_cap, boxsize,
                      radius_sym_gas=h_box * boxsize))
    total += dt
    total -= 0  # build includes build_blocks; do not double count
    total -= dt - dt  # no-op for clarity
    state = sph_mod.build_neighbours(pos_gas, h_cap, boxsize,
                                     radius_sym_gas=h_box * boxsize)
    print(f"{'  max_cand':36s} {state.max_cand:9d}")
    counts = np.asarray(state.cand.count)
    print(f"{'  cand count p50/p90/max':36s} "
          f"{np.percentile(counts, 50):6.0f} "
          f"{np.percentile(counts, 90):6.0f} {counts.max():6d}")
    for m, ids in sph_mod.classed_selections(state):
        print(f"{'  class M=' + str(m):36s} {len(ids):9d} rows")

    bi = state.index
    h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    hm_s = sph_mod._pad_sorted(h_box, bi.order, bi.n_padded)

    _, dt = timed("fused_pass (density+disp)",
                  lambda: sph_mod.fused_pass(
                      state, h0_s, hm_s, mpart, boxsize,
                      kernel=cfg.sph_kernel, desnngb=desnngb))
    total += dt

    # per-class timing
    from toycluster_tpu.ops.pallas_pair import fused_wvt_pallas
    if sph_mod._engine() == "pallas":
        nb = bi.n_blocks
        pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
        hm_src = jnp.where(bi.valid, hm_s, 0.0)
        hm_blocks = hm_src.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
        h0_b = h0_s.reshape(nb, blk.BLOCK)
        cap_b = state.h_cap.reshape(nb, blk.BLOCK)
        hm_b = hm_s.reshape(nb, blk.BLOCK)
        from toycluster_tpu.ops import pair_ops
        for m, ids_np in sph_mod.classed_selections(state):
            ids = jnp.asarray(ids_np)
            rows = state.cand.idx[jnp.maximum(ids, 0)][:, :m]
            rows = jnp.where((ids >= 0)[:, None], rows, -1)
            idc = jnp.maximum(ids, 0)
            cnt = jnp.where(ids >= 0, state.cand.count[idc], 0)
            timed(f"  fused class M={m}", fused_wvt_pallas,
                  pos_t, hm_blocks, rows, cnt, pos_t[idc], h0_b[idc],
                  cap_b[idc], hm_b[idc], float(mpart), float(boxsize),
                  kernel=cfg.sph_kernel, desnngb=desnngb)

    _, dt = timed("error stats + move", lambda: wvt._move(
        pos_gas, jnp.zeros((n_gas, 3), jnp.float32), boxsize))
    total += dt

    print(f"{'-'*46}\n{'TOTAL (one fused iteration)':36s} "
          f"{total*1e3:9.1f} ms")
    print(f"{'updates/s at this rate':36s} {n_gas/total:9.0f}")


if __name__ == "__main__":
    main()
