"""Compiled Pallas density kernel vs XLA on the real chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu.scene import build_scene
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.models import positions as pos_mod, sph as sph_mod
from toycluster_tpu.ops import blocks as blk, pair_ops
from toycluster_tpu.ops.pallas_pair import solve_density_pallas

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def timeit(label, fn):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label:24s} {time.perf_counter()-t0:7.3f}s", flush=True)
    return out


cfg = parse_par_file("/root/reference/cluster.par").replace(ntotal=N)
scene = build_scene(cfg)
ha = halo_arrays_from_scene(scene)
parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
pos = parts.pos[: parts.n_gas]
boxsize = scene.boxsize
mpart = scene.mpart_gas
desnngb = cfg.desnngb

h0 = sph_mod.model_hsml(pos, ha, mpart, desnngb, boxsize)
h_cap = jnp.minimum(h0 * 1.2, boxsize / 3.0)
state = sph_mod.build_neighbours(pos, h_cap, boxsize)
bi = state.index
h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
print("max_cand", state.max_cand, "counts p50/p99/max:",
      *np.percentile(np.asarray(state.cand.count), [50, 99, 100]).astype(int),
      flush=True)
print("classes:", [(m, len(i)) for m, i in
                   sph_mod.classed_selections(state)], flush=True)

nb = bi.n_blocks
pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
h0_b = h0_s.reshape(nb, blk.BLOCK)
cap_b = state.h_cap.reshape(nb, blk.BLOCK)


def run_pallas():
    def f(sel, m):
        idc = jnp.maximum(sel.ids, 0)
        out = solve_density_pallas(pos_t, valid_t, sel.cand, pos_t[idc],
                                   h0_b[idc], cap_b[idc], float(mpart),
                                   float(boxsize), kernel="wc6",
                                   desnngb=desnngb)
        return [o.reshape(-1) for o in out]
    return sph_mod.run_classed(state, f)


def run_xla():
    def f(sel, m):
        return pair_ops.solve_density(bi, sel, h0_s, state.h_cap, mpart,
                                      boxsize, kernel="wc6",
                                      desnngb=desnngb)
    return sph_mod.run_classed(state, f)


res_p = timeit("pallas density", run_pallas)
res_x = timeit("xla density", run_xla)

hp, hx = np.asarray(res_p[1]), np.asarray(res_x[1])
done_b = np.asarray(res_p[4]) & np.asarray(res_x[4]) & np.asarray(bi.valid)
rel = np.abs(hp - hx)[done_b] / hx[done_b]
print("done frac pallas/xla:",
      round(float(np.asarray(res_p[4])[np.asarray(bi.valid)].mean()), 4),
      round(float(np.asarray(res_x[4])[np.asarray(bi.valid)].mean()), 4))
print("h agreement p50/p99/max:",
      *np.percentile(rel, [50, 99, 100]).round(6))
