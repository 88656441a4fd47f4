"""Phase-level wall-clock breakdown of one WVT iteration on the chip.

Times each stage of the hot loop separately (block_until_ready between
stages) so optimisation effort goes where the time is.  Output feeds
PROFILE_r02.md.  Run on the TPU: `python scripts/profile_phases.py [N]`.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops import pair_ops
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(name, fn, *args, reps=3, **kw):
    fn(*args, **kw)  # warmup/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e3:9.1f} ms")
    return out, best


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    n_gas = parts.n_gas
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb
    print(f"N_gas={n_gas}  kernel={cfg.sph_kernel}  desnngb={desnngb}  "
          f"device={jax.devices()[0]}")

    # one full density pass to get a relaxed-ish hsml warm start
    parts = sph_mod.find_sph_quantities(scene, ha, parts)
    pos_gas = parts.pos[:n_gas]

    total = 0.0

    _, dt = timed("rho_model + metric", lambda: (
        wvt._metric_hsml(sph_mod.global_density_model(
            pos_gas, ha, boxsize, None), mpart, desnngb)))
    total += dt
    rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize, None)
    h_box = wvt._metric_hsml(rho_model, mpart, desnngb)

    h0_model = sph_mod.model_hsml(pos_gas, ha, mpart, desnngb, boxsize)
    h0 = jnp.where(parts.hsml[:n_gas] > 0, parts.hsml[:n_gas], h0_model)
    h_cap = jnp.minimum(jnp.maximum(h0, h0_model) * sph_mod._CAP_FACTOR,
                        boxsize / 3.0)

    (order, dt) = timed("hilbert sort", lambda: blk.build_blocks(
        pos_gas, boxsize).order)
    total += dt

    _, dt = timed("build_neighbours (density)",
                  sph_mod.build_neighbours, pos_gas, h_cap, boxsize)
    total += dt
    state = sph_mod.build_neighbours(pos_gas, h_cap, boxsize)
    print(f"{'  max_cand':34s} {state.max_cand:9d}")
    counts = np.asarray(state.cand.count)
    print(f"{'  cand count p50/p90/max':34s} "
          f"{np.percentile(counts, 50):6.0f} {np.percentile(counts, 90):6.0f}"
          f" {counts.max():6d}")

    t0 = time.perf_counter()
    sels = sph_mod.classed_selections(state)
    dt = time.perf_counter() - t0
    print(f"{'classed_selections (host)':34s} {dt*1e3:9.1f} ms")
    total += dt
    for m, ids in sels:
        print(f"{'  class M=' + str(m):34s} {len(ids):9d} blocks")

    bi = state.index
    h0_sorted = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    engine = sph_mod._engine()
    print(f"{'engine':34s} {engine:>9s}")

    nb = bi.n_blocks
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h0_b = h0_sorted.reshape(nb, blk.BLOCK)
    cap_b = state.h_cap.reshape(nb, blk.BLOCK)

    if engine == "pallas":
        from toycluster_tpu.ops.pallas_pair import (
            solve_density_pallas, wvt_displacement_pallas)

        def density_class(sel, m):
            idc = jnp.maximum(sel.ids, 0)
            out = solve_density_pallas(
                pos_t, valid_t, sel.cand, pos_t[idc], h0_b[idc],
                cap_b[idc], float(mpart), float(boxsize),
                kernel=cfg.sph_kernel, desnngb=desnngb)
            return [o.reshape(-1) for o in out]
    else:
        def density_class(sel, m):
            return pair_ops.solve_density(
                bi, sel, h0_sorted, state.h_cap, mpart, boxsize,
                kernel=cfg.sph_kernel, desnngb=desnngb)

    _, dt = timed("density solve (all classes)",
                  lambda: sph_mod.run_classed(state, density_class))
    total += dt

    # per-class density timing
    for m, ids_np in sels:
        ids = jnp.asarray(ids_np)
        rows = state.cand.idx[jnp.maximum(ids, 0)][:, :m]
        rows = jnp.where((ids >= 0)[:, None], rows, -1)
        sel = pair_ops.BlockSelection(ids=ids, cand=rows)
        _, dt_c = timed(f"  density class M={m}", density_class, sel, m)

    _, dt = timed("build_neighbours (displacement)",
                  sph_mod.build_neighbours, pos_gas, h_box * boxsize,
                  boxsize)
    total += dt
    state_d = sph_mod.build_neighbours(pos_gas, h_box * boxsize, boxsize)
    bi_d = state_d.index
    h_sorted = sph_mod._pad_sorted(h_box, bi_d.order, bi_d.n_padded)

    if engine == "pallas":
        nb_d = bi_d.n_blocks
        pos_td = bi_d.pos.reshape(nb_d, blk.BLOCK, 3).transpose(0, 2, 1)
        valid_td = bi_d.valid.reshape(nb_d, 1, blk.BLOCK).astype(
            jnp.float32)
        h_b = h_sorted.reshape(nb_d, blk.BLOCK)
        h_b3 = h_sorted.reshape(nb_d, 1, blk.BLOCK)

        def disp_class(sel, m):
            idc = jnp.maximum(sel.ids, 0)
            out = wvt_displacement_pallas(
                pos_td, valid_td, h_b3, sel.cand, pos_td[idc], h_b[idc],
                0.0085, float(boxsize), kernel=cfg.sph_kernel)
            return (out.reshape(-1, 3),)
    else:
        def disp_class(sel, m):
            return (pair_ops.wvt_displacement(
                bi_d, sel, h_sorted, 0.0085, boxsize,
                kernel=cfg.sph_kernel),)

    _, dt = timed("displacement (all classes)",
                  lambda: sph_mod.run_classed(state_d, disp_class))
    total += dt

    _, dt = timed("error stats + move", lambda: wvt._move(
        pos_gas, jnp.zeros((n_gas, 3), jnp.float32), boxsize))
    total += dt

    print(f"{'-'*44}\n{'TOTAL (one iteration)':34s} {total*1e3:9.1f} ms")
    print(f"{'updates/s at this rate':34s} {n_gas/total:9.0f}")


if __name__ == "__main__":
    main()
