"""Per-phase breakdown of one stream-engine WVT iteration on the TPU.

    python scripts/profile_stream.py [N_GAS]

Phases: superblock build (sort + level-1 sweep), per-iteration skip
bits, the stream kernel (density+displacement / density-only /
sweep-capped), and the XLA prologue (model density + metric).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu import constants as const
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops.pallas_pair import (stream_skip_bits,
                                            stream_wvt_pallas)
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(name, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


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
          f"device={jax.devices()[0]}", flush=True)

    parts = sph_mod.find_sph_quantities(scene, ha, parts)
    pos_gas = parts.pos[:n_gas]
    rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize)
    h_box = wvt._metric_hsml(rho_model, mpart, desnngb)
    h0_model = (desnngb * mpart / rho_model
                / const.FOURPITHIRD) ** (1.0 / 3.0)
    h0 = jnp.where(parts.hsml[:n_gas] > 0, parts.hsml[:n_gas], h0_model)
    h_cap = jnp.minimum(jnp.maximum(h0, h0_model) * sph_mod._CAP_FACTOR,
                        boxsize / 3.0)

    timed("rho_model + metric", lambda: wvt._metric_hsml(
        sph_mod.global_density_model(pos_gas, ha, boxsize), mpart,
        desnngb))
    timed("build (sort + sb level-1 sweep)",
          lambda: sph_mod.build_neighbours(
              pos_gas, h_cap, boxsize,
              radius_sym_gas=h_box * boxsize * wvt._SYM_MARGIN))
    state = sph_mod.build_neighbours(
        pos_gas, h_cap, boxsize,
        radius_sym_gas=h_box * boxsize * wvt._SYM_MARGIN)
    assert state.sb, "stream profile expects the superblock build"
    bi = state.index
    nb = bi.n_blocks
    cnt = state.cand.count
    print(f"{'  M_sb':44s} {state.cand.idx.shape[1]:9d}")
    print(f"{'  sb count p50/p99/max':44s} "
          f"{np.percentile(np.asarray(cnt), 50):5.0f} "
          f"{np.percentile(np.asarray(cnt), 99):5.0f} "
          f"{int(cnt.max()):5d}", flush=True)

    h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    hm_s = sph_mod._pad_sorted(h_box, bi.order, bi.n_padded)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm_src = jnp.where(bi.valid, hm_s, 0.0)
    src = jnp.concatenate(
        [pos_t, hm_src.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0_s.reshape(nb, blk.BLOCK)
    cap_b = state.h_cap.reshape(nb, blk.BLOCK)
    hm_b = hm_s.reshape(nb, blk.BLOCK)
    bhm = hm_src.reshape(nb, blk.BLOCK).max(axis=1)
    ids = jnp.arange(nb, dtype=jnp.int32)

    bk = state.buckets or (None, None)
    bits, safe = timed(
        "skip_bits (bucketed)", lambda: stream_skip_bits(
            bi.bb_lo, bi.bb_hi, bhm, ids, state.cand.idx, cap_b, hm_b,
            float(boxsize), sb=True, bucket_ids=bk[0],
            bucket_widths=bk[1]))

    kw = dict(kernel=cfg.sph_kernel, desnngb=desnngb, sb_mode=True,
              bits=bits, safe=safe)
    args = (src, state.cand.idx, cnt, pos_t, h0_b, cap_b, hm_b,
            float(mpart), float(boxsize))
    o = timed("stream kernel (density+disp)",
              lambda: stream_wvt_pallas(*args, **kw))
    print(f"{'  done frac':44s} "
          f"{float(jnp.mean(o[4].astype(jnp.float32))):9.4f}")
    timed("stream kernel (density only)",
          lambda: stream_wvt_pallas(*args, **kw, do_disp=False))
    timed("stream kernel (1 sweep + disp)",
          lambda: stream_wvt_pallas(*args, **kw, n_sweeps=1))

    # ---- in-kernel member test path (TOYCLUSTER_IK_BITS) ----
    from toycluster_tpu.ops.pallas_pair import compact_sb_lists_agg
    bits_sb, safe_a = timed(
        "ik: stage-A hull bits (agg)", lambda: stream_skip_bits(
            bi.bb_lo, bi.bb_hi, bhm, ids, state.cand.idx, cap_b, hm_b,
            float(boxsize), agg=True))
    cand_it, cnt_it = timed(
        "ik: compact_sb_lists_agg", lambda: compact_sb_lists_agg(
            state.cand.idx, cnt, bits_sb, do_disp=True))
    print(f"{'  kept sb frac (stage-A)':44s} "
          f"{float(jnp.sum(cnt_it) / jnp.maximum(jnp.sum(jnp.minimum(cnt, state.cand.idx.shape[1])), 1)):9.4f}")
    cen_blk = 0.5 * (bi.bb_lo + bi.bb_hi)
    ext_blk = 0.5 * (bi.bb_hi - bi.bb_lo)
    rowq = jnp.concatenate(
        [cen_blk, ext_blk, cap_b.max(axis=1)[:, None],
         hm_b.max(axis=1)[:, None]], axis=1).astype(jnp.float32)
    mtab = jnp.concatenate(
        [cen_blk, ext_blk, bhm[:, None],
         jnp.zeros((nb, 1), jnp.float32)], axis=1).astype(jnp.float32)
    kw_ik = dict(kernel=cfg.sph_kernel, desnngb=desnngb, sb_mode=True,
                 safe=safe_a, rowq=rowq, mtab=mtab, inkernel_bits=True)
    args_ik = (src, cand_it, cnt_it, pos_t, h0_b, cap_b, hm_b,
               float(mpart), float(boxsize))
    timed("ik: stream kernel (density+disp)",
          lambda: stream_wvt_pallas(*args_ik, **kw_ik))
    timed("ik: stream kernel (density only)",
          lambda: stream_wvt_pallas(*args_ik, **kw_ik, do_disp=False))

    # ---- the production whole-iteration program (mega-jit) ----
    if sph_mod._engine() == "pallas":
        beta_u = sph_mod.uniform_beta(scene)
        b_ids, b_widths = state.buckets
        class_shape = ("bits",) + tuple(
            (ids.shape[0], w) for ids, w in zip(b_ids, b_widths))
        iter_fn = wvt._get_iter_fn(
            class_shape, n_gas, bi.n_padded, float(mpart),
            float(boxsize), desnngb, cfg.sph_kernel, None, "pallas",
            tail_shape=None, beta=beta_u)
        growable = jnp.full((n_gas,), sph_mod._CAP_FACTOR, jnp.float32)
        pos_sorted = bi.pos[:n_gas]
        h_sorted = sph_mod._pad_sorted(
            parts.hsml[:n_gas], bi.order, bi.n_padded)[:n_gas]
        out = timed("iter_fn (whole-iteration jit)", lambda: iter_fn(
            pos_sorted, h_sorted, jnp.zeros((n_gas,), jnp.float32),
            state.h_cap, state.cand.idx,
            state.cand.count, b_ids, None, ha, growable,
            jnp.int32(n_gas), jnp.float32(0.0085),
            jnp.float32(1e30), jnp.int32(0)))
        t0 = time.perf_counter()
        n_sat = int(out[7]); em = float(out[5])
        print(f"{'  host sync (n_sat/err floats)':44s} "
              f"{(time.perf_counter() - t0)*1e3:9.1f} ms "
              f"(n_sat={n_sat} err_max={em:.3f})")


if __name__ == "__main__":
    main()
