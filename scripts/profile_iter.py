"""Per-component wall-clock of ONE production WVT iteration (pallas
path) at converged-warm state: skip-bits pass, list compaction, fused
stream kernel, epilogue ops — the bench.py iteration decomposed.

    python scripts/profile_iter.py [N_GAS] [--agg]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from toycluster_tpu import parse_par_file
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops.pallas_pair import (compact_sb_lists,
                                            stream_skip_bits,
                                            stream_wvt_pallas)
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def t(label, fn, *a, reps=5, **k):
    out = fn(*a, **k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a, **k)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:34s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS, wvt_max_iter=6)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    n_gas = parts.n_gas
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb

    # warm the state with a few production iterations
    parts = wvt.regularise_sph_particles(scene, ha, parts)
    pos_gas = parts.pos[:n_gas]
    h_prev = parts.hsml[:n_gas]

    rho_model = sph_mod.global_density_model(pos_gas, ha, boxsize)
    h_box = wvt._metric_hsml(rho_model, mpart, desnngb)
    h0_model = (desnngb * mpart / rho_model
                / (4.0 / 3.0 * 3.14159265358979)) ** (1.0 / 3.0)
    h0 = jnp.where(h_prev > 0, h_prev, h0_model)
    h_cap = jnp.minimum(jnp.maximum(h0, h0_model) * sph_mod._CAP_FACTOR,
                        sph_mod.hard_h_cap(boxsize, n_gas))

    state = sph_mod.build_neighbours(
        pos_gas, h_cap, boxsize,
        radius_sym_gas=h_box * boxsize * wvt._SYM_MARGIN)
    assert state.sb
    bi = state.index
    nb = bi.n_blocks
    print(f"N={n_gas} nb={nb} width={state.cand.idx.shape[1]} "
          f"buckets={[ (len(i), w) for i, w in zip(*(state.buckets or ((),()))) ] if state.buckets else None}")

    def pad1(x):
        return sph_mod._pad_sorted(x, bi.order, bi.n_padded)

    h0_s = pad1(h0)
    hm_s = pad1(h_box)
    # warm margin like iter_fn
    cap_eff = jnp.minimum(pad1(h_cap), h0_s * wvt._BITS_MARGIN_WARM)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid = bi.valid
    hm_src = jnp.where(valid, hm_s, 0.0)
    hm_blocks = hm_src.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h0_b = h0_s.reshape(nb, blk.BLOCK)
    hm_b = hm_s.reshape(nb, blk.BLOCK)
    cap_b = cap_eff.reshape(nb, blk.BLOCK)
    src_blocks = jnp.concatenate([pos_t, hm_blocks], axis=1)
    pos_b = bi.pos.reshape(nb, blk.BLOCK, 3)
    bb_lo = pos_b.min(axis=1)
    bb_hi = pos_b.max(axis=1)
    bhm = hm_src.reshape(nb, blk.BLOCK).max(axis=1)
    ids = jnp.arange(nb, dtype=jnp.int32)
    cand_idx, count = state.cand.idx, state.cand.count
    cnt_all = jnp.minimum(count, cand_idx.shape[1])
    bk = state.buckets or (None, None)
    b_ids = tuple(bk[0]) if state.buckets else None
    b_w = tuple(bk[1]) if state.buckets else None

    bits_j = jax.jit(lambda lo, hi, bm, cb, hb: stream_skip_bits(
        lo, hi, bm, ids, cand_idx, cb, hb, float(boxsize), sb=True,
        bucket_ids=b_ids, bucket_widths=b_w))
    t("skip_bits (member, bucketed)", bits_j,
      bb_lo, bb_hi, bhm, cap_b, hm_b, reps=5)

    from toycluster_tpu.ops.pallas_pair import build_chunk_tab
    ctab = build_chunk_tab(pos_t, hm_src.reshape(nb, blk.BLOCK))
    bitsc_j = jax.jit(lambda lo, hi, bm, cb, hb, ct: stream_skip_bits(
        lo, hi, bm, ids, cand_idx, cb, hb, float(boxsize), sb=True,
        bucket_ids=b_ids, bucket_widths=b_w, chunk_tab=ct))
    bits, safe = t("skip_bits (chunk cross, prod)", bitsc_j,
                   bb_lo, bb_hi, bhm, cap_b, hm_b, ctab, reps=5)
    t("build_chunk_tab", jax.jit(build_chunk_tab), pos_t,
      hm_src.reshape(nb, blk.BLOCK), reps=5)

    agg_j = jax.jit(lambda lo, hi, bm, cb, hb: stream_skip_bits(
        lo, hi, bm, ids, cand_idx, cb, hb, float(boxsize), agg=True))
    t("skip_bits (agg hulls)", agg_j, bb_lo, bb_hi, bhm, cap_b, hm_b,
      reps=5)

    comp_j = jax.jit(lambda c, n, b: compact_sb_lists(
        c, n, b, do_disp=True))
    cand_it, pos_it, cnt_it = t(
        "compact_sb_lists (full width)", comp_j, cand_idx, cnt_all,
        bits, reps=5)
    print(f"  trips p50 {int(jnp.median(cnt_it))} "
          f"(full {int(jnp.median(cnt_all))})")

    def kern():
        return stream_wvt_pallas(
            src_blocks, cand_it, cnt_it, pos_t, h0_b, cap_b, hm_b,
            float(mpart), float(boxsize), kernel=cfg.sph_kernel,
            desnngb=desnngb, sb_mode=True, bits=bits, safe=safe,
            cand_pos=pos_it)

    t("stream kernel (fused union)", lambda: kern()[0], reps=5)

    def kern_dens():
        return stream_wvt_pallas(
            src_blocks, cand_it, cnt_it, pos_t, h0_b, cap_b, hm_b,
            float(mpart), float(boxsize), kernel=cfg.sph_kernel,
            desnngb=desnngb, sb_mode=True, bits=bits, safe=safe,
            cand_pos=pos_it, do_disp=False)

    t("stream kernel (density only)", lambda: kern_dens()[0], reps=5)

    # epilogue-ish: model fields + error stats + move
    def epi():
        rm = sph_mod.global_density_model(pos_gas, ha, boxsize)
        rho = kern()[0].reshape(-1)[:n_gas]
        err = jnp.abs(rho - rm) / rm
        return err.mean(), err.max()

    md_j = jax.jit(lambda p: sph_mod.global_density_model(
        p, ha, boxsize))
    t("model density (global)", md_j, pos_gas, reps=5)

    # whole production iter_fn (the bench median-iteration program),
    # inputs in the state's sorted loop order like regularise passes
    from toycluster_tpu.models.wvt import _get_iter_fn
    b_ids_t, b_w_t = state.buckets
    class_shape = ("bits",) + tuple(
        (i.shape[0], w) for i, w in zip(b_ids_t, b_w_t))
    iter_fn = _get_iter_fn(
        class_shape, n_gas, bi.n_padded, float(mpart), float(boxsize),
        desnngb, cfg.sph_kernel, None, "pallas",
        beta=sph_mod.uniform_beta(scene))
    ordg = bi.order[:n_gas]
    pos_s = bi.pos[:n_gas]
    t("FULL iter_fn", lambda: iter_fn(
        pos_s, h_prev[ordg], rho_model[ordg], state.h_cap,
        jnp.zeros((n_gas,), bool), jnp.float32(1.1),
        state.cand.idx, state.cand.count, tuple(b_ids_t), state.tail,
        ha, jnp.full((n_gas,), sph_mod._CAP_FACTOR, jnp.float32),
        jnp.int32(n_gas), jnp.float32(0.0085), jnp.float32(0.03),
        jnp.int32(7))[0], reps=5)

    # candidate refresh (amortized every ~2 iters)
    t("refresh_candidates", lambda: sph_mod.refresh_candidates(
        state, pos_gas, h_box * boxsize * wvt._SYM_MARGIN,
        boxsize).cand.idx, reps=3)

    # full rebuild (amortized every REBUILD_EVERY)
    t("build_neighbours (full)", lambda: sph_mod.build_neighbours(
        pos_gas, h_cap, boxsize,
        radius_sym_gas=h_box * boxsize * wvt._SYM_MARGIN).cand.idx,
        reps=3)


if __name__ == "__main__":
    main()
