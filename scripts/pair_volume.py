"""Pair-volume audit of the stream engine: how much of the computed
tile volume is geometrically necessary?

    python scripts/pair_volume.py [N_GAS] [N_SAMPLE_ROWS]

Levels measured (per receiver block row, sampled):

  kept      — member blocks the skip bits let through (what the kernel
              COMPUTES today: density bit, disp bit, union)
  needed    — member blocks with ANY pair actually inside the range the
              physics uses (density: r < cap_i — the solve's coverage
              contract; disp: r < (hm_i+hm_j)/2·box)
  pairs     — true in-range pair count vs 128x128 tile pair volume

`kept/needed` is the skip-test geometry cushion (tighter tests could
close it); `needed x 16384 / pairs` is the block-granularity cushion
(only finer receiver/source granularity or source compaction closes
it).  PROFILE_r04 rejected finer receivers; this audit decides whether
a source-compaction pass (gather in-range sources into dense tiles,
paying idle HBM bandwidth to cut VPU tile count) has real headroom.
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
from toycluster_tpu.ops.pallas_pair import _FAN, stream_skip_bits
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 256


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

    state = sph_mod.build_neighbours(
        pos_gas, h_cap, boxsize,
        radius_sym_gas=h_box * boxsize * wvt._SYM_MARGIN)
    assert state.sb
    bi = state.index
    nb = bi.n_blocks
    cnt = np.asarray(state.cand.count)
    m_sb = state.cand.idx.shape[1]

    h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    hs_s = sph_mod._pad_sorted(parts.hsml[:n_gas], bi.order, bi.n_padded)
    hm_s = sph_mod._pad_sorted(h_box, bi.order, bi.n_padded)
    capg = sph_mod._pad_sorted(h_cap, bi.order, bi.n_padded)
    hm_src = jnp.where(bi.valid, hm_s, 0.0)
    cap_b = capg.reshape(nb, blk.BLOCK)
    hm_b = hm_s.reshape(nb, blk.BLOCK)
    bhm = hm_src.reshape(nb, blk.BLOCK).max(axis=1)
    ids = jnp.arange(nb, dtype=jnp.int32)

    bk = state.buckets or (None, None)
    bits, safe = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, ids, state.cand.idx, cap_b, hm_b,
        float(boxsize), sb=True, bucket_ids=bk[0], bucket_widths=bk[1])
    bits_np = np.asarray(bits)          # (nb, ceil(m_sb*_FAN/16)) int32
    # the PRODUCTION bits (chunk cross test, commit 3d39df6): same call
    # with the 16-particle chunk-geometry table, as the WVT loop builds
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    from toycluster_tpu.ops.pallas_pair import build_chunk_tab
    ctab = build_chunk_tab(pos_t, hm_src.reshape(nb, blk.BLOCK))
    bits_c, _ = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, ids, state.cand.idx, cap_b, hm_b,
        float(boxsize), sb=True, bucket_ids=bk[0], bucket_widths=bk[1],
        chunk_tab=ctab)
    bits_c_np = np.asarray(bits_c)
    cand_np = np.asarray(state.cand.idx)

    # decode kept member counts per row from the packed 2-bit fields
    def decode_row(r, src=None):
        src = bits_np if src is None else src
        n_m = min(cnt[r], m_sb) * _FAN
        idx = np.arange(n_m)
        words = src[r, idx >> 4]
        b2 = (words >> (2 * (idx & 15))) & 3
        dens_keep = (b2 & 1) == 0
        disp_keep = (b2 & 2) == 2
        return dens_keep, disp_keep

    rng = np.random.default_rng(0)
    rows = np.sort(rng.choice(nb, size=min(N_ROWS, nb), replace=False))

    pos_b = bi.pos.reshape(nb, blk.BLOCK, 3)
    valid_b = bi.valid.reshape(nb, blk.BLOCK)
    hm_srcb = hm_src.reshape(nb, blk.BLOCK)

    @jax.jit
    def row_audit(r, members):
        """members: (m_sb*_FAN,) global member-block ids (-1 pad).
        Returns per-member (any_dens, any_disp, n_pairs_dens,
        n_pairs_disp) vs the row's receivers."""
        xi = pos_b[r]                    # (B,3)
        cap_i = cap_b[r]                 # (B,)
        hsolved_i = hs_s.reshape(nb, blk.BLOCK)[r]
        hm_i = hm_b[r]
        vi = valid_b[r]

        def one(m):
            mm = jnp.maximum(m, 0)
            xj = pos_b[mm]               # (B,3)
            hj = jnp.where(m >= 0, hm_srcb[mm], 0.0)
            vj = jnp.where(m >= 0, valid_b[mm], False)
            d = xi[:, None, :] - xj[None, :, :]
            d = d - boxsize * jnp.round(d / boxsize)
            r2 = (d * d).sum(-1)
            ok = vi[:, None] & vj[None, :]
            in_dens = ok & (r2 < (cap_i**2)[:, None])
            in_denss = ok & (r2 < (hsolved_i**2)[:, None])
            hbar = 0.5 * (hm_i[:, None] + hj[None, :]) * boxsize
            in_disp = ok & (r2 < hbar * hbar) & (hj[None, :] > 0)
            return (in_dens.any(), in_disp.any(), in_denss.sum(),
                    in_disp.sum(), in_dens.sum())

        return jax.vmap(one)(members)

    tot = dict(kept_d=0, kept_s=0, kept_u=0, need_d=0, need_s=0,
               need_u=0, pairs_s=0, pairs_d=0, pairs_cap=0, listed=0,
               ckept_d=0, ckept_s=0, ckept_u=0, miss=0)
    t0 = time.perf_counter()
    for r in rows:
        n_sb = min(cnt[r], m_sb)
        members = np.full(m_sb * _FAN, -1, np.int64)
        sbs = cand_np[r, :n_sb]
        mem = (sbs[:, None] * _FAN + np.arange(_FAN)[None, :]).reshape(-1)
        # keep phantom members (>= nb: tail-superblock padding) as -1 IN
        # PLACE — compacting them out shifts every later position against
        # the packed bit fields and fabricates per-position mismatches
        mem = np.where((mem >= 0) & (mem < nb), mem, -1)
        members[: len(mem)] = mem
        any_d, any_s, np_s, np_d, np_cap = (
            np.asarray(x) for x in row_audit(int(r), jnp.asarray(members)))
        dens_keep, disp_keep = decode_row(r)
        n_m = len(dens_keep)
        tot["listed"] += n_m
        tot["kept_d"] += int(dens_keep.sum())
        tot["kept_s"] += int(disp_keep.sum())
        tot["kept_u"] += int((dens_keep | disp_keep).sum())
        cd, cs = decode_row(r, bits_c_np)
        tot["ckept_d"] += int(cd.sum())
        tot["ckept_s"] += int(cs.sum())
        tot["ckept_u"] += int((cd | cs).sum())
        valid_m = members[:n_m] >= 0
        # conservativeness audit: a needed member must stay kept
        tot["miss"] += int(((np.asarray(any_d[:n_m]) & valid_m) & ~cd).sum()
                           + ((np.asarray(any_s[:n_m]) & valid_m)
                              & ~cs).sum())
        tot["need_d"] += int((any_d[:n_m] & valid_m).sum())
        tot["need_s"] += int((any_s[:n_m] & valid_m).sum())
        tot["need_u"] += int(((any_d | any_s)[:n_m] & valid_m).sum())
        tot["pairs_s"] += int(np_s[:n_m][valid_m].sum())
        tot["pairs_d"] += int(np_d[:n_m][valid_m].sum())
        tot["pairs_cap"] += int(np_cap[:n_m][valid_m].sum())
    dt = time.perf_counter() - t0
    nr = len(rows)
    B2 = blk.BLOCK * blk.BLOCK
    print(f"rows sampled: {nr}  ({dt:.1f}s)")
    print(f"{'listed members/row':34s} {tot['listed']/nr:9.1f}")
    for k, lab in [("d", "density"), ("s", "disp"), ("u", "union")]:
        print(f"{lab+' kept/row':34s} {tot['kept_'+k]/nr:9.1f}")
        print(f"{lab+' kept/row (chunk bits)':34s} {tot['ckept_'+k]/nr:9.1f}"
              f"  cushion {tot['ckept_'+k]/max(tot['need_'+k],1):.2f}x")
        print(f"{lab+' needed/row':34s} {tot['need_'+k]/nr:9.1f}  "
              f"cushion {tot['kept_'+k]/max(tot['need_'+k],1):.2f}x")
    print(f"{'needed-but-dropped (must be 0)':34s} {tot['miss']:9d}")
    print(f"{'tile pair volume (union kept)':34s} "
          f"{tot['kept_u']*B2/nr:9.0f}")
    print(f"{'tile pair volume (chunk kept)':34s} "
          f"{tot['ckept_u']*B2/nr:9.0f}")
    print(f"{'true pairs r<cap_i':34s} {tot['pairs_cap']/nr:9.0f}  "
          f"granularity cushion "
          f"{tot['ckept_u']*B2/max(tot['pairs_cap'],1):.2f}x")
    print(f"{'true pairs r<h_i (solved)':34s} {tot['pairs_s']/nr:9.0f}")
    print(f"{'true pairs disp range':34s} {tot['pairs_d']/nr:9.0f}")


if __name__ == "__main__":
    main()
