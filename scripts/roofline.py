"""Roofline accounting for the stream WVT kernel on one TPU chip.

Measures, at BENCH-scale N:
  1. COMPUTED pair volume per fused pass, from the packed skip bits
     (the DMA streams every candidate superblock; the bits gate the
     (B,B) tile math — so computed pairs, not streamed bytes, are the
     cost that matters).
  2. Achieved pair rate and flops (ops/pair counted from the kernel
     arithmetic below).
  3. The chip's empirical VPU f32 ceiling, from a pure elementwise
     Pallas kernel on VMEM-resident data (FMA chain, no memory traffic
     in the loop).
  4. HBM traffic per pass (every candidate block is DMA'd whether or
     not the tile runs) against the published ~819 GB/s v5e bandwidth.

    python scripts/roofline.py [N_GAS]
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from toycluster_tpu import parse_par_file
from toycluster_tpu import constants as const
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.models import wvt
from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops.pallas_pair import (_FAN, stream_skip_bits,
                                            stream_wvt_pallas)
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene

N_GAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def timed(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


# ---- empirical VPU ceiling ----------------------------------------------
def vpu_peak(dtype=jnp.float32):
    """VPU throughput from NCHAIN independent FMA chains on a
    VMEM-resident (B,B) tile (independent accumulators so the chains
    pipeline across vregs instead of serializing on FMA latency)."""
    DEPTH, PASSES, B, NCHAIN = 8, 4096, 512, 4

    def kern(x_ref, o_ref):
        x = x_ref[...]
        accs = [x * (1.0 + 0.001 * i) for i in range(NCHAIN)]

        def body(i, accs):
            out = []
            for a in accs:
                for _ in range(DEPTH):
                    a = a * 1.000000119 + x
                out.append(a)
            return out

        accs = jax.lax.fori_loop(0, PASSES, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[...] = acc

    x = jnp.ones((B, B), dtype)
    f = jax.jit(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((B, B), dtype)))
    dt, _ = timed(lambda: f(x))
    return 2.0 * DEPTH * PASSES * NCHAIN * B * B / dt


def main():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=2 * N_GAS)
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(1), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    n_gas = parts.n_gas
    boxsize, mpart, desnngb = scene.boxsize, scene.mpart_gas, cfg.desnngb
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
    B = blk.BLOCK
    cnt = state.cand.count

    h0_s = sph_mod._pad_sorted(h0, bi.order, bi.n_padded)
    hm_s = sph_mod._pad_sorted(h_box, bi.order, bi.n_padded)
    pos_t = bi.pos.reshape(nb, B, 3).transpose(0, 2, 1)
    hm_src = jnp.where(bi.valid, hm_s, 0.0)
    src = jnp.concatenate([pos_t, hm_src.reshape(nb, 1, B)], axis=1)
    h0_b = h0_s.reshape(nb, B)
    # effective cap as the production loop solves it (warm h margin)
    cap_b = jnp.minimum(state.h_cap,
                        h0_s * wvt._BITS_MARGIN_WARM).reshape(nb, B)
    hm_b = hm_s.reshape(nb, B)
    bhm = hm_src.reshape(nb, B).max(axis=1)
    ids = jnp.arange(nb, dtype=jnp.int32)
    bk = state.buckets or (None, None)
    bits, safe = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, ids, state.cand.idx, cap_b, hm_b,
        float(boxsize), sb=True, bucket_ids=bk[0], bucket_widths=bk[1])

    kw = dict(kernel=cfg.sph_kernel, desnngb=desnngb, sb_mode=True,
              bits=bits, safe=safe)
    args = (src, state.cand.idx, cnt, pos_t, h0_b, cap_b, hm_b,
            float(mpart), float(boxsize))
    dt_union, out = timed(
        lambda: stream_wvt_pallas(*args, **kw))
    dt_dens, _ = timed(
        lambda: stream_wvt_pallas(*args, **kw, do_disp=False))

    # ---- pair volume from the bits --------------------------------------
    bits_h = np.asarray(bits)
    cnt_h = np.asarray(cnt)
    m_blocks = state.cand.idx.shape[1] * _FAN
    S = bits_h.shape[0]
    idx = np.arange(m_blocks)
    words = bits_h[:, idx >> 4]
    b2 = (words >> (2 * (idx & 15))) & 3
    in_list = idx[None, :] < cnt_h[:, None] * _FAN
    dens_blocks = ((b2 & 1) == 0) & in_list
    disp_blocks = ((b2 & 2) == 2) & in_list
    union_blocks = (dens_blocks | disp_blocks)
    n_dens = dens_blocks.sum()
    n_disp = disp_blocks.sum()
    n_union = union_blocks.sum()
    n_stream = in_list.sum()
    pairs_union = n_union * B * B
    pairs_dens = n_dens * B * B

    # ops/pair in the fused union tile, counted from _stream_kernel:
    #   r2: 3 sub + 3 FMA                      =  9
    #   rsqrt + r = r2*inv_r                   =  3  (rsqrt ~2)
    #   density (wc6): u, t, t2, t4, t7, wpoly(3 FMA), dpoly(3 FMA),
    #     2 accum FMA + t4*t4, vj mul          ~ 18
    #   disp: hbar, mask(3 cmp), u sel, t..t4, wflat(3 FMA), coef,
    #     3 * (mul + accum FMA)                ~ 22
    OPS_UNION = 52.0
    OPS_DENS = 30.0

    gflops_union = pairs_union * OPS_UNION / dt_union / 1e9
    gflops_dens = pairs_dens * OPS_DENS / dt_dens / 1e9

    # HBM traffic: every in-list superblock group is DMA'd (4 rows of
    # B f32 per member block)
    bytes_pass = n_stream * 4 * B * 4
    vpu = vpu_peak()

    print(f"N_gas={n_gas}  rows={S}  nb={nb}  M_sb={state.cand.idx.shape[1]}")
    print(f"blocks/row: streamed p50={np.percentile(in_list.sum(1),50):.0f} "
          f"dens p50={np.percentile(dens_blocks.sum(1),50):.0f} "
          f"disp p50={np.percentile(disp_blocks.sum(1),50):.0f} "
          f"union p50={np.percentile(union_blocks.sum(1),50):.0f}")
    print(f"computed pairs: union={pairs_union/1e9:.2f}G "
          f"dens-only={pairs_dens/1e9:.2f}G  "
          f"useful={n_gas*desnngb/1e9:.3f}G "
          f"(overfetch {pairs_dens/(n_gas*desnngb):.0f}x)")
    print(f"union pass:   {dt_union*1e3:7.1f} ms  "
          f"{pairs_union/dt_union/1e9:6.2f} Gpair/s  "
          f"~{gflops_union:5.0f} Gflop/s")
    print(f"density pass: {dt_dens*1e3:7.1f} ms  "
          f"{pairs_dens/dt_dens/1e9:6.2f} Gpair/s  "
          f"~{gflops_dens:5.0f} Gflop/s")
    vpu_bf16 = vpu_peak(jnp.bfloat16)
    print(f"VPU ceiling (measured FMA chains): f32 {vpu/1e9:.0f} "
          f"Gflop/s, bf16 {vpu_bf16/1e9:.0f} Gflop/s")
    print(f"-> union pass at {100*gflops_union/(vpu/1e9):.0f}% of VPU peak; "
          f"ideal-pair floor {n_gas*desnngb*OPS_UNION/(vpu)*1e3:.1f} ms")
    print(f"HBM per pass: {bytes_pass/1e9:.2f} GB -> "
          f"{bytes_pass/dt_union/1e9:.0f} GB/s of ~819 GB/s")


if __name__ == "__main__":
    main()
