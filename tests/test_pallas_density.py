"""Pallas fused density kernel vs the XLA pair operator (interpret mode on
CPU; the compiled path runs on TPU via bench.py / TOYCLUSTER_ENGINE)."""

import jax.numpy as jnp
import numpy as np
import pytest

from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops import pair_ops
from toycluster_tpu.ops.pallas_pair import solve_density_pallas

BOX = 1000.0
N = 1500
DESNNGB = 64


def assert_h_rho_match(h_p, h_x, rho_p, rho_x, wk_p):
    """Pointwise h/rho equality for the well-conditioned bulk, the
    neighbour-number contract for plateau stragglers.

    wkNgb(h) plateaus where the support sphere grows into a void (the
    cusp fixture solves h spanning 0.06..100), so h there is only
    determined up to the contract window — ANY arithmetic difference
    (e.g. the stream kernel's MXU pair tile vs the XLA pair sum) moves
    such lanes along the plateau.  A real pair-loss regression still
    fails: it breaks |wkNgb - N| < NNGBDEV (asserted for EVERY done
    lane) or moves > 2% of lanes."""
    ok = (np.isclose(h_p, h_x, rtol=2e-3)
          & np.isclose(rho_p, rho_x, rtol=2e-3))
    assert ok.mean() > 0.98, f"bulk h/rho mismatch on {(~ok).sum()} lanes"
    assert np.abs(wk_p - DESNNGB).max() < 0.05 + 1e-3


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    r = 80.0 * (rng.random(N) ** 2 / (1 - rng.random(N) * 0.7))
    r = np.clip(r, 0, 400.0)
    u = rng.normal(size=(N, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = jnp.asarray(((BOX / 2 + r[:, None] * u) % BOX).astype(np.float32))
    c = jnp.asarray([BOX / 2] * 3)
    rr = jnp.linalg.norm(pos - c, axis=-1)
    h0 = jnp.clip(8.0 + rr * 0.2, 8.0, 90.0).astype(jnp.float32)
    bi = blk.build_blocks(pos, BOX)

    def pad(x):
        xs = x[bi.order]
        p = bi.n_padded - xs.shape[0]
        return jnp.concatenate([xs, jnp.broadcast_to(xs[-1:], (p,))])

    h0s = pad(h0)
    cap = h0s * 3.0
    radius = cap.reshape(bi.n_blocks, blk.BLOCK).max(axis=1)
    cand = blk.find_candidates(bi, radius, BOX, max_cand=16)
    assert int(cand.overflow) <= 0
    return bi, cand, h0s, cap


def test_pallas_matches_xla_solver(setup):
    bi, cand, h0s, cap = setup
    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)

    nb = bi.n_blocks
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    xi = pos_t  # full selection: receivers are all blocks
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)

    rho, h, vf, wk, done, sat = solve_density_pallas(
        pos_t, valid_t, cand.idx, xi, h0_b, cap_b, 1.0, BOX,
        kernel="wc6", desnngb=DESNNGB, n_sweeps=24, interpret=True)

    v = np.asarray(bi.valid)
    done_x = np.asarray(res.done) & v
    done_p = np.asarray(done).reshape(-1) & v
    # same convergence picture (fractions over the valid lanes)
    # both solvers leave the same cap-saturated tail (handled by the
    # production retry loop); the value comparison below is the real check
    assert done_p.sum() >= 0.97 * done_x.sum()
    assert done_p.sum() > 0.9 * v.sum()
    both = done_x & done_p
    np.testing.assert_allclose(np.asarray(h).reshape(-1)[both],
                               np.asarray(res.hsml)[both], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(rho).reshape(-1)[both],
                               np.asarray(res.rho)[both], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(vf).reshape(-1)[both],
                               np.asarray(res.var_hsml_fac)[both],
                               rtol=5e-3)
    wk_p = np.asarray(wk).reshape(-1)[both]
    assert np.abs(wk_p - DESNNGB).max() < 0.05 + 1e-3


def test_fused_kernel_matches_xla(setup):
    """The v2 fused kernel (VMEM-cached candidates, in-kernel Newton
    while_loop, displacement pass sharing the cache) must reproduce both
    the density solve and the displacement of the XLA operators."""
    from toycluster_tpu.ops.pallas_pair import fused_wvt_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    d_xla = pair_ops.wvt_displacement(bi, sel, h_box, 1.0, BOX)

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm_blocks = hm_sorted.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    rho, h, vf, wk, done, delta = fused_wvt_pallas(
        pos_t, hm_blocks, cand.idx, cand.count, pos_t, h0_b, cap_b,
        hm_b, 1.0, BOX, kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
        interpret=True)

    v = np.asarray(bi.valid)
    done_x = np.asarray(res.done) & v
    done_p = np.asarray(done).reshape(-1) & v
    assert done_p.sum() >= 0.97 * done_x.sum()
    both = done_x & done_p
    np.testing.assert_allclose(np.asarray(h).reshape(-1)[both],
                               np.asarray(res.hsml)[both], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(rho).reshape(-1)[both],
                               np.asarray(res.rho)[both], rtol=2e-3)
    wk_p = np.asarray(wk).reshape(-1)[both]
    assert np.abs(wk_p - DESNNGB).max() < 0.05 + 1e-3

    a = np.asarray(d_xla)[v]
    b = np.asarray(delta).reshape(-1, 3)[v]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6 * scale)


def test_pallas_displacement_matches_xla(setup):
    from toycluster_tpu.ops.pallas_pair import wvt_displacement_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    sel = pair_ops.full_selection(bi, cand.idx)
    d_xla = pair_ops.wvt_displacement(bi, sel, h_box, 0.01, BOX)

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h_b = h_box.reshape(nb, blk.BLOCK)
    h_b3 = h_box.reshape(nb, 1, blk.BLOCK)
    d_pal = wvt_displacement_pallas(pos_t, valid_t, h_b3, cand.idx, pos_t,
                                    h_b, 0.01, BOX, kernel="wc6",
                                    interpret=True)
    v = np.asarray(bi.valid)
    a = np.asarray(d_xla)[v]
    b = np.asarray(d_pal).reshape(-1, 3)[v]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6 * scale)


def test_superblock_tail_mode_matches_block_lists(setup):
    """Far-tail rows use SUPERBLOCK-granular candidate lists (sb_mode,
    8x compression for receivers whose block lists would overflow the
    cap): density and displacement must match the block-granular path."""
    import jax.numpy as jnp
    from toycluster_tpu.ops.pallas_pair import (solve_density_pallas,
                                                wvt_displacement_pallas)

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    radius = cap.reshape(nb, blk.BLOCK).max(axis=1)
    # superblock lists for a handful of "tail" receivers
    rec = jnp.asarray(np.array([0, 3, nb - 1, -1], np.int32))
    cand_sb = blk.find_candidates_super(bi, rec, radius, radius, BOX,
                                        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_t = bi.valid.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    idc = jnp.maximum(rec, 0)

    rho_sb, h_sb, _, wk_sb, done_sb, _ = solve_density_pallas(
        pos_t, valid_t, cand_sb.idx, pos_t[idc], h0_b[idc], cap_b[idc],
        1.0, BOX, kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
        interpret=True, sb_mode=True)

    # block-granular reference on the same receivers
    rows = cand.idx[idc]
    rows = jnp.where((rec >= 0)[:, None], rows, -1)
    sel = pair_ops.BlockSelection(ids=rec, cand=rows)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)
    v = np.asarray(bi.valid).reshape(nb, blk.BLOCK)[np.maximum(
        np.asarray(rec), 0)].reshape(-1)
    v &= np.repeat(np.asarray(rec) >= 0, blk.BLOCK)
    both = v & np.asarray(done_sb).reshape(-1) & np.asarray(res.done)
    assert both.sum() > 0.9 * v.sum()
    np.testing.assert_allclose(np.asarray(h_sb).reshape(-1)[both],
                               np.asarray(res.hsml)[both], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(rho_sb).reshape(-1)[both],
                               np.asarray(res.rho)[both], rtol=2e-3)

    # displacement parity
    h_box = h0s / BOX
    h_b3 = h_box.reshape(nb, 1, blk.BLOCK)
    h_b = h_box.reshape(nb, blk.BLOCK)
    d_sb = wvt_displacement_pallas(
        pos_t, valid_t, h_b3, cand_sb.idx, pos_t[idc], h_b[idc], 0.01,
        BOX, kernel="wc6", interpret=True, sb_mode=True)
    d_ref = pair_ops.wvt_displacement(bi, sel, h_box, 0.01, BOX)
    a = np.asarray(d_ref)[v]
    b = np.asarray(d_sb).reshape(-1, 3)[v]
    np.testing.assert_allclose(b, a, rtol=2e-4,
                               atol=1e-6 * max(np.abs(a).max(), 1e-30))

    # the fused (VMEM-cached) kernel supports sb_mode too — used for
    # small tail classes
    from toycluster_tpu.ops.pallas_pair import fused_wvt_pallas
    hm_src = jnp.where(bi.valid, h_box, 0.0)
    hm_blocks = hm_src.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    cnt = jnp.where(rec >= 0, cand_sb.count, 0)
    rho_f, h_f, _, _, done_f, d_f = fused_wvt_pallas(
        pos_t, hm_blocks, cand_sb.idx, cnt, pos_t[idc], h0_b[idc],
        cap_b[idc], h_b[idc], 1.0, BOX, kernel="wc6", desnngb=DESNNGB,
        n_sweeps=24, interpret=True, sb_mode=True)
    both_f = v & np.asarray(done_f).reshape(-1) & np.asarray(res.done)
    np.testing.assert_allclose(np.asarray(h_f).reshape(-1)[both_f],
                               np.asarray(res.hsml)[both_f], rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(d_f).reshape(-1, 3)[v] * 0.01, a, rtol=2e-4,
        atol=1e-6 * max(np.abs(a).max(), 1e-30))


def test_distance_skip_is_exact(setup):
    """The per-candidate-block distance-skip (gdist/dkeep) prunes only
    blocks whose every pair lies outside the kernel support, so the fused
    kernel must return BIT-IDENTICAL results with and without it."""
    from toycluster_tpu.ops.pallas_pair import fused_wvt_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    hm_src = jnp.where(bi.valid, h_box, 0.0)

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm_blocks = hm_src.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    base = fused_wvt_pallas(
        pos_t, hm_blocks, cand.idx, cand.count, pos_t, h0_b, cap_b,
        hm_b, 1.0, BOX, kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
        interpret=True)

    # exact bounds from the block bboxes (as the production callers do)
    rowsc = jnp.maximum(cand.idx, 0)
    ids = jnp.arange(nb)
    d2 = blk._interval_dist2(
        bi.bb_lo[ids][:, None], bi.bb_hi[ids][:, None],
        bi.bb_lo[rowsc], bi.bb_hi[rowsc], BOX)
    gd = jnp.where(cand.idx >= 0, jnp.sqrt(d2), jnp.inf)
    bhm = hm_src.reshape(nb, blk.BLOCK).max(axis=1)
    hmi_max = hm_b.max(axis=1)
    dk = gd <= 0.5 * (hmi_max[:, None] + bhm[rowsc]) * BOX

    # sanity: the bounds actually prune something on this setup
    assert bool((gd[cand.idx >= 0] > 0).any())

    skip = fused_wvt_pallas(
        pos_t, hm_blocks, cand.idx, cand.count, pos_t, h0_b, cap_b,
        hm_b, 1.0, BOX, kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
        interpret=True, gdist=gd, dkeep=dk)

    for a, b in zip(base, skip):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_kernel_matches_xla(setup):
    """The v3 stream kernel (grid over rows, in-kernel double-buffered
    DMA with dynamic trip counts) must reproduce the XLA density solve
    and displacement, block-lists and superblock (tail) mode alike."""
    from toycluster_tpu.ops.pallas_pair import stream_wvt_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    d_xla = pair_ops.wvt_displacement(bi, sel, h_box, 1.0, BOX)

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm_blocks = hm_sorted.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
    src = jnp.concatenate([pos_t, hm_blocks], axis=1)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    ids = jnp.arange(nb)
    rowsc = jnp.maximum(cand.idx, 0)
    d2 = blk._interval_dist2(
        bi.bb_lo[ids][:, None], bi.bb_hi[ids][:, None],
        bi.bb_lo[rowsc], bi.bb_hi[rowsc], BOX)
    gd = jnp.where(cand.idx >= 0, jnp.sqrt(d2), jnp.inf)
    bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)
    dk = gd <= 0.5 * (hm_b.max(axis=1)[:, None] + bhm[rowsc]) * BOX

    rho, h, vf, wk, done, delta = stream_wvt_pallas(
        src, cand.idx, cand.count, pos_t, h0_b, cap_b, hm_b, 1.0, BOX,
        gd, dk, kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
        interpret=True)

    v = np.asarray(bi.valid)
    done_x = np.asarray(res.done) & v
    done_p = np.asarray(done).reshape(-1) & v
    assert done_p.sum() >= 0.97 * done_x.sum()
    both = done_x & done_p
    assert_h_rho_match(np.asarray(h).reshape(-1)[both],
                       np.asarray(res.hsml)[both],
                       np.asarray(rho).reshape(-1)[both],
                       np.asarray(res.rho)[both],
                       np.asarray(wk).reshape(-1)[both])
    a = np.asarray(d_xla)[v]
    b = np.asarray(delta).reshape(-1, 3)[v]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6 * scale)

    # superblock (tail) mode on a handful of receivers
    radius = cap.reshape(nb, blk.BLOCK).max(axis=1)
    rec = jnp.asarray(np.array([0, 3, nb - 1, -1], np.int32))
    cand_sb = blk.find_candidates_super(bi, rec, radius, radius, BOX,
                                        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0
    idc = jnp.maximum(rec, 0)
    from toycluster_tpu.models.sph import expand_tail_rows
    exp = expand_tail_rows(cand_sb.idx, nb)
    rowsc = jnp.maximum(exp, 0)
    d2 = blk._interval_dist2(
        bi.bb_lo[idc][:, None], bi.bb_hi[idc][:, None],
        bi.bb_lo[rowsc], bi.bb_hi[rowsc], BOX)
    gds = jnp.where(exp >= 0, jnp.sqrt(d2), jnp.inf)
    dks = gds <= 0.5 * (hm_b[idc].max(axis=1)[:, None]
                        + bhm[rowsc]) * BOX
    cnt = jnp.where(rec >= 0, cand_sb.count, 0)
    rho_s, h_s, _, wk_s, done_s, d_s = stream_wvt_pallas(
        src, cand_sb.idx, cnt, pos_t[idc], h0_b[idc], cap_b[idc],
        hm_b[idc], 1.0, BOX, gds, dks, kernel="wc6", desnngb=DESNNGB,
        n_sweeps=24, interpret=True, sb_mode=True)
    vm = np.asarray(bi.valid).reshape(nb, blk.BLOCK)[
        np.maximum(np.asarray(rec), 0)].reshape(-1)
    vm &= np.repeat(np.asarray(rec) >= 0, blk.BLOCK)
    both = vm & np.asarray(done_s).reshape(-1) & np.asarray(res.done)[
        (np.maximum(np.asarray(rec), 0)[:, None] * blk.BLOCK
         + np.arange(blk.BLOCK)).reshape(-1)]
    assert both.sum() > 0.9 * vm.sum()
    ref_idx = (np.maximum(np.asarray(rec), 0)[:, None] * blk.BLOCK
               + np.arange(blk.BLOCK)).reshape(-1)
    np.testing.assert_allclose(np.asarray(h_s).reshape(-1)[both],
                               np.asarray(res.hsml)[ref_idx][both],
                               rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(d_s).reshape(-1, 3)[vm],
        np.asarray(d_xla)[ref_idx][vm], rtol=2e-4,
        atol=1e-6 * scale)


def test_stream_wrap_fallback_small_box():
    """Hoisted-wrap guard (ADVICE r1): in a small periodic box where
    receiver extent + pair range exceeds box/2, rows must fall back to
    per-pair min-image wrapping — densities must still match the XLA
    solver, which always wraps per pair."""
    from toycluster_tpu.ops.pallas_pair import stream_wvt_pallas

    box = 100.0
    n = 600
    rng = np.random.default_rng(3)
    pos = jnp.asarray((rng.random((n, 3)) * box).astype(np.float32))
    bi = blk.build_blocks(pos, box)
    nb = bi.n_blocks
    h0 = jnp.full((bi.n_padded,), 12.0, jnp.float32)
    cap = jnp.full((bi.n_padded,), box / 3.0, jnp.float32)
    radius = cap.reshape(nb, blk.BLOCK).max(axis=1)
    cand = blk.find_candidates(bi, radius, box, max_cand=nb)
    assert int(cand.overflow) <= 0

    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0, cap, 1.0, box,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)
    h_box = h0 / box
    d_xla = pair_ops.wvt_displacement(bi, sel, h_box, 1.0, box)

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    src = jnp.concatenate(
        [pos_t, hm_sorted.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    # the guard must actually engage here: extent + range >= box/2
    ext_half = 0.5 * (pos_t.max(axis=2) - pos_t.min(axis=2))
    r_pair = cap_b.max(axis=1)
    assert bool(jnp.any(ext_half.max(axis=1) + r_pair
                        >= 0.49 * box)), "test geometry too tame"

    rho, h, vf, wk, done, delta = stream_wvt_pallas(
        src, cand.idx, cand.count, pos_t, h0_b, cap_b, hm_b, 1.0, box,
        kernel="wc6", desnngb=DESNNGB, n_sweeps=24, interpret=True)

    v = np.asarray(bi.valid)
    done_x = np.asarray(res.done) & v
    done_p = np.asarray(done).reshape(-1) & v
    assert done_p.sum() >= 0.97 * done_x.sum()
    both = done_x & done_p
    assert_h_rho_match(np.asarray(h).reshape(-1)[both],
                       np.asarray(res.hsml)[both],
                       np.asarray(rho).reshape(-1)[both],
                       np.asarray(res.rho)[both],
                       np.asarray(wk).reshape(-1)[both])
    a = np.asarray(d_xla)[v]
    b = np.asarray(delta).reshape(-1, 3)[v]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5 * scale)


def test_stream_count_clamp_overflowed_lists():
    """Counts larger than the list width (the _SB_WIDTH_CAP nearest-
    superblock truncation reports TRUE hit counts) must be clamped
    in-kernel instead of indexing past the prefetched row."""
    from toycluster_tpu.ops.pallas_pair import stream_wvt_pallas

    box = 1000.0
    n = 700
    rng = np.random.default_rng(5)
    pos = jnp.asarray(
        (box / 2 + rng.normal(size=(n, 3)) * 40.0).astype(np.float32)
        % box)
    bi = blk.build_blocks(pos, box)
    nb = bi.n_blocks
    h0 = jnp.full((bi.n_padded,), 30.0, jnp.float32)
    cap = h0 * 3.0
    radius = cap.reshape(nb, blk.BLOCK).max(axis=1)
    ns = bi.sb_lo.shape[0]
    rec = jnp.arange(nb, dtype=jnp.int32)
    # truncated lists: max_cand=1 keeps only the nearest superblock but
    # count reports the full hit count (> width)
    cand_sb = blk.find_candidates_super(bi, rec, radius, radius, box,
                                        max_cand=1)
    assert int(cand_sb.count.max()) > 1 or ns == 1

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    hm = jnp.where(bi.valid, h0 / box, 0.0)
    src = jnp.concatenate([pos_t, hm.reshape(nb, 1, blk.BLOCK)], axis=1)
    rho, h, vf, wk, done, delta = stream_wvt_pallas(
        src, cand_sb.idx, cand_sb.count, pos_t,
        h0.reshape(nb, blk.BLOCK), cap.reshape(nb, blk.BLOCK),
        (h0 / box).reshape(nb, blk.BLOCK), 1.0, box,
        kernel="wc6", desnngb=DESNNGB, n_sweeps=8, interpret=True,
        sb_mode=True)
    assert np.isfinite(np.asarray(rho)).all()
    assert np.isfinite(np.asarray(delta)).all()
    # truncated rows see fewer sources -> finite, possibly unconverged,
    # but never garbage (all sums from real blocks)
    assert (np.asarray(rho).reshape(-1)[np.asarray(bi.valid)] >= 0).all()


def test_skip_bits_prune_exact_zeros(setup):
    """The stream_skip_bits gates (per-block density skip / disp keep)
    prune exact-zero contributions ONLY: results must be bit-identical
    to the ungated inline path."""
    from toycluster_tpu.ops.pallas_pair import (stream_skip_bits,
                                                stream_wvt_pallas)

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src = jnp.concatenate(
        [pos_t, hm_sorted.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    radius = cap_b.max(axis=1)
    rec = jnp.arange(nb, dtype=jnp.int32)
    cand_sb = blk.find_candidates_super(
        bi, rec, radius, hm_b.max(axis=1) * BOX, BOX,
        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0

    kw = dict(kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
              interpret=True, sb_mode=True)
    base = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                             h0_b, cap_b, hm_b, 1.0, BOX, **kw)

    bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)
    bits, safe = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True)
    import numpy as _np
    frac = _np.mean([(int(w) >> (2 * k)) & 1
                     for w in _np.asarray(bits).reshape(-1)
                     for k in range(16)])
    gated = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                              h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                              bits=bits, safe=safe)
    for a, b in zip(base, gated):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert frac > 0.0  # the gates must actually prune something

    # count-bucketed skip-bits path: same results again
    counts = np.asarray(cand_sb.count)
    w_split = max(2, int(np.median(counts)))
    lo_ids = np.where(counts <= w_split)[0].astype(np.int32)
    hi_ids = np.where(counts > w_split)[0].astype(np.int32)
    b_ids = tuple(jnp.asarray(np.concatenate([ids, [-1]]).astype(
        np.int32)) for ids in (lo_ids, hi_ids) if len(ids))
    b_w = tuple(w for ids, w in ((lo_ids, w_split),
                                 (hi_ids, cand_sb.idx.shape[1]))
                if len(ids))
    bits_b, safe_b = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True, bucket_ids=b_ids, bucket_widths=b_w)
    bucketed = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                                 h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                                 bits=bits_b, safe=safe_b)
    for a, b in zip(base, bucketed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_lists_are_exact(setup):
    """Per-iteration superblock-list compaction (compact_sb_lists)
    reorders each row's streamed list to useful-first and shrinks the
    trip count; the prefetched slot map keeps the full-width skip bits
    addressable, so results must be BIT-IDENTICAL to the uncompacted
    stream — and the compaction must actually drop visits."""
    from toycluster_tpu.ops.pallas_pair import (compact_sb_lists,
                                                stream_skip_bits,
                                                stream_wvt_pallas)

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src = jnp.concatenate(
        [pos_t, hm_sorted.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    radius = cap_b.max(axis=1)
    rec = jnp.arange(nb, dtype=jnp.int32)
    cand_sb = blk.find_candidates_super(
        bi, rec, radius, hm_b.max(axis=1) * BOX, BOX,
        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0
    bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)
    bits, safe = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True)
    # the tiny fixture has only 2 superblocks, both always in range, so
    # the real bits reject no WHOLE superblock — force list slot 0 dead
    # (dens-skip=1, disp-keep=0 for all 8 members: bits 0..15 of word 0
    # = 0x5555) for every second row.  Both runs share these bits, so
    # the equivalence below certifies the forced-drop path, and killing
    # the FIRST slot makes the surviving slot shift — the kernel must
    # index the full-width bits through the pos_ref slot map.
    force = (jnp.arange(bits.shape[0]) % 2 == 0) & (cand_sb.count >= 2)
    w0 = jnp.where(force,
                   (bits[:, 0] & ~jnp.int32(0xFFFF)) | 0x5555,
                   bits[:, 0])
    bits = bits.at[:, 0].set(w0)

    kw = dict(kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
              interpret=True, sb_mode=True, bits=bits, safe=safe)
    base = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                             h0_b, cap_b, hm_b, 1.0, BOX, **kw)

    cand_it, pos_it, cnt_it = compact_sb_lists(
        cand_sb.idx, cand_sb.count, bits, do_disp=True)
    dropped = int(jnp.sum(jnp.minimum(
        cand_sb.count, cand_sb.idx.shape[1])) - jnp.sum(cnt_it))
    assert dropped == int(force.sum())
    compacted = stream_wvt_pallas(src, cand_it, cnt_it, pos_t,
                                  h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                                  cand_pos=pos_it)
    for a, b in zip(base, compacted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_inkernel_bits_matches_precomputed(setup):
    """TOYCLUSTER_IK_BITS path: stage-A superblock-HULL bits compact
    the lists (conservative superset of the member-level test) and the
    stream kernel computes the member-level skip test itself during
    sweep 0, caching the packed words in SMEM scratch for the later
    density sweeps.  Both gate only exact-zero tiles, so results must
    be BIT-IDENTICAL to the precomputed member-level bits path."""
    from toycluster_tpu.ops.pallas_pair import (compact_sb_lists_agg,
                                                stream_skip_bits,
                                                stream_wvt_pallas)

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src = jnp.concatenate(
        [pos_t, hm_sorted.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    radius = cap_b.max(axis=1)
    rec = jnp.arange(nb, dtype=jnp.int32)
    cand_sb = blk.find_candidates_super(
        bi, rec, radius, hm_b.max(axis=1) * BOX, BOX,
        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0
    bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)

    kw = dict(kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
              interpret=True, sb_mode=True)
    bits, safe = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True)
    base = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                             h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                             bits=bits, safe=safe)

    bits_sb, safe_a = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), agg=True)
    np.testing.assert_array_equal(np.asarray(safe), np.asarray(safe_a))
    cand_it, cnt_it = compact_sb_lists_agg(
        cand_sb.idx, cand_sb.count, bits_sb, do_disp=True)
    cen_blk = 0.5 * (bi.bb_lo + bi.bb_hi)
    ext_blk = 0.5 * (bi.bb_hi - bi.bb_lo)
    rowq = jnp.concatenate(
        [cen_blk, ext_blk, cap_b.max(axis=1)[:, None],
         hm_b.max(axis=1)[:, None]], axis=1).astype(jnp.float32)
    mtab = jnp.concatenate(
        [cen_blk, ext_blk, bhm[:, None],
         jnp.zeros((nb, 1), jnp.float32)], axis=1).astype(jnp.float32)
    ik = stream_wvt_pallas(src, cand_it, cnt_it, pos_t, h0_b, cap_b,
                           hm_b, 1.0, BOX, **kw, safe=safe_a,
                           rowq=rowq, mtab=mtab, inkernel_bits=True)
    for a, b in zip(base, ik):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # density-only variant (find_sph_quantities path)
    kwd = dict(kw, do_disp=False)
    base_d = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                               h0_b, cap_b, hm_b, 1.0, BOX, **kwd,
                               bits=bits, safe=safe)
    cand_d, cnt_d = compact_sb_lists_agg(
        cand_sb.idx, cand_sb.count, bits_sb, do_disp=False)
    ik_d = stream_wvt_pallas(src, cand_d, cnt_d, pos_t, h0_b, cap_b,
                             hm_b, 1.0, BOX, **kwd, safe=safe_a,
                             rowq=rowq, mtab=mtab, inkernel_bits=True)
    for a, b in zip(base_d[:5], ik_d[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_bits_prune_exact_zeros(setup):
    """Chunk-refined skip bits (16-particle chunk-hull cross tests,
    per-receiver-chunk caps) are strictly tighter than the member-bbox
    test — dens-keep/disp-keep subsets — and still prune exact-zero
    tiles ONLY: kernel outputs bit-identical to the member-bbox gating
    (pruned tiles contribute +0.0 and the stable stream order of the
    surviving tiles is unchanged)."""
    from toycluster_tpu.ops.pallas_pair import (build_chunk_tab,
                                                stream_skip_bits,
                                                stream_wvt_pallas)

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    h_box = h0s / BOX
    hm_sorted = jnp.where(bi.valid, h_box, 0.0)
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src = jnp.concatenate(
        [pos_t, hm_sorted.reshape(nb, 1, blk.BLOCK)], axis=1)
    h0_b = h0s.reshape(nb, blk.BLOCK)
    cap_b = cap.reshape(nb, blk.BLOCK)
    hm_b = h_box.reshape(nb, blk.BLOCK)

    radius = cap_b.max(axis=1)
    rec = jnp.arange(nb, dtype=jnp.int32)
    cand_sb = blk.find_candidates_super(
        bi, rec, radius, hm_b.max(axis=1) * BOX, BOX,
        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0
    bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)

    bits_m, safe_m = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True)
    ctab = build_chunk_tab(pos_t, hm_sorted.reshape(nb, blk.BLOCK))
    bits_c, safe_c = stream_skip_bits(
        bi.bb_lo, bi.bb_hi, bhm, rec, cand_sb.idx, cap_b, hm_b,
        float(BOX), sb=True, chunk_tab=ctab)
    np.testing.assert_array_equal(np.asarray(safe_m), np.asarray(safe_c))

    wm = np.asarray(bits_m).astype(np.uint32)
    wc = np.asarray(bits_c).astype(np.uint32)
    dens_keep_m = ~wm & 0x55555555
    dens_keep_c = ~wc & 0x55555555
    disp_keep_m = wm & np.uint32(0xAAAAAAAA)
    disp_keep_c = wc & np.uint32(0xAAAAAAAA)
    # subset: every chunk-kept member is member-bbox-kept
    assert (dens_keep_c & ~dens_keep_m).sum() == 0
    assert (disp_keep_c & ~disp_keep_m).sum() == 0
    # never keeps more (strict pruning shows up at production N — the
    # r05 TPU audit measured union kept 92 -> needed 51 per row at 1e6;
    # this dense little fixture may have no prunable member at all)
    n_m = sum(bin(int(x)).count("1") for x in dens_keep_m.reshape(-1))
    n_c = sum(bin(int(x)).count("1") for x in dens_keep_c.reshape(-1))
    assert n_c <= n_m

    kw = dict(kernel="wc6", desnngb=DESNNGB, n_sweeps=24,
              interpret=True, sb_mode=True)
    out_m = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                              h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                              bits=bits_m, safe=safe_m)
    out_c = stream_wvt_pallas(src, cand_sb.idx, cand_sb.count, pos_t,
                              h0_b, cap_b, hm_b, 1.0, BOX, **kw,
                              bits=bits_c, safe=safe_c)
    for a, b in zip(out_m, out_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_curl_matches_xla(setup):
    """stream_curl_pallas must reproduce pair_ops.sph_curl (Price 2010
    eq. 79, sph.c:216-300) in block-list and superblock mode."""
    from toycluster_tpu.ops.pallas_pair import stream_curl_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="wc6", desnngb=DESNNGB,
                                 max_iter=24)
    # smooth synthetic vector potential over the sorted positions
    p = bi.pos / BOX
    apot_s = jnp.stack([jnp.sin(3.1 * p[:, 0]) + p[:, 1] ** 2,
                        jnp.cos(2.3 * p[:, 1]) * p[:, 2],
                        p[:, 0] * p[:, 1] + 0.5 * p[:, 2]],
                       axis=1).astype(jnp.float32)
    rho_s = jnp.where(bi.valid, res.rho, 1.0)
    vf_s = jnp.where(bi.valid, res.var_hsml_fac, 0.0)
    b_xla = pair_ops.sph_curl(bi, sel, res.hsml, rho_s, vf_s, apot_s,
                              1.0, BOX, kernel="wc6")

    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_b = bi.valid.astype(jnp.float32).reshape(nb, 1, blk.BLOCK)
    ap_t = apot_s.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src8 = jnp.concatenate(
        [pos_t, valid_b, ap_t,
         jnp.zeros((nb, 1, blk.BLOCK), jnp.float32)], axis=1)
    h_b = res.hsml.reshape(nb, blk.BLOCK)
    wfac_b = jnp.where(bi.valid, -1.0 * vf_s / rho_s,
                       0.0).reshape(nb, blk.BLOCK)

    b_str = stream_curl_pallas(src8, cand.idx, cand.count, pos_t, h_b,
                               wfac_b, ap_t, 1.0, BOX, kernel="wc6",
                               interpret=True)
    a = np.asarray(b_xla).reshape(-1, 3)[np.asarray(bi.valid)]
    b = np.asarray(b_str).reshape(-1, 3)[np.asarray(bi.valid)]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=5e-4, atol=2e-5 * scale)

    # superblock mode over every receiver row
    radius = cap.reshape(nb, blk.BLOCK).max(axis=1)
    ids = jnp.arange(nb, dtype=jnp.int32)
    cand_sb = blk.find_candidates_super(
        bi, ids, radius, radius, BOX,
        max_cand=max(4, bi.sb_lo.shape[0]))
    assert int(cand_sb.overflow) <= 0
    b_sb = stream_curl_pallas(src8, cand_sb.idx, cand_sb.count, pos_t,
                              h_b, wfac_b, ap_t, 1.0, BOX, kernel="wc6",
                              sb_mode=True, interpret=True)
    b2 = np.asarray(b_sb).reshape(-1, 3)[np.asarray(bi.valid)]
    np.testing.assert_allclose(b2, a, rtol=5e-4, atol=2e-5 * scale)


def test_stream_curl_m4(setup):
    from toycluster_tpu.ops.pallas_pair import stream_curl_pallas

    bi, cand, h0s, cap = setup
    nb = bi.n_blocks
    sel = pair_ops.full_selection(bi, cand.idx)
    res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX,
                                 kernel="m4", desnngb=50, max_iter=24)
    p = bi.pos / BOX
    apot_s = jnp.stack([p[:, 1], p[:, 2] ** 2, jnp.sin(2.0 * p[:, 0])],
                       axis=1).astype(jnp.float32)
    rho_s = jnp.where(bi.valid, res.rho, 1.0)
    vf_s = jnp.where(bi.valid, res.var_hsml_fac, 0.0)
    b_xla = pair_ops.sph_curl(bi, sel, res.hsml, rho_s, vf_s, apot_s,
                              1.0, BOX, kernel="m4")
    pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    valid_b = bi.valid.astype(jnp.float32).reshape(nb, 1, blk.BLOCK)
    ap_t = apot_s.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
    src8 = jnp.concatenate(
        [pos_t, valid_b, ap_t,
         jnp.zeros((nb, 1, blk.BLOCK), jnp.float32)], axis=1)
    b_str = stream_curl_pallas(
        src8, cand.idx, cand.count, pos_t,
        res.hsml.reshape(nb, blk.BLOCK),
        jnp.where(bi.valid, -vf_s / rho_s, 0.0).reshape(nb, blk.BLOCK),
        ap_t, 1.0, BOX, kernel="m4", interpret=True)
    a = np.asarray(b_xla).reshape(-1, 3)[np.asarray(bi.valid)]
    b = np.asarray(b_str).reshape(-1, 3)[np.asarray(bi.valid)]
    scale = np.abs(a).max()
    np.testing.assert_allclose(b, a, rtol=5e-4, atol=2e-5 * scale)
