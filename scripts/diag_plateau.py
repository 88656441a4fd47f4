"""Verify the plateau hypothesis for stream-vs-XLA h mismatches:
fix h to the stream kernel's solution and evaluate the XLA pair sum at
that h.  If pair coverage is identical, rho/wk agree to float noise and
the h difference is just two valid roots of the same (plateau) wk(h)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from toycluster_tpu.ops import blocks as blk
from toycluster_tpu.ops import pair_ops
from toycluster_tpu.ops.pallas_pair import stream_wvt_pallas

BOX = 1000.0
N = 1500
DESNNGB = 64

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
nb = bi.n_blocks
sel = pair_ops.full_selection(bi, cand.idx)
res = pair_ops.solve_density(bi, sel, h0s, cap, 1.0, BOX, kernel="wc6",
                             desnngb=DESNNGB, max_iter=24)
h_box = h0s / BOX
hm_sorted = jnp.where(bi.valid, h_box, 0.0)

pos_t = bi.pos.reshape(nb, blk.BLOCK, 3).transpose(0, 2, 1)
hm_blocks = hm_sorted.reshape(nb, 1, blk.BLOCK).astype(jnp.float32)
src = jnp.concatenate([pos_t, hm_blocks], axis=1)
h0_b = h0s.reshape(nb, blk.BLOCK)
cap_b = cap.reshape(nb, blk.BLOCK)
hm_b = h_box.reshape(nb, blk.BLOCK)

ids = jnp.arange(nb)
rowsc = jnp.maximum(cand.idx, 0)
d2 = blk._interval_dist2(bi.bb_lo[ids][:, None], bi.bb_hi[ids][:, None],
                         bi.bb_lo[rowsc], bi.bb_hi[rowsc], BOX)
gd = jnp.where(cand.idx >= 0, jnp.sqrt(d2), jnp.inf)
bhm = hm_sorted.reshape(nb, blk.BLOCK).max(axis=1)
dk = gd <= 0.5 * (hm_b.max(axis=1)[:, None] + bhm[rowsc]) * BOX

rho, h, vf, wk, done, delta = stream_wvt_pallas(
    src, cand.idx, cand.count, pos_t, h0_b, cap_b, hm_b, 1.0, BOX,
    gd, dk, kernel="wc6", desnngb=DESNNGB, n_sweeps=24, interpret=True)

v = np.asarray(bi.valid)
both = (np.asarray(res.done) & v) & (np.asarray(done).reshape(-1) & v)
h_p = np.asarray(h).reshape(-1)
h_x = np.asarray(res.hsml)
rho_p = np.asarray(rho).reshape(-1)
rho_x = np.asarray(res.rho)
ok = (np.isclose(h_p, h_x, rtol=2e-3) & np.isclose(rho_p, rho_x,
                                                   rtol=2e-3))
bad = both & ~ok
print(f"mismatched lanes: {bad.sum()} / {both.sum()}")

# exact direct-summation density at BOTH solved h (all pairs, no lists):
# if each engine's rho matches the direct sum at its own h, both are
# valid roots of the same wk(h) and the mismatch is the plateau
from toycluster_tpu.ops.brute import density_at

idxs = np.where(bad)[0]
pos_q = bi.pos[jnp.asarray(idxs)]
rho_d_hp = np.asarray(density_at(pos_q, jnp.asarray(h_p[idxs]), bi.pos,
                                 1.0, BOX, kernel="wc6",
                                 desnngb=DESNNGB))
rho_d_hx = np.asarray(density_at(pos_q, jnp.asarray(h_x[idxs]), bi.pos,
                                 1.0, BOX, kernel="wc6",
                                 desnngb=DESNNGB))
wk_p = np.asarray(wk).reshape(-1)
k = 4.0 * np.pi / 3.0
print("lane |   h_p      h_x   | rho_p/direct@hp  rho_x/direct@hx | "
      "wk_p   wk_d@hp  wk_d@hx")
for j, i in enumerate(idxs[:40]):
    print(f"{i:5d} | {h_p[i]:8.4f} {h_x[i]:8.4f} | "
          f"{rho_p[i]/rho_d_hp[j]:12.6f} {rho_x[i]/rho_d_hx[j]:12.6f} | "
          f"{wk_p[i]:7.3f} {k*h_p[i]**3*rho_d_hp[j]:8.3f} "
          f"{k*h_x[i]**3*rho_d_hx[j]:8.3f}")
print(f"max |rho_p/direct@hp - 1| = "
      f"{np.abs(rho_p[idxs]/rho_d_hp - 1).max():.2e}")
print(f"max |rho_x/direct@hx - 1| = "
      f"{np.abs(rho_x[idxs]/rho_d_hx - 1).max():.2e}")
