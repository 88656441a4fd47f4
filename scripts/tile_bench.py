"""Pure-tile VPU ceiling for the stream kernel's pair math.

Runs the EXACT union-tile arithmetic (r2 + WC6 density accum + WC6
flat-kernel displacement accum) on VMEM-resident synthetic blocks with
no DMA, no skip bits, no grid scheduling — the per-pair issue floor the
real kernel can approach but not beat.  Reports ns/pair and Gpair/s for
the union tile, the density-only tile, and a bare r2+accum tile (to
split distance cost from kernel-evaluation cost).

    python scripts/tile_bench.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B = 128          # matches ops.blocks.BLOCK
G = 512          # resident source blocks per kernel call
REPS = 1024     # passes over the resident blocks per call


def timed(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_kernel(mode):
    def kern(src_ref, xi_ref, o_ref):
        f32 = jnp.float32
        xi = [xi_ref[pl.ds(d, 1), :].T for d in range(3)]   # (B,1)
        hm_i = xi_ref[pl.ds(3, 1), :].T
        acc0 = [jnp.zeros((B, 1), f32) for _ in range(5)]

        def body(t, acc):
            a0, a1, a2, a3, a4 = acc
            g = jax.lax.rem(t, G)
            row = g * 4
            xj = [src_ref[pl.ds(row + d, 1), :] for d in range(3)]
            hj = src_ref[pl.ds(row + 3, 1), :]
            r2 = jnp.zeros((B, B), f32)
            dx = []
            for d in range(3):
                dd = xi[d] - xj[d]
                dx.append(dd)
                r2 += dd * dd
            if mode == "r2":
                return (a0 + r2.sum(axis=1, keepdims=True),
                        a1, a2, a3, a4)
            inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
            r = r2 * inv_r
            h = 0.31
            u = r * (1.0 / h)
            vj = (hj > 0).astype(f32)
            t1 = jnp.maximum(1.0 - u, 0.0) * vj
            t2 = t1 * t1
            t4 = t2 * t2
            t7 = t4 * t2 * t1
            wpoly = 1.0 + u * (8.0 + u * (25.0 + 32.0 * u))
            dpoly = u * u * (1.0 + u * (7.0 + 16.0 * u))
            a0 = a0 + (t4 * t4 * wpoly).sum(axis=1, keepdims=True)
            a1 = a1 + (t7 * dpoly).sum(axis=1, keepdims=True)
            if mode == "union":
                hbar = (hm_i + hj) * 0.5
                mask = (r2 < hbar * hbar) & (r2 > 0.0) & (hj > 0.0)
                ud = jnp.where(mask, r / hbar, 1.0)
                td = jnp.maximum(1.0 - ud, 0.0)
                td2 = td * td
                td4 = td2 * td2
                wflat = td4 * td4 * (
                    1.0 + ud * (8.0 + ud * (25.0 + 32.0 * ud)))
                coef = jnp.where(mask, wflat, 0.0) * inv_r
                a2 = a2 + (coef * dx[0]).sum(axis=1, keepdims=True)
                a3 = a3 + (coef * dx[1]).sum(axis=1, keepdims=True)
                a4 = a4 + (coef * dx[2]).sum(axis=1, keepdims=True)
            return (a0, a1, a2, a3, a4)

        accs = jax.lax.fori_loop(0, G * REPS, body, tuple(acc0))
        o_ref[...] = jnp.concatenate(
            list(accs) + [accs[0], accs[1], accs[2]], axis=1)

    return kern


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((G * 4, B)), jnp.float32)
    xi = jnp.asarray(rng.random((4, B)), jnp.float32)
    pairs = G * REPS * B * B
    print(f"device={jax.devices()[0]}  pairs/call={pairs/1e9:.2f}G")
    for mode in ("r2", "dens", "union"):
        f = jax.jit(pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((B, 8), jnp.float32)))
        dt = timed(lambda: f(src, xi))
        print(f"{mode:6s} tile: {dt*1e3:7.1f} ms  "
              f"{pairs/dt/1e9:6.1f} Gpair/s  "
              f"{dt/pairs*1e12:6.1f} ps/pair")


if __name__ == "__main__":
    main()
