"""Microbench: XLA gather cost vs row width on TPU.

The member-level skip-bits pass (stream_skip_bits) gathers one
8-f32 (32 B) row per MEMBER block; members of a superblock are
contiguous, so the same bytes can move as one 64-f32 (256 B) row per
SUPERBLOCK — 1/8 the gather rows.  This measures whether TPU gather
cost is per-row (wide rows ~free) or per-byte (no win).

    python scripts/gather_width_bench.py
"""

import time

import jax
import jax.numpy as jnp

NB = 32768            # member blocks (1e6-gas scale: ~31k kd blocks)
ROWS = 7813           # receiver rows at 1e6
M = 224               # candidate members per row (p50 streamed, r03)


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    tab8 = jax.random.normal(key, (NB, 8), jnp.float32)
    tab64 = tab8.reshape(NB // 8, 64)
    idx_m = jax.random.randint(key, (ROWS, M), 0, NB, jnp.int32)
    idx_sb = jax.random.randint(key, (ROWS, M // 8), 0, NB // 8,
                                jnp.int32)

    @jax.jit
    def g_member(idx):
        return tab8[idx].sum(axis=-1)          # (ROWS, M)

    @jax.jit
    def g_super(idx):
        return tab64[idx].reshape(ROWS, M, 8).sum(axis=-1)

    t_m = timeit(g_member, idx_m)
    t_s = timeit(g_super, idx_sb)
    ncy_m = t_m * 0.94e9 / (ROWS * M)
    ncy_s = t_s * 0.94e9 / (ROWS * M // 8)
    print(f"member rows  (32B x {ROWS*M}): {t_m*1e3:8.2f} ms "
          f"= {ncy_m:5.1f} cy/row")
    print(f"super  rows (256B x {ROWS*M//8}): {t_s*1e3:8.2f} ms "
          f"= {ncy_s:5.1f} cy/row  speedup {t_m/t_s:.2f}x")


if __name__ == "__main__":
    main()
