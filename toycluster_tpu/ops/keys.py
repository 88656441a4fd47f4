"""Space-filling-curve keys (device).

TPU-native replacement for the reference's 128-bit Peano-Hilbert keys +
serial heapsort + cycle-leader permutation (peano.c:46-126, sort.c:185-195):
a 30-bit Morton (Z-order) key in uint32 and `jnp.argsort`.  The key only
drives *locality* of the equal-count particle blocks (ops/blocks.py) — the
neighbour search itself is exact via bounding boxes — so 10 bits/dim is
enough resolution at any N.
"""

from __future__ import annotations

import jax.numpy as jnp

MORTON_BITS = 10  # per dimension


def _expand_bits10(v):
    """Spread the low 10 bits of v over 30 bits (x -> x with 2-bit gaps)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_keys(pos, boxsize):
    """Morton key per particle for positions in [0, boxsize)^3."""
    scale = (1 << MORTON_BITS) / boxsize
    cell = jnp.clip((pos * scale).astype(jnp.uint32), 0,
                    (1 << MORTON_BITS) - 1)
    x = _expand_bits10(cell[:, 0])
    y = _expand_bits10(cell[:, 1])
    z = _expand_bits10(cell[:, 2])
    return (x << 2) | (y << 1) | z


def morton_order(pos, boxsize):
    """Permutation sorting particles along the Z-order curve."""
    return jnp.argsort(morton_keys(pos, boxsize))
