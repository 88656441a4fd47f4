"""Multi-chip execution: particle data parallelism over a device mesh.

The reference's only parallelism is OpenMP threads over particles
(SURVEY.md §2); the TPU-native equivalent is a 1-D `jax.sharding.Mesh`
over the (Morton-sorted) particle axis.  Collectives used:

* `all_gather`   — source positions for pair interactions ride ICI
* `psum`         — the WVT metric normalisation sum and error means
                   (wvt_relax.c:106-124 reductions)
* `pmax`         — max density error / max |B| (magnetic_field.c:77-87)

This module provides the dryrun/training-step entry used by
`__graft_entry__.dryrun_multichip` and by multi-chip runs of moderate N
(replicated sources).  Block-sharded halo exchange (ppermute over
neighbouring Morton ranges) is the planned path for N >~ 1e8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .. import constants as const
from ..ops.kernels import wc6_flat


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, ("parts",))


def sharded_wvt_step(mesh: Mesh, *, desnngb: int, mpart: float,
                     boxsize: float, step: float):
    """One data-parallel WVT iteration: receivers sharded over 'parts',
    sources all-gathered; returns (new_pos_shard, err_mean, err_max).

    `rho_model_fn(pos) -> rho` must be a traceable closure built from the
    halo model arrays (models/sph.global_density_model).
    """

    def make(rho_model_fn):
        @partial(shard_map, mesh=mesh, in_specs=(P("parts"),),
                 out_specs=(P("parts"), P(), P()))
        def wvt_step(pos_local):
            n_local = pos_local.shape[0]
            pos_all = jax.lax.all_gather(pos_local, "parts",
                                         tiled=True)      # ICI collective
            rho_local = rho_model_fn(pos_local)
            rho_all = rho_model_fn(pos_all)

            # metric hsml with global renormalisation (wvt_relax.c:108-124)
            h_local = (desnngb * mpart / rho_local
                       / const.FOURPITHIRD) ** (1.0 / 3.0)
            h_all = (desnngb * mpart / rho_all
                     / const.FOURPITHIRD) ** (1.0 / 3.0)
            v_local = (h_local ** 3).sum()
            v_sum = jax.lax.psum(v_local, "parts")
            norm = (desnngb / v_sum / const.FOURPITHIRD) ** (1.0 / 3.0)
            h_local = h_local * norm
            h_all = h_all * norm

            # pair displacement local x global (box units)
            d = (pos_local[:, None, :] - pos_all[None, :, :]) / boxsize
            d = d - jnp.round(d)
            r2 = (d * d).sum(-1)
            r = jnp.sqrt(r2)
            hbar = 0.5 * (h_local[:, None] + h_all[None, :])
            mask = (r2 < hbar * hbar) & (r2 > 0)
            w = jnp.where(mask, wc6_flat(r / hbar), 0.0)
            inv_r = jnp.where(mask, 1.0 / jnp.maximum(r, 1e-30), 0.0)
            coef = step * h_local[:, None] * w * inv_r
            delta = (coef[..., None] * d).sum(axis=1)

            new_pos = pos_local + delta * boxsize
            new_pos = new_pos - jnp.floor(new_pos / boxsize) * boxsize

            # displacement statistics as mesh reductions (the full SPH
            # density error reduction follows the same psum/pmax pattern)
            err = jnp.abs(delta).sum(-1)
            err_mean = jax.lax.pmean(err.mean(), "parts")
            err_max = jax.lax.pmax(err.max(), "parts")
            return new_pos, err_mean, err_max

        return wvt_step

    return make
