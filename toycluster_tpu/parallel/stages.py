"""Sharded pipeline stages beyond the WVT loop: standalone SPH density,
SPH curl (B from the vector potential), and DM velocity sampling under
`shard_map` over a 1-D device mesh.

These reuse the wvt_shard machinery (Hilbert sort + equal-count blocks +
bbox candidate sweep + gather halo) for the two pair operators, and
counter-based per-particle RNG for the sampler — so the result of every
stage is INDEPENDENT of the mesh size (the 1-vs-8-device equivalence
tests in tests/test_multichip.py assert exactness).  Collectives:
`all_gather` for source fields (the analogue of the reference's shared
`P[]`/`SphP[]`, sph.c:13-300), `pmax` for the B-field normalisation
maximum (magnetic_field.c:77-87 — the reference's unsynchronised fmax
race, done right).

Reference scope: sph.c:13-75 (standalone density), sph.c:216-300 (curl),
velocities.c:38-159 (DM velocities).
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
from ..ops import pair_ops
from ..ops.blocks import BLOCK, BlockIndex
from ..ops.keys import hilbert_order
from ..models.sph import global_density_model, hard_h_cap
from .wvt_shard import _local_candidates, pad_for_mesh, shard_array

_CAP_FACTOR = 1.35


def _sort_shard(mesh, pos, boxsize, extras=()):
    """Hilbert-sort, pad-aware shard placement; returns sorted+sharded
    (pos, order, *extras-sorted)."""
    order = hilbert_order(pos, boxsize)
    out = [shard_array(mesh, pos[order]), order]
    for x in extras:
        out.append(shard_array(mesh, x[order]))
    return out


def _unsort(x, order):
    n = order.shape[0]
    inv = jnp.zeros((n,), order.dtype).at[order].set(
        jnp.arange(n, dtype=order.dtype))
    return x[inv]


def sharded_density(mesh: Mesh, ha, pos_gas, hsml_prev=None, *, boxsize,
                    mpart, desnngb, kernel="wc6", max_cand=256,
                    cool_core=None):
    """Standalone SPH density + adaptive hsml over the mesh
    (sph.c:13-75 sharded).  Returns (rho, hsml, var_hsml_fac, wk_ngb)
    in the ORIGINAL particle order, sliced to len(pos_gas)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    pos, n_real = pad_for_mesh(pos_gas, n_dev)
    n = pos.shape[0]
    if hsml_prev is None:
        hsml_prev = jnp.zeros((len(pos_gas),), jnp.float32)
    hprev = jnp.concatenate(
        [hsml_prev, jnp.zeros((n - len(pos_gas),), jnp.float32)]) \
        if n > len(pos_gas) else hsml_prev

    def body(pos_l, hprev_l, valid_l):
        nbl = pos_l.shape[0] // BLOCK
        ax = jax.lax.axis_index(axis)
        rho_model_l = global_density_model(pos_l, ha, boxsize, cool_core)
        h0_model_l = (desnngb * mpart / rho_model_l
                      / const.FOURPITHIRD) ** (1.0 / 3.0)
        h0_l = jnp.where(hprev_l > 0, hprev_l, h0_model_l)
        cap_l = jnp.minimum(jnp.maximum(h0_l, h0_model_l) * _CAP_FACTOR,
                            hard_h_cap(boxsize, n_real))
        blocks_l = pos_l.reshape(nbl, BLOCK, 3)
        lo_l = blocks_l.min(axis=1)
        hi_l = blocks_l.max(axis=1)
        rad_l = cap_l.reshape(nbl, BLOCK).max(axis=1)
        lo_all = jax.lax.all_gather(lo_l, axis, tiled=True)
        hi_all = jax.lax.all_gather(hi_l, axis, tiled=True)
        rad_all = jax.lax.all_gather(rad_l, axis, tiled=True)
        cand, overflow = _local_candidates(
            lo_l, hi_l, rad_l, lo_all, hi_all, rad_all, boxsize, max_cand)
        pos_all = jax.lax.all_gather(pos_l, axis, tiled=True)
        valid_all = jax.lax.all_gather(valid_l, axis, tiled=True)
        dummy3 = jnp.zeros((1, 3), pos_l.dtype)
        bi = BlockIndex(order=jnp.arange(pos_all.shape[0],
                                         dtype=jnp.int32),
                        pos=pos_all, valid=valid_all, bb_lo=lo_all,
                        bb_hi=hi_all, sb_lo=dummy3, sb_hi=dummy3)
        rec_ids = (ax.astype(jnp.int32) * nbl
                   + jnp.arange(nbl, dtype=jnp.int32))
        sel = pair_ops.BlockSelection(ids=rec_ids, cand=cand)
        res = pair_ops.solve_density(
            bi, sel, h0_l.reshape(nbl, BLOCK), cap_l.reshape(nbl, BLOCK),
            mpart, boxsize, kernel=kernel, desnngb=desnngb)
        return (res.rho, res.hsml, res.var_hsml_fac, res.wk_ngb,
                jax.lax.pmax(overflow, axis))

    sharded = shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        check_vma=False)

    pos_s, order, h_s = _sort_shard(mesh, pos, boxsize, (hprev,))
    valid_s = order < n_real
    rho, hsml, vf, wk, overflow = jax.jit(sharded)(pos_s, h_s, valid_s)
    assert int(overflow) <= 0, "sharded density candidate overflow"
    return (_unsort(rho, order)[:len(pos_gas)],
            _unsort(hsml, order)[:len(pos_gas)],
            _unsort(vf, order)[:len(pos_gas)],
            _unsort(wk, order)[:len(pos_gas)])


def sharded_curl(mesh: Mesh, pos_gas, hsml, rho, var_fac, apot, *,
                 boxsize, mpart, kernel="wc6", max_cand=256):
    """SPH curl of the vector potential over the mesh (sph.c:216-300
    sharded).  Returns (bfld (N,3) original order, bmax scalar) — bmax
    is the pmax'd global max |B| the normalisation needs
    (magnetic_field.c:77-87, without the reference's fmax race)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    pos, n_real = pad_for_mesh(pos_gas, n_dev)
    n = pos.shape[0]
    npad = n - len(pos_gas)

    def pad1(x, fill=0.0):
        if not npad:
            return x
        filler = jnp.full((npad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, filler])

    h_p = pad1(hsml)
    rho_p = pad1(rho, 1.0)   # padded lanes never read (masked), avoid /0
    vf_p = pad1(var_fac)
    apot_p = pad1(apot)

    def body(pos_l, h_l, rho_l, vf_l, apot_l, valid_l):
        nbl = pos_l.shape[0] // BLOCK
        ax = jax.lax.axis_index(axis)
        blocks_l = pos_l.reshape(nbl, BLOCK, 3)
        lo_l = blocks_l.min(axis=1)
        hi_l = blocks_l.max(axis=1)
        rad_l = h_l.reshape(nbl, BLOCK).max(axis=1)
        lo_all = jax.lax.all_gather(lo_l, axis, tiled=True)
        hi_all = jax.lax.all_gather(hi_l, axis, tiled=True)
        rad_all = jax.lax.all_gather(rad_l, axis, tiled=True)
        # gather range is the receiver's own h (one-sided, tree.c:25)
        cand, overflow = _local_candidates(
            lo_l, hi_l, rad_l, lo_all, hi_all,
            jnp.zeros_like(rad_all), boxsize, max_cand)
        pos_all = jax.lax.all_gather(pos_l, axis, tiled=True)
        valid_all = jax.lax.all_gather(valid_l, axis, tiled=True)
        apot_all = jax.lax.all_gather(apot_l, axis, tiled=True)
        # sph_curl indexes receiver rows by GLOBAL block id, so the
        # receiver-side fields ride the gather too (they are (N,) — a
        # fraction of the apot/pos volume)
        h_all = jax.lax.all_gather(h_l, axis, tiled=True)
        rho_all = jax.lax.all_gather(rho_l, axis, tiled=True)
        vf_all = jax.lax.all_gather(vf_l, axis, tiled=True)
        dummy3 = jnp.zeros((1, 3), pos_l.dtype)
        bi = BlockIndex(order=jnp.arange(pos_all.shape[0],
                                         dtype=jnp.int32),
                        pos=pos_all, valid=valid_all, bb_lo=lo_all,
                        bb_hi=hi_all, sb_lo=dummy3, sb_hi=dummy3)
        rec_ids = (ax.astype(jnp.int32) * nbl
                   + jnp.arange(nbl, dtype=jnp.int32))
        sel = pair_ops.BlockSelection(ids=rec_ids, cand=cand)
        b = pair_ops.sph_curl(bi, sel, h_all, rho_all, vf_all, apot_all,
                              mpart, boxsize, kernel=kernel)
        b = b.reshape(-1, 3)
        b2 = jnp.where(valid_l, (b * b).sum(axis=-1), 0.0)
        bmax2 = jax.lax.pmax(b2.max(), axis)
        return b, bmax2, jax.lax.pmax(overflow, axis)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=(P(axis), P(), P()), check_vma=False)

    pos_s, order, h_s, rho_s, vf_s, apot_s = _sort_shard(
        mesh, pos, boxsize, (h_p, rho_p, vf_p, apot_p))
    valid_s = order < n_real
    b, bmax2, overflow = jax.jit(sharded)(pos_s, h_s, rho_s, vf_s,
                                          apot_s, valid_s)
    assert int(overflow) <= 0, "sharded curl candidate overflow"
    return _unsort(b, order)[:len(pos_gas)], jnp.sqrt(bmax2)


def sharded_dm_speeds(mesh: Mesh, vt, r_dm, *, key):
    """DM speed sampling over the mesh for ONE halo's velocity tables
    (velocities.c:62-104 target distribution via the inverse-CDF
    sampler).  Per-particle counter-based keys (split by GLOBAL particle
    index) make the draw independent of the mesh size — bit-identical
    on 1 or 8 devices."""
    from ..models.velocities import (_VTAB_V, _invert_cdf_rows,
                                     _speed_cdf_table, potential_device)
    from ..models.eddington import RMIN
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    n0 = r_dm.shape[0]
    q = 8 * n_dev
    n = -(-n0 // q) * q
    r_pad = jnp.concatenate(
        [r_dm, jnp.full((n - n0,), jnp.float32(RMIN))]) if n > n0 else r_dm

    r_lo = jnp.float32(RMIN)
    r_hi = jnp.maximum(jnp.max(r_pad), r_lo * 2.0)
    rtab, cdf, vmax_tab, ok_row = _speed_cdf_table(vt, r_lo, r_hi)
    n_rows = rtab.shape[0]

    def body(r_l, gid_l):
        nl = r_l.shape[0]
        r = jnp.maximum(r_lo, r_l)
        x = (jnp.log(r / r_lo) / jnp.log(r_hi / r_lo)) * (n_rows - 1)
        x = jnp.clip(x, 0.0, n_rows - 1 - 1e-4)
        row = x.astype(jnp.int32)
        frac = x - row
        # per-particle counter-based uniform: fold the GLOBAL index in
        uu = jax.vmap(
            lambda g: jax.random.uniform(jax.random.fold_in(key, g)))(
                gid_l)
        u0 = _invert_cdf_rows(cdf, row, uu)
        u1 = _invert_cdf_rows(cdf, jnp.minimum(row + 1, n_rows - 1), uu)
        u_v = (1.0 - frac) * u0 + frac * u1
        vmax = jnp.sqrt(2.0 * potential_device(vt, r))
        good = ok_row[row] | ok_row[jnp.minimum(row + 1, n_rows - 1)]
        return jnp.where(good, u_v * vmax, 0.0)

    sharded = shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                        out_specs=P(axis), check_vma=False)
    gids = jnp.arange(n, dtype=jnp.int32)
    v = jax.jit(sharded)(shard_array(mesh, r_pad),
                         shard_array(mesh, gids))
    return v[:n0]


def sharded_dm_velocities(mesh: Mesh, vt, r_dm, *, key, bulk_vel):
    """Full DM velocity vectors for ONE halo over the mesh
    (velocities.c:62-117): sharded speed sampling (sharded_dm_speeds),
    isotropic directions from per-particle counter-based keys, plus the
    halo's bulk velocity.  Counter-based draws split by GLOBAL particle
    index keep the result bit-identical on any mesh size."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    v = sharded_dm_speeds(mesh, vt, r_dm, key=key)   # (n0,) speeds

    n0 = r_dm.shape[0]
    q = 8 * n_dev
    n = -(-n0 // q) * q
    v_pad = (jnp.concatenate([v, jnp.zeros((n - n0,), v.dtype)])
             if n > n0 else v)
    kdir = jax.random.fold_in(key, 0x5EED)

    def body(v_l, gid_l):
        u = _lane_draws(kdir, gid_l, 0)
        dirs = _dirs_from_uniforms(u[:, 0], u[:, 1])
        return v_l[:, None] * dirs

    sharded = shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                        out_specs=P(axis), check_vma=False)
    gids = jnp.arange(n, dtype=jnp.int32)
    vel = jax.jit(sharded)(shard_array(mesh, v_pad),
                           shard_array(mesh, gids))
    return vel[:n0] + jnp.asarray(bulk_vel, jnp.float32)


def sharded_gas_bulk(mesh: Mesh, pos_gas, gas_halo, bulk_stack, d_com,
                     sub_hh, *, sub_first, n_halos, boxhalf):
    """Gas bulk-velocity term over the mesh (velocities.c:119-151):
    each gas particle gets its halo's bulk velocity, tapered for
    subhalos by the WC2 kernel weight of its distance from the subhalo
    centre.  Pure elementwise map with the small per-halo tables
    replicated — bit-identical on any mesh size."""
    from ..models.velocities import _gas_bulk_jit
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    n0 = pos_gas.shape[0]
    q = 8 * n_dev
    n = -(-n0 // q) * q
    if n > n0:
        pos_gas = jnp.concatenate(
            [pos_gas, jnp.zeros((n - n0, 3), pos_gas.dtype)])
        gas_halo = jnp.concatenate(
            [gas_halo, jnp.zeros((n - n0,), gas_halo.dtype)])

    def body(pos_l, halo_l):
        return _gas_bulk_jit(pos_l, halo_l, bulk_stack, d_com, sub_hh,
                             sub_first, n_halos, boxhalf)

    sharded = shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                        out_specs=P(axis), check_vma=False)
    dv = jax.jit(sharded)(shard_array(mesh, pos_gas),
                          shard_array(mesh, gas_halo))
    return dv[:n0]


def sharded_temperature(mesh: Mesh, tables, d_com, pos_gas, gas_halo, *,
                        boxhalf):
    """Hydrostatic internal energy over the mesh (temperature.c:8-44):
    pure elementwise gather-eval against the stacked per-halo u(r)
    tables (models/temperature.py), sharded over particles with the
    tables replicated — no collectives needed, bit-identical on any
    mesh size."""
    from ..models.temperature import _temperature_eval
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    n0 = pos_gas.shape[0]
    q = 8 * n_dev
    n = -(-n0 // q) * q
    if n > n0:
        pos_gas = jnp.concatenate(
            [pos_gas, jnp.zeros((n - n0, 3), pos_gas.dtype)])
        gas_halo = jnp.concatenate(
            [gas_halo, jnp.full((n - n0,), -1, gas_halo.dtype)])

    def body(pos_l, halo_l):
        return _temperature_eval(tables, d_com, boxhalf, pos_l, halo_l)

    sharded = shard_map(body, mesh=mesh, in_specs=(P(axis), P(axis)),
                        out_specs=P(axis), check_vma=False)
    u = jax.jit(sharded)(shard_array(mesh, pos_gas),
                         shard_array(mesh, gas_halo))
    return u[:n0]


def _lane_draws(key, gid_l, round_idx):
    """Three uniforms per GLOBAL lane id from counter-based keys —
    independent of how lanes are sharded over the mesh."""
    def one(g):
        k = jax.random.fold_in(jax.random.fold_in(key, round_idx), g)
        return jax.random.uniform(k, (3,))
    return jax.vmap(one)(gid_l)


def _dirs_from_uniforms(u1, u2):
    """Isotropic unit vectors from two uniforms (positions.c:58-65)."""
    cos_t = 2.0 * u1 - 1.0
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * const.PI * u2
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                     axis=-1)


_LANE_QUANTUM = 512  # mesh-independent lane-count grid (see below)
_UNSET = object()


def sharded_halo_sample(mesh: Mesh, ha, i, n, kind, *, boxsize, key,
                        sub_first=0, cool_core=_UNSET, p_floor=0.7,
                        max_rounds=64):
    """Position sampling for one halo over the mesh (positions.c:25-133
    sharded): a FIXED oversampled lane grid with counter-based per-lane
    keys, per-lane acceptance, and selection of the first n accepted
    lanes in global lane order.  The draw is a pure function of the
    global lane ids and each round's lane count is quantized on a
    mesh-independent grid (_LANE_QUANTUM; lanes are only PADDED to a
    multiple of 8*n_dev for sharding, with padded lanes rejected), so
    the result is BIT-IDENTICAL on any mesh size; the conditional
    distribution matches the sequential engine (lanes iid, acceptance
    per lane, draw-order selection).

    `cool_core` must be given explicitly for kind='gas' (the scene's
    (rho0_fac, rc_fac) tuple, or None when the config has no
    double-beta cool cores): the gas ownership predicate silently
    differs on cool-core configs if it is dropped.

    The accepted lanes are combined by a psum of per-device scatter
    buffers — O(n) replicated output, fine for the one-shot IC stage
    (the WVT loop, where memory scaling matters, stays O(N/D))."""
    from ..models.positions import (halo_containing_dm,
                                    halo_containing_gas)
    from ..ops.interp import SplineTable, spline_eval
    if kind == "gas" and cool_core is _UNSET:
        raise TypeError(
            "sharded_halo_sample: cool_core is required for kind='gas' "
            "— pass the scene's (rho0_fac, rc_fac) tuple, or None for "
            "configs without double_beta_cool_cores")
    if cool_core is _UNSET:
        cool_core = None
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    i_dev = jnp.int32(i)

    def body(gid_l, round_idx, m_model):
        u = _lane_draws(key, gid_l, round_idx)
        dirs = _dirs_from_uniforms(u[:, 0], u[:, 1])
        if kind == "dm":
            sq = jnp.sqrt(u[:, 2] * ha.mass_corr_fac[i_dev])
            r = ha.a_hernq[i_dev] * sq / (1.0 - sq)
            cand = dirs * r[:, None]
            ok = halo_containing_dm(cand + ha.d_com[i_dev], ha,
                                    sub_first, boxsize) == i_dev
        else:
            table = SplineTable(ha.minv_x[i_dev], ha.minv_y[i_dev],
                                ha.minv_m2[i_dev])
            r = spline_eval(table, u[:, 2] * ha.mass_gas[i_dev])
            cand = dirs * r[:, None]
            owner = halo_containing_gas(cand + ha.d_com[i_dev], ha,
                                        boxsize, cool_core)
            inside = jnp.all(jnp.abs(cand) <= boxsize / 2.0, axis=-1)
            ok = (owner == i_dev) & inside
        # padding lanes (beyond the mesh-independent model count) are
        # rejected so they cannot perturb ranks or counts
        ok = ok & (gid_l < m_model)
        # global rank of each accepted lane = local exclusive prefix +
        # the accepted counts of all lower-indexed devices
        cnt_l = ok.sum()
        counts = jax.lax.all_gather(cnt_l, axis)
        ax = jax.lax.axis_index(axis)
        offset = jnp.sum(jnp.where(jnp.arange(n_dev) < ax, counts, 0))
        rank = offset + jnp.cumsum(ok) - 1
        tgt = jnp.where(ok & (rank < n), rank, n)
        out_l = jnp.zeros((n, 3), jnp.float32).at[tgt].set(
            cand, mode="drop")
        return jax.lax.psum(out_l, axis), counts.sum()

    sharded = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(axis), P(), P()),
        out_specs=(P(), P()), check_vma=False))

    out = jnp.zeros((n, 3), jnp.float32)
    got = 0
    for rnd in range(max_rounds):
        # model lane count on the mesh-independent grid ...
        m = -(-int((n - got) / p_floor * 1.1) // _LANE_QUANTUM) \
            * _LANE_QUANTUM
        # ... padded (never changed) to a shardable multiple of 8*n_dev
        m_pad = -(-m // (8 * n_dev)) * (8 * n_dev)
        gids = jnp.arange(m_pad, dtype=jnp.int32)
        round_out, cnt = sharded(shard_array(mesh, gids),
                                 jnp.int32(rnd), jnp.int32(m))
        # rounds after the first append after the already-filled prefix
        out = out.at[got:].set(round_out[: n - got]) if got else round_out
        got = min(n, got + int(cnt))  # one host sync per round
        if got >= n:
            return out
    raise RuntimeError(f"halo {i} under-filled after {max_rounds} rounds")
