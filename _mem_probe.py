"""How much ballast fits alongside the large-N WVT prologue at 3.33e7?"""
import sys, time, gc
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from toycluster_tpu import parse_par_file
from toycluster_tpu.scene import build_scene
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.models import wvt as W
from configs.run_configs import PRESETS, PAR

cfg = parse_par_file(PAR, **{**PRESETS[5], "output_file": "/tmp/x",
                             "ntotal": 100_000_000})
scene = build_scene(cfg)
from toycluster_tpu.models.substructure import setup_substructure
scene = setup_substructure(scene, seed=cfg.seed + 7)
ha = halo_arrays_from_scene(scene)
n_gas = scene.npart_gas
print("n_gas", n_gas, "halos", scene.nhalos, flush=True)

key = jax.random.PRNGKey(0)
pos_gas = jax.random.uniform(key, (n_gas, 3), jnp.float32) * scene.boxsize
h_prev = jnp.zeros((n_gas,), jnp.float32)
n_padded = -(-n_gas // 128) * 128
h_cap_pad = jnp.full((n_padded,), 50.0, jnp.float32)
jax.block_until_ready(pos_gas)

itf = W._make_large_iter_fn(n_gas, n_padded, float(scene.mpart_gas),
                            float(scene.boxsize), cfg.desnngb,
                            cfg.sph_kernel, None)
# grab the prologue via closure
pro = itf.__closure__  # not accessible by name; call prologue through a fresh make
from toycluster_tpu.models.wvt import _metric_hsml
import toycluster_tpu.models.sph as sph_mod

# replicate prologue standalone
@jax.jit
def prologue(pos_gas, h_prev, ha, n_gas_d):
    nb = n_padded // 128
    pad = n_padded - n_gas
    rho_model = sph_mod.global_density_model(pos_gas, ha, scene.boxsize, None)
    h_box = _metric_hsml(rho_model, scene.mpart_gas, cfg.desnngb)
    h0 = jnp.where(h_prev > 0, h_prev, h_box)
    pos_pad = jnp.concatenate([pos_gas, jnp.broadcast_to(pos_gas[-1], (pad, 3))]) if pad else pos_gas
    valid = jnp.arange(n_padded) < n_gas_d
    hm_s = jnp.concatenate([h_box, jnp.broadcast_to(h_box[-1:], (pad,))]) if pad else h_box
    hm_src = jnp.where(valid, hm_s, 0.0)
    pos_t = pos_pad.reshape(nb, 128, 3).transpose(0, 2, 1)
    src = jnp.concatenate([pos_t, hm_src.reshape(nb, 1, 128)], axis=1)
    pos_b = pos_pad.reshape(nb, 128, 3)
    return (rho_model, hm_s, pos_t, src, pos_b.min(axis=1), pos_b.max(axis=1))

for nballast_gb in (0, 2, 4, 6, 8):
    ballast = []
    try:
        for _ in range(nballast_gb):
            ballast.append(jnp.zeros((268435456,), jnp.float32))  # 1 GiB
        jax.block_until_ready(ballast)
        out = prologue(pos_gas, h_prev, ha, jnp.int32(n_gas))
        jax.block_until_ready(out)
        print(f"ballast {nballast_gb} GiB: prologue OK", flush=True)
        del out
    except Exception as e:
        print(f"ballast {nballast_gb} GiB: FAIL {type(e).__name__}", flush=True)
    ballast = None
    gc.collect()
