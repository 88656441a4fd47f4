"""The Pallas stream curl path of the B-field stage must match the
slabbed XLA expansion path on the same superblock neighbour structure
(magnetic_field.c:12-26 / sph.c:216-300)."""

import jax
import numpy as np

from toycluster_tpu import parse_par_file
from toycluster_tpu.models import bfield as bf_mod
from toycluster_tpu.models import positions as pos_mod
from toycluster_tpu.models import sph as sph_mod
from toycluster_tpu.particles import halo_arrays_from_scene
from toycluster_tpu.scene import build_scene


def test_curl_stream_matches_slabbed_xla():
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=8192, sph_kernel="m4")
    scene = build_scene(cfg)
    ha = halo_arrays_from_scene(scene)
    parts = pos_mod.make_positions(jax.random.PRNGKey(6), scene, ha)
    parts = pos_mod.shift_origin(parts, ha, scene.boxsize)
    parts, _ = sph_mod.find_sph_quantities(scene, ha, parts,
                                           return_state=True)
    parts = bf_mod.set_vector_potential(scene, ha, parts)
    n_gas = parts.n_gas
    state = sph_mod._build_neighbours_sb(
        parts.pos[:n_gas], parts.hsml[:n_gas], scene.boxsize)
    b_slab = np.asarray(bf_mod._curl_superblock(scene, parts, state))
    b_stream = np.asarray(bf_mod._curl_stream(scene, parts, state))
    scale = np.abs(b_slab).max()
    assert scale > 0
    np.testing.assert_allclose(b_stream, b_slab, rtol=5e-4,
                               atol=2e-5 * scale)
