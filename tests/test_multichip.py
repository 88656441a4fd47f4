"""Multi-chip sharding on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    new_pos, rho = out
    assert new_pos.shape == args[0].shape
    assert bool(jax.numpy.isfinite(rho).all())


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs multiple (virtual) devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(8, jax.device_count()))


@pytest.mark.skipif(jax.device_count() < 2,
                    reason="needs multiple (virtual) devices")
def test_sharded_step_matches_single_device():
    """The sharded WVT step must be numerically identical regardless of the
    mesh size (pure data parallelism + collectives)."""
    import __graft_entry__ as ge
    from toycluster_tpu.parallel.mesh import make_mesh, sharded_wvt_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    boxsize = 1000.0
    n = 256
    pos = jax.numpy.asarray(ge._toy_cloud(n, boxsize, seed=5))

    def rho_model_fn(p):
        c = boxsize / 2.0
        r2 = ((p - c) ** 2).sum(-1)
        return 1.0 / (1.0 + r2 / (0.05 * boxsize) ** 2) ** 0.81 + 1e-6

    results = []
    for ndev in (1, min(8, jax.device_count())):
        mesh = make_mesh(ndev)
        make = sharded_wvt_step(mesh, desnngb=32, mpart=1.0,
                                boxsize=boxsize, step=0.0085)
        f = jax.jit(make(rho_model_fn))
        p = jax.device_put(pos, NamedSharding(mesh, P("parts")))
        new_pos, em, ex = f(p)
        results.append((np.asarray(new_pos), float(em), float(ex)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5,
                               atol=1e-3)
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-4)
