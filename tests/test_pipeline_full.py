"""Full gas+DM end-to-end pipeline on a small single cluster: the bf>0
branch of main.c:50-63 (WVT relax -> SPH quantities -> B field ->
reassign -> temperatures -> velocities -> kinematics -> snapshot)."""

import numpy as np
import pytest

from toycluster_tpu import parse_par_file
from toycluster_tpu.io.gadget import read_snapshot
from toycluster_tpu.pipeline import make_ics
from toycluster_tpu.utils.logging import silent_log


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ics") / "ic_full")
    cfg = parse_par_file("/root/reference/cluster.par").replace(
        ntotal=6000, wvt_max_iter=6, output_file=out)
    # check=True audits the neighbour engine against direct summation
    scene, parts = make_ics(cfg, log=silent_log, check=True)
    return scene, parts, read_snapshot(out)


def test_snapshot_blocks(result):
    scene, parts, snap = result
    hdr = snap["header"]
    assert hdr.npart[0] == scene.npart_gas
    assert hdr.npart[1] == scene.npart_dm
    assert snap["pos"].shape == (scene.ntotal, 3)
    assert snap["u"].shape == (scene.npart_gas,)
    assert snap["rho"].shape == (scene.npart_gas,)
    assert snap["hsml"].shape == (scene.npart_gas,)
    assert snap["bfld"].shape == (scene.npart_gas, 3)
    assert snap["rho_model"].shape == (scene.npart_gas,)
    # ids are a permutation of 1..N
    assert set(snap["ids"].tolist()) == set(range(1, scene.ntotal + 1))


def test_gas_quantities_physical(result):
    scene, parts, snap = result
    assert (snap["rho"] > 0).all()
    assert (snap["hsml"] > 0).all()
    assert (snap["u"] > 0).all()
    # internal energy in the cluster core ~ keV-scale: U2T within 1e6..5e9 K
    u_code = snap["u"].astype(float)
    T = np.array([scene.units.u2t(u) for u in
                  np.percentile(u_code, [5, 50, 95])])
    assert (T > 1e5).all() and (T < 5e9).all()


def test_bfield_normalisation(result):
    scene, parts, snap = result
    b = np.linalg.norm(snap["bfld"], axis=1)
    assert b.max() > 0
    # norm: max|B| = Bfld_Norm/sqrt(3), below the 18 uG cap
    # (magnetic_field.c:89)
    expected = scene.config.bfld_norm / np.sqrt(3)
    assert b.max() == pytest.approx(expected, rel=1e-3)
    assert b.max() <= 18e-6 + 1e-12
    # B ~ rho^eta scaling: top-density decile mean B well above the
    # low-density decile mean
    rho = snap["rho"]
    hi = b[rho > np.percentile(rho, 90)].mean()
    lo = b[rho < np.percentile(rho, 10)].mean()
    assert hi > 3 * lo


def test_density_vs_model_written(result):
    scene, parts, snap = result
    # RHOM block lets consumers check convergence offline (io.c:218-224)
    err = np.abs(snap["rho"] - snap["rho_model"]) / snap["rho_model"]
    assert np.median(err) < 0.25
