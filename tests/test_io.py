"""IO tests: DTW regression machinery (against the reference's committed
golden databases), VTP writer, restart round-trip."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from sphinxsys_tpu.io import regression as rg
from sphinxsys_tpu.io.vtk import write_vtp
from sphinxsys_tpu.io import restart as rst

REF_DB = "/root/reference/tests/2d_examples/test_2d_dambreak/regression_test_tool"


def test_dtw_identical_series_is_zero():
    a = np.sin(np.linspace(0, 3, 40))
    assert rg.dtw_distance(a, a) == 0.0


def test_dtw_shifted_series_small():
    t = np.linspace(0, 3, 40)
    a, b = np.sin(t), np.sin(t - 0.08)
    d_shift = rg.dtw_distance(a, b)
    d_noise = rg.dtw_distance(a, a + 0.5)
    assert d_shift < d_noise


def test_dtw_window_matches_reference_convention():
    """Window = max(5, |la-lb|); lengths differing by < 20% allowed."""
    a = np.linspace(0, 1, 23)
    b = np.linspace(0, 1, 26)
    d = rg.dtw_distance(a, b)
    assert d < 0.5


@pytest.mark.skipif(not os.path.isdir(REF_DB), reason="reference DB not mounted")
def test_read_reference_golden_database():
    """The reference's committed dambreak energy DB must parse, and its own
    stored runs must pass its own DTW test (self-consistency)."""
    test = rg.DTWRegressionTest(REF_DB, "WaterBody", "TotalMechanicalEnergy")
    assert len(test.run_files) == 3
    assert test.threshold.shape == (1,)
    assert test.threshold[0] == 0.2
    stored = rg.read_result_xml(test.run_files[0])
    assert stored.shape[0] == 1 and stored.shape[1] == 23
    ok, report = test.test(stored)
    assert ok, report


@pytest.mark.skipif(not os.path.isdir(REF_DB), reason="reference DB not mounted")
def test_reference_db_rejects_garbage():
    test = rg.DTWRegressionTest(REF_DB, "WaterBody", "TotalMechanicalEnergy")
    stored = rg.read_result_xml(test.run_files[0])
    ok, _ = test.test(stored + 0.5)
    assert not ok


def test_result_xml_roundtrip(tmp_path):
    data = np.random.default_rng(0).uniform(size=(2, 17))
    p = str(tmp_path / "X_Run_0_result.xml")
    rg.write_result_xml(p, data)
    back = rg.read_result_xml(p)
    np.testing.assert_allclose(back, data, rtol=0, atol=0)


def test_vtp_writer(tmp_path):
    state = {
        "NReal": jnp.asarray(3, jnp.int32),
        "Position": jnp.asarray([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [9e9, 9e9]]),
        "Pressure": jnp.asarray([1.0, 2.0, 3.0, 0.0]),
        "Velocity": jnp.asarray([[1.0, 0.0]] * 4),
    }
    p = str(tmp_path / "body.vtp")
    write_vtp(p, state, ["Pressure", "Velocity"])
    text = open(p).read()
    assert 'NumberOfPoints="3"' in text
    assert 'Name="Pressure"' in text and 'Name="Velocity"' in text
    assert "9e+09" not in text  # padding rows excluded


def test_restart_roundtrip(tmp_path):
    from sphinxsys_tpu.core.state import make_fluid_state

    rng = np.random.default_rng(1)
    fluid = make_fluid_state(rng.uniform(size=(10, 2)), 0.01, 1.0)
    fluid = dict(fluid)
    fluid["Velocity"] = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    rst.write_restart(str(tmp_path), 5, {"water": fluid}, physical_time=1.25)
    loaded, meta = rst.read_restart(str(tmp_path), 5, {"water": fluid})
    assert meta["physical_time"] == 1.25
    np.testing.assert_array_equal(np.asarray(loaded["water"]["Velocity"]),
                                  np.asarray(fluid["Velocity"]))


def test_reload_roundtrip(tmp_path):
    from sphinxsys_tpu.core.state import make_fluid_state

    fluid = make_fluid_state(np.random.default_rng(2).uniform(size=(7, 2)), 0.01, 1.0)
    rst.write_reload(str(tmp_path), "body", fluid)
    pos, vol = rst.read_reload(str(tmp_path), "body")
    assert pos.shape == (7, 2) and vol.shape == (7,)
