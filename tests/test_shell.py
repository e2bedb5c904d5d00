"""Thin-shell dynamics tests (thin_structure_dynamics analog).

The oracle: a shell cantilever strip with the oscillating-beam case's
material/geometry must reproduce the SOLID beam's tip oscillation
(period 0.280 s, amplitude 0.114) with a single particle row."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphinxsys_tpu.physics import shell as sh


def test_transformation_matrix_2d():
    n = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    Q = np.asarray(sh.transformation_matrix_2d(n))
    np.testing.assert_allclose(Q[0], np.eye(2), atol=1e-7)
    # local y = global x: Q maps (1,0) -> (0,1)
    np.testing.assert_allclose(Q[1] @ np.asarray([1.0, 0.0]), [0.0, 1.0], atol=1e-7)
    # orthonormal
    np.testing.assert_allclose(Q[1] @ Q[1].T, np.eye(2), atol=1e-7)


def test_pseudo_normal_rotation_consistency():
    theta = jnp.asarray([0.3])
    n = np.asarray(sh.rotate_pseudo_normal_2d(theta))[0]
    np.testing.assert_allclose(n, [math.sin(0.3), math.cos(0.3)], atol=1e-7)
    # rate = d/dt rotate(theta(t)) with omega
    omega = jnp.asarray([2.0])
    rate = np.asarray(sh.pseudo_normal_rate_2d(theta, omega))[0]
    np.testing.assert_allclose(rate, [math.cos(0.3) * 2, -math.sin(0.3) * 2],
                               atol=1e-7)


def test_reduced_kernel_uses_lower_dim_factors():
    from sphinxsys_tpu.core.kernels import WendlandC2

    k = WendlandC2(h=0.01)
    rk = sh.ReducedKernel(k)
    r = jnp.asarray(0.005)
    np.testing.assert_allclose(float(rk.W(r, 2)), float(k.W(r, 1)), rtol=1e-7)
    np.testing.assert_allclose(float(rk.dW(r, 2)), float(k.dW(r, 1)), rtol=1e-7)


@pytest.fixture(scope="module")
def shell_run():
    from sphinxsys_tpu.cases import shell_cantilever_2d as sc

    case, s = sc.build_case()
    run = sc.make_run_chunk(case)
    tips, ts = [], []
    for i in range(1, 33):
        s = run(s, jnp.asarray(i * 0.02, s.time.dtype))
        ts.append(float(s.time))
        tips.append(sc.tip_displacement(case, s))
    return case, s, np.asarray(ts), np.asarray(tips)


def test_shell_cantilever_matches_solid_beam_oracle(shell_run):
    case, s, t, d = shell_run
    crossings = t[np.where(np.diff(np.sign(d)))[0]]
    period = 2 * np.mean(np.diff(crossings))
    # solid-beam result for identical parameters: T = 0.280, amp 0.114
    assert abs(period - 0.280) < 0.015
    assert abs(np.abs(d).max() - 0.114) < 0.012


def test_shell_clamp_holds(shell_run):
    case, s, _, _ = shell_run
    mask = np.asarray(case.base_mask)
    disp = np.asarray(s.shell["Position"] - s.shell["InitialPosition"])[mask]
    assert np.abs(disp).max() < 1e-12
    rot = np.asarray(s.shell["Rotation"])[mask]
    assert np.abs(rot).max() < 1e-12


def test_shell_pseudo_normal_stays_unit(shell_run):
    case, s, _, _ = shell_run
    nrm = np.linalg.norm(np.asarray(s.shell["PseudoNormal"]), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
