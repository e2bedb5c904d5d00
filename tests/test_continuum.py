"""Granular continuum (Drucker-Prager) tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphinxsys_tpu.physics import continuum as cm


def test_dp_constants():
    m = cm.PlasticContinuum(rho0=2040, c0=30.0, youngs_modulus=5.84e6,
                            poisson_ratio=0.3,
                            friction_angle=21.9 * math.pi / 180)
    t = math.tan(m.friction_angle)
    np.testing.assert_allclose(m.alpha_phi, t / math.sqrt(9 + 12 * t * t))
    assert m.k_c == 0.0  # cohesionless


def test_return_mapping_projects_to_cone():
    m = cm.PlasticContinuum(rho0=1.0, c0=1.0, youngs_modulus=1e4,
                            poisson_ratio=0.3, friction_angle=0.4)
    # a stress state far outside the cone (strong shear, weak compression)
    s = jnp.asarray([[[-1.0, 5.0, 0.0], [5.0, -1.0, 0.0], [0.0, 0.0, -1.0]]])
    out = np.asarray(m.return_mapping(s))[0]
    I1 = np.trace(out)
    dev = out - I1 / 3 * np.eye(3)
    J2 = 0.5 * (dev * dev).sum()
    f = math.sqrt(J2) + m.alpha_phi * I1 - m.k_c
    assert f < 1e-3  # on or inside the yield surface


def test_return_mapping_leaves_elastic_states():
    m = cm.PlasticContinuum(rho0=1.0, c0=1.0, youngs_modulus=1e4,
                            poisson_ratio=0.3, friction_angle=0.4)
    s = jnp.asarray([[[-10.0, 0.1, 0.0], [0.1, -10.0, 0.0], [0.0, 0.0, -10.0]]])
    out = np.asarray(m.return_mapping(s))[0]
    np.testing.assert_allclose(out, np.asarray(s)[0], atol=1e-6)


def test_elastic_constitutive_rate():
    """Below yield, the rate reduces to Jaumann linear elasticity."""
    m = cm.PlasticContinuum(rho0=1.0, c0=1.0, youngs_modulus=1e4,
                            poisson_ratio=0.3, friction_angle=0.4, cohesion=100.0)
    L = jnp.asarray([[[0.1, 0.0, 0.0], [0.0, -0.05, 0.0], [0.0, 0.0, 0.0]]])
    sigma = jnp.zeros((1, 3, 3))
    rate = np.asarray(m.constitutive_relation(L, sigma))[0]
    G, K = m.shear_modulus, m.bulk_modulus
    tr = 0.05
    expected = 2 * G * (np.diag([0.1, -0.05, 0.0]) - tr / 3 * np.eye(3)) + K * tr * np.eye(3)
    np.testing.assert_allclose(rate, expected, rtol=1e-5)


@pytest.mark.parametrize("", [()])
def test_column_collapse_arrests(_=None):
    """The granular column must spread AND come to rest (friction) —
    a fluid would keep sloshing."""
    from sphinxsys_tpu.cases import column_collapse_2d as cc

    case, soil = cc.build_case(dx=cc.LH / 12)  # very coarse for CI
    s = cc.init_sim(case, soil)
    run = cc.make_run_chunk(case)
    s = run(s, jnp.asarray(0.6, s.time.dtype))
    assert not bool(s.overflow)
    pos = np.asarray(s.soil["Position"][: case.n_soil])
    assert np.isfinite(pos).all()
    assert pos[:, 0].max() > 1.5 * cc.LL  # spread
    vmax = float(jnp.max(jnp.linalg.norm(s.soil["Velocity"][: case.n_soil], axis=-1)))
    assert vmax < 0.5  # arresting
    assert pos[:, 1].min() > -5 * case.dx  # contained by the floor
