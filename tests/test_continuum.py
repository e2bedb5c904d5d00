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


def test_viscous_plastic_solid_limits():
    """ViscousPlasticSolid (inelastic_solid.cpp ElasticLeftCauchy): below
    yield nothing relaxes; above yield the Herschel-Bulkley bisection
    interpolates between the rate-independent (eta -> 0: back to the yield
    surface) and frozen (eta -> inf: trial state) limits."""
    import jax.numpy as jnp
    import numpy as np
    from sphinxsys_tpu.core.materials import ViscousPlasticSolid

    def run(eta, gamma, dt=1e-3):
        m = ViscousPlasticSolid(rho0=1.0, youngs_modulus=10.0,
                                poisson_ratio=0.3, yield_stress=0.05,
                                viscous_modulus=eta,
                                herschel_bulkley_power=1.0)
        F = jnp.asarray([[[1.0, gamma], [0.0, 1.0]]])
        inv_ps = jnp.broadcast_to(jnp.eye(2), (1, 2, 2))
        kappa = jnp.zeros((1,))
        nbe, inv_ps2, _ = m.elastic_left_cauchy(F, inv_ps, kappa, dt=dt)
        # deviatoric Kirchhoff norm after return
        G = m.shear_modulus
        dev = G * (nbe - (jnp.trace(nbe[0]) / 2.0) * jnp.eye(2))
        return m, float(jnp.linalg.norm(dev)), inv_ps2

    import math
    sqrt23 = math.sqrt(2.0 / 3.0)

    # below yield: inv_ps stays identity
    m, s, inv_ps2 = run(eta=1.0, gamma=0.001)
    np.testing.assert_allclose(np.asarray(inv_ps2[0]), np.eye(2), atol=1e-5)

    # rate-independent limit: back to the yield surface (the post-return
    # det-renormalization of relaxed_be shifts the recomputed dev norm a
    # few % at this large strain — the reference renormalizes identically)
    m, s, _ = run(eta=1e-8, gamma=0.5)
    assert abs(s - sqrt23 * m.yield_stress) < 0.15 * sqrt23 * m.yield_stress

    # frozen limit: trial state survives (norm far above yield)
    m, s_frozen, _ = run(eta=1e8, gamma=0.5)
    assert s_frozen > 3.0 * sqrt23 * m.yield_stress


def test_locally_orthotropic_muscle_matches_global():
    """With uniform per-particle directions the local muscle stress equals
    the global Muscle stress (LocallyOrthotropicMuscle::StressPK2)."""
    import jax.numpy as jnp
    import numpy as np
    from sphinxsys_tpu.core.materials import LocallyOrthotropicMuscle, Muscle

    kw = dict(rho0=1.0, youngs_modulus=1.0, poisson_ratio=0.3,
              bulk_modulus_param=5.0, f0=(1.0, 0.0), s0=(0.0, 1.0),
              a0=(0.5, 0.2, 0.1, 0.05), b0=(1.0, 2.0, 1.5, 0.5))
    g = Muscle(**kw)
    lo = LocallyOrthotropicMuscle(**kw)
    rng = np.random.default_rng(0)
    F = jnp.asarray(np.eye(2) + 0.1 * rng.standard_normal((8, 2, 2)),
                    jnp.float32)
    f0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0], jnp.float32), (8, 2))
    s0 = jnp.broadcast_to(jnp.asarray([0.0, 1.0], jnp.float32), (8, 2))
    np.testing.assert_allclose(np.asarray(g.stress_PK2(F)),
                               np.asarray(lo.stress_PK2_local(F, f0, s0)),
                               rtol=1e-5, atol=1e-6)


def test_composite_solid_dispatches_by_id():
    """CompositeSolid (complex_solid.h:59-96): per-particle material_id
    selects the composed material's stress; density follows the id."""
    import jax.numpy as jnp
    import numpy as np
    from sphinxsys_tpu.core.materials import (CompositeSolid,
                                              NeoHookeanSolid,
                                              SaintVenantKirchhoffSolid)

    m0 = SaintVenantKirchhoffSolid(rho0=1.0, youngs_modulus=1.0,
                                   poisson_ratio=0.3)
    m1 = NeoHookeanSolid(rho0=2.0, youngs_modulus=5.0, poisson_ratio=0.4)
    comp = CompositeSolid(rho0=1.5, youngs_modulus=1.0, poisson_ratio=0.3,
                          materials=(m0, m1))
    rng = np.random.default_rng(1)
    F = jnp.asarray(np.eye(2) + 0.05 * rng.standard_normal((6, 2, 2)),
                    jnp.float32)
    mid = jnp.asarray([0, 1, 0, 1, 1, 0])
    s = np.asarray(comp.stress_PK2_composite(F, mid))
    s0 = np.asarray(m0.stress_PK2(F))
    s1 = np.asarray(m1.stress_PK2(F))
    for k in range(6):
        want = s0[k] if int(mid[k]) == 0 else s1[k]
        np.testing.assert_allclose(s[k], want, rtol=1e-6)
    rho = np.asarray(comp.composite_density(mid))
    np.testing.assert_allclose(rho, [1.0, 2.0, 1.0, 2.0, 2.0, 1.0])
    assert comp.sound_speed == max(m0.sound_speed, m1.sound_speed)
