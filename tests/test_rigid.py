"""Rigid-body coupling tests (Simbody-bridge counterpart)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphinxsys_tpu.physics import rigid as rg


def test_rigid_ballistics_with_spin():
    """Free rigid body under gravity with a constant torque: analytic
    parabola + angular acceleration."""
    rb = rg.RigidBody2D(com=jnp.zeros(2), vel=jnp.asarray([1.0, 2.0]),
                        theta=jnp.zeros(()), omega=jnp.zeros(()),
                        mass=jnp.asarray(2.0), inertia=jnp.asarray(0.5))
    dt = 1e-3
    g = (0.0, -9.81)
    torque = jnp.asarray(0.1)
    for _ in range(1000):
        rb = rg.rigid_step(rb, jnp.zeros(2), torque, dt, gravity=g)
    t = 1.0
    np.testing.assert_allclose(float(rb.com[0]), 1.0 * t, rtol=1e-3)
    np.testing.assert_allclose(float(rb.com[1]), 2.0 * t - 0.5 * 9.81 * t**2,
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(float(rb.omega), (0.1 / 0.5) * t, rtol=1e-6)
    np.testing.assert_allclose(float(rb.theta), 0.5 * (0.1 / 0.5) * t**2,
                               rtol=2e-3)


def test_constraint_imposes_rigid_motion():
    from sphinxsys_tpu.core.state import make_solid_state

    pos0 = np.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    state = dict(make_solid_state(pos0, 0.1, 1.0))
    mask = jnp.ones(3, bool)
    rb = rg.RigidBody2D(com=jnp.asarray([2.0, 1.0]), vel=jnp.asarray([0.5, 0.0]),
                        theta=jnp.asarray(math.pi / 2), omega=jnp.asarray(1.0),
                        mass=jnp.asarray(1.0), inertia=jnp.asarray(1.0))
    com0 = jnp.asarray(pos0.mean(axis=0))
    out = rg.constrain_by_rigid_body(state, mask, rb, jnp.asarray(pos0), com0)
    p = np.asarray(out["Position"])
    # 90-degree rotation about COM0 then translation to COM
    r0 = pos0 - np.asarray(com0)
    expect = np.asarray([2.0, 1.0]) + r0 @ np.asarray([[0.0, -1.0], [1.0, 0.0]]).T
    np.testing.assert_allclose(p, expect, atol=1e-6)
    # velocity = V + omega x r
    v = np.asarray(out["Velocity"])
    r = p - np.asarray([2.0, 1.0])
    expect_v = np.asarray([0.5, 0.0]) + np.stack([-r[:, 1], r[:, 0]], -1)
    np.testing.assert_allclose(v, expect_v, atol=1e-6)


@pytest.mark.parametrize("", [()])
def test_floating_block_archimedes(_=None):
    """A half-density block dropped at the free surface must settle into a
    heave oscillation about the Archimedes draft (rho_ratio * height), with
    the theoretical heave period 2 pi sqrt(m / (rho g A))."""
    from sphinxsys_tpu.cases import floating_body_2d as fb

    case, fluid = fb.build_case(dx=0.025)
    s = fb.init_sim(case, fluid)
    run = fb.make_run_chunk(case)
    drafts, times = [], []
    for i in range(1, 17):
        s = run(s, jnp.asarray(i * 0.125, s.time.dtype))
        drafts.append(fb.WH - (float(s.rb.com[1]) - fb.BH / 2))
        times.append(float(s.time))
    assert not bool(s.overflow)
    drafts = np.asarray(drafts)
    target = fb.RHO_RATIO * fb.BH  # 0.05
    # oscillates about the Archimedes draft (coarse-resolution tolerance)
    mean_draft = drafts[len(drafts) // 2:].mean()
    assert 0.4 * target < mean_draft < 1.4 * target
    # it definitely sank in (not resting at draft ~0) and didn't sink through
    assert drafts.max() > 0.5 * target
    assert drafts.max() < fb.BH
    # block stays horizontal-ish and near the tank center
    assert abs(float(s.rb.theta)) < 0.3
    assert abs(float(s.rb.com[0]) - fb.DL / 2) < 0.1
