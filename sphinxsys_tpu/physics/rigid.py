"""Rigid multi-body coupling (native counterpart of the Simbody bridge).

Counterpart of /root/reference/src/shared/simbody_sphinxsys/ +
solid_dynamics/constraint_dynamics.h:156-184: the reference funnels SPH
forces into SimTK mobilized bodies and imposes the resulting rigid motion
back on the particles.  Here the rigid solver is native (and jit-compiled
like everything else):

  * RigidBody2D: COM state (x, v, theta, omega) + mass/inertia
  * total_force_and_torque: reduce the SPH forces of a body part onto the
    COM (TotalForceForSimBody analog)
  * rigid_step: symplectic Euler of the planar 3-DOF equations
  * constrain_by_rigid_body: impose the rigid transform on the particles
    (ConstraintBySimBody analog), with velocities v + omega x r.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sphinxsys_tpu.core.state import State


class RigidBody2D(NamedTuple):
    com: jnp.ndarray       # (2,)
    vel: jnp.ndarray       # (2,)
    theta: jnp.ndarray     # ()
    omega: jnp.ndarray     # ()
    mass: jnp.ndarray      # ()
    inertia: jnp.ndarray   # () about COM


def rigid_body_from_particles(state: State, mask) -> RigidBody2D:
    """Mass properties from a particle set (SolidBodyPartForSimbody,
    body_part_for_simbody.h:43)."""
    dtype = state["Position"].dtype
    m = jnp.where(mask, state["Mass"], 0.0)
    total = jnp.sum(m)
    com = jnp.sum(m[:, None] * state["Position"], axis=0) / total
    r = state["Position"] - com
    inertia = jnp.sum(m * jnp.sum(r * r, axis=-1))
    z = jnp.zeros((), dtype)
    return RigidBody2D(com=com, vel=jnp.zeros(2, dtype),
                       theta=z, omega=z, mass=total, inertia=inertia)


def total_force_and_torque(state: State, mask, rb: RigidBody2D,
                           force_keys=("Force", "ForcePrior")):
    """Reduce SPH forces on the body part to a COM force + torque
    (TotalForceForSimBody, constraint_dynamics.h:170-184)."""
    f = jnp.zeros_like(state["Position"])
    for k in force_keys:
        f = f + state[k]
    f = jnp.where(mask[:, None], f, 0.0)
    total_f = jnp.sum(f, axis=0)
    r = state["Position"] - rb.com
    torque = jnp.sum(jnp.where(mask, r[:, 0] * f[:, 1] - r[:, 1] * f[:, 0], 0.0))
    return total_f, torque


def rigid_step(rb: RigidBody2D, force, torque, dt, gravity=None) -> RigidBody2D:
    """Symplectic Euler for the planar rigid equations."""
    acc = force / rb.mass
    if gravity is not None:
        acc = acc + jnp.asarray(gravity, dtype=force.dtype)
    vel = rb.vel + acc * dt
    com = rb.com + vel * dt
    omega = rb.omega + (torque / rb.inertia) * dt
    theta = rb.theta + omega * dt
    return rb._replace(com=com, vel=vel, theta=theta, omega=omega)


def constrain_by_rigid_body(state: State, mask, rb: RigidBody2D,
                            initial_pos, initial_com) -> State:
    """Impose the rigid transform on the part's particles
    (ConstraintBySimBody::update): x = COM + R(theta) (x0 - COM0),
    v = V + omega x r, and the averaged-wall kinematics follow."""
    out = dict(state)
    c, s = jnp.cos(rb.theta), jnp.sin(rb.theta)
    R = jnp.asarray([[c, -s], [s, c]], dtype=state["Position"].dtype)
    r0 = initial_pos - initial_com
    new_pos = rb.com + r0 @ R.T
    r = new_pos - rb.com
    new_vel = rb.vel + rb.omega * jnp.stack([-r[:, 1], r[:, 0]], axis=-1)
    m = mask[:, None]
    out["Position"] = jnp.where(m, new_pos, state["Position"])
    out["Velocity"] = jnp.where(m, new_vel, state["Velocity"])
    if "AverageVelocity" in state:
        out["AverageVelocity"] = jnp.where(m, new_vel, state["AverageVelocity"])
    if "NormalDirection" in state and "InitialNormalDirection" in state:
        out["NormalDirection"] = jnp.where(
            m, state["InitialNormalDirection"] @ R.T, state["NormalDirection"])
    return out
