"""Eulerian (mesh-free finite-volume) weakly-compressible SPH.

Counterpart of /root/reference/src/shared/particle_dynamics/fluid_dynamics/
eulerian_fluid_dynamics/eulerian_fluid_integration.{h,hpp}: particles are
STATIC control volumes; fluxes between particle pairs use the acoustic
Riemann interface state (riemann_solver.h:102-116):

  1st half:  dmom/dt_i = -2 V_i sum_j (rho* v* v*^T + p* I) e_ij dW_ij V_j
             mom += (dmom/dt + F_prior) dt ;  v = mom/mass
  2nd half:  dmass/dt_i = -2 V_i sum_j (rho* v*).e_ij dW_ij V_j
             mass += dmass/dt dt ;  rho = mass/V ;  p = EoS(rho)

Wall contact mirrors the state with vel_in_wall = 2 v_ave - v_i and the
interface evaluated along the wall normal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sphinxsys_tpu.core.state import State
from sphinxsys_tpu.neighbors.neighbor_list import NeighborList, gather
from sphinxsys_tpu.physics.pair import pair_geometry

TINY = 1.0e-15


def interface_state(riemann, rho_i, vel_i, p_i, rho_j, vel_j, p_j, e_ij):
    """AcousticRiemannSolver::InterfaceState (riemann_solver.h:102-116),
    vectorized over (..., K) pair slots; e_ij points j -> i."""
    rc_i, rc_j = riemann.rho0c0_i, riemann.rho0c0_j
    inv_sum = riemann.inv_rho0c0_sum
    rho_star = (rho_i * rc_i + rho_j * rc_j) * inv_sum
    p_avg = (p_i * rc_j + p_j * rc_i) * inv_sum
    v_avg = (vel_i * rc_i + vel_j * rc_j) * inv_sum
    ul = -jnp.sum(e_ij * vel_i, axis=-1)
    ur = -jnp.sum(e_ij * vel_j, axis=-1)
    u_jump = ul - ur
    if hasattr(riemann, "_limiter"):
        lim = riemann._limiter(riemann.inv_c0_ave * jnp.maximum(u_jump, 0.0))
    else:
        lim = jnp.zeros_like(u_jump)
    p_star = p_avg + 0.5 * riemann.rho0c0_geo_ave * u_jump * lim
    u_diss = 0.5 * (p_i - p_j) * riemann.inv_rho0c0_ave * lim * lim
    v_star = v_avg - e_ij * u_diss[..., None]
    return rho_star, v_star, p_star


def make_eulerian_state(pos, volume, material, dtype=jnp.float32) -> State:
    from sphinxsys_tpu.core.state import make_base_state

    state = dict(make_base_state(pos, volume, material.rho0, dtype=dtype))
    n, dim = state["Position"].shape
    state["Velocity"] = jnp.zeros((n, dim), dtype=dtype)
    state["Momentum"] = jnp.zeros((n, dim), dtype=dtype)
    state["Pressure"] = jnp.zeros((n,), dtype=dtype)
    state["ForcePrior"] = jnp.zeros((n, dim), dtype=dtype)
    return state


def _pair_states(state, nl, kernel, dim, box):
    pg = pair_geometry(state["Position"], state["Position"], nl, kernel, dim,
                       need_W=False, box=box)
    rho_j, _ = gather(state["Density"], nl.idx)
    vel_j, _ = gather(state["Velocity"], nl.idx)
    p_j, _ = gather(state["Pressure"], nl.idx)
    vol_j, _ = gather(state["VolumetricMeasure"], nl.idx)
    return pg, rho_j, vel_j, p_j, vol_j


def eulerian_integration_1st_half(state: State, nl: NeighborList, kernel,
                                  dim: int, riemann, dt,
                                  wall: State | None = None,
                                  nl_wall: NeighborList | None = None,
                                  box=None) -> State:
    out = dict(state)
    pg, rho_j, vel_j, p_j, vol_j = _pair_states(state, nl, kernel, dim, box)
    rho_i = state["Density"][:, None]
    p_i = state["Pressure"][:, None]
    vel_i = state["Velocity"][:, None, :]
    vol_i = state["VolumetricMeasure"]

    rho_s, v_s, p_s = interface_state(riemann, rho_i, vel_i, p_i,
                                      rho_j, vel_j, p_j, pg.e)
    dWV = pg.dW * vol_j
    # (rho* v* v*^T + p* I) e = rho* v* (v*.e) + p* e
    flux = (rho_s * jnp.sum(v_s * pg.e, axis=-1))[..., None] * v_s + \
        p_s[..., None] * pg.e
    dmom_dt = -2.0 * vol_i[:, None] * jnp.sum(flux * dWV[..., None], axis=1)

    if wall is not None:
        pgw = pair_geometry(state["Position"], wall["Position"], nl_wall,
                            kernel, dim, need_W=False, box=box)
        wall_vol, _ = gather(wall["VolumetricMeasure"], nl_wall.idx)
        vel_ave, _ = gather(wall["AverageVelocity"], nl_wall.idx)
        n_k, _ = gather(wall["NormalDirection"], nl_wall.idx)
        vel_in_wall = 2.0 * vel_ave - vel_i
        rho_s, v_s, p_s = interface_state(riemann, rho_i, vel_i, p_i,
                                          rho_i, vel_in_wall, p_i, n_k)
        dWV_w = pgw.dW * wall_vol
        flux = (rho_s * jnp.sum(v_s * pgw.e, axis=-1))[..., None] * v_s + \
            p_s[..., None] * pgw.e
        dmom_dt = dmom_dt - 2.0 * vol_i[:, None] * jnp.sum(
            flux * dWV_w[..., None], axis=1)

    mom = state["Momentum"] + (dmom_dt + state["ForcePrior"]) * dt
    out["Momentum"] = mom
    out["Velocity"] = mom / state["Mass"][:, None]
    return out


def eulerian_integration_2nd_half(state: State, nl: NeighborList, kernel,
                                  dim: int, riemann, eos, dt,
                                  wall: State | None = None,
                                  nl_wall: NeighborList | None = None,
                                  box=None) -> State:
    out = dict(state)
    pg, rho_j, vel_j, p_j, vol_j = _pair_states(state, nl, kernel, dim, box)
    rho_i = state["Density"][:, None]
    p_i = state["Pressure"][:, None]
    vel_i = state["Velocity"][:, None, :]
    vol_i = state["VolumetricMeasure"]

    rho_s, v_s, p_s = interface_state(riemann, rho_i, vel_i, p_i,
                                      rho_j, vel_j, p_j, pg.e)
    dWV = pg.dW * vol_j
    dmass_dt = -2.0 * vol_i * jnp.sum(
        rho_s * jnp.sum(v_s * pg.e, axis=-1) * dWV, axis=1)

    if wall is not None:
        pgw = pair_geometry(state["Position"], wall["Position"], nl_wall,
                            kernel, dim, need_W=False, box=box)
        wall_vol, _ = gather(wall["VolumetricMeasure"], nl_wall.idx)
        vel_ave, _ = gather(wall["AverageVelocity"], nl_wall.idx)
        n_k, _ = gather(wall["NormalDirection"], nl_wall.idx)
        vel_in_wall = 2.0 * vel_ave - vel_i
        rho_s, v_s, p_s = interface_state(riemann, rho_i, vel_i, p_i,
                                          rho_i, vel_in_wall, p_i, n_k)
        dWV_w = pgw.dW * wall_vol
        dmass_dt = dmass_dt - 2.0 * vol_i * jnp.sum(
            rho_s * jnp.sum(v_s * pgw.e, axis=-1) * dWV_w, axis=1)

    mass = state["Mass"] + dmass_dt * dt
    out["Mass"] = mass
    out["Density"] = mass / vol_i
    out["Pressure"] = eos.pressure(out["Density"])
    return out


def eulerian_time_step(state: State, eos, h_min: float, cfl: float = 0.6):
    from sphinxsys_tpu.core.state import valid_mask

    c = eos.sound_speed(state["Pressure"], state["Density"])
    speed = jnp.linalg.norm(state["Velocity"], axis=-1)
    reduced = jnp.max(jnp.where(valid_mask(state), c + speed, 0.0))
    return cfl * h_min / (reduced + TINY)
