"""Adaptive-smoothing-length WCSPH fluid ops (multi-resolution fluids).

Counterpart of the reference's *Adaptive dynamics variants
(fluid_dynamics + ParticleWithLocalRefinement, used by
test_2d_free_stream_around_cylinder_mr): the dense-neighbor-list ops of
physics/fluid.py re-derived for per-particle smoothing lengths
h_i = h_ref / SmoothingLengthRatio_i.

Kernel conventions (matching neighbors/multilevel.py and the adaptive
frozen solid pairs):
  * density summation evaluates W at the particle's OWN h (the physical
    interpolation, DensitySummationAdaptive);
  * every PAIR force/gradient evaluates dW at the pair smoothing length
    max(h_i, h_j) (= min of the ratios) — symmetric, so pairwise momentum
    exchange cancels exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from sphinxsys_tpu.core.state import State
from sphinxsys_tpu.physics.pair import min_image
from sphinxsys_tpu.neighbors.neighbor_list import NeighborList, gather

TINY = 1.0e-15


def adaptive_pair(fluid: State, nl: NeighborList, kernel, dim: int, box=None):
    """Shared pair quantities: (r, e, dW_pair, hr_pair, vol_j, mask)."""
    pos = fluid["Position"]
    hr = fluid["SmoothingLengthRatio"]
    pos_j, mask = gather(pos, nl.idx)
    hr_j, _ = gather(hr, nl.idx)
    vol_j, _ = gather(fluid["VolumetricMeasure"], nl.idx)
    disp = pos[:, None, :] - pos_j
    if box is not None and any(b > 0 for b in box):
        disp = min_image(disp, box)
    r = jnp.sqrt(jnp.sum(disp * disp, axis=-1) + TINY)
    e = disp / (r[..., None] + TINY)
    hr_pair = jnp.minimum(hr[:, None], hr_j)       # pair h = max(h_i, h_j)
    dW = kernel.dW_adaptive(r, hr_pair, dim) * mask
    return r, e, dW, hr_pair, vol_j, mask


def density_summation_adaptive(fluid: State, nl: NeighborList, kernel,
                               dim: int, rho0: float, box=None) -> State:
    """rho_i = m_i W(0; h_i) + sum m_j W(r; h_i); Vol = m / rho."""
    pos = fluid["Position"]
    hr = fluid["SmoothingLengthRatio"]
    mass = fluid["Mass"]
    pos_j, mask = gather(pos, nl.idx)
    m_j, _ = gather(mass, nl.idx)
    disp = pos[:, None, :] - pos_j
    if box is not None and any(b > 0 for b in box):
        disp = min_image(disp, box)
    r = jnp.linalg.norm(disp, axis=-1)
    W = kernel.W_adaptive(r, hr[:, None], dim) * mask
    w0 = kernel._factor_w(dim) * (hr ** dim) * kernel._w(jnp.zeros((), pos.dtype))
    rho = mass * w0 + jnp.sum(m_j * W, axis=1)
    out = dict(fluid)
    out["Density"] = rho
    out["VolumetricMeasure"] = mass / jnp.maximum(rho, TINY)
    return out


def acoustic_step_1st_half_adaptive(fluid: State, nl: NeighborList, kernel,
                                    dim: int, eos, riemann, dt,
                                    box=None) -> State:
    out = dict(fluid)
    rho = fluid["Density"] + fluid["DensityChangeRate"] * (0.5 * dt)
    p = eos.pressure(rho)
    pos = fluid["Position"] + fluid["Velocity"] * (0.5 * dt)
    vol = fluid["VolumetricMeasure"]

    f2 = dict(fluid)
    f2["Position"] = pos
    r, e, dW, _, vol_j, mask = adaptive_pair(f2, nl, kernel, dim, box)
    p_j, _ = gather(p, nl.idx)
    dWV = dW * vol_j
    force = -jnp.sum((p[:, None] + p_j)[..., None] * dWV[..., None] * e,
                     axis=1)
    rho_diss = jnp.sum(riemann.dissipative_u_jump(p[:, None] - p_j) * dWV,
                       axis=1)
    force_total = fluid["Force"] + force * vol[:, None]
    vel = fluid["Velocity"] + (fluid["ForcePrior"] + force_total) \
        / fluid["Mass"][:, None] * dt
    out.update({"Density": rho, "Pressure": p, "Position": pos,
                "Force": force_total, "DensityChangeRate": rho_diss * rho,
                "Velocity": vel})
    return out


def acoustic_step_2nd_half_adaptive(fluid: State, nl: NeighborList, kernel,
                                    dim: int, riemann, dt,
                                    box=None) -> State:
    out = dict(fluid)
    pos = fluid["Position"] + fluid["Velocity"] * (0.5 * dt)
    vel = fluid["Velocity"]
    rho = fluid["Density"]
    vol = fluid["VolumetricMeasure"]

    f2 = dict(fluid)
    f2["Position"] = pos
    r, e, dW, _, vol_j, mask = adaptive_pair(f2, nl, kernel, dim, box)
    vel_j, _ = gather(vel, nl.idx)
    dWV = dW * vol_j
    u_jump = jnp.sum((vel[:, None, :] - vel_j) * e, axis=-1)
    # accumulate the advective term onto the 1st half's dissipation; the
    # dissipation force is ASSIGNED and consumed by the NEXT 1st half
    # (fluid_integration.hpp:195, same structure as the uniform op)
    drho_dt = fluid["DensityChangeRate"] + rho * jnp.sum(u_jump * dWV, axis=1)
    p_diss = riemann.dissipative_p_jump(u_jump) * dWV
    force = vol[:, None] * jnp.sum(p_diss[..., None] * e, axis=1)
    rho_new = rho + drho_dt * (0.5 * dt)
    out.update({"Position": pos, "Density": rho_new,
                "DensityChangeRate": drho_dt, "Force": force})
    return out


def viscous_force_adaptive(fluid: State, nl: NeighborList, kernel, dim: int,
                           mu: float, h_ref: float, box=None) -> State:
    r, e, dW, hr_pair, vol_j, mask = adaptive_pair(fluid, nl, kernel, dim,
                                                   box)
    vel_j, _ = gather(fluid["Velocity"], nl.idx)
    h_pair = h_ref / jnp.maximum(hr_pair, TINY)
    vderiv = (fluid["Velocity"][:, None, :] - vel_j) \
        / (r + 0.01 * h_pair)[..., None]
    force = 2.0 * mu * jnp.sum(vderiv * (dW * vol_j)[..., None], axis=1)
    out = dict(fluid)
    vf = force * fluid["VolumetricMeasure"][:, None]
    out["ViscousForce"] = vf
    out["ForcePrior"] = fluid["ForcePrior"] + vf - fluid.get(
        "ViscousForcePrev", jnp.zeros_like(vf))
    out["ViscousForcePrev"] = vf
    return out


def transport_velocity_correction_adaptive(fluid: State, nl: NeighborList,
                                           kernel, dim: int, h_ref: float,
                                           coefficient: float = 0.2,
                                           limiter_slope: float = 100.0,
                                           box=None) -> State:
    """Shift with the particle's OWN h^2 scale (the adaptive TVC uses the
    local resolution)."""
    r, e, dW, _, vol_j, mask = adaptive_pair(fluid, nl, kernel, dim, box)
    inconsistency = -jnp.sum((2.0 * dW * vol_j)[..., None] * e, axis=1)
    h_own = h_ref / jnp.maximum(fluid["SmoothingLengthRatio"], TINY)
    h2 = h_own * h_own
    sq = jnp.sum(inconsistency ** 2, axis=-1)
    lim = jnp.minimum(limiter_slope * h2 * sq, 1.0)
    out = dict(fluid)
    out["Position"] = fluid["Position"] \
        + (coefficient * h2 * lim)[:, None] * inconsistency
    return out
