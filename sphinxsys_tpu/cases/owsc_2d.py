"""Oscillating wave surge converter (OWSC): pin-jointed flap + PTO damper.

Counterpart of tests/2d_examples/test_2d_owsc/owsc.{h,cpp}: a bottom-pinned
rigid flap (SimTK::MobilizedBody::Pin) with a linear power-take-off damper
on the joint (Force::MobilityLinearDamper, coefficient 20, cpp:158) driven
by water waves.  The articulated rigid machinery is
physics/rigid.py PinJoint2D.

Compact scene deviation: instead of the reference's 18 m tank with a
piston wave maker, a dam-break surge (column at the left) provides the
incident wave — the flap pitch response and the PTO energy capture are the
same observables (the reference's regression quantity is the flap
rotation).

Oracle: the surge reaches the flap at t ~ sqrt(2 DL/g); the flap pitches
measurably (|theta| > 5 degrees), stays bounded, and the PTO absorbs a
positive, saturating energy integral c omega^2 dt.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.core import geometry as G
from sphinxsys_tpu.core.adaptation import SPHAdaptation
from sphinxsys_tpu.core.generators import generate_lattice
from sphinxsys_tpu.core.materials import WeaklyCompressibleFluid
from sphinxsys_tpu.core.state import State, make_fluid_state, make_solid_state
from sphinxsys_tpu.neighbors import (build_cell_table, build_neighbor_list,
                                     grid_from_bounds)
from sphinxsys_tpu.physics import fluid as fd
from sphinxsys_tpu.physics import fsi
from sphinxsys_tpu.physics import general as gd
from sphinxsys_tpu.physics import riemann as rs
from sphinxsys_tpu.physics import rigid as rg

DL = 3.0
DH = 0.8
WATER_L = 0.8       # dam column length
WATER_H = 0.5
FLAP_X = 2.0        # pivot x
FLAP_H = 0.36
FLAP_W = 0.06
RHO0_F = 1000.0
RHO_FLAP = 500.0    # buoyant flap
GRAVITY_G = 9.81
U_REF = 2.0 * (GRAVITY_G * WATER_H) ** 0.5
C_F = 10.0 * U_REF
PTO_DAMPING = 5.0    # PTO damper (the reference's MobilityLinearDamper)
PTO_STIFFNESS = 100.0
# spring+damper PTO: a bottom-pinned flap is an inverted pendulum once the
# surge passes and the water level drops below it — the reference's flap
# is restored by buoyancy in its standing water; in this compact dam-break
# scene the spring supplies the restoring moment (standard PTO model).
# Gravity gradient ~ m g H/2 = 19 N m/rad < k = 100 -> upright stable,
# omega_n ~ 13 rad/s, damping ratio ~ 0.36 (underdamped oscillation).


class SimState(NamedTuple):
    fluid: Any
    flap: Any
    pj: Any
    pto_energy: jnp.ndarray
    nl_inner: Any
    nl_fw: Any
    nl_ff: Any
    nl_bf: Any
    time: jnp.ndarray
    n_adv: jnp.ndarray
    overflow: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class OWSCCase:
    dx: float
    adaptation: SPHAdaptation
    grid: Any
    eos: WeaklyCompressibleFluid
    riemann: Any
    gravity: Any
    wall: Any
    wall_table: Any
    flap0: Any
    pj0: Any
    n_fluid: int
    n_flap: int
    cell_cap: int
    k_inner: int
    k_contact: int

    @property
    def kernel(self):
        return self.adaptation.kernel


def build_case(dx: float = 0.02, dtype=jnp.float32, cell_cap: int = 24,
               k_inner: int = 64, k_contact: int = 40):
    bw = 4 * dx
    adaptation = SPHAdaptation(spacing=dx, dim=2)
    water_shape = G.Box(G.Transform(translation=(WATER_L / 2, WATER_H / 2)),
                        halfsize=(WATER_L / 2, WATER_H / 2))
    flap_shape = G.Box(
        G.Transform(translation=(FLAP_X, FLAP_H / 2)),
        halfsize=(FLAP_W / 2, FLAP_H / 2))
    outer = G.Box(G.Transform(translation=(DL / 2, DH / 2)),
                  halfsize=(DL / 2 + bw, DH / 2 + bw))
    inner = G.Box(G.Transform(translation=(DL / 2, DH / 2)),
                  halfsize=(DL / 2, DH / 2))
    wall_shape = G.make_complex(("add", outer), ("sub", inner))

    dom_lo, dom_hi = (-bw, -bw), (DL + bw, DH + bw)
    pos_f, vol = generate_lattice(water_shape, dom_lo, dom_hi, dx)
    pos_w, _ = generate_lattice(wall_shape, dom_lo, dom_hi, dx)
    pos_b, _ = generate_lattice(flap_shape, dom_lo, dom_hi, dx)

    fluid = dict(make_fluid_state(pos_f, vol, RHO0_F, dtype=dtype))
    eos = WeaklyCompressibleFluid(rho0=RHO0_F, c0=C_F)
    p_hydro = RHO0_F * GRAVITY_G * (WATER_H - np.asarray(pos_f)[:, 1])
    fluid["Density"] = jnp.asarray(
        np.asarray(eos.density_from_pressure(jnp.asarray(p_hydro))), dtype)
    fluid["Pressure"] = jnp.asarray(p_hydro, dtype)

    wall = make_solid_state(pos_w, vol, RHO0_F, dtype=dtype)
    wall = gd.normal_direction_from_shape(wall, wall_shape)

    flap = dict(make_solid_state(pos_b, vol, RHO_FLAP, dtype=dtype))
    flap = gd.normal_direction_from_shape(flap, flap_shape)
    flap["InitialPosition"] = flap["Position"]
    for key in ["PressureForceFromFluid"]:
        flap[key] = jnp.zeros_like(flap["Position"])
        flap["Previous" + key] = jnp.zeros_like(flap["Position"])
    flap["ForcePrior"] = jnp.zeros_like(flap["Position"])
    flap["Force"] = jnp.zeros_like(flap["Position"])
    flap["AverageAcceleration"] = jnp.zeros_like(flap["Position"])

    mask = jnp.ones((len(pos_b),), bool)
    pj0 = rg.pin_joint_from_particles(flap, mask, (FLAP_X, 0.0))

    gravity = gd.Gravity(acceleration=(0.0, -GRAVITY_G))
    fluid = gd.gravity_force(fluid, gravity)

    grid = grid_from_bounds(dom_lo, dom_hi, adaptation.cutoff)
    wall_table = jax.jit(partial(build_cell_table, grid=grid, cap=cell_cap))(
        wall["Position"], wall["NReal"])

    case = OWSCCase(dx=dx, adaptation=adaptation, grid=grid, eos=eos,
                    riemann=rs.acoustic_riemann(eos), gravity=gravity,
                    wall=wall, wall_table=wall_table, flap0=flap, pj0=pj0,
                    n_fluid=len(pos_f), n_flap=len(pos_b),
                    cell_cap=cell_cap, k_inner=k_inner, k_contact=k_contact)
    return case, fluid


def rebuild(case: OWSCCase, fluid: State, flap: State):
    pos = fluid["Position"]
    n_f, n_b = fluid["NReal"], flap["NReal"]
    cutoff = case.adaptation.cutoff
    table_f = build_cell_table(pos, n_f, case.grid, cap=case.cell_cap)
    table_b = build_cell_table(flap["Position"], n_b, case.grid,
                               cap=case.cell_cap)
    nl_inner = build_neighbor_list(pos, n_f, pos, n_f, table_f, case.grid,
                                   cutoff, k_max=case.k_inner,
                                   include_self=False)
    nl_fw = build_neighbor_list(pos, n_f, case.wall["Position"],
                                case.wall["NReal"], case.wall_table,
                                case.grid, cutoff, k_max=case.k_contact,
                                include_self=True)
    nl_ff = build_neighbor_list(pos, n_f, flap["Position"], n_b, table_b,
                                case.grid, cutoff, k_max=case.k_contact,
                                include_self=True)
    nl_bf = build_neighbor_list(flap["Position"], n_b, pos, n_f, table_f,
                                case.grid, cutoff, k_max=case.k_contact,
                                include_self=True)
    ovf = nl_inner.overflow | nl_fw.overflow | nl_ff.overflow | nl_bf.overflow
    return nl_inner, nl_fw, nl_ff, nl_bf, ovf


def init_sim(case: OWSCCase, fluid: State) -> SimState:
    flap = case.flap0
    nl_inner, nl_fw, nl_ff, nl_bf, ovf = jax.jit(partial(rebuild, case))(
        fluid, flap)
    dtype = fluid["Position"].dtype
    return SimState(fluid=fluid, flap=flap, pj=case.pj0,
                    pto_energy=jnp.zeros((), dtype),
                    nl_inner=nl_inner, nl_fw=nl_fw, nl_ff=nl_ff, nl_bf=nl_bf,
                    time=jnp.zeros((), dtype), n_adv=jnp.zeros((), jnp.int32),
                    overflow=ovf)


def _advection_step(case: OWSCCase, s: SimState) -> SimState:
    kernel, dim = case.kernel, 2
    h = case.adaptation.h
    sigma0 = case.adaptation.sigma0
    fluid, flap, pj = s.fluid, s.flap, s.pj
    mask_b = jnp.ones((case.n_flap,), bool)

    dt_adv = fd.advection_time_step(fluid, h, U_REF)
    fluid = fd.density_summation(
        fluid, s.nl_inner, kernel, dim, RHO0_F, sigma0,
        contacts=[(case.wall, s.nl_fw, RHO0_F), (flap, s.nl_ff, RHO0_F)],
        free_surface=True)

    def ac_cond(carry):
        _, _, _, _, rt = carry
        return rt < dt_adv

    def ac_body(carry):
        f, b, p, e_pto, rt = carry
        dt = jnp.minimum(fd.acoustic_time_step(f, case.eos, h), dt_adv)
        walls = [(case.wall, s.nl_fw), (b, s.nl_ff)]
        f = fd.acoustic_step_1st_half(f, s.nl_inner, kernel, dim, case.eos,
                                      case.riemann, dt, walls=walls)
        b = fsi.pressure_force_from_fluid(b, f, s.nl_bf, kernel, dim,
                                          case.riemann)
        torque = rg.pin_torque(b, mask_b, p, force_keys=("ForcePrior",))
        p_new = rg.pin_joint_step(p, torque, dt, damping=PTO_DAMPING,
                                  stiffness=PTO_STIFFNESS,
                                  gravity=(0.0, -GRAVITY_G))
        b = rg.constrain_by_pin_joint(b, mask_b, p_new,
                                      case.flap0["InitialPosition"])
        e_pto = e_pto + PTO_DAMPING * p_new.omega ** 2 * dt
        f = fd.acoustic_step_2nd_half(f, s.nl_inner, kernel, dim,
                                      case.riemann, dt,
                                      walls=[(case.wall, s.nl_fw),
                                             (b, s.nl_ff)])
        return (f, b, p_new, e_pto, rt + dt)

    fluid, flap, pj, pto_energy, relax_t = jax.lax.while_loop(
        ac_cond, ac_body,
        (fluid, flap, pj, s.pto_energy, jnp.zeros_like(dt_adv)))

    nl_inner, nl_fw, nl_ff, nl_bf, ovf = rebuild(case, fluid, flap)
    return SimState(fluid=fluid, flap=flap, pj=pj, pto_energy=pto_energy,
                    nl_inner=nl_inner, nl_fw=nl_fw, nl_ff=nl_ff, nl_bf=nl_bf,
                    time=s.time + relax_t, n_adv=s.n_adv + 1,
                    overflow=s.overflow | ovf)


def make_run_chunk(case: OWSCCase):
    @jax.jit
    def run_chunk(s: SimState, t_target) -> SimState:
        return jax.lax.while_loop(lambda st: st.time < t_target,
                                  lambda st: _advection_step(case, st), s)

    return run_chunk


def flap_angle_deg(s: SimState) -> float:
    return float(s.pj.theta) * 180.0 / np.pi
