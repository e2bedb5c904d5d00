"""fsi2 on the cell-block engine (TPU hot path) — flow-induced vibration
of an elastic beam behind a cylinder.

Same scene, constants and triple-rate loop as cases/fsi2.py (reference
tests/2d_examples/test_2d_fsi2/fsi2.{h,cpp}); the fluid runs on the
case-agnostic block engine (engine/block_fluid.py) with optional fused
Pallas sweeps, and the solid keeps the gather formulation (it is tiny
next to the fluid) coupled through direct block-window gathers
(physics/fsi_blocks.py).

Block-engine specifics:
  * ONE periodic-x grid for everything.  The gather case gives the wall
    strips x-overhangs of width bw as hand-made periodic images; here the
    wrap supplies the images, so the overhangs are TRIMMED (x outside
    [-dl_sponge, DL)) to avoid double counting.  The strip lattice period
    is an integer multiple of dx, so the wrapped images coincide with the
    trimmed overhang positions exactly — the two cases see identical wall
    geometry.
  * wall + insert are merged into ONE wall-type contact body (identical
    contact terms; the V = m/rho0 identity makes the density contact sum
    body-rho0-agnostic).  Slots re-freeze each advection step; the moving
    insert's channels refresh each acoustic iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import fsi2
from sphinxsys_tpu.cases.fsi2 import (DH, DL, MU_F, RHO0_F, RHO0_S, T_REF,
                                      U_F)
from sphinxsys_tpu.engine import block_fluid as eng_mod
from sphinxsys_tpu.engine.block_fluid import BlockEngine
from sphinxsys_tpu.neighbors.cell_blocks import dense_cell_map
from sphinxsys_tpu.neighbors.cell_list import wrap_positions
from sphinxsys_tpu.physics import fsi
from sphinxsys_tpu.physics import fsi_blocks as fsb
from sphinxsys_tpu.physics import solid as sd


class BlockFSISim(NamedTuple):
    fluid_b: Any
    nbr_inner: Any
    nbr_wall: Any
    wall_bm: Any       # merged wall+insert BlockMap (slots frozen per step)
    wall_b0: Any       # merged wall block state (static channels)
    sol_win: Any       # (n_s, 9) fluid block windows of solid particles
    solid: Any         # flat solid state (gather formulation)
    time: jnp.ndarray
    n_adv: jnp.ndarray
    n_ac: jnp.ndarray
    n_s: jnp.ndarray
    overflow: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BlockFSICase:
    base: fsi2.FSICase
    eng: BlockEngine
    c_max_wall: int
    wall_valid: Any        # trimmed-overhang mask for the merged body
    n_wall: int
    n_solid: int

    @property
    def kernel(self):
        return self.base.kernel


def build_case(dx: float = 0.1, dtype=jnp.float32, cap: int = 12,
               c_max: int | None = None, use_pallas: bool = False,
               pallas_interpret: bool = False, tile_c: int = 256):
    base, fluid, solid = fsi2.build_case(dx=dx, dtype=dtype)
    grid = base.grid_f
    c_max = eng_mod.round_to(c_max or grid.ncells, tile_c)
    c_max_wall = eng_mod.round_to(grid.ncells, 32)
    eng = BlockEngine(
        grid=grid, kernel=base.kernel, eos=base.eos, riemann1=base.riemann,
        riemann2=base.no_riemann, rho0=RHO0_F, sigma0=base.adaptation.sigma0,
        h=base.adaptation.h, speed_ref=U_F, dim=2, mu=MU_F, tvc_coef=0.25,
        tvc_limiter=None, free_surface=False, cap=cap, c_max=c_max,
        tile_c=tile_c, use_pallas=use_pallas,
        pallas_interpret=pallas_interpret, cap_ac_dt=True)

    # trim the wall x-overhangs: the periodic wrap supplies those images
    wx = np.asarray(base.wall["Position"][:, 0])
    wall_valid = jnp.asarray((wx >= -base.dl_sponge - 1e-9) & (wx < DL - 1e-9))
    wall_valid = jnp.concatenate(
        [wall_valid, jnp.ones((base.n_solid,), bool)], axis=0)

    case = BlockFSICase(base=base, eng=eng, c_max_wall=c_max_wall,
                        wall_valid=wall_valid, n_wall=base.n_wall,
                        n_solid=base.n_solid)
    return case, fluid, solid


def _merged_wall_state(case: BlockFSICase, solid: dict) -> dict:
    """Concatenate the static wall strips with the (moving) insert into one
    wall-type contact body."""
    wall = case.base.wall
    nw = case.n_wall
    z = jnp.zeros((nw, 2), dtype=wall["Position"].dtype)
    return {
        "Position": jnp.concatenate(
            [wrap_positions(wall["Position"], case.eng.grid),
             wrap_positions(solid["Position"], case.eng.grid)], axis=0),
        "VolumetricMeasure": jnp.concatenate(
            [wall["VolumetricMeasure"], solid["VolumetricMeasure"]], axis=0),
        "AverageVelocity": jnp.concatenate(
            [z, solid["AverageVelocity"]], axis=0),
        "AverageAcceleration": jnp.concatenate(
            [z, solid["AverageAcceleration"]], axis=0),
        "NormalDirection": jnp.concatenate(
            [wall["NormalDirection"], solid["NormalDirection"]], axis=0),
    }


def _slot_all(case: BlockFSICase, flat: dict, valid, solid: dict):
    """Re-slot fluid + merged wall body; rebuild all window maps."""
    eng = case.eng
    flat = dict(flat)
    flat["Position"] = wrap_positions(flat["Position"], eng.grid)
    fb, bm_f = eng_mod.slot_fluid(eng, flat, valid, n_max=case.base.n_fluid)

    wstate = _merged_wall_state(case, solid)
    wall_b, bm_w, dm_w = eng_mod.build_wall_blocks(
        eng, wstate, case.c_max_wall, valid=case.wall_valid)
    nbr_wall = eng_mod.wall_windows(eng, bm_f, bm_w, dm_w)

    dm_f = dense_cell_map(bm_f.occ_cells, eng.grid.ncells, bm_f.c_max)
    sol_win = fsb.solid_windows(solid["Position"], eng.grid, bm_f, dm_f)
    overflow = bm_f.overflow | bm_w.overflow
    return fb, bm_f, wall_b, bm_w, nbr_wall, sol_win, overflow


_FLUID_EXTRA = ("ViscousForcePrev", "OriginalID")


def init_sim(case: BlockFSICase, fluid: dict, solid: dict) -> BlockFSISim:
    n = fluid["Position"].shape[0]
    flat = {k: fluid[k] for k in eng_mod.FLUID_FIELDS}
    flat["ViscousForcePrev"] = jnp.zeros_like(fluid["Velocity"])
    flat["OriginalID"] = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.arange(n) < fluid["NReal"]

    @jax.jit
    def do():
        return _slot_all(case, flat, valid, solid)

    fb, bm_f, wall_b, bm_w, nbr_wall, sol_win, ovf = do()
    dtype = fluid["Position"].dtype
    z32 = jnp.zeros((), jnp.int32)
    return BlockFSISim(fluid_b=fb, nbr_inner=bm_f.nbr_block,
                       nbr_wall=nbr_wall, wall_bm=bm_w, wall_b0=wall_b,
                       sol_win=sol_win, solid=dict(solid),
                       time=jnp.zeros((), dtype), n_adv=z32, n_ac=z32,
                       n_s=z32, overflow=ovf)


def inflow_velocity_b(fb, t, dl_sponge: float):
    """fsi2.inflow_velocity in block layout (fsi2.h:146-167)."""
    pos, vel = fb["Position"], fb["Velocity"]
    u_ave = jnp.where(t < T_REF,
                      0.5 * U_F * (1.0 - jnp.cos(jnp.pi * t / T_REF)), U_F)
    y_local = pos[..., 1] - DH / 2
    h = DH / 2
    vx_target = (1.5 * u_ave * (1.0 - y_local * y_local / (h * h))).astype(
        vel.dtype)
    in_buffer = (pos[..., 0] < 0.0) & (pos[..., 0] >= -dl_sponge - 1e-9) \
        & fb["SlotMask"]
    out = dict(fb)
    out["Velocity"] = jnp.stack(
        [jnp.where(in_buffer, vx_target, vel[..., 0]), vel[..., 1]], axis=-1)
    return out


def _advection_step(case: BlockFSICase, s: BlockFSISim) -> BlockFSISim:
    eng = case.eng
    base = case.base
    kernel, dim = base.kernel, 2
    h = base.adaptation.h
    fb, solid = s.fluid_b, s.solid
    n_occ = jnp.sum(jnp.any(fb["SlotMask"][:-1], axis=1).astype(jnp.int32))

    wc0 = eng_mod.make_wall_ctx(eng, s.wall_b0, s.nbr_wall, s.wall_bm,
                                n_occ=n_occ)
    dt_adv = eng_mod.advection_dt(eng, fb)
    fb = eng_mod.advection_prep(eng, fb, s.nbr_inner, wc0)

    # FSI viscous force on the insert + normal update (fsi2.cpp:216-219)
    solid = fsb.viscous_force_from_fluid_b(solid, fb, s.sol_win, kernel, dim,
                                           MU_F, h, box=eng.box)
    solid = fsi.update_elastic_normal_direction(solid)

    w0 = kernel.w0(dim)
    c0s = base.material_s.sound_speed

    def mid_cond(carry):
        _, _, rt, _, _ = carry
        return rt < dt_adv

    def mid_body(carry):
        f, so, rt, k_ac, k_s = carry
        # refresh moving-insert channels in the frozen wall slots
        wstate = _merged_wall_state(case, so)
        wall_b = eng_mod.refresh_wall_blocks(eng, s.wall_bm, wstate, s.wall_b0)
        wc = eng_mod.make_wall_ctx(eng, wall_b, s.nbr_wall, s.wall_bm,
                                   n_occ=n_occ)

        dt = eng_mod.acoustic_dt(eng, f, dt_adv)
        if eng.use_pallas:
            from sphinxsys_tpu.physics import fluid_blocks as fbops

            f = fbops.acoustic_step_1st_half_p2(
                f, s.nbr_inner, wc.wall_jt, wc.wflags, kernel, eng.eos,
                eng.riemann1, dt, tile_c=eng.tile_c,
                interpret=eng.pallas_interpret, box=eng.box,
                roll_y=eng.roll_y)
        else:
            from sphinxsys_tpu.physics import fluid_blocks as fbops

            f = fbops.acoustic_step_1st_half_b(
                f, s.nbr_inner, kernel, dim, eng.eos, eng.riemann1, dt,
                wall_b=wall_b, nbr_wall=s.nbr_wall, box=eng.box)
        so = fsb.pressure_force_from_fluid_b(so, f, s.sol_win, kernel, dim,
                                             eng.riemann1, box=eng.box)
        if eng.use_pallas:
            f = fbops.acoustic_step_2nd_half_p2(
                f, s.nbr_inner, wc.wall_jt, wc.wflags, kernel, eng.riemann2,
                dt, tile_c=eng.tile_c, interpret=eng.pallas_interpret,
                box=eng.box, roll_y=eng.roll_y)
        else:
            f = fbops.acoustic_step_2nd_half_b(
                f, s.nbr_inner, kernel, dim, eng.riemann2, dt,
                wall_b=wall_b, nbr_wall=s.nbr_wall, box=eng.box)

        # solid sub-cycling (fsi2.cpp:233-246)
        so = fsi.initialize_displacement(so)

        def s_cond(sc):
            _, ds_sum, _ = sc
            return ds_sum < dt

        def s_body(sc):
            so_i, ds_sum, k = sc
            dt_s = jnp.minimum(sd.solid_acoustic_time_step(so_i, c0s, h),
                               dt - ds_sum)
            so_i = sd.integration_1st_half_pk2(so_i, base.rp, base.material_s,
                                               dt_s, h, w0)
            so_i = sd.fix_constraint(so_i, base.base_mask)
            so_i = sd.integration_2nd_half(so_i, base.rp, dt_s)
            return (so_i, ds_sum + dt_s, k + 1)

        so, _, k_sub = jax.lax.while_loop(
            s_cond, s_body, (so, jnp.zeros_like(dt), jnp.zeros((), jnp.int32)))
        so = fsi.update_average_velocity_acceleration(so, dt)
        f = inflow_velocity_b(f, s.time + rt + dt, base.dl_sponge)
        return (f, so, rt + dt, k_ac + 1, k_s + k_sub)

    fb, solid, relax_t, n_ac, n_s_steps = jax.lax.while_loop(
        mid_cond, mid_body,
        (fb, solid, jnp.zeros_like(dt_adv), jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32)))

    flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
            for k in eng_mod.FLUID_FIELDS + _FLUID_EXTRA}
    valid = fb["SlotMask"].reshape(-1)
    fb2, bm_f, wall_b, bm_w, nbr_wall, sol_win, ovf = _slot_all(
        case, flat, valid, solid)

    return BlockFSISim(fluid_b=fb2, nbr_inner=bm_f.nbr_block,
                       nbr_wall=nbr_wall, wall_bm=bm_w, wall_b0=wall_b,
                       sol_win=sol_win, solid=solid,
                       time=s.time + relax_t, n_adv=s.n_adv + 1,
                       n_ac=s.n_ac + n_ac, n_s=s.n_s + n_s_steps,
                       overflow=s.overflow | ovf)


def make_run_chunk(case: BlockFSICase):
    @jax.jit
    def run_chunk(s: BlockFSISim, t_target) -> BlockFSISim:
        return jax.lax.while_loop(lambda st: st.time < t_target,
                                  lambda st: _advection_step(case, st), s)

    return run_chunk


def blocks_to_particles(case: BlockFSICase, s: BlockFSISim) -> dict:
    return eng_mod.blocks_to_particles(case.eng, s.fluid_b,
                                       case.base.n_fluid)


def tip_observer(case: BlockFSICase, solid: dict):
    """Reference-compatible tip observation (frozen initial weights) —
    delegates to the gather case's implementation (fsi2.cpp:46-48,103)."""
    return fsi2.tip_observer(case.base, solid)


def observe_tip(s: BlockFSISim, idx, weights):
    return jnp.sum(s.solid["Position"][idx] * weights[:, None], axis=0)
