"""2D dambreak on the cell-block engine (TPU hot path).

Same scene, constants and dual-criteria loop as cases/dambreak_2d.py
(reference: tests/2d_examples/test_2d_dambreak/Dambreak.cpp), but the
fluid state lives in occupied-cell block layout (neighbors/cell_blocks.py)
between rebuilds:

  * the per-advection-step re-slot IS the spatial sort (blocks are in
    cell order), so the reference's ParticleSortCK disappears;
  * every pair sweep is 9 dense (C, cap, cap) window passes — no per-pair
    gathers anywhere in the acoustic loop;
  * particle identity is carried as an OriginalID block field for IO.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.core.state import FAR_AWAY
from sphinxsys_tpu.neighbors.cell_blocks import (
    BlockMap, build_block_map, cross_neighbor_blocks, to_blocks,
    to_blocks_packed,
)
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.physics import riemann as rs

# block-field fill values for padding slots
_FILLS = {
    "Position": FAR_AWAY,
    "Density": db.RHO0_F,
    "Mass": 1.0,
    "VolumetricMeasure": 1.0,
}

_FLUID_FIELDS = ["Position", "Velocity", "Density", "Mass", "VolumetricMeasure",
                 "Pressure", "DensityChangeRate", "Force", "ForcePrior",
                 "DensitySummation"]


class BlockSim(NamedTuple):
    fluid_b: Any       # block state dict (incl. SlotMask, OriginalID)
    nbr_inner: Any     # (C_max, 9) int32
    nbr_wall: Any      # (C_max, 9) int32
    time: jnp.ndarray
    n_adv: jnp.ndarray
    n_ac: jnp.ndarray
    overflow: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BlockCase:
    base: db.DambreakCase
    wall_b: Any
    bm_wall: BlockMap
    cap: int
    c_max: int
    use_pallas: bool = False
    pallas_interpret: bool = False   # run the Pallas sweeps interpreted (CPU)
    tile_c: int = 256
    wall_dense_map: Any = None       # static wall cell->block lookup

    @property
    def grid(self):
        return self.base.grid

    @property
    def kernel(self):
        return self.base.kernel


def _slot_mask_2d(bm: BlockMap):
    """(C_max+1, cap) slot mask with an all-False sentinel row."""
    m = bm.slot_mask.reshape(bm.c_max, bm.cap)
    return jnp.concatenate([m, jnp.zeros((1, bm.cap), dtype=bool)], axis=0)


def build_case(dx: float = 0.025, dtype=jnp.float32, cap: int = 12,
               c_max: int | None = None, use_pallas: bool = False,
               pallas_interpret: bool = False, tile_c: int = 256):
    """`use_pallas=True` runs the acoustic pair sweeps as the fused
    transposed Pallas kernels (ops/pallas_block2.py); `pallas_interpret`
    runs them in interpreter mode for CPU tests."""
    base, fluid = db.build_case(dx=dx, dtype=dtype)

    def _round(n, m):
        return ((n + m - 1) // m) * m

    # fluid block count padded to the Pallas tile size (sweep grid tiles)
    # measured dambreak occupancy stays under n_fluid/6 occupied cells
    # through impact (max 12.5k at 80k particles, benchmarks PROGRESS.md);
    # n_fluid/5 leaves sloshing margin — the overflow flag guards the rest
    c_max = _round(c_max or max(base.n_fluid // 5, 256), tile_c)
    c_max_w = _round(max(base.n_wall // 4, 256), 32)

    # static wall blocks (jitted: eager remote-TPU dispatch is latency-bound)
    @jax.jit
    def _build_wall():
        bm_wall = build_block_map(base.wall["Position"], base.wall["NReal"],
                                  base.grid, cap=cap, c_max=c_max_w)
        wall_b = {k: to_blocks(bm_wall, base.wall[k], fill=_FILLS.get(k, 0.0))
                  for k in ["Position", "VolumetricMeasure", "Mass",
                            "AverageVelocity", "AverageAcceleration",
                            "NormalDirection"]}
        wall_b["SlotMask"] = _slot_mask_2d(bm_wall)
        return bm_wall, wall_b

    bm_wall, wall_b = _build_wall()
    wall_dense_map = jax.jit(lambda: __import__(
        'sphinxsys_tpu.neighbors.cell_blocks', fromlist=['dense_cell_map']
    ).dense_cell_map(bm_wall.occ_cells, base.grid.ncells, bm_wall.c_max))()

    case = BlockCase(base=base, wall_b=wall_b, bm_wall=bm_wall, cap=cap,
                     c_max=c_max, use_pallas=use_pallas,
                     pallas_interpret=pallas_interpret, tile_c=tile_c,
                     wall_dense_map=wall_dense_map)
    return case, fluid


def _slot_fluid(case: BlockCase, flat_fields: dict, valid):
    """(Re-)slot flat per-particle/per-slot arrays into fresh blocks."""
    bm = build_block_map(flat_fields["Position"], valid, case.grid,
                         cap=case.cap, c_max=case.c_max,
                         n_max=case.base.n_fluid, with_inverse=False)
    fills = dict(_FILLS)
    fills["OriginalID"] = jnp.iinfo(jnp.int32).max
    fb = to_blocks_packed(bm, flat_fields, fills)
    fb["SlotMask"] = _slot_mask_2d(bm)
    nbr_inner = bm.nbr_block
    nbr_wall = cross_neighbor_blocks(bm.occ_cells, case.grid, case.bm_wall,
                                     src_dense_map=case.wall_dense_map)
    return fb, nbr_inner, nbr_wall, bm.overflow


def init_sim(case: BlockCase, fluid: dict) -> BlockSim:
    n = fluid["Position"].shape[0]
    flat = {k: fluid[k] for k in _FLUID_FIELDS}
    flat["OriginalID"] = jnp.arange(n, dtype=jnp.int32)
    valid = jnp.arange(n) < fluid["NReal"]

    @jax.jit
    def do():
        return _slot_fluid(case, flat, valid)

    fb, nbr_inner, nbr_wall, ovf = do()
    dtype = fluid["Position"].dtype
    return BlockSim(fluid_b=fb, nbr_inner=nbr_inner, nbr_wall=nbr_wall,
                    time=jnp.zeros((), dtype), n_adv=jnp.zeros((), jnp.int32),
                    n_ac=jnp.zeros((), jnp.int32), overflow=ovf)


def _advection_step(case: BlockCase, s: BlockSim) -> BlockSim:
    base = case.base
    kernel, dim = base.kernel, 2
    h = base.adaptation.h
    sigma0 = base.adaptation.sigma0
    fb = s.fluid_b

    dt_adv = fbops.advection_time_step_b(fb, h, db.U_REF)
    if case.use_pallas:
        n_occ_cells = jnp.sum(jnp.any(s.fluid_b["SlotMask"][:-1], axis=1)
                              .astype(jnp.int32))
        wall_jt, wflags = fbops.pack_wall_t(
            case.wall_b, s.nbr_wall, case.bm_wall.c_max, case.tile_c,
            n_occ=n_occ_cells)
        fb = fbops.density_summation_p2(
            fb, s.nbr_inner, wall_jt, wflags, kernel, db.RHO0_F, sigma0,
            tile_c=case.tile_c, interpret=case.pallas_interpret)
    else:
        fb = fbops.density_summation_b(
            fb, s.nbr_inner, kernel, dim, db.RHO0_F, sigma0,
            contacts=[(case.wall_b, s.nbr_wall, db.RHO0_F)], free_surface=True)

    def ac_cond(carry):
        _, rt, _ = carry
        return rt < dt_adv

    def ac_body(carry):
        f, rt, k = carry
        dt = fbops.acoustic_time_step_b(f, base.eos, h)
        if case.use_pallas:
            f = fbops.acoustic_step_1st_half_p2(
                f, s.nbr_inner, wall_jt, wflags, kernel, base.eos,
                base.riemann, dt, tile_c=case.tile_c,
                interpret=case.pallas_interpret)
            f = fbops.acoustic_step_2nd_half_p2(
                f, s.nbr_inner, wall_jt, wflags, kernel, base.riemann, dt,
                tile_c=case.tile_c, interpret=case.pallas_interpret)
        else:
            f = fbops.acoustic_step_1st_half_b(
                f, s.nbr_inner, kernel, dim, base.eos, base.riemann, dt,
                wall_b=case.wall_b, nbr_wall=s.nbr_wall)
            f = fbops.acoustic_step_2nd_half_b(
                f, s.nbr_inner, kernel, dim, base.riemann, dt,
                wall_b=case.wall_b, nbr_wall=s.nbr_wall)
        return (f, rt + dt, k + 1)

    fb, relax_t, n_ac = jax.lax.while_loop(
        ac_cond, ac_body, (fb, jnp.zeros_like(dt_adv), jnp.zeros((), jnp.int32)))

    # re-slot (cell-order == spatial sort, every step)
    flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
            for k in _FLUID_FIELDS + ["OriginalID"]}
    valid = fb["SlotMask"].reshape(-1)
    fb2, nbr_inner, nbr_wall, ovf = _slot_fluid(case, flat, valid)

    return BlockSim(fluid_b=fb2, nbr_inner=nbr_inner, nbr_wall=nbr_wall,
                    time=s.time + relax_t, n_adv=s.n_adv + 1,
                    n_ac=s.n_ac + n_ac, overflow=s.overflow | ovf)


def make_run_chunk(case: BlockCase):
    @jax.jit
    def run_chunk(s: BlockSim, t_target) -> BlockSim:
        return jax.lax.while_loop(lambda st: st.time < t_target,
                                  lambda st: _advection_step(case, st), s)

    return run_chunk


def make_advection_step(case: BlockCase):
    @jax.jit
    def step(s: BlockSim) -> BlockSim:
        return _advection_step(case, s)

    return step


def blocks_to_particles(case: BlockCase, s: BlockSim, n: int) -> dict:
    """Recover per-particle arrays (by OriginalID) for IO/observation."""
    fb = s.fluid_b
    ids = fb["OriginalID"].reshape(-1)
    mask = fb["SlotMask"].reshape(-1)
    tgt = jnp.where(mask, jnp.minimum(ids, n - 1), n)
    out = {}
    for k in _FLUID_FIELDS:
        flat = fb[k].reshape((-1,) + fb[k].shape[2:])
        arr = jnp.zeros((n + 1,) + flat.shape[1:], dtype=flat.dtype)
        arr = arr.at[tgt].set(flat, mode="drop")
        out[k] = arr[:n]
    out["NReal"] = jnp.asarray(n, jnp.int32)
    return out
