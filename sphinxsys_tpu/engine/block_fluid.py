"""Case-agnostic cell-block WCSPH engine — the TPU fast path for EVERY
fluid case, not just the dambreak benchmark (VERDICT r2 item 1).

The reference's CK stack gives every wired physics op a device twin
(/root/reference/src/shared/shared_ck/particle_dynamics/fluid_dynamics/);
here the cell-block layout (neighbors/cell_blocks.py) plus the fused
transposed Pallas sweeps (ops/pallas_block2.py) play that role, and this
module is the case-agnostic glue:

  * `BlockEngine` — the static configuration (grid, kernel, EoS, Riemann
    solvers, viscosity, transport-velocity correction, periodicity,
    block capacities, Pallas on/off);
  * `slot_fluid` — (re-)slot flat particle fields into fresh cell blocks;
  * `build_wall_blocks` / `make_wall_ctx` — wall-type contact bodies
    (static walls, or moving solids seen as walls à la FSI);
  * `advection_prep` — density summation (+ viscous force + TVC);
  * `acoustic_step` — the two half-step pressure/density relaxations.

Cases compose these into their own advection step (inflow conditions,
FSI sub-cycling etc. slot between the pieces); see
cases/taylor_green_2d_block.py and cases/fsi2_block.py.

Periodic domains: the grid's periodic axes drive minimum-image wrapping
in both the XLA and Pallas sweeps; padding slots are parked FAR *and*
carry VolumetricMeasure = 0 (every pair term is proportional to dW*V_j,
which keeps padding inert even when the wrap folds FAR positions back
into range — ops/pallas_block2._make_wrap).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from sphinxsys_tpu.core.state import FAR_AWAY
from sphinxsys_tpu.neighbors.cell_blocks import (
    build_block_map, cross_neighbor_blocks, dense_cell_map, to_blocks,
    to_blocks_packed,
)
from sphinxsys_tpu.physics import fluid_blocks as fbops

# block-field fill values for padding slots: Vol = 0 keeps padding inert
# under periodic minimum-image wrap (see module docstring)
BASE_FILLS = {"Position": FAR_AWAY, "Mass": 1.0, "VolumetricMeasure": 0.0}

FLUID_FIELDS = ("Position", "Velocity", "Density", "Mass",
                "VolumetricMeasure", "Pressure", "DensityChangeRate",
                "Force", "ForcePrior", "DensitySummation")

WALL_FIELDS = ("Position", "VolumetricMeasure", "AverageVelocity",
               "AverageAcceleration", "NormalDirection")


class WallCtx(NamedTuple):
    """Wall-type contact bodies as the fluid sweeps see them: block state +
    window maps (+ the packed Pallas wall tensor when use_pallas)."""

    wall_b: Any       # block state dict (or None: no wall)
    nbr_wall: Any     # (C_fluid, 3^dim) int32 window block rows
    wall_jt: Any      # (9, 9, CAPW, C) transposed Pallas tensor (or None)
    wflags: Any       # per-tile scalar-prefetch flags
    wall_packed: Any = None   # compact (Cw+1, CAPW, CH) packing when the
                              # wall tensor is window-chunked (HBM regime)
    wall_cells: Any = None    # per-cell wall compaction (wall_compact_frac)
    wall_has: Any = None
    wflags_w: Any = None
    wall_ovf: Any = None      # compaction capacity overflow flag


@dataclasses.dataclass(frozen=True)
class BlockEngine:
    """Static engine configuration (hashable: closed over by jitted fns)."""

    grid: Any                 # CellGrid (shared by fluid and wall bodies)
    kernel: Any
    eos: Any
    riemann1: Any             # 1st-half (pressure) Riemann solver
    riemann2: Any             # 2nd-half (density) Riemann solver
    rho0: float
    sigma0: float
    h: float
    speed_ref: float
    dim: int = 2
    mu: float = 0.0           # Newtonian viscosity (0 = no viscous force)
    tvc_coef: float = 0.0     # transport-velocity correction (0 = off)
    tvc_limiter: float | None = None
    free_surface: bool = True
    cap: int = 12
    c_max: int = 0            # occupied-cell capacity (tile_c multiple)
    tile_c: int = 256
    use_pallas: bool = False
    pallas_interpret: bool = False
    cap_ac_dt: bool = True    # cap acoustic dt by the advection dt
    wall_static: bool = False  # fixed walls: drop vel/acc wall channels
                               # (Pallas path only; big HBM win in 3D)
    window_chunks: int = 1     # >1: never materialize the full inner
                               # j-window tensor (large-N HBM discipline)
    wall_chunks: int = 1       # >1: same for the WALL window tensor (the
                               # full form is ~10.8 GB at 4.1M particles)
    wall_compact_frac: float = 0.0  # >0: wall-side sweeps run only on the
                               # compacted wall-adjacent cells (~26% in the
                               # 3D dambreak; tile-level wflags fire on
                               # ~100% of tiles because every tile spans a
                               # z-column touching the tank floor)

    @property
    def box(self):
        return self.grid.periodic_lengths

    @property
    def roll_y(self) -> bool:
        """Window packing may use the sorted-order roll shortcut for the
        last axis only when that axis does not wrap."""
        p = self.grid.periodic
        return p is None or not p[-1]

    @property
    def fluid_fields(self):
        return FLUID_FIELDS + (("ViscousForcePrev",) if self.mu > 0.0 else ())

    @property
    def fills(self):
        f = dict(BASE_FILLS)
        f["Density"] = self.rho0
        f["OriginalID"] = jnp.iinfo(jnp.int32).max
        return f


def _slot_mask_2d(bm):
    m = bm.slot_mask.reshape(bm.c_max, bm.cap)
    return jnp.concatenate([m, jnp.zeros((1, bm.cap), dtype=bool)], axis=0)


def slot_fluid(eng: BlockEngine, flat: dict, valid, n_max: int | None = None):
    """(Re-)slot flat per-particle/per-slot arrays into fresh blocks.
    Returns (fb, bm): the block state (with SlotMask) and the BlockMap
    (its occ_cells feed wall window maps and solid->fluid lookups).
    Pass n_max = the particle capacity when re-slotting slot arrays
    (2-3x larger than the particle count) — it bounds the post-sort work.

    The field columns ride the block map's OWN sort and the blocks form
    by per-block-row CHUNK gathers (cell_blocks.build_block_map carry
    path): TPU gathers cost ~25-40 ns PER ROW regardless of width, so
    the old per-slot packed gather (c_max*cap rows) was the single most
    expensive stage of the 3D advection step (195 of 210 ms at 1M)."""
    fdtype = flat["Position"].dtype
    cols, meta = [], []
    for k, v in flat.items():
        if v.ndim == 1:
            cols.append(v.astype(fdtype))
            meta.append((k, None, v.dtype))
        else:
            for d in range(v.shape[1]):
                cols.append(v[:, d].astype(fdtype))
                meta.append((k, d, v.dtype))
    carry = jnp.stack(cols, axis=-1)
    bm, blocks = build_block_map(flat["Position"], valid, eng.grid,
                                 cap=eng.cap, c_max=eng.c_max, n_max=n_max,
                                 with_inverse=False, carry=carry)
    mask2 = bm.slot_mask.reshape(eng.c_max, eng.cap)
    fills = eng.fills
    fb = {}
    comp = {}
    for j, (k, d, dt) in enumerate(meta):
        col = blocks[..., j]
        if d is None:
            fill = fills.get(k, 0.0)
            fill = 0 if k == "OriginalID" else fill
            col = jnp.where(mask2, col, jnp.asarray(fill, fdtype))
            if k == "OriginalID":
                col = col.astype(dt)
                col = jnp.where(mask2, col, jnp.iinfo(jnp.int32).max)
            else:
                col = col.astype(dt)
            fb[k] = jnp.concatenate(
                [col, jnp.full((1, eng.cap), fills.get(k, 0.0), dt)
                 if k != "OriginalID" else
                 jnp.full((1, eng.cap), jnp.iinfo(jnp.int32).max, dt)],
                axis=0)
        else:
            comp.setdefault(k, {})[d] = col
    for k, dcols in comp.items():
        dim = len(dcols)
        fill = fills.get(k, 0.0)
        arr = jnp.stack([dcols[d] for d in range(dim)], axis=-1)
        arr = jnp.where(mask2[..., None], arr, jnp.asarray(fill, fdtype))
        arr = arr.astype(flat[k].dtype)
        sent = jnp.full((1, eng.cap, dim), fill, flat[k].dtype)
        fb[k] = jnp.concatenate([arr, sent], axis=0)
    fb["SlotMask"] = _slot_mask_2d(bm)
    return fb, bm


def build_wall_blocks(eng: BlockEngine, wall_state: dict, c_max_wall: int,
                      fields=WALL_FIELDS, valid=None):
    """Slot a wall-type contact body into blocks on the engine grid.
    Returns (wall_b, bm_wall, dense_map).  For moving wall-type bodies
    (FSI solids) call this per advection step and `refresh_wall_blocks`
    per acoustic iteration."""
    n = wall_state["Position"].shape[0]
    if valid is None:
        valid = jnp.arange(n) < wall_state.get("NReal", n)
    bm = build_block_map(wall_state["Position"], valid, eng.grid,
                         cap=eng.cap, c_max=c_max_wall)
    wall_b = {k: to_blocks(bm, wall_state[k], fill=BASE_FILLS.get(k, 0.0))
              for k in fields if k in wall_state}
    wall_b["SlotMask"] = _slot_mask_2d(bm)
    dm = dense_cell_map(bm.occ_cells, eng.grid.ncells, bm.c_max)
    return wall_b, bm, dm


def refresh_wall_blocks(eng: BlockEngine, bm_wall, wall_state: dict,
                        wall_b: dict, fields=("Position", "AverageVelocity",
                                              "AverageAcceleration",
                                              "NormalDirection")):
    """Re-gather updated per-particle wall channels into the FIXED slots of
    an existing wall block map (moving FSI solids: slots freeze per
    advection step, kinematics change per acoustic iteration)."""
    out = dict(wall_b)
    for k in fields:
        if k in wall_state:
            out[k] = to_blocks(bm_wall, wall_state[k],
                               fill=BASE_FILLS.get(k, 0.0))
    return out


def wall_windows(eng: BlockEngine, bm_fluid, bm_wall, wall_dense_map):
    """(C_fluid, 3^dim) window block rows into the wall body's blocks."""
    return cross_neighbor_blocks(bm_fluid.occ_cells, eng.grid, bm_wall,
                                 src_dense_map=wall_dense_map)


def make_wall_ctx(eng: BlockEngine, wall_b, nbr_wall, bm_wall,
                  n_occ=None) -> WallCtx:
    """Pack the wall tensor for the Pallas sweeps (or pass-through for the
    XLA block path)."""
    if not eng.use_pallas:
        return WallCtx(wall_b, nbr_wall, None, None)
    if eng.wall_compact_frac > 0.0:
        c_w = round_to(max(int(eng.c_max * eng.wall_compact_frac),
                           eng.tile_c), eng.tile_c)
        wall_cells, nbr_sub, _, wall_has, n_w = fbops.compact_wall_ctx(
            nbr_wall, bm_wall.c_max, c_w, eng.tile_c)
        wall_jt, wflags_w = fbops.pack_wall_t(
            wall_b, nbr_sub, bm_wall.c_max, eng.tile_c, n_occ=n_w,
            wall_static=eng.wall_static)
        from sphinxsys_tpu.ops import pallas_block2 as _pb2
        wflags = _pb2.wall_flags(nbr_wall, bm_wall.c_max, eng.tile_c,
                                 n_occ=n_occ)
        return WallCtx(wall_b, nbr_wall, wall_jt, wflags,
                       wall_cells=wall_cells, wall_has=wall_has,
                       wflags_w=wflags_w, wall_ovf=n_w > c_w)
    if eng.wall_chunks > 1:
        packed = fbops.pack_wall_channels(wall_b, wall_static=eng.wall_static)
        from sphinxsys_tpu.ops import pallas_block2 as _pb2
        wflags = _pb2.wall_flags(nbr_wall, bm_wall.c_max, eng.tile_c,
                                 n_occ=n_occ)
        return WallCtx(wall_b, nbr_wall, None, wflags, wall_packed=packed)
    wall_jt, wflags = fbops.pack_wall_t(wall_b, nbr_wall, bm_wall.c_max,
                                        eng.tile_c, n_occ=n_occ,
                                        wall_static=eng.wall_static)
    return WallCtx(wall_b, nbr_wall, wall_jt, wflags)


def null_wall_ctx(eng: BlockEngine, n_occ=None) -> WallCtx:
    """Wall context for cases without wall contact (e.g. periodic boxes).
    The Pallas tensor is a 1-slot dummy; wflags = 0 (occupied, wall-free)
    or -1 (tile beyond the occupied range, skipped outright)."""
    if not eng.use_pallas:
        return WallCtx(None, None, None, None)
    n_tiles = eng.c_max // eng.tile_c
    nw = 3 ** eng.dim
    chw = 2 * eng.dim + 1 if eng.wall_static else 3 * eng.dim + 1
    wall_jt = jnp.zeros((nw, chw, 1, eng.c_max), jnp.float32)
    flags = jnp.zeros((n_tiles,), jnp.int32)
    if n_occ is not None:
        tile_start = jnp.arange(n_tiles, dtype=jnp.int32) * eng.tile_c
        flags = jnp.where(tile_start < n_occ, flags, jnp.int32(-1))
    return WallCtx(None, None, wall_jt, flags)


def _jnp_walls(wc: WallCtx):
    return [(wc.wall_b, wc.nbr_wall)] if wc.wall_b is not None else []


def advection_prep(eng: BlockEngine, fb, nbr_inner, wc: WallCtx):
    """Density summation (+ viscous force + transport-velocity correction
    as configured) — the per-advection-step prep stage of the reference's
    dual-criteria loop (SURVEY.md §3.2)."""
    if eng.use_pallas:
        fb = fbops.density_summation_p2(
            fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.rho0,
            eng.sigma0, tile_c=eng.tile_c, interpret=eng.pallas_interpret,
            free_surface=eng.free_surface, box=eng.box, roll_y=eng.roll_y,
            dim=eng.dim, wall_static=eng.wall_static,
            window_chunks=eng.window_chunks, wall_packed=wc.wall_packed,
            nbr_wall=wc.nbr_wall, wall_chunks=eng.wall_chunks)
        if eng.mu > 0.0 or eng.tvc_coef > 0.0:
            fb = fbops.visc_tvc_p2(
                fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.dim,
                eng.mu, eng.h, tvc_coefficient=eng.tvc_coef,
                tvc_limiter_slope=eng.tvc_limiter, tile_c=eng.tile_c,
                interpret=eng.pallas_interpret, box=eng.box,
                roll_y=eng.roll_y, do_viscous=eng.mu > 0.0,
                do_tvc=eng.tvc_coef > 0.0, wall_static=eng.wall_static,
                window_chunks=eng.window_chunks, wall_packed=wc.wall_packed,
                nbr_wall=wc.nbr_wall, wall_chunks=eng.wall_chunks)
        return fb

    contacts = []
    if wc.wall_b is not None:
        # wall contact via the V = m/rho0 identity: sum W V0_k equals the
        # reference's sum W m_k/rho0_k for any per-body rho0 (so merged
        # wall+solid contact bodies work with one term)
        proxy = {"Position": wc.wall_b["Position"],
                 "Mass": wc.wall_b["VolumetricMeasure"],
                 "SlotMask": wc.wall_b["SlotMask"]}
        contacts = [(proxy, wc.nbr_wall, 1.0)]
    fb = fbops.density_summation_b(fb, nbr_inner, eng.kernel, eng.dim,
                                   eng.rho0, eng.sigma0, contacts=contacts,
                                   free_surface=eng.free_surface, box=eng.box)
    walls = _jnp_walls(wc)
    if eng.mu > 0.0:
        fb = fbops.viscous_force_b(fb, nbr_inner, eng.kernel, eng.dim, eng.mu,
                                   eng.h, walls=walls, box=eng.box)
    if eng.tvc_coef > 0.0:
        fb = fbops.transport_velocity_correction_b(
            fb, nbr_inner, eng.kernel, eng.dim, eng.h,
            coefficient=eng.tvc_coef, limiter_slope=eng.tvc_limiter,
            walls=walls, box=eng.box)
    return fb


def advection_dt(eng: BlockEngine, fb):
    if eng.mu > 0.0:
        return fbops.advection_viscous_time_step_b(fb, eng.h, eng.speed_ref,
                                                   eng.rho0, eng.mu)
    return fbops.advection_time_step_b(fb, eng.h, eng.speed_ref)


def acoustic_dt(eng: BlockEngine, fb, dt_adv=None):
    dt = fbops.acoustic_time_step_b(fb, eng.eos, eng.h)
    if eng.cap_ac_dt and dt_adv is not None:
        dt = jnp.minimum(dt, dt_adv)
    return dt


def acoustic_step(eng: BlockEngine, fb, nbr_inner, wc: WallCtx, dt,
                  between=None):
    """Both half-steps of the pressure/density relaxation
    (fluid_integration.hpp; physics/fluid_blocks.py for the math).
    `between` (optional, fb -> fb) runs between the halves — the
    distributed wrapper re-exchanges ghost values there (the 2nd half
    reads the 1st half's velocities)."""
    if eng.use_pallas:
        fb = fbops.acoustic_step_1st_half_p2(
            fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.eos,
            eng.riemann1, dt, tile_c=eng.tile_c,
            interpret=eng.pallas_interpret, box=eng.box, roll_y=eng.roll_y,
            dim=eng.dim, wall_static=eng.wall_static,
            window_chunks=eng.window_chunks, wall_packed=wc.wall_packed,
            nbr_wall=wc.nbr_wall, wall_chunks=eng.wall_chunks,
            wall_cells=wc.wall_cells, wall_has=wc.wall_has,
            wflags_w=wc.wflags_w)
        if between is not None:
            fb = between(fb)
        fb = fbops.acoustic_step_2nd_half_p2(
            fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.riemann2,
            dt, tile_c=eng.tile_c, interpret=eng.pallas_interpret,
            box=eng.box, roll_y=eng.roll_y, dim=eng.dim,
            wall_static=eng.wall_static,
            window_chunks=eng.window_chunks, wall_packed=wc.wall_packed,
            nbr_wall=wc.nbr_wall, wall_chunks=eng.wall_chunks,
            wall_cells=wc.wall_cells, wall_has=wc.wall_has,
            wflags_w=wc.wflags_w)
        return fb
    walls = _jnp_walls(wc)
    wall_b = walls[0][0] if walls else None
    nbr_w = walls[0][1] if walls else None
    fb = fbops.acoustic_step_1st_half_b(
        fb, nbr_inner, eng.kernel, eng.dim, eng.eos, eng.riemann1, dt,
        wall_b=wall_b, nbr_wall=nbr_w, box=eng.box)
    if between is not None:
        fb = between(fb)
    fb = fbops.acoustic_step_2nd_half_b(
        fb, nbr_inner, eng.kernel, eng.dim, eng.riemann2, dt,
        wall_b=wall_b, nbr_wall=nbr_w, box=eng.box)
    return fb


def acoustic_first_half(eng: BlockEngine, fb, nbr_inner, wc: WallCtx, dt):
    """1st half only (pressure relaxation) — for loops that couple other
    bodies between the halves (FSI)."""
    if eng.use_pallas:
        return fbops.acoustic_step_1st_half_p2(
            fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.eos,
            eng.riemann1, dt, tile_c=eng.tile_c,
            interpret=eng.pallas_interpret, box=eng.box, roll_y=eng.roll_y,
            dim=eng.dim, wall_static=eng.wall_static,
            window_chunks=eng.window_chunks, wall_packed=wc.wall_packed,
            nbr_wall=wc.nbr_wall, wall_chunks=eng.wall_chunks,
            wall_cells=wc.wall_cells, wall_has=wc.wall_has,
            wflags_w=wc.wflags_w)
    walls = _jnp_walls(wc)
    wall_b = walls[0][0] if walls else None
    nbr_w = walls[0][1] if walls else None
    return fbops.acoustic_step_1st_half_b(
        fb, nbr_inner, eng.kernel, eng.dim, eng.eos, eng.riemann1, dt,
        wall_b=wall_b, nbr_wall=nbr_w, box=eng.box)


def acoustic_second_half(eng: BlockEngine, fb, nbr_inner, wc: WallCtx, dt):
    if eng.use_pallas:
        return fbops.acoustic_step_2nd_half_p2(
            fb, nbr_inner, wc.wall_jt, wc.wflags, eng.kernel, eng.riemann2,
            dt, tile_c=eng.tile_c, interpret=eng.pallas_interpret,
            box=eng.box, roll_y=eng.roll_y, dim=eng.dim,
            wall_static=eng.wall_static, window_chunks=eng.window_chunks,
            wall_packed=wc.wall_packed, nbr_wall=wc.nbr_wall,
            wall_chunks=eng.wall_chunks, wall_cells=wc.wall_cells,
            wall_has=wc.wall_has, wflags_w=wc.wflags_w)
    walls = _jnp_walls(wc)
    wall_b = walls[0][0] if walls else None
    nbr_w = walls[0][1] if walls else None
    return fbops.acoustic_step_2nd_half_b(
        fb, nbr_inner, eng.kernel, eng.dim, eng.riemann2, dt,
        wall_b=wall_b, nbr_wall=nbr_w, box=eng.box)


def blocks_to_particles(eng: BlockEngine, fb, n: int, fields=None) -> dict:
    """Recover per-particle arrays (by OriginalID) for IO/observation."""
    fields = fields or eng.fluid_fields
    ids = fb["OriginalID"].reshape(-1)
    mask = fb["SlotMask"].reshape(-1)
    tgt = jnp.where(mask, jnp.minimum(ids, n - 1), n)
    out = {}
    for k in fields:
        flat = fb[k].reshape((-1,) + fb[k].shape[2:])
        arr = jnp.zeros((n + 1,) + flat.shape[1:], dtype=flat.dtype)
        arr = arr.at[tgt].set(flat, mode="drop")
        out[k] = arr[:n]
    out["NReal"] = jnp.asarray(n, jnp.int32)
    return out


def round_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
