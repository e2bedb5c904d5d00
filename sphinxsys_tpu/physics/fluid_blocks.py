"""WCSPH fluid ops in cell-block layout — the TPU hot path.

Same physics as physics/fluid.py (fluid_integration.hpp — see that module
for the scheme and reference citations), reformulated on the cell-block
engine (neighbors/cell_blocks.py): state arrays live in occupied-cell
blocks (C+1, cap, ...) and every pair sweep is a loop over the 3^dim
window offsets of dense (C, cap_i, cap_j) broadcast ops — no per-pair
gathers.

Performance notes (measured on TPU v5e):
  * all per-window source data is packed into ONE (C+1, cap, ch) tensor so
    each window costs a single row-granularity gather instead of one per
    field;
  * padding slots are masked explicitly (their positions are parked FAR,
    but a periodic minimum-image wrap would fold FAR back into range).

A "block state" is a dict with the usual variable names holding block
arrays, plus the key "SlotMask" ((C+1, cap) bool).
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp

from sphinxsys_tpu.neighbors.cell_list import CellGrid
from sphinxsys_tpu.neighbors.cell_blocks import BlockMap

TINY = 1.0e-15


def _window_offsets(dim: int):
    return list(itertools.product(*([(-1, 0, 1)] * dim)))


def _center_index(dim: int) -> int:
    return _window_offsets(dim).index((0,) * dim)


def _min_image(disp, box):
    if box is None or not any(b > 0 for b in box):
        return disp
    L = jnp.asarray(box, dtype=disp.dtype)
    safe_L = jnp.where(L > 0, L, 1.0)
    return jnp.where(L > 0, disp - L * jnp.round(disp / safe_L), disp)


def pack_channels(*arrays):
    """Pack (C+1, cap) / (C+1, cap, d) arrays into one (C+1, cap, ch)."""
    cols = [a if a.ndim == 3 else a[..., None] for a in arrays]
    return jnp.concatenate(cols, axis=-1)


def _pair_geom(pos_i, mask_i, pos_j, mask_j, w, kernel, dim, box, exclude_self):
    """(C, capi, capj) pair geometry given gathered j positions."""
    c = pos_j.shape[0]
    disp = pos_i[:c, :, None, :] - pos_j[:, None, :, :]
    disp = _min_image(disp, box)
    r2 = jnp.sum(disp * disp, axis=-1)
    r = jnp.sqrt(r2 + TINY)
    e = disp / (r[..., None] + TINY)
    mask = mask_i[:c, :, None] & mask_j[:, None, :]
    if exclude_self and w == _center_index(dim):
        capi = pos_i.shape[1]
        eye = jnp.eye(capi, dtype=bool)
        mask = mask & ~eye[None, :, :]
    return r, e, mask


# ---------------------------------------------------------------------------
# reduces over block arrays
# ---------------------------------------------------------------------------

def _masked(x, mask, fill):
    return jnp.where(mask, x, fill)


def acoustic_time_step_b(fb, eos, h_min: float, cfl: float = 0.6):
    c = eos.sound_speed(fb["Pressure"], fb["Density"])
    speed = jnp.linalg.norm(fb["Velocity"], axis=-1)
    reduced = jnp.max(_masked(c + speed, fb["SlotMask"], 0.0))
    return cfl * h_min / (reduced + TINY)


def advection_time_step_b(fb, h_min: float, speed_ref: float, cfl: float = 0.25):
    accel_scale = 4.0 * h_min * jnp.linalg.norm(
        fb["Force"] + fb["ForcePrior"], axis=-1) / jnp.maximum(fb["Mass"], TINY)
    v2 = jnp.sum(fb["Velocity"] ** 2, axis=-1)
    reduced = jnp.max(_masked(jnp.maximum(v2, accel_scale), fb["SlotMask"], 0.0))
    return cfl * h_min / (jnp.maximum(jnp.sqrt(reduced), speed_ref) + TINY)


# ---------------------------------------------------------------------------
# density summation (block form)
# ---------------------------------------------------------------------------

def density_summation_b(fb, nbr_inner, kernel, dim: int, rho0: float,
                        sigma0: float, contacts: Sequence[tuple] = (),
                        free_surface: bool = True, box=None):
    """contacts: sequence of (contact_block_state, nbr_block_contact,
    contact_rho0)."""
    pos, mask = fb["Position"], fb["SlotMask"]
    c = nbr_inner.shape[0]
    n_w = len(_window_offsets(dim))
    sigma = jnp.full(pos.shape[:2], kernel.w0(dim), dtype=pos.dtype)[:c]
    fmaskd = mask.astype(pos.dtype)
    for w in range(n_w):
        j = nbr_inner[:, w]
        r, e, m = _pair_geom(pos, mask, pos[j], mask[j], w, kernel, dim, box, True)
        W = kernel.W(r, dim) * m.astype(r.dtype)
        sigma = sigma + jnp.sum(W, axis=2)
    rho_sum = sigma * rho0 / sigma0

    for cb, nbr_c, c_rho0 in contacts:
        packed = pack_channels(cb["Position"], cb["Mass"])
        contact_sum = jnp.zeros_like(rho_sum)
        for w in range(n_w):
            j = nbr_c[:, w]
            pj = packed[j]
            r, e, m = _pair_geom(pos, mask, pj[..., :dim], cb["SlotMask"][j],
                                 w, kernel, dim, box, False)
            W = kernel.W(r, dim) * m.astype(r.dtype)
            contact_sum = contact_sum + jnp.sum(
                W * pj[..., dim][:, None, :] / c_rho0, axis=2)
        rho_sum = rho_sum + contact_sum * rho0 * rho0 / sigma0 / jnp.maximum(
            fb["Mass"][:c], TINY)

    out = dict(fb)
    pad = fb["Density"][c:]
    if free_surface:
        out["Density"] = jnp.concatenate([jnp.maximum(rho_sum, rho0), pad], axis=0)
    else:
        out["Density"] = jnp.concatenate([rho_sum, pad], axis=0)
        out["VolumetricMeasure"] = jnp.where(
            fb["SlotMask"], fb["Mass"] / jnp.maximum(out["Density"], TINY),
            fb["VolumetricMeasure"])
    out["DensitySummation"] = jnp.concatenate([rho_sum, pad], axis=0)
    return out


# ---------------------------------------------------------------------------
# acoustic steps (block form, channel-packed window gathers)
# ---------------------------------------------------------------------------

def acoustic_step_1st_half_b(fb, nbr_inner, kernel, dim: int, eos, riemann, dt,
                             wall_b=None, nbr_wall=None, wall_riemann=None,
                             box=None):
    out = dict(fb)
    mask = fb["SlotMask"]
    rho = jnp.where(mask, fb["Density"] + fb["DensityChangeRate"] * (0.5 * dt),
                    fb["Density"])
    p = eos.pressure(rho)
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]
    n_w = len(_window_offsets(dim))

    packed = pack_channels(pos, p, vol)  # (C+1, cap, dim+2)
    force = jnp.zeros_like(fb["Velocity"][:c])
    rho_diss = jnp.zeros(p.shape[:2], dtype=p.dtype)[:c]
    for w in range(n_w):
        j = nbr_inner[:, w]
        pj = packed[j]
        r, e, m = _pair_geom(pos, mask, pj[..., :dim], mask[j], w, kernel,
                             dim, box, True)
        fm = m.astype(r.dtype)
        dW = kernel.dW(r, dim) * fm
        p_j = pj[..., dim][:, None, :]
        vol_j = pj[..., dim + 1][:, None, :]
        dWV = dW * vol_j
        force = force - jnp.sum(
            (p[:c, :, None] + p_j)[..., None] * dWV[..., None] * e, axis=2)
        rho_diss = rho_diss + jnp.sum(
            riemann.dissipative_u_jump(p[:c, :, None] - p_j) * dWV, axis=2)

    if wall_b is not None:
        wr = wall_riemann or riemann
        acc_prior = fb["ForcePrior"] / jnp.maximum(fb["Mass"], TINY)[..., None]
        wpacked = pack_channels(wall_b["Position"], wall_b["VolumetricMeasure"],
                                wall_b["AverageAcceleration"])
        for w in range(n_w):
            j = nbr_wall[:, w]
            pj = wpacked[j]
            r, e, m = _pair_geom(pos, mask, pj[..., :dim], wall_b["SlotMask"][j],
                                 w, kernel, dim, box, False)
            fm = m.astype(r.dtype)
            dW = kernel.dW(r, dim) * fm
            wall_vol = pj[..., dim][:, None, :]
            wall_acc = pj[..., dim + 1:2 * dim + 1][:, None, :, :]
            dWV = dW * wall_vol
            face_acc = jnp.sum(
                (acc_prior[:c, :, None, :] - wall_acc) * (-e), axis=-1)
            p_in_wall = p[:c, :, None] + rho[:c, :, None] * r * jnp.maximum(face_acc, 0.0)
            force = force - jnp.sum(
                (p[:c, :, None] + p_in_wall)[..., None] * dWV[..., None] * e, axis=2)
            rho_diss = rho_diss + jnp.sum(
                wr.dissipative_u_jump(p[:c, :, None] - p_in_wall) * dWV, axis=2)

    pad_v = fb["Force"][c:]
    force_total = fb["Force"] + jnp.concatenate(
        [force * vol[:c][..., None], jnp.zeros_like(pad_v)], axis=0)
    drho_dt = jnp.concatenate(
        [rho_diss * rho[:c], fb["DensityChangeRate"][c:]], axis=0)
    vel = fb["Velocity"] + jnp.where(
        mask[..., None],
        (fb["ForcePrior"] + force_total) / jnp.maximum(fb["Mass"], TINY)[..., None] * dt,
        0.0)
    out.update({"Density": rho, "Pressure": p, "Position": pos,
                "Force": force_total, "DensityChangeRate": drho_dt, "Velocity": vel})
    return out


def acoustic_step_2nd_half_b(fb, nbr_inner, kernel, dim: int, riemann, dt,
                             wall_b=None, nbr_wall=None, wall_riemann=None,
                             box=None):
    out = dict(fb)
    mask = fb["SlotMask"]
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vel = fb["Velocity"]
    rho = fb["Density"]
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]
    n_w = len(_window_offsets(dim))

    packed = pack_channels(pos, vel, vol)  # (C+1, cap, 2 dim + 1)
    dcr = jnp.zeros(rho.shape[:2], dtype=rho.dtype)[:c]
    p_diss = jnp.zeros_like(vel[:c])
    for w in range(n_w):
        j = nbr_inner[:, w]
        pj = packed[j]
        r, e, m = _pair_geom(pos, mask, pj[..., :dim], mask[j], w, kernel,
                             dim, box, True)
        fm = m.astype(r.dtype)
        dW = kernel.dW(r, dim) * fm
        vel_j = pj[..., dim:2 * dim][:, None, :, :]
        vol_j = pj[..., 2 * dim][:, None, :]
        dWV = dW * vol_j
        u_jump = jnp.sum((vel[:c, :, None, :] - vel_j) * e, axis=-1)
        dcr = dcr + jnp.sum(u_jump * dWV, axis=2)
        p_diss = p_diss + jnp.sum(
            (riemann.dissipative_p_jump(u_jump) * dWV)[..., None] * e, axis=2)

    force = p_diss * vol[:c][..., None]

    if wall_b is not None:
        wr = wall_riemann or riemann
        wpacked = pack_channels(wall_b["Position"], wall_b["VolumetricMeasure"],
                                wall_b["AverageVelocity"], wall_b["NormalDirection"])
        for w in range(n_w):
            j = nbr_wall[:, w]
            pj = wpacked[j]
            r, e, m = _pair_geom(pos, mask, pj[..., :dim], wall_b["SlotMask"][j],
                                 w, kernel, dim, box, False)
            fm = m.astype(r.dtype)
            dW = kernel.dW(r, dim) * fm
            wall_vol = pj[..., dim][:, None, :]
            vel_ave = pj[..., dim + 1:2 * dim + 1][:, None, :, :]
            n_k = pj[..., 2 * dim + 1:3 * dim + 1][:, None, :, :]
            dWV = dW * wall_vol
            e_dot_n = jnp.sum(e * n_k, axis=-1)
            face_n = jnp.sign(e_dot_n)[..., None] * n_k
            vel_in_wall = 2.0 * vel_ave - vel[:c, :, None, :]
            dcr = dcr + jnp.sum(jnp.sum(
                (vel[:c, :, None, :] - vel_in_wall) * e, axis=-1) * dWV, axis=2)
            u_jump_w = 2.0 * jnp.sum(
                (vel[:c, :, None, :] - vel_ave) * face_n, axis=-1)
            force = force + jnp.sum(
                (wr.dissipative_p_jump(u_jump_w) * dWV)[..., None] * face_n,
                axis=2) * vol[:c][..., None]

    drho_dt = fb["DensityChangeRate"] + jnp.concatenate(
        [dcr * rho[:c], jnp.zeros_like(rho[c:])], axis=0)
    force_full = jnp.concatenate([force, jnp.zeros_like(vel[c:])], axis=0)
    rho_new = jnp.where(mask, rho + drho_dt * (0.5 * dt), rho)
    out.update({"Position": pos, "DensityChangeRate": drho_dt,
                "Force": force_full, "Density": rho_new})
    return out


# ---------------------------------------------------------------------------
# Pallas-backed acoustic steps (2D, Wendland C2, non-periodic): the window
# sweeps run as fused lane-aligned kernels (ops/pallas_sweep.py); the
# init/update stages stay in jnp.
# ---------------------------------------------------------------------------

def pack_wall_ac1(wall_b):
    """Static wall tensor for the 1st-half Pallas wall sweep."""
    import jax.numpy as jnp

    m = wall_b["SlotMask"].astype(wall_b["VolumetricMeasure"].dtype)
    z = jnp.zeros_like(m)
    return jnp.stack([wall_b["Position"][..., 0], wall_b["Position"][..., 1],
                      wall_b["VolumetricMeasure"],
                      wall_b["AverageAcceleration"][..., 0],
                      wall_b["AverageAcceleration"][..., 1], m, z, z], axis=-1)


def pack_wall_ac2(wall_b):
    """Static wall tensor for the 2nd-half Pallas wall sweep."""
    import jax.numpy as jnp

    m = wall_b["SlotMask"].astype(wall_b["VolumetricMeasure"].dtype)
    return jnp.stack([wall_b["Position"][..., 0], wall_b["Position"][..., 1],
                      wall_b["VolumetricMeasure"],
                      wall_b["AverageVelocity"][..., 0],
                      wall_b["AverageVelocity"][..., 1],
                      wall_b["NormalDirection"][..., 0],
                      wall_b["NormalDirection"][..., 1], m], axis=-1)


def acoustic_step_1st_half_pallas(fb, nbr_inner, kernel, eos, riemann, dt,
                                  wall_packed=None, nbr_wall=None,
                                  tile_c: int = 32, interpret: bool = False):
    """Pallas variant of acoustic_step_1st_half_b (2D WendlandC2 only)."""
    from sphinxsys_tpu.ops import pallas_sweep as ps

    out = dict(fb)
    mask = fb["SlotMask"]
    rho = jnp.where(mask, fb["Density"] + fb["DensityChangeRate"] * (0.5 * dt),
                    fb["Density"])
    p = eos.pressure(rho)
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]

    packed = ps.pack_state_2d(pos, fb["Velocity"], p, vol, mask)
    force, rd = ps.ac1_inner_sweep(
        packed, nbr_inner, kernel_h=kernel.h, factor_w=kernel._factor_w(2),
        inv_rho0c0_ave=riemann.inv_rho0c0_ave, tile_c=tile_c,
        interpret=interpret)

    if wall_packed is not None:
        acc_prior = fb["ForcePrior"] / jnp.maximum(fb["Mass"], TINY)[..., None]
        fm = mask.astype(p.dtype)
        zi = jnp.zeros_like(p)
        packed_i = jnp.stack([pos[..., 0], pos[..., 1], p, rho,
                              acc_prior[..., 0], acc_prior[..., 1], fm, zi],
                             axis=-1)
        force_w, rd_w = ps.ac1_wall_sweep(
            packed_i, wall_packed, nbr_wall, kernel_h=kernel.h,
            factor_w=kernel._factor_w(2),
            inv_rho0c0_ave=riemann.inv_rho0c0_ave, tile_c=tile_c,
            interpret=interpret)
        force = force + force_w
        rd = rd + rd_w

    pad_v = fb["Force"][c:]
    force_total = fb["Force"] + jnp.concatenate(
        [force * vol[:c][..., None], jnp.zeros_like(pad_v)], axis=0)
    drho_dt = jnp.concatenate([rd * rho[:c], fb["DensityChangeRate"][c:]], axis=0)
    vel = fb["Velocity"] + jnp.where(
        mask[..., None],
        (fb["ForcePrior"] + force_total) / jnp.maximum(fb["Mass"], TINY)[..., None] * dt,
        0.0)
    out.update({"Density": rho, "Pressure": p, "Position": pos,
                "Force": force_total, "DensityChangeRate": drho_dt, "Velocity": vel})
    return out


def acoustic_step_2nd_half_pallas(fb, nbr_inner, kernel, riemann, dt,
                                  wall_packed=None, nbr_wall=None,
                                  tile_c: int = 32, interpret: bool = False):
    """Pallas variant of acoustic_step_2nd_half_b (2D WendlandC2 only).
    Inner uses `riemann` (its limiter/geo coefficients); the wall term uses
    the same solver, matching the reference aliases."""
    from sphinxsys_tpu.ops import pallas_sweep as ps

    out = dict(fb)
    mask = fb["SlotMask"]
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vel = fb["Velocity"]
    rho = fb["Density"]
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]

    packed = ps.pack_state_2d(pos, vel, fb["Pressure"], vol, mask)
    from sphinxsys_tpu.physics.riemann import (
        AcousticRiemannSolver, DissipativeRiemannSolver)

    if isinstance(riemann, DissipativeRiemannSolver):
        geo, limiter = riemann.rho0c0_geo_ave, 1.0e30  # NoLimiter == 1
    elif isinstance(riemann, AcousticRiemannSolver):
        geo, limiter = riemann.rho0c0_geo_ave, riemann.limiter_coeff
    else:  # NoRiemannSolver: no pressure dissipation
        geo, limiter = 0.0, 1.0
    dcr, pdiss = ps.ac2_inner_sweep(
        packed, nbr_inner, kernel_h=kernel.h, factor_w=kernel._factor_w(2),
        rho0c0_geo=geo, inv_c0=riemann.inv_c0_ave, limiter_coeff=limiter,
        tile_c=tile_c, interpret=interpret)

    if wall_packed is not None:
        fm = mask.astype(rho.dtype)
        zi = jnp.zeros_like(rho)
        packed_i = jnp.stack([pos[..., 0], pos[..., 1], vel[..., 0],
                              vel[..., 1], fm, zi, zi, zi], axis=-1)
        dcr_w, pdiss_w = ps.ac2_wall_sweep(
            packed_i, wall_packed, nbr_wall, kernel_h=kernel.h,
            factor_w=kernel._factor_w(2), rho0c0_geo=geo,
            inv_c0=riemann.inv_c0_ave, limiter_coeff=limiter, tile_c=tile_c,
            interpret=interpret)
        dcr = dcr + dcr_w
        pdiss = pdiss + pdiss_w

    force = pdiss * vol[:c][..., None]
    drho_dt = fb["DensityChangeRate"] + jnp.concatenate(
        [dcr * rho[:c], jnp.zeros_like(rho[c:])], axis=0)
    force_full = jnp.concatenate([force, jnp.zeros_like(vel[c:])], axis=0)
    rho_new = jnp.where(mask, rho + drho_dt * (0.5 * dt), rho)
    out.update({"Position": pos, "DensityChangeRate": drho_dt,
                "Force": force_full, "Density": rho_new})
    return out


# kept for compatibility with tests/other ops
def sweep_geometry(pos_qb, mask_qb, pos_sb, mask_sb, nbr_block, w, kernel,
                   dim: int, box, exclude_self: bool):
    """Pair geometry of window offset `w` (unpacked variant)."""
    j = nbr_block[:, w]
    pos_j = pos_sb[j]
    mask_j = mask_sb[j]
    r, e, m = _pair_geom(pos_qb, mask_qb, pos_j, mask_j, w, kernel, dim, box,
                         exclude_self)
    fm = m.astype(pos_qb.dtype)
    W = kernel.W(r, dim) * fm
    dW = kernel.dW(r, dim) * fm
    return j, r, e, W, dW, m


# ---------------------------------------------------------------------------
# Second-generation Pallas acoustic steps (ops/pallas_block2.py): transposed
# lane-packed fused inner+wall sweeps.  ~2x the XLA block engine per sweep
# with per-window gathers at ~1/10 the prep cost of the v1 kernels.
# ---------------------------------------------------------------------------

def pack_wall_channels(wall_b, wall_static: bool = False):
    """Compact per-advection-step wall packing: (Cw+1, CAPW, CH) channel
    concat WITHOUT the 27-window expansion.  At 4.1M particles the full
    (27, CH, CAPW, C) wall tensor is ~10.8 GB of HBM (the r5 driver-bench
    OOM); window-chunked sweeps gather windows from this compact form
    on the fly instead."""
    cols = [wall_b["Position"], wall_b["VolumetricMeasure"][..., None]]
    if not wall_static:
        cols.append(wall_b["AverageVelocity"])
    cols.append(wall_b["NormalDirection"])
    if not wall_static:
        cols.append(wall_b["AverageAcceleration"])
    return jnp.concatenate(cols, axis=-1)


def pack_wall_t(wall_b, nbr_wall, c_max_wall: int, tile_c: int = 256,
                n_occ=None, wall_static: bool = False):
    """Per-advection-step wall prep for the fused sweeps: gather+transpose
    the static wall channels through the (C, NW) wall windows, plus
    per-tile any-wall flags.  Returns (wall_jt (NW, CH, CAP, C), wflags).
    `wall_static` drops the velocity/acceleration channels (identically
    zero for fixed walls): CH = 2*dim+1 instead of 3*dim+1."""
    from sphinxsys_tpu.ops import pallas_block2 as pb2

    cols = [wall_b["Position"], wall_b["VolumetricMeasure"][..., None]]
    if not wall_static:
        cols.append(wall_b["AverageVelocity"])
    cols.append(wall_b["NormalDirection"])
    if not wall_static:
        cols.append(wall_b["AverageAcceleration"])
    packed = jnp.concatenate(cols, axis=-1)       # (Cw+1, CAP, CH)
    nw = nbr_wall.shape[1]
    cap, ch = packed.shape[1], packed.shape[2]
    c = nbr_wall.shape[0]
    flat = packed.reshape(packed.shape[0], cap * ch)  # flat-row gathers:
    wall_jt = jnp.stack(                              # see _window_jt note
        [flat[nbr_wall[:, w]] for w in range(nw)], axis=0).reshape(
            nw, c, cap, ch).transpose(0, 3, 2, 1)
    wflags = pb2.wall_flags(nbr_wall, c_max_wall, tile_c, n_occ=n_occ)
    return wall_jt, wflags




def _window_jt(packed_j, nbr, c, roll_y: bool = True, dim: int = 2,
               windows=None, cross: bool = False):
    """(C+1, CAP, CH) + (C, NW) -> (NW, CH, CAP, C) window stack in the
    transposed kernel layout (NW = 3^dim).

    Gather layout matters enormously on TPU: gathering 3D rows of a
    (C+1, CAP, CH) array costs ~4x the same bytes gathered as 2D rows of
    the flattened (C+1, CAP*CH) view, and six flat gathers pipeline into
    barely more than one (measured 21 ms -> 2.5 ms for the 6-window prep
    at C = 64000, cap 12).  So: flatten, gather all windows, then ONE
    stacked transpose into the kernel layout.

    With `roll_y` (the default), the three center-column windows — the
    offsets (0, ..., 0, -1/0/+1) along the LAST axis — are PURE SHIFTS of
    the sorted block order (cells sort row-major, so the last-axis +-1
    cell, when occupied, is exactly the adjacent row): they use
    roll/select instead of gathers.  Pass roll_y=False on grids PERIODIC
    along the last axis (a wrap neighbor is not the adjacent row; those
    windows fall back to gathers)."""
    nw = nbr.shape[1]
    ctr = (nw - 1) // 2          # offset (0,...,0); ctr -+ 1 = last-axis -+1
    cap, ch = packed_j.shape[1], packed_j.shape[2]
    flat = packed_j.reshape(packed_j.shape[0], cap * ch)
    if windows is not None:
        # window-chunked build (large-N HBM discipline): gather ONLY the
        # requested window subset, no roll shortcut; returns
        # (len(windows), CH, CAP, C).  `cross`: cross-body window maps
        # (e.g. fluid cells -> wall blocks) have NO identity center —
        # gather every window.
        gw = tuple(w for w in windows if cross or w != ctr)
        if gw:
            gathered = jnp.stack([flat[nbr[:, w]] for w in gw], axis=0)
            gathered = gathered.reshape(len(gw), c, cap, ch).transpose(
                0, 3, 2, 1)
        if cross:
            return gathered
        base = flat[:c].reshape(c, cap, ch).transpose(2, 1, 0)
        out = []
        k = 0
        for w in windows:
            if w == ctr:
                out.append(base)
            else:
                out.append(gathered[k])
                k += 1
        return jnp.stack(out, axis=0)
    if roll_y and dim == 3:
        # z-TRIPLE gathers: cells sort by flattened id with z minor, so
        # the OCCUPIED cells of a column's z-triple {z-1, z, z+1} always
        # occupy CONSECUTIVE block rows (ids differ by 1; sorted
        # occupancy).  Anchor each cell's triple at (first occupied row)
        # + 1, gather the 3-row sliding concat ONCE per (dx, dy) column
        # (9 wide gathers instead of 27 narrow ones — measured 56.6 ->
        # ~20 ms at 1M particles), then SELECT each window's slot by its
        # own row offset — exact for every occupancy pattern, including
        # the z-sandwich (z+-1 occupied, z empty) that a naive
        # adjacent-row check would drop.
        n_rows = flat.shape[0]
        sent = n_rows - 1                             # sentinel row
        rw = cap * ch
        fill_row = jnp.zeros((1, rw), flat.dtype)
        flat_m = jnp.concatenate([fill_row, flat[:-1]], axis=0)   # row r-1
        flat_p = jnp.concatenate([flat[1:], fill_row], axis=0)    # row r+1
        flat3 = jnp.concatenate([flat_m, flat, flat_p], axis=1)   # (R, 3rw)

        fillc = jnp.zeros((ch, cap, c), flat.dtype)
        fillc = fillc.at[:dim].set(1.0e16)            # park positions FAR

        out = [None] * nw
        for w0 in range(1, nw, 3):                    # z = 0 windows
            rows = [nbr[:, w0 - 1], nbr[:, w0], nbr[:, w0 + 1]]
            occ = [r < sent for r in rows]
            r_first = jnp.where(
                occ[0], rows[0],
                jnp.where(occ[1], rows[1],
                          jnp.where(occ[2], rows[2], sent - 1)))
            a = jnp.minimum(r_first + 1, sent)
            g3 = flat3[a].reshape(c, 3, cap, ch).transpose(1, 3, 2, 0)
            for k in range(3):
                slot = rows[k] - (a - 1)              # 0, 1 or 2
                piece = jnp.where((slot == 0)[None, None, :], g3[0],
                                  jnp.where((slot == 1)[None, None, :],
                                            g3[1], g3[2]))
                out[w0 - 1 + k] = jnp.where(occ[k][None, None, :], piece,
                                            fillc)
        return jnp.stack(out, axis=0)
    if roll_y:
        gw = tuple(w for w in range(nw) if w not in (ctr - 1, ctr, ctr + 1))
    else:
        gw = tuple(w for w in range(nw) if w != ctr)
    gathered = jnp.stack([flat[nbr[:, w]] for w in gw], axis=0)
    gathered = gathered.reshape(len(gw), c, cap, ch).transpose(0, 3, 2, 1)
    base = flat[:c].reshape(c, cap, ch).transpose(2, 1, 0)  # (CH, CAP, C)
    out = [None] * nw
    for k, w in enumerate(gw):
        out[w] = gathered[k]
    out[ctr] = base
    if roll_y:
        fill = jnp.zeros_like(base)
        fill = fill.at[:dim].set(1.0e16)              # park positions FAR
        rolled_m = jnp.concatenate([fill[..., :1], base[..., :-1]], axis=-1)
        rolled_p = jnp.concatenate([base[..., 1:], fill[..., :1]], axis=-1)
        # exact adjacency check (cells sort by flattened id; the last-axis
        # +-1 cell, when occupied, is always the adjacent row when the
        # last axis does not wrap)
        ar = jnp.arange(nbr.shape[0], dtype=nbr.dtype)
        valid_m = (nbr[:, ctr - 1] == ar - 1)[None, None, :]
        valid_p = (nbr[:, ctr + 1] == ar + 1)[None, None, :]
        out[ctr - 1] = jnp.where(valid_m, rolled_m, fill)
        out[ctr + 1] = jnp.where(valid_p, rolled_p, fill)
    return jnp.stack(out, axis=0)



def compact_wall_ctx(nbr_wall, c_max_wall: int, c_w: int, tile_c: int):
    """Per-cell wall compaction: only ~25-35% of occupied cells have any
    wall window in the 3D dambreak, yet tile-level wflag predication
    fires on ~100% of tiles (every 128-cell tile straddles a z-column
    touching the tank floor).  Compact the wall-adjacent cells into a
    dense index list so the wall-side sweep runs on c_w << C cells.

    Returns (wall_cells (c_w,), nbr_wall_sub (c_w, NW), wflags_w,
    has_wall (C,), n_wall_cells)."""
    c = nbr_wall.shape[0]
    has_wall = jnp.any(nbr_wall < c_max_wall, axis=1)
    wall_cells = jnp.nonzero(has_wall, size=c_w, fill_value=c)[0]
    nbr_sub = jnp.take(nbr_wall, wall_cells, axis=0, mode="fill",
                       fill_value=c_max_wall)
    n_wall_cells = jnp.sum(has_wall.astype(jnp.int32))
    tile_start = jnp.arange(c_w // tile_c, dtype=jnp.int32) * tile_c
    wflags_w = jnp.where(tile_start < n_wall_cells, jnp.int32(1),
                         jnp.int32(-1))
    return wall_cells, nbr_sub, wflags_w, has_wall, n_wall_cells


def expand_wall_outputs(outs_w, wall_cells, has_wall, c: int):
    """Scatter-free expansion of compacted wall-side outputs (cap, c_w)
    back to (cap, C): row-gather through the searchsorted inverse (the
    compaction list is monotone), zeroed where the cell has no wall."""
    inv = jnp.searchsorted(wall_cells, jnp.arange(c, dtype=wall_cells.dtype))
    inv = jnp.minimum(inv, wall_cells.shape[0] - 1)
    outs = []
    for ow in outs_w:
        rows = ow.T[inv]                               # (C, cap) gather
        rows = jnp.where(has_wall[:, None], rows, 0.0)
        outs.append(rows.T)
    return tuple(outs)


def _chunked_sweep(sweep_fn, xi_t, packed_j, nbr_inner, c, wall_jt, wflags,
                   dim, window_chunks, wall_packed=None, nbr_wall=None,
                   wall_chunks: int = 1, **kw):
    """Window-chunked sweep for large-N HBM discipline: the (3^dim, CH,
    CAP, C) inner j-tensor never materializes whole — each chunk is
    built, consumed, and freed.  Outputs sum exactly (pair sums split by
    window).

    The chunk loop is a lax.fori_loop with a DYNAMIC window slice:
    sequenced chunk subgraphs, so XLA cannot schedule all chunks'
    gather temps concurrently (statically unrolled chunks at 4.1M were
    scheduled in parallel and peaked at 34 GB).  The kernels recompute
    all pair data from positions, so any window subset runs through the
    same compiled body.

    `wall_packed` + `wall_chunks` >= 1 chunk the WALL windows the same
    way from the compact (Cw+1, CAPW, CH) packing (the full wall tensor
    is ~10.8 GB at 4.1M)."""
    nw = 3 ** dim
    chj = packed_j.shape[-1]
    dummy_j = jnp.zeros((1, chj, 1, c), jnp.float32)

    def fori_chunks(n_chunks, make_chunk_out):
        """Run nw windows in n_chunks sequenced groups; sum outputs."""
        k = nw // n_chunks
        assert k * n_chunks == nw, (nw, n_chunks)
        out0 = make_chunk_out(jnp.int32(0), k)

        def body(ci, acc):
            o = make_chunk_out(ci * k, k)
            return tuple(a + b for a, b in zip(acc, o))

        if n_chunks == 1:
            return out0
        return jax.lax.fori_loop(1, n_chunks,
                                 lambda i, acc: body(jnp.int32(i), acc),
                                 out0)

    if wall_packed is not None:
        def wall_chunk(w0, k):
            wsub = jax.lax.dynamic_slice(
                nbr_wall, (jnp.int32(0), w0), (c, k))
            wj_g = _window_jt(wall_packed, wsub, c, roll_y=False, dim=dim,
                              windows=tuple(range(k)), cross=True)
            return sweep_fn(xi_t, dummy_j, wj_g, wflags, dim=dim,
                            side="wall", **kw)

        outs = fori_chunks(max(wall_chunks, 1), wall_chunk)
    else:
        outs = sweep_fn(xi_t, dummy_j, wall_jt, wflags, dim=dim,
                        side="wall", **kw)

    def inner_chunk(w0, k):
        nsub = jax.lax.dynamic_slice(nbr_inner, (jnp.int32(0), w0), (c, k))
        xj_g = _window_jt(packed_j, nsub, c, roll_y=False, dim=dim,
                          windows=tuple(range(k)), cross=True)
        return sweep_fn(xi_t, xj_g,
                        wall_jt if wall_packed is None else dummy_j,
                        wflags, dim=dim, side="inner", **kw)

    inner_outs = fori_chunks(max(window_chunks, 1), inner_chunk)
    return tuple(a + b for a, b in zip(outs, inner_outs))


def _box_xy(box):
    """(box_x, box_y, box_z) static floats from a periodic-lengths tuple
    (0 = no wrap).  Periodic Pallas engines must park padding with
    VOL = 0 — see ops/pallas_block2._make_wrap."""
    if box is None:
        return 0.0, 0.0, 0.0
    b = tuple(float(x) for x in box)
    return b + (0.0,) * (3 - len(b))


def acoustic_step_1st_half_p2(fb, nbr_inner, wall_jt, wflags, kernel, eos,
                              riemann, dt, tile_c: int = 256,
                              interpret: bool = False, box=None,
                              roll_y: bool = True, dim: int = 2,
                              wall_static: bool = False,
                              window_chunks: int = 1,
                              wall_packed=None, nbr_wall=None,
                              wall_chunks: int = 1,
                              wall_cells=None, wall_has=None,
                              wflags_w=None):
    """Pallas v2 variant of acoustic_step_1st_half_b (WendlandC2, 2D/3D).
    Padding handled by FAR-parked positions (non-periodic) plus VOL = 0
    fills (required under periodic wrap)."""
    from sphinxsys_tpu.ops import pallas_block2 as pb2

    bx, by, bz = _box_xy(box)
    out = dict(fb)
    mask = fb["SlotMask"]
    rho = jnp.where(mask, fb["Density"] + fb["DensityChangeRate"] * (0.5 * dt),
                    fb["Density"])
    p = eos.pressure(rho)
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]

    packed_j = jnp.concatenate([pos, p[..., None], vol[..., None]], axis=-1)
    acc_prior = fb["ForcePrior"] / jnp.maximum(fb["Mass"], TINY)[..., None]
    packed_i = jnp.concatenate([pos[:c], p[:c, :, None], rho[:c, :, None],
                                acc_prior[:c]], axis=-1)
    xi_t = packed_i.transpose(2, 1, 0)

    kw = dict(inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(dim),
              inv_rho0c0=riemann.inv_rho0c0_ave, tile_c=tile_c,
              interpret=interpret, box_x=bx, box_y=by, box_z=bz,
              wall_static=wall_static)
    if wall_cells is not None:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        outs_i = pb2.ac1_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                 side="inner", **kw)
        xi_w = jnp.take(packed_i, wall_cells, axis=0, mode="fill",
                        fill_value=0.0).transpose(2, 1, 0)
        outs_w = pb2.ac1_sweep_t(xi_w, xj_t[:1, :, :1], wall_jt, wflags_w,
                                 dim=dim, side="wall", **kw)
        outs_w = expand_wall_outputs(outs_w, wall_cells, wall_has, c)
        *fs, rd = tuple(a + b for a, b in zip(outs_i, outs_w))
    elif window_chunks > 1 or wall_chunks > 1:
        *fs, rd = _chunked_sweep(pb2.ac1_sweep_t, xi_t, packed_j, nbr_inner,
                                 c, wall_jt, wflags, dim, window_chunks,
                                 wall_packed=wall_packed, nbr_wall=nbr_wall,
                                 wall_chunks=wall_chunks, **kw)
    else:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        *fs, rd = pb2.ac1_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                  split_wall=dim == 3, **kw)
    force = jnp.stack([f.T for f in fs], axis=-1)  # (C, CAP, dim)
    pad_v = fb["Force"][c:]
    force_total = fb["Force"] + jnp.concatenate(
        [force * vol[:c][..., None], jnp.zeros_like(pad_v)], axis=0)
    drho_dt = jnp.concatenate([rd.T * rho[:c], fb["DensityChangeRate"][c:]], 0)
    vel = fb["Velocity"] + jnp.where(
        mask[..., None],
        (fb["ForcePrior"] + force_total) / jnp.maximum(fb["Mass"], TINY)[..., None] * dt,
        0.0)
    out.update({"Density": rho, "Pressure": p, "Position": pos,
                "Force": force_total, "DensityChangeRate": drho_dt,
                "Velocity": vel})
    return out


def acoustic_step_2nd_half_p2(fb, nbr_inner, wall_jt, wflags, kernel, riemann,
                              dt, tile_c: int = 256,
                              interpret: bool = False, box=None,
                              roll_y: bool = True, dim: int = 2,
                              wall_static: bool = False,
                              window_chunks: int = 1,
                              wall_packed=None, nbr_wall=None,
                              wall_chunks: int = 1,
                              wall_cells=None, wall_has=None,
                              wflags_w=None):
    """Pallas v2 variant of acoustic_step_2nd_half_b."""
    from sphinxsys_tpu.ops import pallas_block2 as pb2
    from sphinxsys_tpu.physics.riemann import (
        AcousticRiemannSolver, DissipativeRiemannSolver)

    bx, by, bz = _box_xy(box)
    out = dict(fb)
    mask = fb["SlotMask"]
    pos = fb["Position"] + jnp.where(mask[..., None], fb["Velocity"] * (0.5 * dt), 0.0)
    vel = fb["Velocity"]
    rho = fb["Density"]
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]

    packed_j = jnp.concatenate([pos, vel, vol[..., None]], axis=-1)
    packed_i = jnp.concatenate([pos[:c], vel[:c]], axis=-1)
    xi_t = packed_i.transpose(2, 1, 0)

    if isinstance(riemann, DissipativeRiemannSolver):
        geo, limiter = riemann.rho0c0_geo_ave, 1.0e30
    elif isinstance(riemann, AcousticRiemannSolver):
        geo, limiter = riemann.rho0c0_geo_ave, riemann.limiter_coeff
    else:
        geo, limiter = 0.0, 1.0
    kw = dict(inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(dim),
              rho0c0_geo=geo, inv_c0=riemann.inv_c0_ave,
              limiter_coeff=limiter, tile_c=tile_c, interpret=interpret,
              box_x=bx, box_y=by, box_z=bz, wall_static=wall_static)
    if wall_cells is not None:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        outs_i = pb2.ac2_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                 side="inner", **kw)
        xi_w = jnp.take(packed_i, wall_cells, axis=0, mode="fill",
                        fill_value=0.0).transpose(2, 1, 0)
        outs_w = pb2.ac2_sweep_t(xi_w, xj_t[:1, :, :1], wall_jt, wflags_w,
                                 dim=dim, side="wall", **kw)
        outs_w = expand_wall_outputs(outs_w, wall_cells, wall_has, c)
        dcr, *fs = tuple(a + b for a, b in zip(outs_i, outs_w))
    elif window_chunks > 1 or wall_chunks > 1:
        dcr, *fs = _chunked_sweep(pb2.ac2_sweep_t, xi_t, packed_j, nbr_inner,
                                  c, wall_jt, wflags, dim, window_chunks,
                                  wall_packed=wall_packed, nbr_wall=nbr_wall,
                                  wall_chunks=wall_chunks, **kw)
    else:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        dcr, *fs = pb2.ac2_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                   split_wall=dim == 3, **kw)

    force = jnp.stack([f.T for f in fs], axis=-1) * vol[:c][..., None]
    drho_dt = fb["DensityChangeRate"] + jnp.concatenate(
        [dcr.T * rho[:c], jnp.zeros_like(rho[c:])], axis=0)
    force_full = jnp.concatenate([force, jnp.zeros_like(vel[c:])], axis=0)
    rho_new = jnp.where(mask, rho + drho_dt * (0.5 * dt), rho)
    out.update({"Position": pos, "DensityChangeRate": drho_dt,
                "Force": force_full, "Density": rho_new})
    return out


def density_summation_p2(fb, nbr_inner, wall_jt, wflags, kernel, rho0: float,
                         sigma0: float, tile_c: int = 256,
                         interpret: bool = False, free_surface: bool = True,
                         box=None, roll_y: bool = True, dim: int = 2,
                         wall_static: bool = False, window_chunks: int = 1,
                              wall_packed=None, nbr_wall=None,
                              wall_chunks: int = 1):
    """Pallas v2 variant of density_summation_b (inner + wall contact).
    The slot-mask channel and the W(0) self term make the sweep seed-free;
    the wall's W*V sum is converted to the reference's m_k/rho0_k
    weighting by the V = m/rho0 identity.

    NOTE: sigma here mixes the inner SUM W and the wall SUM W V terms; the
    split matches density_summation_b's algebra exactly for equal-mass
    fluid particles (the dambreak/TG family)."""
    from sphinxsys_tpu.ops import pallas_block2 as pb2

    bx, by, bz = _box_xy(box)
    pos, mask = fb["Position"], fb["SlotMask"]
    c = nbr_inner.shape[0]
    packed_j = jnp.concatenate([pos, mask.astype(pos.dtype)[..., None]],
                               axis=-1)               # [pos, slot-mask]
    xi_t = jnp.stack([pos[:c, :, k].T for k in range(dim)], 0)
    kw = dict(inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(dim),
              tile_c=tile_c, interpret=interpret, box_x=bx, box_y=by,
              box_z=bz, wall_static=wall_static)
    if window_chunks > 1 or wall_chunks > 1:
        sig, sigw = _chunked_sweep(pb2.density_sweep_t, xi_t, packed_j,
                                   nbr_inner, c, wall_jt, wflags, dim,
                                   window_chunks, wall_packed=wall_packed,
                                   nbr_wall=nbr_wall,
                                   wall_chunks=wall_chunks, **kw)
    else:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        sig, sigw = pb2.density_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                        split_wall=dim == 3, **kw)
    # density_summation_b: rho_sum = (w0 + sum W) rho0/sigma0
    #                      + [sum_k W m_k/rho0_k] rho0^2/(sigma0 m_i)
    # the kernel's fluid sum counts the self pair as exactly W(0) = w0, and
    # the wall sum uses V_k = m_k/rho0_k — identical algebra.
    rho_sum = sig.T * rho0 / sigma0 + sigw.T * rho0 * rho0 / (
        sigma0 * jnp.maximum(fb["Mass"][:c], TINY))
    out = dict(fb)
    pad = fb["Density"][c:]
    if free_surface:
        out["Density"] = jnp.concatenate(
            [jnp.maximum(rho_sum, rho0), pad], axis=0)
    else:
        out["Density"] = jnp.concatenate([rho_sum, pad], axis=0)
        out["VolumetricMeasure"] = jnp.where(
            fb["SlotMask"], fb["Mass"] / jnp.maximum(out["Density"], TINY),
            fb["VolumetricMeasure"])
    out["DensitySummation"] = jnp.concatenate([rho_sum, pad], axis=0)
    return out


def advection_viscous_time_step_b(fb, h_min: float, speed_ref: float,
                                  rho0: float, mu: float, cfl: float = 0.25):
    """AdvectionViscousTimeStep (block form): fold the viscous diffusion
    speed into U_ref (fluid_time_step.cpp)."""
    viscous_speed = mu / rho0 / h_min
    return advection_time_step_b(fb, h_min, max(viscous_speed, speed_ref), cfl)


# ---------------------------------------------------------------------------
# viscous force + transport-velocity correction (block forms)
# ---------------------------------------------------------------------------

def viscous_force_b(fb, nbr_inner, kernel, dim: int, mu: float,
                    smoothing_length: float, walls: Sequence[tuple] = (),
                    box=None):
    """Block twin of physics/fluid.viscous_force (viscous_dynamics.hpp):
    F_i = 2 mu V_i sum_j (v_i - v_j)/(r + 0.01 h) dW V_j, wall jump doubled
    against the averaged wall velocity; ForcePrior accumulation included.
    `walls`: (wall_block_state, nbr_wall_windows) pairs."""
    pos, vel, mask = fb["Position"], fb["Velocity"], fb["SlotMask"]
    vol = fb["VolumetricMeasure"]
    eps_r = 0.01 * smoothing_length
    c = nbr_inner.shape[0]
    n_w = len(_window_offsets(dim))

    packed = pack_channels(pos, vel, vol)
    force = jnp.zeros_like(vel[:c])
    for w in range(n_w):
        j = nbr_inner[:, w]
        pj = packed[j]
        r, e, m = _pair_geom(pos, mask, pj[..., :dim], mask[j], w, kernel,
                             dim, box, True)
        dWV = kernel.dW(r, dim) * m.astype(r.dtype) * pj[..., 2 * dim][:, None, :]
        vel_j = pj[..., dim:2 * dim][:, None, :, :]
        vderiv = (vel[:c, :, None, :] - vel_j) / (r + eps_r)[..., None]
        force = force + jnp.sum(vderiv * dWV[..., None], axis=2)

    for wall_b, nbr_wall in walls:
        wpacked = pack_channels(wall_b["Position"], wall_b["VolumetricMeasure"],
                                wall_b["AverageVelocity"])
        for w in range(n_w):
            j = nbr_wall[:, w]
            pj = wpacked[j]
            r, e, m = _pair_geom(pos, mask, pj[..., :dim], wall_b["SlotMask"][j],
                                 w, kernel, dim, box, False)
            dWV = kernel.dW(r, dim) * m.astype(r.dtype) * pj[..., dim][:, None, :]
            vel_ave = pj[..., dim + 1:2 * dim + 1][:, None, :, :]
            vderiv = 2.0 * (vel[:c, :, None, :] - vel_ave) / (r + eps_r)[..., None]
            force = force + jnp.sum(vderiv * dWV[..., None], axis=2)

    force = 2.0 * mu * force * vol[:c][..., None]
    pad = jnp.zeros_like(vel[c:])
    force_full = jnp.concatenate([force, pad], axis=0)
    out = dict(fb)
    prev = fb.get("ViscousForcePrev", jnp.zeros_like(force_full))
    out["ForcePrior"] = fb["ForcePrior"] + force_full - prev
    out["ViscousForcePrev"] = force_full
    return out


def transport_velocity_correction_b(fb, nbr_inner, kernel, dim: int,
                                    h_ref: float, coefficient: float = 0.2,
                                    limiter_slope: float | None = None,
                                    walls: Sequence[tuple] = (), box=None):
    """Block twin of physics/fluid.transport_velocity_correction
    (transport_velocity_correction.hpp:37-67):
        I_i  = -sum_j 2 dW V_j e_ij  (+ wall terms)
        x_i += coef h^2 limiter(h^2 |I|^2) I_i."""
    pos, mask = fb["Position"], fb["SlotMask"]
    c = nbr_inner.shape[0]
    n_w = len(_window_offsets(dim))

    packed = pack_channels(pos, fb["VolumetricMeasure"])
    incon = jnp.zeros_like(pos[:c])
    for w in range(n_w):
        j = nbr_inner[:, w]
        pj = packed[j]
        r, e, m = _pair_geom(pos, mask, pj[..., :dim], mask[j], w, kernel,
                             dim, box, True)
        dWV = kernel.dW(r, dim) * m.astype(r.dtype) * pj[..., dim][:, None, :]
        incon = incon - jnp.sum((2.0 * dWV)[..., None] * e, axis=2)

    for wall_b, nbr_wall in walls:
        wpacked = pack_channels(wall_b["Position"], wall_b["VolumetricMeasure"])
        for w in range(n_w):
            j = nbr_wall[:, w]
            pj = wpacked[j]
            r, e, m = _pair_geom(pos, mask, pj[..., :dim], wall_b["SlotMask"][j],
                                 w, kernel, dim, box, False)
            dWV = kernel.dW(r, dim) * m.astype(r.dtype) * pj[..., dim][:, None, :]
            incon = incon - jnp.sum((2.0 * dWV)[..., None] * e, axis=2)

    h2 = h_ref * h_ref
    if limiter_slope is not None:
        sq = jnp.sum(incon ** 2, axis=-1)
        lim = jnp.minimum(limiter_slope * h2 * sq, 1.0)[..., None]
    else:
        lim = 1.0
    shift = coefficient * h2 * lim * incon
    shift_full = jnp.concatenate([shift, jnp.zeros_like(pos[c:])], axis=0)
    out = dict(fb)
    out["Position"] = jnp.where(mask[..., None], pos + shift_full, pos)
    return out


def visc_tvc_p2(fb, nbr_inner, wall_jt, wflags, kernel, dim: int, mu: float,
                smoothing_length: float, tvc_coefficient: float = 0.2,
                tvc_limiter_slope: float | None = None, tile_c: int = 256,
                interpret: bool = False, box=None, roll_y: bool = True,
                do_viscous: bool = True, do_tvc: bool = True,
                wall_static: bool = False, window_chunks: int = 1,
                              wall_packed=None, nbr_wall=None,
                              wall_chunks: int = 1):
    """Pallas v2 fused twin of viscous_force_b + transport_velocity_
    correction_b (one window sweep computes both; ops/pallas_block2.py
    visc_tvc_sweep_t).  Padding slots must carry VOL = 0."""
    from sphinxsys_tpu.ops import pallas_block2 as pb2

    bx, by, bz = _box_xy(box)
    pos, vel, mask = fb["Position"], fb["Velocity"], fb["SlotMask"]
    vol = fb["VolumetricMeasure"]
    c = nbr_inner.shape[0]

    packed_j = jnp.concatenate([pos, vel, vol[..., None]], axis=-1)
    xi_t = jnp.stack([pos[:c, :, k].T for k in range(dim)]
                     + [vel[:c, :, k].T for k in range(dim)], 0)
    kw = dict(inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(dim),
              eps_r=0.01 * smoothing_length, tile_c=tile_c,
              interpret=interpret, box_x=bx, box_y=by, box_z=bz,
              wall_static=wall_static)
    if window_chunks > 1 or wall_chunks > 1:
        outs = _chunked_sweep(pb2.visc_tvc_sweep_t, xi_t, packed_j,
                              nbr_inner, c, wall_jt, wflags, dim,
                              window_chunks, wall_packed=wall_packed,
                              nbr_wall=nbr_wall, wall_chunks=wall_chunks,
                              **kw)
    else:
        xj_t = _window_jt(packed_j, nbr_inner, c, roll_y=roll_y, dim=dim)
        outs = pb2.visc_tvc_sweep_t(xi_t, xj_t, wall_jt, wflags, dim=dim,
                                    split_wall=dim == 3, **kw)
    fvs, ivs = outs[:dim], outs[dim:]

    out = dict(fb)
    if do_viscous:
        force = 2.0 * mu * jnp.stack([f.T for f in fvs], -1) * vol[:c][..., None]
        force_full = jnp.concatenate([force, jnp.zeros_like(vel[c:])], axis=0)
        prev = fb.get("ViscousForcePrev", jnp.zeros_like(force_full))
        out["ForcePrior"] = fb["ForcePrior"] + force_full - prev
        out["ViscousForcePrev"] = force_full
    if do_tvc:
        incon = jnp.stack([iv.T for iv in ivs], -1)
        h2 = smoothing_length * smoothing_length
        if tvc_limiter_slope is not None:
            sq = jnp.sum(incon ** 2, axis=-1)
            lim = jnp.minimum(tvc_limiter_slope * h2 * sq, 1.0)[..., None]
        else:
            lim = 1.0
        shift = tvc_coefficient * h2 * lim * incon
        shift_full = jnp.concatenate([shift, jnp.zeros_like(pos[c:])], axis=0)
        out["Position"] = jnp.where(mask[..., None], pos + shift_full, pos)
    return out
