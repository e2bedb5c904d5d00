"""Pallas TPU kernels for the cell-block pair sweeps (2D WCSPH hot path).

Why: XLA lowers the (C, cap_i, cap_j) window-sweep broadcasts with cap=16
minor dims, wasting 7/8 of the VPU lanes; the sweeps dominate the acoustic
step.  These kernels re-layout the pair math as (TILE_C, cap_i*cap_j=256)
tiles — full (8, 128) utilization — with the window-neighbor blocks
pre-gathered by one XLA row gather (so the kernel is pure dense compute).

Physics identical to physics/fluid_blocks.py (fluid_integration.hpp):
  1st half:  force_i  = -sum_w sum_j (p_i + p_j) dW V_j e_ij
             drho_i   =  sum_w sum_j UJump(p_i - p_j) dW V_j      * rho_i
  2nd half:  dcr_i    =  sum_w sum_j (v_i - v_j).e dW V_j         * rho_i
             force_i  =  sum_w sum_j PJump(u_jump) dW V_j e_ij    * V_i

Channel layout of the packed block tensor X (C+1, cap, 8):
  [0]=x [1]=y [2]=vx [3]=vy [4]=p [5]=vol [6]=mask [7]=unused
Wendland C2 kernel values are computed inline (factor, h are scalars).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 16
CH = 8
NW = 9  # 3^2 windows
CX, CY, CVX, CVY, CP, CVOL, CMASK = 0, 1, 2, 3, 4, 5, 6


def _expand_i(a):  # (T, cap) -> (T, cap, cap) repeating each i entry over j
    t = a.shape[0]
    return jnp.broadcast_to(a[:, :, None], (t, CAP, CAP))


def _expand_j(a):  # (T, cap) -> (T, cap, cap) tiling the j row over i
    t = a.shape[0]
    return jnp.broadcast_to(a[:, None, :], (t, CAP, CAP))


def _reduce_j(a):  # (T, cap, cap) -> (T, cap) sum over j
    return jnp.sum(a, axis=2)


def _wendland_dw(q, inv_h, factor_w):
    """dW/dr for Wendland C2 (kernel_wendland_c2.cpp): factor/h * 0.625 (q-2)^3 q,
    zero outside support."""
    qc = jnp.minimum(q, 2.0)
    return jnp.where(q < 2.0, (factor_w * inv_h * 0.625) * (qc - 2.0) ** 3 * qc, 0.0)


def _pair_block(xi, xj, w_idx, inv_h, factor_w, exclude_self):
    """Common pair geometry on (T, 256) tiles.  Returns dict of arrays."""
    t = xi.shape[0]
    dx = _expand_i(xi[:, :, CX]) - _expand_j(xj[:, :, CX])
    dy = _expand_i(xi[:, :, CY]) - _expand_j(xj[:, :, CY])
    r2 = dx * dx + dy * dy
    r = jnp.sqrt(r2 + 1e-15)
    inv_r = 1.0 / r
    ex = dx * inv_r
    ey = dy * inv_r
    m = _expand_i(xi[:, :, CMASK]) * _expand_j(xj[:, :, CMASK])
    if exclude_self and w_idx == 4:  # center window of a 2D inner sweep
        row = jax.lax.broadcasted_iota(jnp.int32, (1, CAP, CAP), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CAP, CAP), 2)
        m = m * jnp.where(row == col, 0.0, 1.0)
    dW = _wendland_dw(r * inv_h, inv_h, factor_w) * m
    dWV = dW * _expand_j(xj[:, :, CVOL])
    return r, ex, ey, dWV


def _ac1_kernel(xi_ref, xj_ref, fx_ref, fy_ref, rd_ref, *, inv_h, factor_w,
                inv_rho0c0_ave):
    xi = xi_ref[...]  # (T, CAP, CH)
    t = xi.shape[0]
    fx = jnp.zeros((t, CAP), jnp.float32)
    fy = jnp.zeros((t, CAP), jnp.float32)
    rd = jnp.zeros((t, CAP), jnp.float32)
    p_i = _expand_i(xi[:, :, CP])
    for w in range(NW):
        xj = xj_ref[:, w, :, :]
        r, ex, ey, dWV = _pair_block(xi, xj, w, inv_h, factor_w, True)
        p_j = _expand_j(xj[:, :, CP])
        psum = (p_i + p_j) * dWV
        fx = fx - _reduce_j(psum * ex)
        fy = fy - _reduce_j(psum * ey)
        rd = rd + _reduce_j((p_i - p_j) * inv_rho0c0_ave * dWV)
    fx_ref[...] = fx
    fy_ref[...] = fy
    rd_ref[...] = rd


def _ac2_kernel(xi_ref, xj_ref, dcr_ref, fx_ref, fy_ref, *, inv_h, factor_w,
                rho0c0_geo, inv_c0, limiter_coeff):
    xi = xi_ref[...]
    t = xi.shape[0]
    dcr = jnp.zeros((t, CAP), jnp.float32)
    fx = jnp.zeros((t, CAP), jnp.float32)
    fy = jnp.zeros((t, CAP), jnp.float32)
    vx_i = _expand_i(xi[:, :, CVX])
    vy_i = _expand_i(xi[:, :, CVY])
    for w in range(NW):
        xj = xj_ref[:, w, :, :]
        r, ex, ey, dWV = _pair_block(xi, xj, w, inv_h, factor_w, True)
        du = vx_i - _expand_j(xj[:, :, CVX])
        dv = vy_i - _expand_j(xj[:, :, CVY])
        u_jump = du * ex + dv * ey
        dcr = dcr + _reduce_j(u_jump * dWV)
        lim = jnp.minimum(limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0), 1.0)
        pj = rho0c0_geo * u_jump * lim * dWV
        fx = fx + _reduce_j(pj * ex)
        fy = fy + _reduce_j(pj * ey)
    dcr_ref[...] = dcr
    fx_ref[...] = fx
    fy_ref[...] = fy


def _tiles(c, tile):
    if c % tile != 0:
        raise ValueError(f"block count {c} must be a multiple of tile_c={tile} "
                         "(round c_max up)")
    return c // tile


@functools.partial(jax.jit, static_argnames=("kernel_h", "factor_w",
                                             "inv_rho0c0_ave", "tile_c",
                                             "interpret"))
def ac1_inner_sweep(packed, nbr, kernel_h: float, factor_w: float,
                    inv_rho0c0_ave: float, tile_c: int = 32,
                    interpret: bool = False):
    """1st-half inner sweep.  packed: (C+1, CAP, CH) with channel layout
    above; nbr: (C, NW).  Returns (force (C, CAP, 2), rho_diss (C, CAP))."""
    c = nbr.shape[0]
    xj = packed[nbr]  # (C, NW, CAP, CH) — one XLA row gather
    xi = packed[:c]
    grid = (_tiles(c, tile_c),)
    kern = functools.partial(_ac1_kernel, inv_h=1.0 / kernel_h,
                             factor_w=factor_w,
                             inv_rho0c0_ave=inv_rho0c0_ave)
    fx, fy, rd = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_c, CAP, CH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, NW, CAP, CH), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
        ],
        interpret=interpret,
    )(xi, xj)
    return jnp.stack([fx, fy], axis=-1), rd


@functools.partial(jax.jit, static_argnames=("kernel_h", "factor_w",
                                             "rho0c0_geo", "inv_c0",
                                             "limiter_coeff", "tile_c",
                                             "interpret"))
def ac2_inner_sweep(packed, nbr, kernel_h: float, factor_w: float,
                    rho0c0_geo: float, inv_c0: float, limiter_coeff: float,
                    tile_c: int = 32, interpret: bool = False):
    """2nd-half inner sweep.  Returns (dcr (C, CAP), p_diss (C, CAP, 2))."""
    c = nbr.shape[0]
    xj = packed[nbr]
    xi = packed[:c]
    grid = (_tiles(c, tile_c),)
    kern = functools.partial(_ac2_kernel, inv_h=1.0 / kernel_h,
                             factor_w=factor_w, rho0c0_geo=rho0c0_geo,
                             inv_c0=inv_c0, limiter_coeff=limiter_coeff)
    dcr, fx, fy = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_c, CAP, CH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, NW, CAP, CH), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, CAP), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
            jax.ShapeDtypeStruct((c, CAP), jnp.float32),
        ],
        interpret=interpret,
    )(xi, xj)
    return dcr, jnp.stack([fx, fy], axis=-1)


def pack_state_2d(pos, vel, p, vol, mask):
    """Pack block fields into the (C+1, CAP, CH) kernel layout."""
    z = jnp.zeros_like(p)
    return jnp.stack([pos[..., 0], pos[..., 1], vel[..., 0], vel[..., 1],
                      p, vol, mask.astype(p.dtype), z], axis=-1)


# ---------------------------------------------------------------------------
# wall-contact sweeps (fluid_integration.hpp:89-113, 205-231)
# ---------------------------------------------------------------------------
# i-side channels for ac1 wall: [x, y, p, rho, accx, accy, mask, 0]
I1X, I1Y, I1P, I1RHO, I1AX, I1AY, I1M = 0, 1, 2, 3, 4, 5, 6
# wall channels for ac1: [x, y, vol, accx, accy, mask, 0, 0]
W1X, W1Y, W1VOL, W1AX, W1AY, W1M = 0, 1, 2, 3, 4, 5
# i-side channels for ac2 wall: [x, y, vx, vy, mask, 0, 0, 0]
I2X, I2Y, I2VX, I2VY, I2M = 0, 1, 2, 3, 4
# wall channels for ac2: [x, y, vol, vax, vay, nx, ny, mask]
W2X, W2Y, W2VOL, W2VAX, W2VAY, W2NX, W2NY, W2M = 0, 1, 2, 3, 4, 5, 6, 7


def _pair_geom_w(xi, xj, ix, iy, im, jx, jy, jm, inv_h, factor_w):
    dx = _expand_i(xi[:, :, ix]) - _expand_j(xj[:, :, jx])
    dy = _expand_i(xi[:, :, iy]) - _expand_j(xj[:, :, jy])
    r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
    inv_r = 1.0 / r
    ex, ey = dx * inv_r, dy * inv_r
    m = _expand_i(xi[:, :, im]) * _expand_j(xj[:, :, jm])
    dW = _wendland_dw(r * inv_h, inv_h, factor_w) * m
    return r, ex, ey, dW


def _ac1_wall_kernel(xi_ref, xj_ref, fx_ref, fy_ref, rd_ref, *, inv_h,
                     factor_w, inv_rho0c0_ave):
    xi = xi_ref[...]
    t = xi.shape[0]
    fx = jnp.zeros((t, CAP), jnp.float32)
    fy = jnp.zeros((t, CAP), jnp.float32)
    rd = jnp.zeros((t, CAP), jnp.float32)
    p_i = _expand_i(xi[:, :, I1P])
    rho_i = _expand_i(xi[:, :, I1RHO])
    ax_i = _expand_i(xi[:, :, I1AX])
    ay_i = _expand_i(xi[:, :, I1AY])
    for w in range(NW):
        xj = xj_ref[:, w, :, :]
        r, ex, ey, dW = _pair_geom_w(xi, xj, I1X, I1Y, I1M, W1X, W1Y, W1M,
                                     inv_h, factor_w)
        dWV = dW * _expand_j(xj[:, :, W1VOL])
        face_acc = (ax_i - _expand_j(xj[:, :, W1AX])) * (-ex) + \
                   (ay_i - _expand_j(xj[:, :, W1AY])) * (-ey)
        p_in_wall = p_i + rho_i * r * jnp.maximum(face_acc, 0.0)
        psum = (p_i + p_in_wall) * dWV
        fx = fx - _reduce_j(psum * ex)
        fy = fy - _reduce_j(psum * ey)
        rd = rd + _reduce_j((p_i - p_in_wall) * inv_rho0c0_ave * dWV)
    fx_ref[...] = fx
    fy_ref[...] = fy
    rd_ref[...] = rd


def _ac2_wall_kernel(xi_ref, xj_ref, dcr_ref, fx_ref, fy_ref, *, inv_h,
                     factor_w, rho0c0_geo, inv_c0, limiter_coeff):
    xi = xi_ref[...]
    t = xi.shape[0]
    dcr = jnp.zeros((t, CAP), jnp.float32)
    fx = jnp.zeros((t, CAP), jnp.float32)
    fy = jnp.zeros((t, CAP), jnp.float32)
    vx_i = _expand_i(xi[:, :, I2VX])
    vy_i = _expand_i(xi[:, :, I2VY])
    for w in range(NW):
        xj = xj_ref[:, w, :, :]
        r, ex, ey, dW = _pair_geom_w(xi, xj, I2X, I2Y, I2M, W2X, W2Y, W2M,
                                     inv_h, factor_w)
        dWV = dW * _expand_j(xj[:, :, W2VOL])
        vax = _expand_j(xj[:, :, W2VAX])
        vay = _expand_j(xj[:, :, W2VAY])
        nx = _expand_j(xj[:, :, W2NX])
        ny = _expand_j(xj[:, :, W2NY])
        e_dot_n = ex * nx + ey * ny
        sgn = jnp.sign(e_dot_n)
        fnx, fny = sgn * nx, sgn * ny
        # vel_in_wall = 2 v_ave - v_i  ->  v_i - vel_in_wall = 2 (v_i - v_ave)
        dvx = 2.0 * (vx_i - vax)
        dvy = 2.0 * (vy_i - vay)
        dcr = dcr + _reduce_j((dvx * ex + dvy * ey) * dWV)
        u_jump = dvx * fnx + dvy * fny
        lim = jnp.minimum(limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0), 1.0)
        pj = rho0c0_geo * u_jump * lim * dWV
        fx = fx + _reduce_j(pj * fnx)
        fy = fy + _reduce_j(pj * fny)
    dcr_ref[...] = dcr
    fx_ref[...] = fx
    fy_ref[...] = fy


def _wall_sweep_call(kern, xi, xj, c, tile_c, interpret, n_out=3):
    grid = (_tiles(c, tile_c),)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_c, CAP, CH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, NW, CAP, CH), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tile_c, CAP), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((c, CAP), jnp.float32)] * n_out,
        interpret=interpret,
    )(xi, xj)
    return outs


@functools.partial(jax.jit, static_argnames=("kernel_h", "factor_w",
                                             "inv_rho0c0_ave", "tile_c",
                                             "interpret"))
def ac1_wall_sweep(packed_i, wall_packed, nbr_wall, kernel_h: float,
                   factor_w: float, inv_rho0c0_ave: float, tile_c: int = 32,
                   interpret: bool = False):
    """packed_i: (C, CAP, CH) [x,y,p,rho,ax,ay,mask,0];
    wall_packed: (Cw+1, CAP, CH) [x,y,vol,ax,ay,mask,0,0]."""
    c = nbr_wall.shape[0]
    xj = wall_packed[nbr_wall]
    kern = functools.partial(_ac1_wall_kernel, inv_h=1.0 / kernel_h,
                             factor_w=factor_w,
                             inv_rho0c0_ave=inv_rho0c0_ave)
    fx, fy, rd = _wall_sweep_call(kern, packed_i[:c], xj, c, tile_c, interpret)
    return jnp.stack([fx, fy], axis=-1), rd


@functools.partial(jax.jit, static_argnames=("kernel_h", "factor_w",
                                             "rho0c0_geo", "inv_c0",
                                             "limiter_coeff", "tile_c",
                                             "interpret"))
def ac2_wall_sweep(packed_i, wall_packed, nbr_wall, kernel_h: float,
                   factor_w: float, rho0c0_geo: float, inv_c0: float,
                   limiter_coeff: float, tile_c: int = 32,
                   interpret: bool = False):
    """packed_i: (C, CAP, CH) [x,y,vx,vy,mask,0,0,0];
    wall_packed: (Cw+1, CAP, CH) [x,y,vol,vax,vay,nx,ny,mask]."""
    c = nbr_wall.shape[0]
    xj = wall_packed[nbr_wall]
    kern = functools.partial(_ac2_wall_kernel, inv_h=1.0 / kernel_h,
                             factor_w=factor_w, rho0c0_geo=rho0c0_geo,
                             inv_c0=inv_c0, limiter_coeff=limiter_coeff)
    dcr, fx, fy = _wall_sweep_call(kern, packed_i[:c], xj, c, tile_c, interpret)
    return dcr, jnp.stack([fx, fy], axis=-1)
