"""Fused transposed Pallas sweeps for the cell-block WCSPH hot path (2D).

Second-generation kernels (replacing ops/pallas_sweep.py): the pair axes
(16_i, 16_j) live on majors/sublanes and the CELL axis rides the VPU
lanes, so every elementwise op runs on dense (8,128) tiles — measured
~2x the slot throughput of the XLA block engine and ~5x the first-gen
(T,16,16) kernels, whose 16-wide minor dim wasted 7/8 lanes (and whose
(T,16,16)->(T,256) reshape Mosaic rejects outright).

Physics identical to physics/fluid_blocks.py acoustic_step_*_b
(reference fluid_integration.hpp):
  1st half:  force_i = -sum_w sum_j (p_i + p_j) dW V_j e_ij
             drho_i  =  sum_w sum_j UJump(p_i - p_j) dW V_j
             + wall variant with hydrostatic p-in-wall reconstruction
  2nd half:  dcr_i   =  sum_w sum_j (v_i - v_j).e dW V_j
             force_i =  sum_w sum_j PJump(u_jump) dW V_j e_ij
             + wall variant with mirrored velocity and face normal

Design notes:
  * the inner and wall window loops are FUSED into one kernel per half —
    one pass over the i-side data, one pallas dispatch;
  * wall j-data is gathered+transposed ONCE per advection step (wall
    values are static within it); fluid j-data once per half-step;
  * slot masking is positional: padding slots are parked FAR_AWAY, which
    puts them outside kernel support (dW=0) — no mask channel, no mask
    flops (non-periodic scenes only);
  * the self-pair (center window, i==j) contributes exactly zero to both
    halves (e_ij = 0 and p_i - p_j = 0), so no identity mask either.

Channel layouts (transposed, shape (CH, CAP, C)):
  fluid i ac1: [x, y, p, rho, apx, apy]   (ap = prior accel, for wall term)
  fluid j ac1: [x, y, p, vol]
  fluid i ac2: [x, y, vx, vy]
  fluid j ac2: [x, y, vx, vy, vol]
  wall  j    : [x, y, vol, vax, vay, nx, ny, awx, awy]  (shared both halves)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 16
NW = 9

# i-side channels, 1st half
I1X, I1Y, I1P, I1RHO, I1AX, I1AY = range(6)
# fluid j channels, 1st half
J1X, J1Y, J1P, J1VOL = range(4)
# i-side channels, 2nd half
I2X, I2Y, I2VX, I2VY = range(4)
# fluid j channels, 2nd half
J2X, J2Y, J2VX, J2VY, J2VOL = range(5)
# wall j channels (both halves)
WX, WY, WVOL, WVAX, WVAY, WNX, WNY, WAX, WAY = range(9)


def _wendland_dwv(dx, dy, vol_j, inv_h, factor_w):
    """dW/dr * V_j and (inv_r, r) for Wendland C2 pairs.  (qc-2)^3*qc is
    exactly zero at the 2h cutoff, so clamping q replaces the support
    test (kernel_wendland_c2.cpp dW)."""
    r2 = dx * dx + dy * dy + 1e-15
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    qc = jnp.minimum(r * inv_h, 2.0)
    dwv = ((factor_w * inv_h * 0.625) * (qc - 2.0) ** 3 * qc) * vol_j
    return dwv, inv_r, r


def _make_wrap(box_x: float, box_y: float):
    """Static minimum-image wrapper for periodic axes (box length 0 = not
    periodic; the Python branches vanish at trace time).  Padding safety
    under wrap: periodic engines must park padding with VOL = 0 (every
    pair term is proportional to dW*V_j) and pass a mask channel to the
    pure-W density sweep — FAR-parked positions alone are not enough,
    because the wrap can fold them back into range."""
    def wrap(dx, dy):
        if box_x > 0.0:
            dx = dx - box_x * jnp.round(dx * (1.0 / box_x))
        if box_y > 0.0:
            dy = dy - box_y * jnp.round(dy * (1.0 / box_y))
        return dx, dy

    return wrap


def _ac1_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, fx_ref, fy_ref, rd_ref, *,
                inv_h, factor_w, inv_rho0c0, box_x=0.0, box_y=0.0):
    wrap = _make_wrap(box_x, box_y)
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]          # slots per cell (configurable, def. 16)
    capj = xj_ref.shape[-2]
    fx_ref[...] = jnp.zeros((cap, t), jnp.float32)
    fy_ref[...] = jnp.zeros((cap, t), jnp.float32)
    rd_ref[...] = jnp.zeros((cap, t), jnp.float32)

    # tiles beyond the occupied block range are all-sentinel: skip
    @pl.when(wflag_ref[pl.program_id(0)] >= 0)
    def _():
        xi = xi_ref[...]                   # (6, CAP, T)
        x_i = xi[I1X][:, None, :]
        y_i = xi[I1Y][:, None, :]
        p_i = xi[I1P][:, None, :]
        fxa = jnp.zeros((cap, capj, t), jnp.float32)
        fya = jnp.zeros((cap, capj, t), jnp.float32)
        rda = jnp.zeros((cap, capj, t), jnp.float32)
        for w in range(NW):
            xj = xj_ref[w]                 # (4, CAP, T)
            dx, dy = wrap(x_i - xj[J1X][None], y_i - xj[J1Y][None])
            dwv, inv_r, _ = _wendland_dwv(dx, dy, xj[J1VOL][None], inv_h,
                                          factor_w)
            p_j = xj[J1P][None]
            psum = (p_i + p_j) * dwv * inv_r
            fxa = fxa - psum * dx
            fya = fya - psum * dy
            rda = rda + (p_i - p_j) * dwv
        fx_ref[...] = jnp.sum(fxa, axis=1)
        fy_ref[...] = jnp.sum(fya, axis=1)
        rd_ref[...] = jnp.sum(rda, axis=1) * inv_rho0c0

    # wall windows (fluid_integration.hpp:89-113): p-in-wall hydrostatic
    # reconstruction from the prior acceleration; predicated per tile
    @pl.when(wflag_ref[pl.program_id(0)] > 0)
    def _():
        xi = xi_ref[...]
        x_i = xi[I1X][:, None, :]
        y_i = xi[I1Y][:, None, :]
        p_i = xi[I1P][:, None, :]
        rho_i = xi[I1RHO][:, None, :]
        ax_i = xi[I1AX][:, None, :]
        ay_i = xi[I1AY][:, None, :]
        fxw = jnp.zeros((cap, t), jnp.float32)
        fyw = jnp.zeros((cap, t), jnp.float32)
        rdw = jnp.zeros((cap, t), jnp.float32)
        for w in range(NW):
            wj = wj_ref[w]                 # (9, CAP, T)
            dx, dy = wrap(x_i - wj[WX][None], y_i - wj[WY][None])
            dwv, inv_r, r = _wendland_dwv(dx, dy, wj[WVOL][None], inv_h,
                                          factor_w)
            ex = dx * inv_r
            ey = dy * inv_r
            face_acc = (ax_i - wj[WAX][None]) * (-ex) + \
                       (ay_i - wj[WAY][None]) * (-ey)
            p_wall = p_i + rho_i * r * jnp.maximum(face_acc, 0.0)
            psum = (p_i + p_wall) * dwv * inv_r
            fxw = fxw - jnp.sum(psum * dx, axis=1)
            fyw = fyw - jnp.sum(psum * dy, axis=1)
            rdw = rdw + jnp.sum((p_i - p_wall) * dwv, axis=1)
        fx_ref[...] += fxw
        fy_ref[...] += fyw
        rd_ref[...] += rdw * inv_rho0c0


def _ac2_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, dcr_ref, fx_ref, fy_ref, *,
                inv_h, factor_w, rho0c0_geo, inv_c0, limiter_coeff,
                box_x=0.0, box_y=0.0):
    wrap = _make_wrap(box_x, box_y)
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]
    capj = xj_ref.shape[-2]
    dcr_ref[...] = jnp.zeros((cap, t), jnp.float32)
    fx_ref[...] = jnp.zeros((cap, t), jnp.float32)
    fy_ref[...] = jnp.zeros((cap, t), jnp.float32)

    @pl.when(wflag_ref[pl.program_id(0)] >= 0)
    def _():
        xi = xi_ref[...]                   # (4, CAP, T)
        x_i = xi[I2X][:, None, :]
        y_i = xi[I2Y][:, None, :]
        vx_i = xi[I2VX][:, None, :]
        vy_i = xi[I2VY][:, None, :]
        dcra = jnp.zeros((cap, capj, t), jnp.float32)
        fxa = jnp.zeros((cap, capj, t), jnp.float32)
        fya = jnp.zeros((cap, capj, t), jnp.float32)
        for w in range(NW):
            xj = xj_ref[w]                 # (5, CAP, T)
            dx, dy = wrap(x_i - xj[J2X][None], y_i - xj[J2Y][None])
            dwv, inv_r, _ = _wendland_dwv(dx, dy, xj[J2VOL][None], inv_h,
                                          factor_w)
            ex = dx * inv_r
            ey = dy * inv_r
            du = vx_i - xj[J2VX][None]
            dv = vy_i - xj[J2VY][None]
            u_jump = du * ex + dv * ey
            dcra = dcra + u_jump * dwv
            lim = jnp.minimum(limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0),
                              1.0)
            pj = rho0c0_geo * u_jump * lim * dwv
            fxa = fxa + pj * ex
            fya = fya + pj * ey
        dcr_ref[...] = jnp.sum(dcra, axis=1)
        fx_ref[...] = jnp.sum(fxa, axis=1)
        fy_ref[...] = jnp.sum(fya, axis=1)

    @pl.when(wflag_ref[pl.program_id(0)] > 0)
    def _():
        xi = xi_ref[...]
        x_i = xi[I2X][:, None, :]
        y_i = xi[I2Y][:, None, :]
        vx_i = xi[I2VX][:, None, :]
        vy_i = xi[I2VY][:, None, :]
        dcrw = jnp.zeros((cap, t), jnp.float32)
        fxw = jnp.zeros((cap, t), jnp.float32)
        fyw = jnp.zeros((cap, t), jnp.float32)
        for w in range(NW):
            wj = wj_ref[w]
            dx, dy = wrap(x_i - wj[WX][None], y_i - wj[WY][None])
            dwv, inv_r, _ = _wendland_dwv(dx, dy, wj[WVOL][None], inv_h,
                                          factor_w)
            ex = dx * inv_r
            ey = dy * inv_r
            nx = wj[WNX][None]
            ny = wj[WNY][None]
            e_dot_n = ex * nx + ey * ny
            sgn = jnp.sign(e_dot_n)
            fnx = sgn * nx
            fny = sgn * ny
            # vel_in_wall = 2 v_ave - v_i -> v_i - vel_in_wall = 2 (v_i - v_ave)
            dvx = 2.0 * (vx_i - wj[WVAX][None])
            dvy = 2.0 * (vy_i - wj[WVAY][None])
            dcrw = dcrw + jnp.sum((dvx * ex + dvy * ey) * dwv, axis=1)
            u_jump = dvx * fnx + dvy * fny
            lim = jnp.minimum(limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0),
                              1.0)
            pj = rho0c0_geo * u_jump * lim * dwv
            fxw = fxw + jnp.sum(pj * fnx, axis=1)
            fyw = fyw + jnp.sum(pj * fny, axis=1)
        dcr_ref[...] += dcrw
        fx_ref[...] += fxw
        fy_ref[...] += fyw


def _call(kern, xi_t, xj_t, wj_t, wflag, n_out, tile_c, interpret=False):
    chi, cap, c = xi_t.shape
    chj, capj = xj_t.shape[1], xj_t.shape[2]
    chw, capw = wj_t.shape[1], wj_t.shape[2]
    if c % tile_c != 0:
        raise ValueError(f"block count {c} not a multiple of tile_c={tile_c}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // tile_c,),
        in_specs=[
            pl.BlockSpec((chi, cap, tile_c), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, chj, capj, tile_c), lambda i, *_: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, chw, capw, tile_c), lambda i, *_: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((cap, tile_c), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)] * n_out,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap, c), jnp.float32)] * n_out,
        interpret=interpret,
    )(wflag, xi_t, xj_t, wj_t)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w",
                                             "inv_rho0c0", "tile_c",
                                             "interpret", "box_x", "box_y"))
def ac1_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                inv_rho0c0: float, tile_c: int = 256, interpret: bool = False,
                box_x: float = 0.0, box_y: float = 0.0):
    """Fused 1st-half inner+wall sweep.  Returns (fx, fy, rd), (cap, C)."""
    kern = functools.partial(_ac1_kernel, inv_h=inv_h, factor_w=factor_w,
                             inv_rho0c0=inv_rho0c0, box_x=box_x, box_y=box_y)
    return _call(kern, xi_t, xj_t, wj_t, wflag, 3, tile_c, interpret)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "rho0c0_geo",
                                             "inv_c0", "limiter_coeff",
                                             "tile_c", "interpret",
                                             "box_x", "box_y"))
def ac2_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                rho0c0_geo: float, inv_c0: float, limiter_coeff: float,
                tile_c: int = 256, interpret: bool = False,
                box_x: float = 0.0, box_y: float = 0.0):
    """Fused 2nd-half inner+wall sweep.  Returns (dcr, fx, fy), (CAP, C)."""
    kern = functools.partial(_ac2_kernel, inv_h=inv_h, factor_w=factor_w,
                             rho0c0_geo=rho0c0_geo, inv_c0=inv_c0,
                             limiter_coeff=limiter_coeff, box_x=box_x,
                             box_y=box_y)
    return _call(kern, xi_t, xj_t, wj_t, wflag, 3, tile_c, interpret)


def _visctvc_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, fvx_ref, fvy_ref,
                    ix_ref, iy_ref, *, inv_h, factor_w, eps_r,
                    box_x=0.0, box_y=0.0):
    """Fused viscous-force + transport-velocity-correction sweep.

    Both read the SAME j data ([x, y, vx, vy, vol], the ac2 layout), so one
    window pass produces both (viscous_dynamics.hpp Newtonian inner+wall and
    transport_velocity_correction.hpp:37-67):
      fv_i = sum_w sum_j (v_i - v_j) / (r + eps_r) dW V_j      (x 2mu outside;
             wall jump doubled against the averaged wall velocity)
      I_i  = -sum_w sum_j 2 dW V_j e_ij                        (+ wall term)
    """
    wrap = _make_wrap(box_x, box_y)
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]
    capj = xj_ref.shape[-2]
    fvx_ref[...] = jnp.zeros((cap, t), jnp.float32)
    fvy_ref[...] = jnp.zeros((cap, t), jnp.float32)
    ix_ref[...] = jnp.zeros((cap, t), jnp.float32)
    iy_ref[...] = jnp.zeros((cap, t), jnp.float32)

    @pl.when(wflag_ref[pl.program_id(0)] >= 0)
    def _():
        xi = xi_ref[...]                   # (4, CAP, T)
        x_i = xi[I2X][:, None, :]
        y_i = xi[I2Y][:, None, :]
        vx_i = xi[I2VX][:, None, :]
        vy_i = xi[I2VY][:, None, :]
        fvxa = jnp.zeros((cap, capj, t), jnp.float32)
        fvya = jnp.zeros((cap, capj, t), jnp.float32)
        ixa = jnp.zeros((cap, capj, t), jnp.float32)
        iya = jnp.zeros((cap, capj, t), jnp.float32)
        for w in range(NW):
            xj = xj_ref[w]                 # (5, CAP, T)
            dx, dy = wrap(x_i - xj[J2X][None], y_i - xj[J2Y][None])
            dwv, inv_r, r = _wendland_dwv(dx, dy, xj[J2VOL][None], inv_h,
                                          factor_w)
            scale = dwv / (r + eps_r)
            fvxa = fvxa + (vx_i - xj[J2VX][None]) * scale
            fvya = fvya + (vy_i - xj[J2VY][None]) * scale
            ixa = ixa - (2.0 * dwv * inv_r) * dx
            iya = iya - (2.0 * dwv * inv_r) * dy
        fvx_ref[...] = jnp.sum(fvxa, axis=1)
        fvy_ref[...] = jnp.sum(fvya, axis=1)
        ix_ref[...] = jnp.sum(ixa, axis=1)
        iy_ref[...] = jnp.sum(iya, axis=1)

    @pl.when(wflag_ref[pl.program_id(0)] > 0)
    def _():
        xi = xi_ref[...]
        x_i = xi[I2X][:, None, :]
        y_i = xi[I2Y][:, None, :]
        vx_i = xi[I2VX][:, None, :]
        vy_i = xi[I2VY][:, None, :]
        fvxw = jnp.zeros((cap, t), jnp.float32)
        fvyw = jnp.zeros((cap, t), jnp.float32)
        ixw = jnp.zeros((cap, t), jnp.float32)
        iyw = jnp.zeros((cap, t), jnp.float32)
        for w in range(NW):
            wj = wj_ref[w]
            dx, dy = wrap(x_i - wj[WX][None], y_i - wj[WY][None])
            dwv, inv_r, r = _wendland_dwv(dx, dy, wj[WVOL][None], inv_h,
                                          factor_w)
            scale = 2.0 * dwv / (r + eps_r)
            fvxw = fvxw + jnp.sum((vx_i - wj[WVAX][None]) * scale, axis=1)
            fvyw = fvyw + jnp.sum((vy_i - wj[WVAY][None]) * scale, axis=1)
            ixw = ixw - jnp.sum((2.0 * dwv * inv_r) * dx, axis=1)
            iyw = iyw - jnp.sum((2.0 * dwv * inv_r) * dy, axis=1)
        fvx_ref[...] += fvxw
        fvy_ref[...] += fvyw
        ix_ref[...] += ixw
        iy_ref[...] += iyw


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "eps_r",
                                             "tile_c", "interpret",
                                             "box_x", "box_y"))
def visc_tvc_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                     eps_r: float, tile_c: int = 256, interpret: bool = False,
                     box_x: float = 0.0, box_y: float = 0.0):
    """Fused viscous + TVC inner+wall sweep.  xi_t: (4, CAP, C) [x,y,vx,vy];
    xj_t: (NW, 5, CAP, C) [x,y,vx,vy,vol].  Returns (fvx, fvy, ix, iy)."""
    kern = functools.partial(_visctvc_kernel, inv_h=inv_h, factor_w=factor_w,
                             eps_r=eps_r, box_x=box_x, box_y=box_y)
    return _call(kern, xi_t, xj_t, wj_t, wflag, 4, tile_c, interpret)


# ---------------------------------------------------------------------------
# XLA-side prep helpers
# ---------------------------------------------------------------------------

def gather_t(packed, nbr):
    """(C+1, CAP, CH) + (C, NW) -> (NW, CH, CAP, C) window gather in the
    transposed kernel layout."""
    return packed[nbr].transpose(1, 3, 2, 0)


def wall_flags(nbr_wall, c_max_wall: int, tile_c: int = 256, n_occ=None):
    """Per-tile int32 flag (n_tiles,), passed as scalar prefetch:
    1 = tile has occupied wall windows, 0 = occupied but wall-free,
    -1 = entirely beyond the occupied block range (skipped outright)."""
    c = nbr_wall.shape[0]
    has = jnp.any(nbr_wall < c_max_wall, axis=1)      # (C,)
    flags = jnp.any(has.reshape(c // tile_c, tile_c), axis=1).astype(jnp.int32)
    if n_occ is not None:
        tile_start = jnp.arange(c // tile_c, dtype=jnp.int32) * tile_c
        flags = jnp.where(tile_start < n_occ, flags, jnp.int32(-1))
    return flags


def _dens_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, sig_ref, sigw_ref, *,
                 inv_h, factor_w, box_x=0.0, box_y=0.0):
    """Density-summation sweep.  Two outputs:
      sig  = sum_w sum_j W_ij m_j over fluid windows, with m the 0/1 slot
             mask channel (the self pair contributes exactly W(0) = w0,
             replacing the explicit w0 seed of density_summation.cpp:40-45;
             the mask channel — not just FAR parking — keeps padding out
             of this pure-W sum under periodic wrap)
      sigw = sum_w sum_k W V_k over wall windows (m_k / rho0_k = V_k)."""
    wrap = _make_wrap(box_x, box_y)
    xi = xi_ref[...]                       # (2, CAP, T)
    t = xi.shape[-1]
    cap = xi.shape[-2]
    x_i = xi[0][:, None, :]
    y_i = xi[1][:, None, :]
    sig = jnp.zeros((cap, t), jnp.float32)

    def w_of(dx, dy):
        r2 = dx * dx + dy * dy
        q = jnp.sqrt(r2) * inv_h
        qc = jnp.minimum(q, 2.0)
        # WendlandC2 W = factor * (1 - q/2)^4 (2q + 1), 0 beyond q=2
        return factor_w * (1.0 - 0.5 * qc) ** 4 * (2.0 * qc + 1.0)

    for w in range(NW):
        xj = xj_ref[w]                     # (3, CAP, T) [x, y, mask]
        dx, dy = wrap(x_i - xj[0][None], y_i - xj[1][None])
        sig = sig + jnp.sum(w_of(dx, dy) * xj[2][None], axis=1)
    sig_ref[...] = sig
    sigw_ref[...] = jnp.zeros((cap, t), jnp.float32)

    @pl.when(wflag_ref[pl.program_id(0)] > 0)
    def _():
        sigw = jnp.zeros((cap, t), jnp.float32)
        for w in range(NW):
            wj = wj_ref[w]
            dx, dy = wrap(x_i - wj[WX][None], y_i - wj[WY][None])
            W = w_of(dx, dy)
            sigw = sigw + jnp.sum(W * wj[WVOL][None], axis=1)
        sigw_ref[...] = sigw


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "tile_c",
                                             "interpret", "box_x", "box_y"))
def density_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                    tile_c: int = 256, interpret: bool = False,
                    box_x: float = 0.0, box_y: float = 0.0):
    """Fused density-summation sweep.  xi_t: (2, CAP, C) positions;
    xj_t: (NW, 3, CAP, C) [x, y, slot-mask]; wj_t: the shared wall tensor.
    Returns (sig (CAP, C), sigw (CAP, C)): the fluid W*mask-sum (self pair
    included = the w0 seed) and the wall W*V-sum."""
    kern = functools.partial(_dens_kernel, inv_h=inv_h, factor_w=factor_w,
                             box_x=box_x, box_y=box_y)
    return _call(kern, xi_t, xj_t, wj_t, wflag, 2, tile_c, interpret)
