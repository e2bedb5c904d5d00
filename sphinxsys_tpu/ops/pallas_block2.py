"""Fused transposed Pallas sweeps for the cell-block WCSPH hot path.

Second-generation kernels (replacing ops/pallas_sweep.py): the pair axes
(cap_i, cap_j) live on majors/sublanes and the CELL axis rides the VPU
lanes, so every elementwise op runs on dense (8,128) tiles — measured
~2x the slot throughput of the XLA block engine and ~5x the first-gen
(T,16,16) kernels, whose 16-wide minor dim wasted 7/8 lanes (and whose
(T,16,16)->(T,256) reshape Mosaic rejects outright).

Dimension-generic: every kernel takes a static `dim` (2 or 3); the window
loop runs over 3^dim offsets and all channel layouts scale with dim.

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
    halves (e_ij = 0 and p_i - p_j = 0), so no identity mask either;
  * `wall_static=True` drops the wall tensor's velocity/acceleration
    channels (identically zero for fixed tank walls): wall channels
    shrink from 3*dim+1 to 2*dim+1 — in 3D that tensor is HBM-resident
    at (3^dim, ch, cap, C) and the cut is the difference between fitting
    1M+ particles and not.

Channel layouts (transposed, shape (CH, CAP, C)); d = dim:
  fluid i ac1: [pos(d), p, rho, ap(d)]   (ap = prior accel, for wall term)
  fluid j ac1: [pos(d), p, vol]
  fluid i ac2: [pos(d), vel(d)]
  fluid j ac2: [pos(d), vel(d), vol]
  wall  j    : [pos(d), vol, va(d), n(d), aw(d)]  (moving; shared halves)
  wall  j    : [pos(d), vol, n(d)]                (wall_static)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 16
NW = 9


def _nw(dim: int) -> int:
    return 3 ** dim


def _wall_idx(dim: int, static: bool):
    """Channel indices (vol, va, n, aw) in the wall tensor layout."""
    if static:
        return dim, None, dim + 1, None
    return dim, dim + 1, 2 * dim + 1, 3 * dim + 1


def _wendland_dwv(d, vol_j, inv_h, factor_w):
    """dW/dr * V_j and (inv_r, r) for Wendland C2 pairs given the list of
    displacement components.  (qc-2)^3*qc is exactly zero at the 2h
    cutoff, so clamping q replaces the support test
    (kernel_wendland_c2.cpp dW)."""
    r2 = sum(c * c for c in d) + 1e-15
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    qc = jnp.minimum(r * inv_h, 2.0)
    dwv = ((factor_w * inv_h * 0.625) * (qc - 2.0) ** 3 * qc) * vol_j
    return dwv, inv_r, r


def _make_wrap(box):
    """Static minimum-image wrapper for periodic axes (box length 0 = not
    periodic; the Python branches vanish at trace time).  Padding safety
    under wrap: periodic engines must park padding with VOL = 0 (every
    pair term is proportional to dW*V_j) and pass a mask channel to the
    pure-W density sweep — FAR-parked positions alone are not enough,
    because the wrap can fold them back into range."""
    def wrap(d):
        return [c - L * jnp.round(c * (1.0 / L)) if L > 0.0 else c
                for c, L in zip(d, box)]

    return wrap


def _ac1_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, *o_refs, dim, inv_h,
                factor_w, inv_rho0c0, box, wall_static, mode="both"):
    # o_refs = f_refs[0..dim) + (rd_ref,)
    wrap = _make_wrap(box)
    nw_i = xj_ref.shape[0]   # window-chunkable
    nw_w = wj_ref.shape[0]
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]          # slots per cell (configurable)
    capj = xj_ref.shape[-2]
    WVOL, WVA, WN, WAW = _wall_idx(dim, wall_static)
    for r in o_refs:
        r[...] = jnp.zeros((cap, t), jnp.float32)

    # tiles beyond the occupied block range are all-sentinel: skip;
    # mode gating happens at TRACE time so a skipped branch emits no code
    # (and costs no scoped VMEM)
    def _inner():
        xi = xi_ref[...]                   # (2d+2, CAP, T)
        x_i = [xi[k][:, None, :] for k in range(dim)]
        p_i = xi[dim][:, None, :]
        # 2D: accumulate (cap, capj, t) and reduce once (fastest measured);
        # 3D: reduce per window — the wide accumulators blow the 16M
        # scoped-VMEM budget at 27 windows
        wide = dim == 2
        ash = (cap, capj, t) if wide else (cap, t)
        facc = [jnp.zeros(ash, jnp.float32) for _ in range(dim)]
        rda = jnp.zeros(ash, jnp.float32)
        for w in range(nw_i):
            xj = xj_ref[w]                 # (d+2, CAP, T)
            d = wrap([x_i[k] - xj[k][None] for k in range(dim)])
            dwv, inv_r, _ = _wendland_dwv(d, xj[dim + 1][None], inv_h,
                                          factor_w)
            p_j = xj[dim][None]
            psum = (p_i + p_j) * dwv * inv_r
            for k in range(dim):
                term = psum * d[k]
                facc[k] = facc[k] - (term if wide else jnp.sum(term, axis=1))
            term = (p_i - p_j) * dwv
            rda = rda + (term if wide else jnp.sum(term, axis=1))
        for k in range(dim):
            o_refs[k][...] = jnp.sum(facc[k], axis=1) if wide else facc[k]
        o_refs[dim][...] = (jnp.sum(rda, axis=1) if wide else rda) * inv_rho0c0

    if mode != "wall":
        pl.when(wflag_ref[pl.program_id(0)] >= 0)(_inner)

    # wall windows (fluid_integration.hpp:89-113): p-in-wall hydrostatic
    # reconstruction from the prior acceleration; predicated per tile
    def _wall():
        xi = xi_ref[...]
        x_i = [xi[k][:, None, :] for k in range(dim)]
        p_i = xi[dim][:, None, :]
        rho_i = xi[dim + 1][:, None, :]
        a_i = [xi[dim + 2 + k][:, None, :] for k in range(dim)]
        fw = [jnp.zeros((cap, t), jnp.float32) for _ in range(dim)]
        rdw = jnp.zeros((cap, t), jnp.float32)
        for w in range(nw_w):
            wj = wj_ref[w]
            d = wrap([x_i[k] - wj[k][None] for k in range(dim)])
            dwv, inv_r, r = _wendland_dwv(d, wj[WVOL][None], inv_h, factor_w)
            e = [c * inv_r for c in d]
            if wall_static:
                face_acc = sum(a_i[k] * (-e[k]) for k in range(dim))
            else:
                face_acc = sum((a_i[k] - wj[WAW + k][None]) * (-e[k])
                               for k in range(dim))
            p_wall = p_i + rho_i * r * jnp.maximum(face_acc, 0.0)
            psum = (p_i + p_wall) * dwv * inv_r
            for k in range(dim):
                fw[k] = fw[k] - jnp.sum(psum * d[k], axis=1)
            rdw = rdw + jnp.sum((p_i - p_wall) * dwv, axis=1)
        for k in range(dim):
            o_refs[k][...] += fw[k]
        o_refs[dim][...] += rdw * inv_rho0c0

    if mode != "inner":
        pl.when(wflag_ref[pl.program_id(0)] > 0)(_wall)


def _ac2_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, dcr_ref, *f_refs, dim,
                inv_h, factor_w, rho0c0_geo, inv_c0, limiter_coeff, box,
                wall_static, mode="both"):
    wrap = _make_wrap(box)
    nw_i = xj_ref.shape[0]   # window-chunkable
    nw_w = wj_ref.shape[0]
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]
    capj = xj_ref.shape[-2]
    WVOL, WVA, WN, WAW = _wall_idx(dim, wall_static)
    dcr_ref[...] = jnp.zeros((cap, t), jnp.float32)
    for r in f_refs:
        r[...] = jnp.zeros((cap, t), jnp.float32)

    def _inner():
        xi = xi_ref[...]                   # (2d, CAP, T)
        x_i = [xi[k][:, None, :] for k in range(dim)]
        v_i = [xi[dim + k][:, None, :] for k in range(dim)]
        wide = dim == 2                    # see _ac1_kernel note
        ash = (cap, capj, t) if wide else (cap, t)
        dcra = jnp.zeros(ash, jnp.float32)
        facc = [jnp.zeros(ash, jnp.float32) for _ in range(dim)]
        for w in range(nw_i):
            xj = xj_ref[w]                 # (2d+1, CAP, T)
            d = wrap([x_i[k] - xj[k][None] for k in range(dim)])
            dwv, inv_r, _ = _wendland_dwv(d, xj[2 * dim][None], inv_h,
                                          factor_w)
            e = [c * inv_r for c in d]
            u_jump = sum((v_i[k] - xj[dim + k][None]) * e[k]
                         for k in range(dim))
            term = u_jump * dwv
            dcra = dcra + (term if wide else jnp.sum(term, axis=1))
            lim = jnp.minimum(
                limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0), 1.0)
            pj = rho0c0_geo * u_jump * lim * dwv
            for k in range(dim):
                term = pj * e[k]
                facc[k] = facc[k] + (term if wide else jnp.sum(term, axis=1))
        dcr_ref[...] = jnp.sum(dcra, axis=1) if wide else dcra
        for k in range(dim):
            f_refs[k][...] = jnp.sum(facc[k], axis=1) if wide else facc[k]

    if mode != "wall":
        pl.when(wflag_ref[pl.program_id(0)] >= 0)(_inner)

    def _wall():
        xi = xi_ref[...]
        x_i = [xi[k][:, None, :] for k in range(dim)]
        v_i = [xi[dim + k][:, None, :] for k in range(dim)]
        dcrw = jnp.zeros((cap, t), jnp.float32)
        fw = [jnp.zeros((cap, t), jnp.float32) for _ in range(dim)]
        for w in range(nw_w):
            wj = wj_ref[w]
            d = wrap([x_i[k] - wj[k][None] for k in range(dim)])
            dwv, inv_r, _ = _wendland_dwv(d, wj[WVOL][None], inv_h, factor_w)
            e = [c * inv_r for c in d]
            n = [wj[WN + k][None] for k in range(dim)]
            e_dot_n = sum(e[k] * n[k] for k in range(dim))
            sgn = jnp.sign(e_dot_n)
            fn = [sgn * c for c in n]
            # vel_in_wall = 2 v_ave - v_i -> v_i - vel_in_wall = 2 (v_i - v_ave)
            if wall_static:
                dv = [2.0 * v_i[k] for k in range(dim)]
            else:
                dv = [2.0 * (v_i[k] - wj[WVA + k][None]) for k in range(dim)]
            dcrw = dcrw + jnp.sum(
                sum(dv[k] * e[k] for k in range(dim)) * dwv, axis=1)
            u_jump = sum(dv[k] * fn[k] for k in range(dim))
            lim = jnp.minimum(
                limiter_coeff * inv_c0 * jnp.maximum(u_jump, 0.0), 1.0)
            pj = rho0c0_geo * u_jump * lim * dwv
            for k in range(dim):
                fw[k] = fw[k] + jnp.sum(pj * fn[k], axis=1)
        dcr_ref[...] += dcrw
        for k in range(dim):
            f_refs[k][...] += fw[k]

    if mode != "inner":
        pl.when(wflag_ref[pl.program_id(0)] > 0)(_wall)


def _split_call(kern_of_mode, xi_t, xj_t, wj_t, wflag, n_out, tile_c,
                interpret=False):
    """Run the inner and wall window sweeps as SEPARATE pallas calls (each
    with a 1-slot dummy for the other side's tensor) and sum the outputs.
    Halves the peak scoped-VMEM residency: the fused kernel must hold both
    double-buffered j-tensors at once, which overflows the ~16M budget for
    3D (27-window) sweeps at production caps."""
    nw, c = xj_t.shape[0], xi_t.shape[-1]
    dummy_w = jnp.zeros((nw, wj_t.shape[1], 1, c), jnp.float32)
    dummy_j = jnp.zeros((nw, xj_t.shape[1], 1, c), jnp.float32)
    outs_i = _call(kern_of_mode("inner"), xi_t, xj_t, dummy_w, wflag, n_out,
                   tile_c, interpret)
    outs_w = _call(kern_of_mode("wall"), xi_t, dummy_j, wj_t, wflag, n_out,
                   tile_c, interpret)
    return tuple(a + b for a, b in zip(outs_i, outs_w))


def _side_call(kern_of_mode, side, xi_t, xj_t, wj_t, wflag, n_out, tile_c,
               interpret=False):
    """Single-side sweep (window chunking): side="inner" runs only the
    fluid windows of the given xj_t chunk (wall tensor replaced by a
    1-window dummy — the mode-gated wall branch emits no code); "wall"
    the converse.  Outputs ACCUMULATE across chunk calls by summation."""
    c = xi_t.shape[-1]
    if side == "inner":
        dummy_w = jnp.zeros((1, wj_t.shape[1], 1, c), jnp.float32)
        return _call(kern_of_mode("inner"), xi_t, xj_t, dummy_w, wflag,
                     n_out, tile_c, interpret)
    dummy_j = jnp.zeros((1, xj_t.shape[1], 1, c), jnp.float32)
    return _call(kern_of_mode("wall"), xi_t, dummy_j, wj_t, wflag, n_out,
                 tile_c, interpret)


def _call(kern, xi_t, xj_t, wj_t, wflag, n_out, tile_c, interpret=False):
    chi, cap, c = xi_t.shape
    nwj, chj, capj = xj_t.shape[0], xj_t.shape[1], xj_t.shape[2]
    nww, chw, capw = wj_t.shape[0], wj_t.shape[1], wj_t.shape[2]
    if c % tile_c != 0:
        raise ValueError(f"block count {c} not a multiple of tile_c={tile_c}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // tile_c,),
        in_specs=[
            pl.BlockSpec((chi, cap, tile_c), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nwj, chj, capj, tile_c), lambda i, *_: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nww, chw, capw, tile_c), lambda i, *_: (0, 0, 0, i),
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
                                             "interpret", "box_x", "box_y",
                                             "box_z", "dim", "wall_static",
                                             "split_wall", "side"))
def ac1_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                inv_rho0c0: float, tile_c: int = 256, interpret: bool = False,
                box_x: float = 0.0, box_y: float = 0.0, box_z: float = 0.0,
                dim: int = 2, wall_static: bool = False,
                split_wall: bool = False, side: str = ""):
    """Fused 1st-half inner+wall sweep.  Returns (f[0..dim), rd), (cap, C).
    `side`: "" = fused/split per split_wall; "inner"/"wall" = one side only
    (window chunking — pass a window SUBSET as xj_t and sum outputs)."""
    kern = lambda mode: functools.partial(
        _ac1_kernel, dim=dim, inv_h=inv_h, factor_w=factor_w,
        inv_rho0c0=inv_rho0c0, box=(box_x, box_y, box_z)[:dim],
        wall_static=wall_static, mode=mode)
    if side:
        return _side_call(kern, side, xi_t, xj_t, wj_t, wflag, dim + 1,
                          tile_c, interpret)
    if split_wall:
        return _split_call(kern, xi_t, xj_t, wj_t, wflag, dim + 1, tile_c,
                           interpret)
    return _call(kern("both"), xi_t, xj_t, wj_t, wflag, dim + 1, tile_c,
                 interpret)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "rho0c0_geo",
                                             "inv_c0", "limiter_coeff",
                                             "tile_c", "interpret",
                                             "box_x", "box_y", "box_z",
                                             "dim", "wall_static",
                                             "split_wall", "side"))
def ac2_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                rho0c0_geo: float, inv_c0: float, limiter_coeff: float,
                tile_c: int = 256, interpret: bool = False,
                box_x: float = 0.0, box_y: float = 0.0, box_z: float = 0.0,
                dim: int = 2, wall_static: bool = False,
                split_wall: bool = False, side: str = ""):
    """Fused 2nd-half inner+wall sweep.  Returns (dcr, f[0..dim)), (CAP, C)."""
    kern = lambda mode: functools.partial(
        _ac2_kernel, dim=dim, inv_h=inv_h, factor_w=factor_w,
        rho0c0_geo=rho0c0_geo, inv_c0=inv_c0, limiter_coeff=limiter_coeff,
        box=(box_x, box_y, box_z)[:dim], wall_static=wall_static, mode=mode)
    if side:
        return _side_call(kern, side, xi_t, xj_t, wj_t, wflag, dim + 1,
                          tile_c, interpret)
    if split_wall:
        return _split_call(kern, xi_t, xj_t, wj_t, wflag, dim + 1, tile_c,
                           interpret)
    return _call(kern("both"), xi_t, xj_t, wj_t, wflag, dim + 1, tile_c,
                 interpret)


def _visctvc_kernel(wflag_ref, xi_ref, xj_ref, wj_ref, *o_refs, dim, inv_h,
                    factor_w, eps_r, box, wall_static, mode="both"):
    """Fused viscous-force + transport-velocity-correction sweep.
    o_refs = fv[0..dim) + I[0..dim).

    Both read the SAME j data ([pos, vel, vol], the ac2 layout), so one
    window pass produces both (viscous_dynamics.hpp Newtonian inner+wall and
    transport_velocity_correction.hpp:37-67):
      fv_i = sum_w sum_j (v_i - v_j) / (r + eps_r) dW V_j      (x 2mu outside;
             wall jump doubled against the averaged wall velocity)
      I_i  = -sum_w sum_j 2 dW V_j e_ij                        (+ wall term)
    """
    wrap = _make_wrap(box)
    nw_i = xj_ref.shape[0]   # window-chunkable
    nw_w = wj_ref.shape[0]
    t = xi_ref.shape[-1]
    cap = xi_ref.shape[-2]
    capj = xj_ref.shape[-2]
    WVOL, WVA, WN, WAW = _wall_idx(dim, wall_static)
    for r in o_refs:
        r[...] = jnp.zeros((cap, t), jnp.float32)

    def _inner():
        xi = xi_ref[...]                   # (2d, CAP, T)
        x_i = [xi[k][:, None, :] for k in range(dim)]
        v_i = [xi[dim + k][:, None, :] for k in range(dim)]
        wide = dim == 2                    # see _ac1_kernel note
        ash = (cap, capj, t) if wide else (cap, t)
        fva = [jnp.zeros(ash, jnp.float32) for _ in range(dim)]
        ia = [jnp.zeros(ash, jnp.float32) for _ in range(dim)]
        for w in range(nw_i):
            xj = xj_ref[w]                 # (2d+1, CAP, T)
            d = wrap([x_i[k] - xj[k][None] for k in range(dim)])
            dwv, inv_r, r = _wendland_dwv(d, xj[2 * dim][None], inv_h,
                                          factor_w)
            scale = dwv / (r + eps_r)
            for k in range(dim):
                t1 = (v_i[k] - xj[dim + k][None]) * scale
                t2 = (2.0 * dwv * inv_r) * d[k]
                fva[k] = fva[k] + (t1 if wide else jnp.sum(t1, axis=1))
                ia[k] = ia[k] - (t2 if wide else jnp.sum(t2, axis=1))
        for k in range(dim):
            o_refs[k][...] = jnp.sum(fva[k], axis=1) if wide else fva[k]
            o_refs[dim + k][...] = jnp.sum(ia[k], axis=1) if wide else ia[k]

    if mode != "wall":
        pl.when(wflag_ref[pl.program_id(0)] >= 0)(_inner)

    def _wall():
        xi = xi_ref[...]
        x_i = [xi[k][:, None, :] for k in range(dim)]
        v_i = [xi[dim + k][:, None, :] for k in range(dim)]
        fvw = [jnp.zeros((cap, t), jnp.float32) for _ in range(dim)]
        iw = [jnp.zeros((cap, t), jnp.float32) for _ in range(dim)]
        for w in range(nw_w):
            wj = wj_ref[w]
            d = wrap([x_i[k] - wj[k][None] for k in range(dim)])
            dwv, inv_r, r = _wendland_dwv(d, wj[WVOL][None], inv_h, factor_w)
            scale = 2.0 * dwv / (r + eps_r)
            for k in range(dim):
                dv = v_i[k] if wall_static else v_i[k] - wj[WVA + k][None]
                fvw[k] = fvw[k] + jnp.sum(dv * scale, axis=1)
                iw[k] = iw[k] - jnp.sum((2.0 * dwv * inv_r) * d[k], axis=1)
        for k in range(dim):
            o_refs[k][...] += fvw[k]
            o_refs[dim + k][...] += iw[k]

    if mode != "inner":
        pl.when(wflag_ref[pl.program_id(0)] > 0)(_wall)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "eps_r",
                                             "tile_c", "interpret",
                                             "box_x", "box_y", "box_z",
                                             "dim", "wall_static",
                                             "split_wall", "side"))
def visc_tvc_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                     eps_r: float, tile_c: int = 256, interpret: bool = False,
                     box_x: float = 0.0, box_y: float = 0.0,
                     box_z: float = 0.0, dim: int = 2,
                     wall_static: bool = False, split_wall: bool = False,
                     side: str = ""):
    """Fused viscous + TVC inner+wall sweep.  xi_t: (2d, CAP, C) [pos, vel];
    xj_t: (NW, 2d+1, CAP, C) [pos, vel, vol].  Returns (fv[0..d), I[0..d))."""
    kern = lambda mode: functools.partial(
        _visctvc_kernel, dim=dim, inv_h=inv_h, factor_w=factor_w, eps_r=eps_r,
        box=(box_x, box_y, box_z)[:dim], wall_static=wall_static, mode=mode)
    if side:
        return _side_call(kern, side, xi_t, xj_t, wj_t, wflag, 2 * dim,
                          tile_c, interpret)
    if split_wall:
        return _split_call(kern, xi_t, xj_t, wj_t, wflag, 2 * dim, tile_c,
                           interpret)
    return _call(kern("both"), xi_t, xj_t, wj_t, wflag, 2 * dim, tile_c,
                 interpret)


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
                 dim, inv_h, factor_w, box, wall_static, mode="both"):
    """Density-summation sweep.  Two outputs:
      sig  = sum_w sum_j W_ij m_j over fluid windows, with m the 0/1 slot
             mask channel (the self pair contributes exactly W(0) = w0,
             replacing the explicit w0 seed of density_summation.cpp:40-45;
             the mask channel — not just FAR parking — keeps padding out
             of this pure-W sum under periodic wrap)
      sigw = sum_w sum_k W V_k over wall windows (m_k / rho0_k = V_k)."""
    wrap = _make_wrap(box)
    nw_i = xj_ref.shape[0]   # window-chunkable
    nw_w = wj_ref.shape[0]
    WVOL = _wall_idx(dim, wall_static)[0]
    xi = xi_ref[...]                       # (d, CAP, T)
    t = xi.shape[-1]
    cap = xi.shape[-2]
    x_i = [xi[k][:, None, :] for k in range(dim)]
    sig = jnp.zeros((cap, t), jnp.float32)

    def w_of(d):
        r2 = sum(c * c for c in d)
        q = jnp.sqrt(r2) * inv_h
        qc = jnp.minimum(q, 2.0)
        # WendlandC2 W = factor * (1 - q/2)^4 (2q + 1), 0 beyond q=2
        return factor_w * (1.0 - 0.5 * qc) ** 4 * (2.0 * qc + 1.0)

    if mode != "wall":
        for w in range(nw_i):
            xj = xj_ref[w]                 # (d+1, CAP, T) [pos, mask]
            d = wrap([x_i[k] - xj[k][None] for k in range(dim)])
            sig = sig + jnp.sum(w_of(d) * xj[dim][None], axis=1)
    sig_ref[...] = sig
    sigw_ref[...] = jnp.zeros((cap, t), jnp.float32)

    def _wall():
        sigw = jnp.zeros((cap, t), jnp.float32)
        for w in range(nw_w):
            wj = wj_ref[w]
            d = wrap([x_i[k] - wj[k][None] for k in range(dim)])
            sigw = sigw + jnp.sum(w_of(d) * wj[WVOL][None], axis=1)
        sigw_ref[...] = sigw

    if mode != "inner":
        pl.when(wflag_ref[pl.program_id(0)] > 0)(_wall)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "tile_c",
                                             "interpret", "box_x", "box_y",
                                             "box_z", "dim", "wall_static",
                                             "split_wall", "side"))
def density_sweep_t(xi_t, xj_t, wj_t, wflag, inv_h: float, factor_w: float,
                    tile_c: int = 256, interpret: bool = False,
                    box_x: float = 0.0, box_y: float = 0.0,
                    box_z: float = 0.0, dim: int = 2,
                    wall_static: bool = False, split_wall: bool = False,
                    side: str = ""):
    """Fused density-summation sweep.  xi_t: (d, CAP, C) positions;
    xj_t: (NW, d+1, CAP, C) [pos, slot-mask]; wj_t: the shared wall tensor.
    Returns (sig (CAP, C), sigw (CAP, C)): the fluid W*mask-sum (self pair
    included = the w0 seed) and the wall W*V-sum."""
    kern = lambda mode: functools.partial(
        _dens_kernel, dim=dim, inv_h=inv_h, factor_w=factor_w,
        box=(box_x, box_y, box_z)[:dim], wall_static=wall_static, mode=mode)
    if side:
        return _side_call(kern, side, xi_t, xj_t, wj_t, wflag, 2, tile_c,
                          interpret)
    if split_wall:
        return _split_call(kern, xi_t, xj_t, wj_t, wflag, 2, tile_c,
                           interpret)
    return _call(kern("both"), xi_t, xj_t, wj_t, wflag, 2, tile_c, interpret)
