"""Prototype: transposed-resident block state for the Pallas hot path.

Hypothesis (micro_layout.py): the (C, cap) / (C, cap, d) block arrays pad
their minor dims toward the TPU's (8,128) physical tiles, inflating HBM
traffic ~10-60x; keeping the ENTIRE resident fluid state in the kernels'
transposed layout — C on lanes, cap on sublanes, channels/components
leading — should collapse the prep cost of every sweep.

Measures the full acoustic 1st+2nd halves per layout, carrying the state
dict through a fori_loop (structure-preserving, no barrier tricks):
  current: acoustic_step_*_p2 on (C+1, cap[, d]) state
  transposed: prototype _t ops on (cap, C+1) / (d, cap, C+1) state

Usage: PYTHONPATH=... python benchmarks/micro_t.py [dx]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.ops import pallas_block2 as pb2

ITERS = 20
TINY = 1e-15


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:9.3f} ms/iter", flush=True)
    return out, dt


# --------------------------------------------------------------------------
# transposed prototype ops
# --------------------------------------------------------------------------

def to_t(fb, c):
    """(C+1, cap[, d]) dict -> transposed dict (cap, C+1) / (d, cap, C+1)."""
    ft = {}
    for k, v in fb.items():
        if v.ndim == 2:
            ft[k] = jnp.asarray(v.T)
        elif v.ndim == 3:
            ft[k] = jnp.asarray(v.transpose(2, 1, 0))
    return ft


def window_jt_t(packed_j, nbr, c, roll_y: bool = True, dim: int = 2):
    """Transposed-native window stack: (CH, CAP, C+1) + (C, NW)
    -> (NW, CH, CAP, C) via lane gathers + lane rolls."""
    nw = nbr.shape[1]
    ctr = (nw - 1) // 2
    base = packed_j[:, :, :c]
    if roll_y:
        gw = tuple(w for w in range(nw) if w not in (ctr - 1, ctr, ctr + 1))
    else:
        gw = tuple(w for w in range(nw) if w != ctr)
    out = [None] * nw
    for w in gw:
        out[w] = packed_j[:, :, nbr[:, w]]
    out[ctr] = base
    if roll_y:
        fill = jnp.zeros_like(base[..., :1])
        fill = fill.at[:dim].set(1.0e16)
        rolled_m = jnp.concatenate([fill, base[..., :-1]], axis=-1)
        rolled_p = jnp.concatenate([base[..., 1:], fill], axis=-1)
        ar = jnp.arange(nbr.shape[0], dtype=nbr.dtype)
        valid_m = (nbr[:, ctr - 1] == ar - 1)[None, None, :]
        valid_p = (nbr[:, ctr + 1] == ar + 1)[None, None, :]
        far = jnp.zeros_like(base)
        far = far.at[:dim].set(1.0e16)
        out[ctr - 1] = jnp.where(valid_m, rolled_m, far)
        out[ctr + 1] = jnp.where(valid_p, rolled_p, far)
    return jnp.stack(out, axis=0)


def ac1_t(ft, nbr, wall_jt, wflags, kernel, eos, riemann, dt, tile_c, c):
    mask = ft["SlotMask"]
    rho = jnp.where(mask, ft["Density"] + ft["DensityChangeRate"] * (0.5 * dt),
                    ft["Density"])
    p = eos.pressure(rho)
    pos = ft["Position"] + jnp.where(mask[None], ft["Velocity"] * (0.5 * dt),
                                     0.0)
    vol = ft["VolumetricMeasure"]
    packed_j = jnp.concatenate([pos, p[None], vol[None]], axis=0)
    xj_t = window_jt_t(packed_j, nbr, c)
    acc_prior = ft["ForcePrior"] / jnp.maximum(ft["Mass"], TINY)[None]
    xi_t = jnp.concatenate([pos[:, :, :c], p[None, :, :c], rho[None, :, :c],
                            acc_prior[:, :, :c]], axis=0)
    f0, f1, rd = pb2.ac1_sweep_t(
        xi_t, xj_t, wall_jt, wflags, inv_h=1.0 / kernel.h,
        factor_w=kernel._factor_w(2), inv_rho0c0=riemann.inv_rho0c0_ave,
        tile_c=tile_c)
    force = jnp.stack([f0, f1], axis=0)          # (2, cap, C)
    pad = jnp.zeros_like(ft["Force"][:, :, c:])
    force_total = ft["Force"] + jnp.concatenate(
        [force * vol[None, :, :c], pad], axis=-1)
    drho = jnp.concatenate([rd * rho[:, :c], ft["DensityChangeRate"][:, c:]],
                           axis=-1)
    vel = ft["Velocity"] + jnp.where(
        mask[None], (ft["ForcePrior"] + force_total)
        / jnp.maximum(ft["Mass"], TINY)[None] * dt, 0.0)
    out = dict(ft)
    out.update({"Density": rho, "Pressure": p, "Position": pos,
                "Force": force_total, "DensityChangeRate": drho,
                "Velocity": vel})
    return out


def ac2_t(ft, nbr, wall_jt, wflags, kernel, riemann, dt, tile_c, c):
    from sphinxsys_tpu.physics.riemann import AcousticRiemannSolver
    mask = ft["SlotMask"]
    pos = ft["Position"] + jnp.where(mask[None], ft["Velocity"] * (0.5 * dt),
                                     0.0)
    vel = ft["Velocity"]
    rho = ft["Density"]
    vol = ft["VolumetricMeasure"]
    packed_j = jnp.concatenate([pos, vel, vol[None]], axis=0)
    xj_t = window_jt_t(packed_j, nbr, c)
    xi_t = jnp.concatenate([pos[:, :, :c], vel[:, :, :c]], axis=0)
    geo, limiter = riemann.rho0c0_geo_ave, riemann.limiter_coeff
    dcr, f0, f1 = pb2.ac2_sweep_t(
        xi_t, xj_t, wall_jt, wflags, inv_h=1.0 / kernel.h,
        factor_w=kernel._factor_w(2), rho0c0_geo=geo,
        inv_c0=riemann.inv_c0_ave, limiter_coeff=limiter, tile_c=tile_c)
    force = jnp.stack([f0, f1], axis=0) * vol[None, :, :c]
    drho = ft["DensityChangeRate"] + jnp.concatenate(
        [dcr * rho[:, :c], jnp.zeros_like(rho[:, c:])], axis=-1)
    force_full = jnp.concatenate([force, jnp.zeros_like(vel[:, :, c:])], -1)
    rho_new = jnp.where(mask, rho + drho * (0.5 * dt), rho)
    out = dict(ft)
    out.update({"Position": pos, "DensityChangeRate": drho,
                "Force": force_full, "Density": rho_new})
    return out


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0025
    case, fluid = dbb.build_case(dx=dx, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    base = case.base
    kernel = base.kernel
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * base.adaptation.h / db.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    fb = dict(sim.fluid_b)
    nbr_inner, nbr_wall = sim.nbr_inner, sim.nbr_wall
    c = nbr_inner.shape[0]
    print(f"dx={dx} n_fluid={base.n_fluid} c_max={c} "
          f"platform={jax.devices()[0].platform}", flush=True)
    dtv = jnp.asarray(1e-5, jnp.float32)
    eos, riemann = base.eos, base.riemann

    wall_jt, wflags = jax.jit(lambda: fbops.pack_wall_t(
        case.wall_b, nbr_wall, case.bm_wall.c_max, case.tile_c))()
    jax.block_until_ready(wall_jt)

    # current path: ac1+ac2 chained, carry = fb
    @jax.jit
    def cur_loop(f, wjt, wfl):
        def body(i, g):
            g = fbops.acoustic_step_1st_half_p2(
                g, nbr_inner, wjt, wfl, kernel, eos, riemann, dtv,
                tile_c=case.tile_c)
            g = fbops.acoustic_step_2nd_half_p2(
                g, nbr_inner, wjt, wfl, kernel, riemann, dtv,
                tile_c=case.tile_c)
            return g
        return jax.lax.fori_loop(0, ITERS, body, f)
    timeit("CURRENT ac1+ac2 (p2)", cur_loop, fb, wall_jt, wflags)

    # transposed path
    ft = jax.jit(lambda f: to_t(f, c))(fb)
    jax.block_until_ready(ft)

    @jax.jit
    def t_loop(f, wjt, wfl):
        def body(i, g):
            g = ac1_t(g, nbr_inner, wjt, wfl, kernel, eos, riemann, dtv,
                      case.tile_c, c)
            g = ac2_t(g, nbr_inner, wjt, wfl, kernel, riemann, dtv,
                      case.tile_c, c)
            return g
        return jax.lax.fori_loop(0, ITERS, body, f)
    out_t, _ = timeit("TRANSPOSED ac1+ac2 (t)", t_loop, ft, wall_jt, wflags)

    # numeric parity after one chained double-step
    one_cur = jax.jit(lambda f, wjt, wfl: fbops.acoustic_step_2nd_half_p2(
        fbops.acoustic_step_1st_half_p2(f, nbr_inner, wjt, wfl, kernel, eos,
                                        riemann, dtv, tile_c=case.tile_c),
        nbr_inner, wjt, wfl, kernel, riemann, dtv, tile_c=case.tile_c))(
            fb, wall_jt, wflags)
    one_t = jax.jit(lambda f, wjt, wfl: ac2_t(
        ac1_t(f, nbr_inner, wjt, wfl, kernel, eos, riemann, dtv, case.tile_c,
              c), nbr_inner, wjt, wfl, kernel, riemann, dtv, case.tile_c, c))(
            ft, wall_jt, wflags)
    for k in ("Velocity", "Density", "Position"):
        a = one_cur[k]
        b = one_t[k].T if one_t[k].ndim == 2 else one_t[k].transpose(2, 1, 0)
        m = one_cur["SlotMask"]
        if a.ndim == 3:
            m = m[..., None]
        diff = float(jnp.max(jnp.abs(jnp.where(m, a - b, 0.0))))
        print(f"parity {k}: max|diff| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
