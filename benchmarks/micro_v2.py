"""Microbenchmark of the v2 (transposed fused Pallas) acoustic path."""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.ops import pallas_block2 as pb2

DX = float(os.environ.get("MB_DX", "0.005"))
K = int(os.environ.get("MB_K", "20"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {dt * 1e3 / K:9.3f} ms/iter")
    return out


def main():
    case, fluid = dbb.build_case(dx=DX, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    base = case.base
    kernel = base.kernel
    h = base.adaptation.h
    fb0 = sim.fluid_b
    nbr_i, nbr_w = sim.nbr_inner, sim.nbr_wall
    print(f"c_max={case.c_max} tile_c={case.tile_c}")

    wall_jt, wflags = jax.jit(lambda: fbops.pack_wall_t(
        case.wall_b, nbr_w, case.bm_wall.c_max, case.tile_c))()
    jax.block_until_ready(wall_jt)
    dt_ac = fbops.acoustic_time_step_b(fb0, base.eos, h)

    def loop(fn):
        @jax.jit
        def go(fb):
            def body(_, f):
                return fn(f)
            return jax.lax.fori_loop(0, K, body, fb)
        return go

    # full v2 acoustic step (ac1+ac2)
    def v2_step(f):
        f = fbops.acoustic_step_1st_half_p2(
            f, nbr_i, wall_jt, wflags, kernel, base.eos, base.riemann, dt_ac,
            tile_c=case.tile_c)
        f = fbops.acoustic_step_2nd_half_p2(
            f, nbr_i, wall_jt, wflags, kernel, base.riemann, dt_ac,
            tile_c=case.tile_c)
        return f
    timed("v2 acoustic step (ac1+ac2, in+wall)", loop(v2_step), fb0)

    # ac1 alone
    timed("v2 ac1 alone", loop(lambda f: fbops.acoustic_step_1st_half_p2(
        f, nbr_i, wall_jt, wflags, kernel, base.eos, base.riemann, dt_ac,
        tile_c=case.tile_c)), fb0)

    # prep alone: per-window gathers + stacks for ac1 channels
    c = nbr_i.shape[0]

    @jax.jit
    def prep_loop(fb):
        pos, vol, p = fb["Position"], fb["VolumetricMeasure"], fb["Pressure"]
        packed_j = jnp.concatenate([pos, p[..., None], vol[..., None]], -1)
        def body(_, acc):
            xj_t = jnp.stack(
                [packed_j[nbr_i[:, w]].transpose(2, 1, 0) for w in range(9)], 0)
            return acc + xj_t[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), pos.dtype))
    timed("ac1 xj prep alone (9 gathers + stack)", prep_loop, fb0)

    # kernel alone (static inputs)
    pos, vol, p = fb0["Position"], fb0["VolumetricMeasure"], fb0["Pressure"]
    packed_j = jnp.concatenate([pos, p[..., None], vol[..., None]], -1)
    xj_t = jnp.stack([packed_j[nbr_i[:, w]].transpose(2, 1, 0)
                      for w in range(9)], 0)
    acc_prior = fb0["ForcePrior"] / jnp.maximum(fb0["Mass"], 1e-15)[..., None]
    rho = fb0["Density"]
    xi_t = jnp.stack([pos[:c, :, 0].T, pos[:c, :, 1].T, p[:c].T, rho[:c].T,
                      acc_prior[:c, :, 0].T, acc_prior[:c, :, 1].T], 0)

    @jax.jit
    def kern_loop(xi_t, xj_t):
        def body(_, acc):
            fx, fy, rd = pb2.ac1_sweep_t(
                xi_t + acc[0, :1, None] * 0.0, xj_t,
                inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(2),
                inv_rho0c0=base.riemann.inv_rho0c0_ave, tile_c=case.tile_c)
            return acc + fx
        return jax.lax.fori_loop(0, K, body, jnp.zeros((16, c), xi_t.dtype))
    timed("ac1 fused kernel alone", kern_loop, xi_t, xj_t)

    # density summation (still jnp block form)
    from sphinxsys_tpu.cases import dambreak_2d as db

    @jax.jit
    def dens_loop(fb):
        def body(_, f):
            return fbops.density_summation_b(
                f, nbr_i, kernel, 2, db.RHO0_F, base.adaptation.sigma0,
                contacts=[(case.wall_b, nbr_w, db.RHO0_F)])
        return jax.lax.fori_loop(0, K, body, fb)
    timed("density summation (jnp block)", dens_loop, fb0)

    # CFL reduces
    @jax.jit
    def cfl_loop(fb):
        def body(_, acc):
            return acc + fbops.acoustic_time_step_b(fb, base.eos, h) \
                + fbops.advection_time_step_b(fb, h, db.U_REF)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), fb["Density"].dtype))
    timed("CFL reduces (ac + adv)", cfl_loop, fb0)

    # re-slot
    flat = {k: fb0[k].reshape((-1,) + fb0[k].shape[2:])
            for k in dbb._FLUID_FIELDS + ["OriginalID"]}
    valid = fb0["SlotMask"].reshape(-1)

    @jax.jit
    def slot_loop(pos):
        def body(_, pp):
            fb2, a, b, ovf = dbb._slot_fluid(case, dict(flat, Position=pp), valid)
            return pp + fb2["Position"][0, 0] * 0.0
        return jax.lax.fori_loop(0, K, body, pos)
    timed("re-slot", slot_loop, flat["Position"])

    # wall prep (once per advection step)
    @jax.jit
    def wall_prep_loop(x):
        def body(_, acc):
            wjt, wf = fbops.pack_wall_t(case.wall_b, nbr_w,
                                        case.bm_wall.c_max, case.tile_c)
            return acc + wjt[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), x.dtype))
    timed("wall prep (per advection step)", wall_prep_loop, flat["Position"])




def profile_full_step():
    """Time one full advection step (jitted alone) vs the component sum."""
    case, fluid = dbb.build_case(dx=DX, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    step = dbb.make_advection_step(case)
    sim = step(sim)          # warm flow + compile
    jax.block_until_ready(sim.fluid_b["Position"])
    t0 = time.perf_counter()
    for _ in range(10):
        sim = step(sim)
    jax.block_until_ready(sim.fluid_b["Position"])
    dt = (time.perf_counter() - t0) / 10
    print(f"full advection step (jit, incl reslot+density): {dt*1e3:9.3f} ms"
          f"  ({int(sim.n_ac)} ac steps total)")

    run = dbb.make_run_chunk(case)
    h = case.base.adaptation.h
    from sphinxsys_tpu.cases import dambreak_2d as db
    dt_adv = 0.25 * h / db.U_REF
    t_target = sim.time + 10 * dt_adv
    sim2 = run(sim, t_target)  # compile
    jax.block_until_ready(sim2.fluid_b["Position"])
    n0 = int(sim2.n_adv)
    t_target2 = sim2.time + 10 * dt_adv
    t0 = time.perf_counter()
    sim3 = run(sim2, t_target2)
    jax.block_until_ready(sim3.fluid_b["Position"])
    dt = time.perf_counter() - t0
    n = int(sim3.n_adv) - n0
    print(f"run_chunk: {dt*1e3/max(n,1):9.3f} ms/adv step ({n} steps, "
          f"{int(sim3.n_ac)-int(sim2.n_ac)} ac)")


if __name__ == "__main__":
    if os.environ.get("MB_FULL"):
        profile_full_step()
    else:
        main()
