"""Profile the block-engine hot path piece by piece on the real TPU.

Each piece is looped inside ONE jit dispatch (lax.fori_loop) so the axon
tunnel latency is amortized; report per-iteration time.

Usage: python benchmarks/profile_block.py [dx]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.ops import pallas_sweep as ps


def timeit(name, fn, *args, iters=20):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.3f} ms/iter")
    return dt


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.005
    case, fluid = dbb.build_case(dx=dx)
    sim = dbb.init_sim(case, fluid)
    base = case.base
    kernel, dim, h = base.kernel, 2, base.adaptation.h
    print(f"dx={dx} n_fluid={base.n_fluid} n_wall={base.n_wall} "
          f"c_max={case.c_max} cap={case.cap} "
          f"n_occ={int(jnp.sum(sim.fluid_b['SlotMask'].any(axis=1)))} "
          f"platform={jax.devices()[0].platform}")

    # warm the flow a little
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * h / db.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    fb = sim.fluid_b
    nbr_inner, nbr_wall = sim.nbr_inner, sim.nbr_wall
    dt = jnp.asarray(1e-5, fb["Position"].dtype)

    ITERS = 20

    def loop(body):
        @jax.jit
        def run(fb):
            return jax.lax.fori_loop(0, ITERS, lambda i, f: body(f), fb)
        return run

    # 1. full advection step
    @jax.jit
    def adv_loop(s):
        return jax.lax.fori_loop(0, ITERS,
                                 lambda i, st: dbb._advection_step(case, st), s)
    timeit("advection_step (XLA, full)", adv_loop, sim, iters=ITERS)

    # 2. acoustic 1st half XLA (inner+wall)
    timeit("ac1 XLA (inner+wall)", loop(
        lambda f: fbops.acoustic_step_1st_half_b(
            f, nbr_inner, kernel, dim, base.eos, base.riemann, dt,
            wall_b=case.wall_b, nbr_wall=nbr_wall)), fb, iters=ITERS)

    # 3. acoustic 2nd half XLA
    timeit("ac2 XLA (inner+wall)", loop(
        lambda f: fbops.acoustic_step_2nd_half_b(
            f, nbr_inner, kernel, dim, base.riemann, dt,
            wall_b=case.wall_b, nbr_wall=nbr_wall)), fb, iters=ITERS)

    # 3b. ac1 XLA inner only
    timeit("ac1 XLA (inner only)", loop(
        lambda f: fbops.acoustic_step_1st_half_b(
            f, nbr_inner, kernel, dim, base.eos, base.riemann, dt)),
        fb, iters=ITERS)

    # 4. density summation
    timeit("density_summation XLA", loop(
        lambda f: fbops.density_summation_b(
            f, nbr_inner, kernel, dim, db.RHO0_F, base.adaptation.sigma0,
            contacts=[(case.wall_b, nbr_wall, db.RHO0_F)])), fb, iters=ITERS)

    # 5. re-slot
    def reslot(f):
        flat = {k: f[k].reshape((-1,) + f[k].shape[2:])
                for k in dbb._FLUID_FIELDS + ["OriginalID"]}
        valid = f["SlotMask"].reshape(-1)
        fb2, _, _, _ = dbb._slot_fluid(case, flat, valid)
        return fb2
    timeit("re-slot (sort + window search)", loop(reslot), fb, iters=ITERS)

    # 6. window gather alone
    packed = jax.jit(lambda f: fbops.pack_channels(
        f["Position"], f["Pressure"], f["VolumetricMeasure"]))(fb)

    @jax.jit
    def gather_loop(p):
        def body(i, acc):
            return acc + p[nbr_inner].sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), p.dtype))
    timeit("window row-gather packed[nbr] alone", gather_loop, packed,
           iters=ITERS)

    # 7. pallas path (if 2D fp32)
    casep, fluidp = dbb.build_case(dx=dx, use_pallas=True)
    simp = dbb.init_sim(casep, fluidp)
    simp = dbb.make_run_chunk(casep)(simp, jnp.asarray(3 * dt_adv,
                                                       simp.time.dtype))
    jax.block_until_ready(simp.fluid_b["Position"])
    fbp = simp.fluid_b

    wall_jt, wflags = jax.jit(lambda: fbops.pack_wall_t(
        casep.wall_b, simp.nbr_wall, casep.bm_wall.c_max, casep.tile_c))()

    timeit("ac1 PALLAS v2 (inner+wall fused)", loop(
        lambda f: fbops.acoustic_step_1st_half_p2(
            f, simp.nbr_inner, wall_jt, wflags, kernel, base.eos,
            base.riemann, dt, tile_c=casep.tile_c)),
        fbp, iters=ITERS)

    timeit("ac2 PALLAS v2 (inner+wall fused)", loop(
        lambda f: fbops.acoustic_step_2nd_half_p2(
            f, simp.nbr_inner, wall_jt, wflags, kernel, base.riemann, dt,
            tile_c=casep.tile_c)),
        fbp, iters=ITERS)

    # 8. pallas sweep alone with pre-gathered xj (compute-only cost)
    packed_s = jnp.asarray(
        jnp.concatenate([
            fb["Position"][..., 0:1], fb["Position"][..., 1:2],
            fb["Velocity"][..., 0:1], fb["Velocity"][..., 1:2],
            fb["Pressure"][..., None], fb["VolumetricMeasure"][..., None],
            fb["SlotMask"].astype(fb["Pressure"].dtype)[..., None],
            jnp.zeros_like(fb["Pressure"])[..., None]], axis=-1),
        jnp.float32)
    factor_w = float(kernel.factor_w(2))

    @jax.jit
    def sweep_loop(p):
        def body(i, acc):
            f, rd = ps.ac1_inner_sweep(p, nbr_inner, float(h), factor_w,
                                       1.0, tile_c=32)
            return acc + f.sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    timeit("pallas ac1 sweep (incl gather)", sweep_loop, packed_s, iters=ITERS)


if __name__ == "__main__":
    main()
