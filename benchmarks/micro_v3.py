"""Isolate the acoustic-loop overhead: fori vs while, constant vs computed dt."""
import os, time
import jax
import jax.numpy as jnp
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops

DX = float(os.environ.get("MB_DX", "0.005"))
K = 20

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)*1e3/K:9.3f} ms/iter")

def main():
    case, fluid = dbb.build_case(dx=DX, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    base, kernel, h = case.base, case.base.kernel, case.base.adaptation.h
    fb0 = sim.fluid_b
    nbr_i, nbr_w = sim.nbr_inner, sim.nbr_wall
    wall_jt, wflags = jax.jit(lambda: fbops.pack_wall_t(
        case.wall_b, nbr_w, case.bm_wall.c_max, case.tile_c))()
    jax.block_until_ready(wall_jt)
    dt_const = fbops.acoustic_time_step_b(fb0, base.eos, h)

    def ac(f, dt):
        f = fbops.acoustic_step_1st_half_p2(f, nbr_i, wall_jt, wflags, kernel,
                                            base.eos, base.riemann, dt,
                                            tile_c=case.tile_c)
        f = fbops.acoustic_step_2nd_half_p2(f, nbr_i, wall_jt, wflags, kernel,
                                            base.riemann, dt, tile_c=case.tile_c)
        return f

    @jax.jit
    def fori_const(fb):
        return jax.lax.fori_loop(0, K, lambda _, f: ac(f, dt_const), fb)
    timed("fori, constant dt", fori_const, fb0)

    @jax.jit
    def fori_dt(fb):
        def body(_, f):
            dt = fbops.acoustic_time_step_b(f, base.eos, h)
            return ac(f, dt)
        return jax.lax.fori_loop(0, K, body, fb)
    timed("fori, computed dt", fori_dt, fb0)

    @jax.jit
    def while_dt(fb):
        def cond(c):
            return c[1] < K
        def body(c):
            f, k = c
            dt = fbops.acoustic_time_step_b(f, base.eos, h)
            return (ac(f, dt), k + 1)
        return jax.lax.while_loop(cond, body, (fb, 0))[0]
    timed("while, computed dt", while_dt, fb0)

    # wall prep cost
    @jax.jit
    def wall_prep(fb):
        def body(_, acc):
            wjt, wf = fbops.pack_wall_t(case.wall_b, nbr_w,
                                        case.bm_wall.c_max, case.tile_c)
            return acc + wjt[0, 0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    timed("wall prep (per adv step)", wall_prep, fb0)

if __name__ == "__main__":
    main()
