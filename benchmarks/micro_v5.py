"""Honest in-situ bisect: fixed 5-ac-step fori + optimization_barrier."""
import os, time
import jax, jax.numpy as jnp
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.physics import fluid_blocks as fbops

DX = float(os.environ.get("MB_DX", "0.005"))

def timed(name, fn, s, n=10):
    s2 = fn(s); jax.block_until_ready(s2.fluid_b["Position"])
    t0 = time.perf_counter()
    for _ in range(n):
        s2 = fn(s2)
    jax.block_until_ready(s2.fluid_b["Position"])
    print(f"{name:50s} {(time.perf_counter()-t0)*1e3/n:9.3f} ms/step")
    return s2

def make_step(case, n_ac=5, do_density=True, do_acoustic=True,
              do_reslot=True, do_wallprep=True):
    base = case.base
    kernel, dim, h = base.kernel, 2, base.adaptation.h
    sigma0 = base.adaptation.sigma0
    def step_fn(s):
        fb = s.fluid_b
        dt = jnp.asarray(2e-4, fb["Density"].dtype)  # fixed, physical scale
        if do_density:
            fb = fbops.density_summation_b(
                fb, s.nbr_inner, kernel, dim, db.RHO0_F, sigma0,
                contacts=[(case.wall_b, s.nbr_wall, db.RHO0_F)])
        if do_wallprep:
            wall_jt, wflags = fbops.pack_wall_t(
                case.wall_b, s.nbr_wall, case.bm_wall.c_max, case.tile_c)
            wall_jt = jax.lax.optimization_barrier(wall_jt)
        if do_acoustic:
            def body(_, f):
                f = fbops.acoustic_step_1st_half_p2(
                    f, s.nbr_inner, wall_jt, wflags, kernel, base.eos,
                    base.riemann, dt, tile_c=case.tile_c)
                f = fbops.acoustic_step_2nd_half_p2(
                    f, s.nbr_inner, wall_jt, wflags, kernel, base.riemann,
                    dt, tile_c=case.tile_c)
                return f
            fb = jax.lax.fori_loop(0, n_ac, body, fb)
        if do_reslot:
            flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
                    for k in dbb._FLUID_FIELDS + ["OriginalID"]}
            valid = fb["SlotMask"].reshape(-1)
            fb2, nbr_i, nbr_w, ovf = dbb._slot_fluid(case, flat, valid)
        else:
            fb2, nbr_i, nbr_w, ovf = fb, s.nbr_inner, s.nbr_wall, s.overflow
        return dbb.BlockSim(fluid_b=fb2, nbr_inner=nbr_i, nbr_wall=nbr_w,
                            time=s.time + dt * n_ac, n_adv=s.n_adv + 1,
                            n_ac=s.n_ac + n_ac, overflow=s.overflow | ovf)
    return jax.jit(step_fn)

def main():
    case, fluid = dbb.build_case(dx=DX, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    sim = timed("full (dens+5ac+reslot+wallprep)", make_step(case), sim)
    timed("  - reslot", make_step(case, do_reslot=False), sim)
    timed("  - acoustic", make_step(case, do_acoustic=False), sim)
    timed("  - density", make_step(case, do_density=False), sim)
    timed("  - wallprep&acoustic", make_step(case, do_acoustic=False,
                                             do_wallprep=False), sim)
    timed("  10 ac steps", make_step(case, n_ac=10), sim)

if __name__ == "__main__":
    main()
