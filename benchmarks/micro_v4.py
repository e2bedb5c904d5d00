"""Bisect the full advection step: which part costs 128ms?"""
import os, time
import jax
import jax.numpy as jnp
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
    print(f"{name:56s} {(time.perf_counter()-t0)*1e3/n:9.3f} ms/step "
          f"(n_ac={int(s2.n_ac)})")
    return s2

def make_step(case, do_density=True, do_acoustic=True, do_reslot=True):
    base = case.base
    kernel, dim, h = base.kernel, 2, base.adaptation.h
    sigma0 = base.adaptation.sigma0
    def step_fn(s):
        fb = s.fluid_b
        dt_adv = fbops.advection_time_step_b(fb, h, db.U_REF)
        if do_density:
            fb = fbops.density_summation_b(
                fb, s.nbr_inner, kernel, dim, db.RHO0_F, sigma0,
                contacts=[(case.wall_b, s.nbr_wall, db.RHO0_F)])
        if do_acoustic:
            wall_jt, wflags = fbops.pack_wall_t(
                case.wall_b, s.nbr_wall, case.bm_wall.c_max, case.tile_c)
            def body(carry):
                f, rt, k = carry
                dt = fbops.acoustic_time_step_b(f, base.eos, h)
                f = fbops.acoustic_step_1st_half_p2(
                    f, s.nbr_inner, wall_jt, wflags, kernel, base.eos,
                    base.riemann, dt, tile_c=case.tile_c)
                f = fbops.acoustic_step_2nd_half_p2(
                    f, s.nbr_inner, wall_jt, wflags, kernel, base.riemann,
                    dt, tile_c=case.tile_c)
                return (f, rt + dt, k + 1)
            fb, relax_t, n_ac = jax.lax.while_loop(
                lambda c: c[1] < dt_adv, body,
                (fb, jnp.zeros_like(dt_adv), jnp.zeros((), jnp.int32)))
        else:
            relax_t, n_ac = dt_adv, jnp.ones((), jnp.int32)
        if do_reslot:
            flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
                    for k in dbb._FLUID_FIELDS + ["OriginalID"]}
            valid = fb["SlotMask"].reshape(-1)
            fb2, nbr_i, nbr_w, ovf = dbb._slot_fluid(case, flat, valid)
        else:
            fb2, nbr_i, nbr_w, ovf = fb, s.nbr_inner, s.nbr_wall, s.overflow
        return dbb.BlockSim(fluid_b=fb2, nbr_inner=nbr_i, nbr_wall=nbr_w,
                            time=s.time + relax_t, n_adv=s.n_adv + 1,
                            n_ac=s.n_ac + n_ac, overflow=s.overflow | ovf)
    return jax.jit(step_fn)

def main():
    case, fluid = dbb.build_case(dx=DX, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    # warm the flow
    sim = timed("full (density+acoustic+reslot)", make_step(case), sim)
    timed("no reslot", make_step(case, do_reslot=False), sim)
    timed("no density", make_step(case, do_density=False), sim)
    timed("no acoustic", make_step(case, do_acoustic=False), sim)
    timed("reslot only", make_step(case, do_density=False, do_acoustic=False), sim)

if __name__ == "__main__":
    main()
