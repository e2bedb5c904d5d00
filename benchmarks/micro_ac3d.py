"""Micro-bisect the 3D acoustic half-step at 1M particles: j-window pack
(_window_jt XLA gathers) vs the Pallas pair kernel, and the c_max/cap
sensitivity.

Usage: python benchmarks/micro_ac3d.py [dx] [cap] [c_max]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_3d as db3
from sphinxsys_tpu.cases import dambreak_3d_block as dbb
from sphinxsys_tpu.engine import block_fluid as eng_mod
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.ops import pallas_block2 as pb2

ITERS = 10


def bench(name, make_loop, *args):
    fn = jax.jit(make_loop)
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    c_max = int(sys.argv[3]) if len(sys.argv) > 3 else 125000
    case, fluid = dbb.build_case(dx=dx, cap=cap, c_max=c_max, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    eng, base = case.eng, case.base
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * base.adaptation.h / db3.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    n_occ = int(jnp.sum(jnp.any(sim.fluid_b["SlotMask"][:-1], axis=1)))
    print(f"n_fluid={base.n_fluid} c_max={eng.c_max} cap={eng.cap} "
          f"n_occ={n_occ}", flush=True)

    fb, nbr = sim.fluid_b, sim.nbr_inner
    c = nbr.shape[0]
    kernel = base.kernel
    dtv = jnp.asarray(1e-5, jnp.float32)

    # 1. j-window pack alone (ac1 channels: pos(3) + p + vol = 5)
    def pack_loop(fb, nbr):
        def body(i, acc):
            packed_j = jnp.concatenate(
                [fb["Position"] + acc * 0.0, fb["Pressure"][..., None],
                 fb["VolumetricMeasure"][..., None]], axis=-1)
            xj_t = fbops._window_jt(packed_j, nbr, c, roll_y=eng.roll_y,
                                    dim=3)
            return acc + xj_t[0, 0, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    bench("j-window pack (_window_jt, 5ch)", pack_loop, fb, nbr)

    # 2. pallas ac1 kernel alone (prebuilt tensors)
    wc = eng_mod.make_wall_ctx(eng, case.wall_b, sim.nbr_wall, case.bm_wall,
                               n_occ=jnp.asarray(n_occ, jnp.int32))
    pos, p = fb["Position"], fb["Pressure"]
    vol, rho = fb["VolumetricMeasure"], fb["Density"]
    packed_j = jnp.concatenate([pos, p[..., None], vol[..., None]], axis=-1)
    xj_t = fbops._window_jt(packed_j, nbr, c, roll_y=eng.roll_y, dim=3)
    acc_prior = fb["ForcePrior"] / jnp.maximum(fb["Mass"], 1e-15)[..., None]
    xi_t = jnp.stack([pos[:c, :, k].T for k in range(3)]
                     + [p[:c].T, rho[:c].T]
                     + [acc_prior[:c, :, k].T for k in range(3)], 0)

    def kern_loop(xi_t, xj_t, wall_jt, wflags):
        def body(i, acc):
            outs = pb2.ac1_sweep_t(
                xi_t + acc * 0.0, xj_t, wall_jt, wflags,
                inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(3),
                inv_rho0c0=base.riemann.inv_rho0c0_ave, tile_c=eng.tile_c,
                box_x=0.0, box_y=0.0, box_z=0.0, dim=3,
                wall_static=eng.wall_static, split_wall=True)
            return acc + outs[0][0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    bench("ac1 pallas kernel (prebuilt, inner+wall)", kern_loop,
          xi_t, xj_t, wc.wall_jt, wc.wflags)

    def kern_inner_loop(xi_t, xj_t, wall_jt, wflags):
        def body(i, acc):
            outs = pb2.ac1_sweep_t(
                xi_t + acc * 0.0, xj_t, wall_jt, wflags,
                inv_h=1.0 / kernel.h, factor_w=kernel._factor_w(3),
                inv_rho0c0=base.riemann.inv_rho0c0_ave, tile_c=eng.tile_c,
                box_x=0.0, box_y=0.0, box_z=0.0, dim=3,
                wall_static=eng.wall_static, split_wall=True,
                modes=("inner",))
            return acc + outs[0][0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    try:
        bench("ac1 pallas kernel (inner only)", kern_inner_loop,
              xi_t, xj_t, wc.wall_jt, wc.wflags)
    except TypeError as e:
        print(f"(inner-only probe unsupported: {e})", flush=True)

    # 3. full halves for reference
    def ac1_loop(fb, nbr, wall_jt, wflags):
        def body(i, f):
            return fbops.acoustic_step_1st_half_p2(
                f, nbr, wall_jt, wflags, kernel, base.eos, base.riemann,
                dtv, tile_c=eng.tile_c, dim=3, wall_static=eng.wall_static)
        return jax.lax.fori_loop(0, ITERS, body, fb)
    bench("ac1 full half-step", ac1_loop, fb, nbr, wc.wall_jt, wc.wflags)

    def ac2_loop(fb, nbr, wall_jt, wflags):
        def body(i, f):
            return fbops.acoustic_step_2nd_half_p2(
                f, nbr, wall_jt, wflags, kernel, base.riemann, dtv,
                tile_c=eng.tile_c, dim=3, wall_static=eng.wall_static)
        return jax.lax.fori_loop(0, ITERS, body, fb)
    bench("ac2 full half-step", ac2_loop, fb, nbr, wc.wall_jt, wc.wflags)


if __name__ == "__main__":
    main()
