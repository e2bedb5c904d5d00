"""Profile the 3D block-engine hot path piece by piece on the real TPU.

Each piece loops inside ONE jit dispatch (lax.fori_loop) to amortize the
axon tunnel latency (~30 ms/dispatch).  Large arrays are jit ARGUMENTS
(closure constants overflow the remote-compile transport at 1M particles).

Usage: PYTHONPATH=... python benchmarks/profile_block3d.py [dx] [cap] [c_max]
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

ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)  # compile
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    c_max = int(sys.argv[3]) if len(sys.argv) > 3 else 125000
    case, fluid = dbb.build_case(dx=dx, cap=cap, c_max=c_max, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    eng, base = case.eng, case.base
    n_fluid = base.n_fluid
    print(f"dx={dx} n_fluid={n_fluid} n_wall={base.n_wall} "
          f"c_max={eng.c_max} cap={eng.cap} tile_c={eng.tile_c} "
          f"platform={jax.devices()[0].platform}", flush=True)

    # warm the flow a little
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * base.adaptation.h / db3.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    n_occ_now = int(jnp.sum(jnp.any(sim.fluid_b["SlotMask"][:-1], axis=1)))
    print(f"n_occ={n_occ_now} of c_max={eng.c_max}", flush=True)

    pack = (case.wall_b, case.bm_wall, case.wall_dense_map)
    dt = jnp.asarray(1e-5, jnp.float32)

    def loop(body):
        @jax.jit
        def run(fb, nbr_inner, nbr_wall, pack):
            wall_b, bm_wall, dm = pack
            n_occ = jnp.sum(jnp.any(fb["SlotMask"][:-1], axis=1)
                            .astype(jnp.int32))
            wc = eng_mod.make_wall_ctx(eng, wall_b, nbr_wall, bm_wall,
                                       n_occ=n_occ)
            return jax.lax.fori_loop(
                0, ITERS, lambda i, f: body(f, nbr_inner, wc), fb)
        return lambda: run(sim.fluid_b, sim.nbr_inner, sim.nbr_wall, pack)

    def timeit_loop(name, body):
        fn = loop(body)
        out = fn()  # compile
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:40s} {dt*1e3:9.3f} ms/iter", flush=True)
        return dt

    # 1. full advection step
    step = dbb.make_advection_step(case)

    @jax.jit
    def adv_loop(s, pack):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, st: dbb._advection_step(eng, n_fluid, pack, st),
            s)
    t_adv = timeit("advection_step (full)", adv_loop, sim, pack)

    # 2. acoustic step (both halves, pallas inner+wall)
    t_ac = timeit_loop("acoustic_step (1st+2nd half)",
        lambda f, nbr, wc: eng_mod.acoustic_step(eng, f, nbr, wc, dt))

    # 3. advection prep (density summation)
    t_prep = timeit_loop("advection_prep (density)",
        lambda f, nbr, wc: eng_mod.advection_prep(eng, f, nbr, wc))

    # 4. dt reduces
    t_dt = timeit_loop("acoustic_dt + advection_dt",
        lambda f, nbr, wc: {**f, "Velocity": f["Velocity"] +
                            0.0 * (eng_mod.acoustic_dt(eng, f) +
                                   eng_mod.advection_dt(eng, f))})

    # 5. re-slot (flatten + build_block_map + to_blocks_packed + windows)
    @jax.jit
    def reslot_loop(fb, pack):
        wall_b, bm_wall, dm = pack

        def body(i, f):
            flat = {k: f[k].reshape((-1,) + f[k].shape[2:])
                    for k in eng.fluid_fields + ("OriginalID",)}
            valid = f["SlotMask"].reshape(-1)
            fb2, nbr_inner, nbr_wall, ovf, _ = dbb._slot(
                eng, n_fluid, bm_wall, dm, flat, valid)
            return fb2
        return jax.lax.fori_loop(0, ITERS, body, fb)
    t_slot = timeit("re-slot (map+pack+windows)", reslot_loop,
                    sim.fluid_b, pack)

    # 6. wall ctx pack (per advection step)
    @jax.jit
    def wctx_loop(fb, nbr_wall, pack):
        wall_b, bm_wall, dm = pack
        n_occ = jnp.sum(jnp.any(fb["SlotMask"][:-1], axis=1)
                        .astype(jnp.int32))

        def body(i, acc):
            wc = eng_mod.make_wall_ctx(eng, wall_b, nbr_wall, bm_wall,
                                       n_occ=n_occ + i * 0)
            return acc + wc.wall_jt[0, 0, 0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    t_wctx = timeit("make_wall_ctx (pack_wall_t)", wctx_loop,
                    sim.fluid_b, sim.nbr_wall, pack)

    n_ac = 5  # typical acoustic substeps per advection step
    model = t_prep + n_ac * (t_ac + t_dt) + t_slot + t_wctx
    print(f"\nmodel (prep + {n_ac}*(ac+dt) + slot + wctx) = {model*1e3:.1f} ms"
          f" vs measured advection {t_adv*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
