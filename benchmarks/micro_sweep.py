"""Microbenchmark: isolate the acoustic-sweep bottleneck on TPU.

Times, at bench-size dambreak (dx=0.005, ~80k fluid particles):
  1. full acoustic step, jnp block engine      (current bench path)
  2. full acoustic step, pallas engine         (ops/pallas_sweep.py)
  3. the XLA row gather packed[nbr] alone
  4. one ac1_inner_sweep pallas call alone (pre-gathered input)
  5. one jnp ac1 block step alone

Each timed region loops K times inside one jitted dispatch (lax.fori_loop
with data dependence) so tunnel latency is amortized.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops
from sphinxsys_tpu.ops import pallas_sweep as ps

DX = float(os.environ.get("MB_DX", "0.005"))
K = int(os.environ.get("MB_K", "20"))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:46s} {dt * 1e3 / K:9.3f} ms/iter   ({dt:.3f}s / {K})")
    return out


def main():
    case, fluid = dbb.build_case(dx=DX)
    sim = dbb.init_sim(case, fluid)
    print(f"devices: {jax.devices()}")
    print(f"n_fluid={case.base.n_fluid} n_wall={case.base.n_wall} "
          f"c_max={case.c_max} cap={case.cap} "
          f"n_occ~{int(jnp.sum(sim.fluid_b['SlotMask']))} particles slotted")

    base = case.base
    kernel, dim, h = base.kernel, 2, base.adaptation.h
    fb0 = sim.fluid_b
    nbr_i, nbr_w = sim.nbr_inner, sim.nbr_wall
    dt_ac = fbops.acoustic_time_step_b(fb0, base.eos, h)
    print(f"dt_ac={float(dt_ac):.3e}")

    # --- 1. jnp block acoustic step (1st+2nd half, inner+wall), K times
    @jax.jit
    def jnp_step_loop(fb):
        def body(_, f):
            f = fbops.acoustic_step_1st_half_b(
                f, nbr_i, kernel, dim, base.eos, base.riemann, dt_ac,
                wall_b=case.wall_b, nbr_wall=nbr_w)
            f = fbops.acoustic_step_2nd_half_b(
                f, nbr_i, kernel, dim, base.riemann, dt_ac,
                wall_b=case.wall_b, nbr_wall=nbr_w)
            return f
        return jax.lax.fori_loop(0, K, body, fb)

    timed("jnp block acoustic step (1st+2nd, in+wall)", jnp_step_loop, fb0)

    # --- 2. pallas acoustic step
    wall_p1 = jax.jit(fbops.pack_wall_ac1)(case.wall_b)
    wall_p2 = jax.jit(fbops.pack_wall_ac2)(case.wall_b)

    @jax.jit
    def pallas_step_loop(fb):
        def body(_, f):
            f = fbops.acoustic_step_1st_half_pallas(
                f, nbr_i, kernel, base.eos, base.riemann, dt_ac,
                wall_packed=wall_p1, nbr_wall=nbr_w)
            f = fbops.acoustic_step_2nd_half_pallas(
                f, nbr_i, kernel, base.riemann, dt_ac,
                wall_packed=wall_p2, nbr_wall=nbr_w)
            return f
        return jax.lax.fori_loop(0, K, body, fb)

    timed("pallas acoustic step (1st+2nd, in+wall)", pallas_step_loop, fb0)

    # --- 3. XLA row gather alone
    packed = jax.jit(ps.pack_state_2d)(
        fb0["Position"], fb0["Velocity"], fb0["Pressure"],
        fb0["VolumetricMeasure"], fb0["SlotMask"])

    @jax.jit
    def gather_loop(p):
        def body(_, acc):
            xj = p[nbr_i]  # (C, 9, CAP, CH)
            return acc + xj[:, 0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((nbr_i.shape[0],), p.dtype))

    timed("XLA row gather packed[nbr] (C,9,16,8)", gather_loop, packed)

    # --- 4. pallas ac1 inner sweep alone (includes its own gather)
    @jax.jit
    def pallas_ac1_loop(p):
        def body(_, acc):
            force, rd = ps.ac1_inner_sweep(
                p, nbr_i, kernel_h=kernel.h, factor_w=kernel._factor_w(2),
                inv_rho0c0_ave=base.riemann.inv_rho0c0_ave)
            return acc + force[:, 0, 0] + rd[:, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((nbr_i.shape[0],), p.dtype))

    timed("pallas ac1 inner sweep (gather+kernel)", pallas_ac1_loop, packed)

    # --- 5. jnp ac1 alone (inner only, no wall)
    @jax.jit
    def jnp_ac1_loop(fb):
        def body(_, f):
            return fbops.acoustic_step_1st_half_b(
                f, nbr_i, kernel, dim, base.eos, base.riemann, dt_ac)
        return jax.lax.fori_loop(0, K, body, fb)

    timed("jnp ac1 step inner-only", jnp_ac1_loop, fb0)

    # --- 6. jnp ac1 wall contribution cost = (1)-(5) roughly; time density sum
    @jax.jit
    def dens_loop(fb):
        def body(_, f):
            return fbops.density_summation_b(
                f, nbr_i, kernel, dim, db.RHO0_F, base.adaptation.sigma0,
                contacts=[(case.wall_b, nbr_w, db.RHO0_F)])
        return jax.lax.fori_loop(0, K, body, fb)

    timed("jnp density summation (inner+wall)", dens_loop, fb0)

    # --- 7. re-slot (build_block_map + to_blocks) once per advection step
    flat = {k: fb0[k].reshape((-1,) + fb0[k].shape[2:])
            for k in dbb._FLUID_FIELDS + ["OriginalID"]}
    valid = fb0["SlotMask"].reshape(-1)

    @jax.jit
    def slot_loop(pos):
        def body(_, p):
            fb2, nbr2_i, nbr2_w, ovf = dbb._slot_fluid(
                case, dict(flat, Position=p), valid)
            return p + fb2["Position"][0, 0] * 0.0
        return jax.lax.fori_loop(0, K, body, pos)

    timed("re-slot (block map + to_blocks + windows)", slot_loop, flat["Position"])


if __name__ == "__main__":
    main()
