"""Bisect the Pallas acoustic-step prep at production N: which piece of
acoustic_step_1st_half_p2 costs what.

Pieces per call:
  A. state update math (rho half-step, EoS, pos half-step)
  B. packed_j concat
  C. _window_jt (6 flat gathers + stacked transpose + y-rolls)
  D. xi_t stack (per-channel transposes)
  E. pb2.ac1_sweep_t alone (pre-built tensors)
  F. output handling (force transposes + velocity update)

Usage: PYTHONPATH=... python benchmarks/micro_prep.py [dx]
"""

from __future__ import annotations

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
    return dt


def loop(body):
    """Time `body(carry, *rest)` ITERS times inside one dispatch.  The
    output need not match the carry structure: the carry passes through an
    optimization_barrier together with the output, which keeps the body
    alive without requiring structural equality."""
    @jax.jit
    def run(*args):
        def it(i, c):
            out = body(*((c,) + args[1:]))
            c2, _ = jax.lax.optimization_barrier((c, out))
            return c2
        return jax.lax.fori_loop(0, ITERS, it, args[0])
    return run


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0025
    case, fluid = dbb.build_case(dx=dx, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    base = case.base
    kernel, dim = base.kernel, 2
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * base.adaptation.h / db.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    fb = dict(sim.fluid_b)
    nbr_inner, nbr_wall = sim.nbr_inner, sim.nbr_wall
    c = nbr_inner.shape[0]
    print(f"dx={dx} n_fluid={base.n_fluid} c_max={c} "
          f"platform={jax.devices()[0].platform}", flush=True)
    dt = jnp.asarray(1e-5, jnp.float32)
    eos, riemann = base.eos, base.riemann

    wall_jt, wflags = jax.jit(lambda: fbops.pack_wall_t(
        case.wall_b, nbr_wall, case.bm_wall.c_max, case.tile_c))()
    jax.block_until_ready(wall_jt)

    # full op
    timeit("ac1 p2 FULL", loop(
        lambda f: fbops.acoustic_step_1st_half_p2(
            f, nbr_inner, wall_jt, wflags, kernel, eos, riemann, dt,
            tile_c=case.tile_c)), fb)

    # A: state math
    def state_math(f):
        mask = f["SlotMask"]
        rho = jnp.where(mask, f["Density"] + f["DensityChangeRate"] * (0.5 * dt),
                        f["Density"])
        p = eos.pressure(rho)
        pos = f["Position"] + jnp.where(mask[..., None],
                                        f["Velocity"] * (0.5 * dt), 0.0)
        g = dict(f)
        g.update({"Density": rho, "Pressure": p, "Position": pos})
        return g
    timeit("A state math", loop(state_math), fb)

    pos = fb["Position"]
    p = fb["Pressure"]
    vol = fb["VolumetricMeasure"]

    # B: packed_j concat
    def packing(f):
        return jnp.concatenate([f["Position"], f["Pressure"][..., None],
                                f["VolumetricMeasure"][..., None]], axis=-1)
    timeit("B packed_j concat", loop(packing), fb)
    packed_j = jax.jit(packing)(fb)
    jax.block_until_ready(packed_j)

    # C: window gather+transpose
    timeit("C _window_jt (roll_y)", loop(
        lambda pj: fbops._window_jt(pj, nbr_inner, c, roll_y=True, dim=2)),
        packed_j)
    timeit("C _window_jt (no roll)", loop(
        lambda pj: fbops._window_jt(pj, nbr_inner, c, roll_y=False, dim=2)),
        packed_j)

    # C1: gathers only (no transpose) — 6 windows flat
    def gathers_only(pj):
        flat = pj.reshape(pj.shape[0], -1)
        return jnp.stack([flat[nbr_inner[:, w]] for w in (0, 1, 2, 6, 7, 8)], 0)
    timeit("C1 six flat gathers only", loop(gathers_only), packed_j)

    g6 = jax.jit(gathers_only)(packed_j)
    jax.block_until_ready(g6)

    # C2: the stacked transpose alone
    def transpose_only(g):
        return g.reshape(6, c, 12, 4).transpose(0, 3, 2, 1)
    timeit("C2 (6,C,48)->(6,4,12,C) transpose", loop(transpose_only), g6)

    # D: xi_t stack
    acc_prior = fb["ForcePrior"] / jnp.maximum(fb["Mass"], TINY)[..., None]

    def xi_stack(f):
        ap = f["ForcePrior"] / jnp.maximum(f["Mass"], TINY)[..., None]
        return jnp.stack([f["Position"][:c, :, k].T for k in range(2)]
                         + [f["Pressure"][:c].T, f["Density"][:c].T]
                         + [ap[:c, :, k].T for k in range(2)], 0)
    timeit("D xi_t stack", loop(xi_stack), fb)
    xi_t = jax.jit(xi_stack)(fb)
    xj_t = jax.jit(lambda pj: fbops._window_jt(pj, nbr_inner, c, roll_y=True,
                                               dim=2))(packed_j)
    jax.block_until_ready((xi_t, xj_t))

    # E: sweep alone
    timeit("E ac1_sweep_t kernel alone", loop(
        lambda xi: pb2.ac1_sweep_t(
            xi, xj_t, wall_jt, wflags, inv_h=1.0 / kernel.h,
            factor_w=kernel._factor_w(2),
            inv_rho0c0=riemann.inv_rho0c0_ave, tile_c=case.tile_c)), xi_t)

    # F: output transposes + velocity update
    fs = jax.jit(lambda xi: pb2.ac1_sweep_t(
        xi, xj_t, wall_jt, wflags, inv_h=1.0 / kernel.h,
        factor_w=kernel._factor_w(2), inv_rho0c0=riemann.inv_rho0c0_ave,
        tile_c=case.tile_c))(xi_t)
    jax.block_until_ready(fs)

    def post(f):
        f0, f1, rd = fs
        force = jnp.stack([f0.T, f1.T], axis=-1)
        pad_v = f["Force"][c:]
        force_total = f["Force"] + jnp.concatenate(
            [force * f["VolumetricMeasure"][:c][..., None],
             jnp.zeros_like(pad_v)], axis=0)
        drho = jnp.concatenate([rd.T * f["Density"][:c],
                                f["DensityChangeRate"][c:]], 0)
        vel = f["Velocity"] + jnp.where(
            f["SlotMask"][..., None],
            (f["ForcePrior"] + force_total)
            / jnp.maximum(f["Mass"], TINY)[..., None] * dt, 0.0)
        g = dict(f)
        g.update({"Force": force_total, "DensityChangeRate": drho,
                  "Velocity": vel})
        return g
    timeit("F output+update", loop(post), fb)


if __name__ == "__main__":
    main()
