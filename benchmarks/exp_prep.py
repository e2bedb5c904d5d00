"""Gather/transpose prep formulations for the transposed sweep kernel.

Which way of producing xj_t (NW, CH, CAP, C) from packed state + nbr(C,9)
is fastest on TPU?
  p1) gather (C,9,16,8) then transpose          (baseline, 8 ch)
  p2) gather 4-channel packed then transpose    (channel trim)
  p3) transpose packed first (8,16,C), then gather along lanes
  p4) 9 per-window gathers + stack, then transpose
  p5) gather with flattened indices, reshape, transpose (4ch)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d_block as dbb

DX = float(os.environ.get("MB_DX", "0.005"))
K = int(os.environ.get("MB_K", "20"))
CAP = 16


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:56s} {dt * 1e3 / K:9.3f} ms/iter")
    return out


def main():
    case, fluid = dbb.build_case(dx=DX, c_max=20480)
    sim = dbb.init_sim(case, fluid)
    fb = sim.fluid_b
    nbr = sim.nbr_inner
    c = nbr.shape[0]
    pos, vol, p = fb["Position"], fb["VolumetricMeasure"], fb["Pressure"]

    packed8 = jnp.concatenate(
        [pos, fb["Velocity"], p[..., None], vol[..., None],
         fb["SlotMask"].astype(p.dtype)[..., None],
         jnp.zeros_like(p)[..., None]], axis=-1)  # (C+1,16,8)
    packed4 = jnp.concatenate(
        [pos, p[..., None], vol[..., None]], axis=-1)  # (C+1,16,4)

    def loop(fn, x):
        @jax.jit
        def go(x):
            def body(i, acc):
                out = fn(x + 0.0 * acc[0, 0, 0, 0])
                return acc + out * 0.0 + acc * 0.0 + out
            z = fn(x)
            return jax.lax.fori_loop(0, K, body, jnp.zeros_like(z))
        return go, x

    # p1: 8ch gather + transpose -> (9,8,16,C)
    f, x = loop(lambda pk: pk[nbr].transpose(1, 3, 2, 0), packed8)
    timed("p1) gather8 + transpose", f, x)

    # p2: 4ch gather + transpose
    f, x = loop(lambda pk: pk[nbr].transpose(1, 3, 2, 0), packed4)
    timed("p2) gather4 + transpose", f, x)

    # p2b: 4ch gather only (no transpose) — isolates the gather
    f, x = loop(lambda pk: pk[nbr][..., None].transpose(1, 3, 2, 0, 4)[..., 0],
                packed4)
    # ^ same as p2; instead measure raw gather:
    @jax.jit
    def raw_gather(pk):
        def body(i, acc):
            g = pk[nbr]  # (C,9,16,4)
            return acc + g
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c, 9, CAP, 4), pk.dtype))
    timed("p2c) gather4 only", raw_gather, packed4)

    # p3: transpose first, then take along lane axis
    packed4_t = packed4.transpose(2, 1, 0)  # (4,16,C+1)
    @jax.jit
    def lane_gather(pk_t):
        def body(i, acc):
            g = jnp.take(pk_t, nbr.reshape(-1), axis=2)  # (4,16,C*9)
            return acc + g.reshape(4, CAP, c, 9).transpose(3, 0, 1, 2)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((9, 4, CAP, c), pk_t.dtype))
    timed("p3) lane-axis take (transposed source)", lane_gather, packed4_t)

    # p4: 9 per-window gathers + stack + transpose
    @jax.jit
    def per_window(pk):
        def body(i, acc):
            gs = [pk[nbr[:, w]].transpose(2, 1, 0) for w in range(9)]
            return acc + jnp.stack(gs, 0)
        return jax.lax.fori_loop(0, K, body,
                                 jnp.zeros((9, 4, CAP, c), pk.dtype))
    timed("p4) 9 per-window gathers (transposed out)", per_window, packed4)

    # p5: transpose-free consumption reference: gather4 natural only then
    # per-window transpose (what a kernel-side transpose would replace)
    # (skipped: same as p4 modulo stacking)

    # p6: wall-side: gather wall (static values) once
    nbr_w = sim.nbr_wall
    wall5 = jnp.concatenate(
        [case.wall_b["Position"], case.wall_b["VolumetricMeasure"][..., None],
         case.wall_b["NormalDirection"],
         case.wall_b["SlotMask"].astype(p.dtype)[..., None]], axis=-1)
    f, x = loop(lambda wk: wk[nbr_w].transpose(1, 3, 2, 0), wall5)
    timed("p6) wall gather6 + transpose", f, x)


if __name__ == "__main__":
    main()
