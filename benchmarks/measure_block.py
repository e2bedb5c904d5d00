"""Quick TPU measurement of the block-engine advection step."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d_block as dbb


def main():
    dx = float(os.environ.get("BENCH_DX", "0.005"))
    c_max = int(os.environ.get("BENCH_CMAX", "16000"))
    case, fluid = dbb.build_case(dx=dx, c_max=c_max)
    s = dbb.init_sim(case, fluid)
    step = dbb.make_advection_step(case)
    s = step(s)
    jax.block_until_ready(s.fluid_b["Position"])
    t0 = time.perf_counter()
    for _ in range(20):
        s = step(s)
    jax.block_until_ready(s.fluid_b["Position"])
    dt = (time.perf_counter() - t0) / 20
    print(f"n_fluid={case.base.n_fluid} c_max={c_max} per advstep: {dt*1e3:.1f} ms")
    print("overflow:", bool(s.overflow), " ac/adv:", int(s.n_ac) / int(s.n_adv))


if __name__ == "__main__":
    main()
