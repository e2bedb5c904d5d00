"""TPU timing: Pallas sweep kernels vs jnp block ops at dambreak-80k scale."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.ops import pallas_sweep as ps
from sphinxsys_tpu.physics import fluid_blocks as fbops


def bench(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/30*1e3:.2f} ms", flush=True)


def main():
    dx = float(os.environ.get("BENCH_DX", "0.005"))
    case, fluid = dbb.build_case(dx=dx, c_max=16384)
    s = dbb.init_sim(case, fluid)
    fb = s.fluid_b
    base = case.base
    kernel = base.kernel
    riemann = base.riemann
    print(f"n_fluid={base.n_fluid} c_max={case.c_max}", flush=True)

    packed = ps.pack_state_2d(fb["Position"], fb["Velocity"], fb["Pressure"],
                              fb["VolumetricMeasure"], fb["SlotMask"])

    @jax.jit
    def pallas_ac1(packed, nbr):
        return ps.ac1_inner_sweep(packed, nbr, kernel_h=kernel.h,
                                  factor_w=kernel._factor_w(2),
                                  inv_rho0c0_ave=riemann.inv_rho0c0_ave)

    @jax.jit
    def pallas_ac2(packed, nbr):
        return ps.ac2_inner_sweep(packed, nbr, kernel_h=kernel.h,
                                  factor_w=kernel._factor_w(2),
                                  rho0c0_geo=riemann.rho0c0_geo_ave,
                                  inv_c0=riemann.inv_c0_ave,
                                  limiter_coeff=riemann.limiter_coeff)

    @jax.jit
    def jnp_ac1(fb, nbr_i, nbr_w):
        return fbops.acoustic_step_1st_half_b(
            fb, nbr_i, kernel, 2, base.eos, riemann, 1e-5,
            wall_b=case.wall_b, nbr_wall=nbr_w)["Velocity"]

    bench("pallas ac1 inner", pallas_ac1, packed, s.nbr_inner)
    bench("pallas ac2 inner", pallas_ac2, packed, s.nbr_inner)
    bench("jnp ac1 full (inner+wall)", jnp_ac1, fb, s.nbr_inner, s.nbr_wall)

    extra(case, s)

    # numeric sanity on device
    f_k, rd_k = pallas_ac1(packed, s.nbr_inner)
    print("pallas force finite:", bool(jnp.isfinite(f_k).all()),
          " max|f|:", float(jnp.abs(f_k).max()), flush=True)


def extra(case, s):
    """Extra isolation: jnp ac1 without wall; raw inner sweep only."""
    import functools
    fb = s.fluid_b
    base = case.base
    kernel = base.kernel
    riemann = base.riemann

    @jax.jit
    def jnp_ac1_nowall(fb, nbr_i):
        return fbops.acoustic_step_1st_half_b(
            fb, nbr_i, kernel, 2, base.eos, riemann, 1e-5)["Velocity"]

    bench("jnp ac1 inner only", jnp_ac1_nowall, fb, s.nbr_inner)


if __name__ == "__main__":
    main()
