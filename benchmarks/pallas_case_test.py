"""TPU end-to-end: block dambreak with Pallas sweeps vs jnp sweeps —
numeric parity + speed."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import dambreak_2d_block as dbb


def run(use_pallas, dx, t_end):
    case, fluid = dbb.build_case(dx=dx, use_pallas=use_pallas)
    s = dbb.init_sim(case, fluid)
    runc = dbb.make_run_chunk(case)
    s = runc(s, jnp.asarray(t_end, s.time.dtype))
    jax.block_until_ready(s.fluid_b["Position"])
    t0 = time.perf_counter()
    s = runc(s, jnp.asarray(2 * t_end, s.time.dtype))
    jax.block_until_ready(s.fluid_b["Position"])
    dt = time.perf_counter() - t0
    n_adv = int(s.n_adv)
    parts = dbb.blocks_to_particles(case, s, case.base.n_fluid)
    return s, parts, dt, n_adv, case


def main():
    dx = float(os.environ.get("BENCH_DX", "0.01"))
    t_end = float(os.environ.get("BENCH_T", "0.05"))
    s_j, p_j, dt_j, na_j, _ = run(False, dx, t_end)
    print(f"jnp   : {dt_j:.2f}s for {na_j} adv steps", flush=True)
    s_p, p_p, dt_p, na_p, case = run(True, dx, t_end)
    print(f"pallas: {dt_p:.2f}s for {na_p} adv steps  speedup x{dt_j/dt_p:.2f}",
          flush=True)
    assert na_j == na_p, (na_j, na_p)
    for key in ["Position", "Velocity", "Density"]:
        a, b = np.asarray(p_j[key]), np.asarray(p_p[key])
        scale = np.abs(a).max() + 1e-9
        err = np.abs(a - b).max() / scale
        print(f"max rel diff {key}: {err:.2e}", flush=True)
    print("overflow:", bool(s_p.overflow))


if __name__ == "__main__":
    main()
