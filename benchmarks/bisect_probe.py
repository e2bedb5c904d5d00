"""Bisect why production block ops are ~100x slower than the isolated sweep."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.physics import fluid_blocks as fbops


def bench(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/30*1e3:.2f} ms", flush=True)


def main():
    case, fluid = dbb.build_case(dx=0.005, c_max=16384)
    s = dbb.init_sim(case, fluid)
    fb = s.fluid_b
    base = case.base
    kernel = base.kernel
    sig = base.adaptation.sigma0
    c = case.c_max
    CAP = case.cap
    print(f"n_fluid={base.n_fluid} c_max={c}", flush=True)

    # v1: full production density summation, no contacts
    @jax.jit
    def v1(fb, nbr):
        return fbops.density_summation_b(fb, nbr, kernel, 2, 1.0, sig)["Density"]

    # v2: bare-bones equivalent inline
    @jax.jit
    def v2(pos, mask, vol, nbr):
        fmask = mask
        sigma = jnp.full(pos.shape[:2], kernel.w0(2), jnp.float32)[:c]
        for w in range(9):
            j = nbr[:, w]
            pos_j = pos[j]
            m = mask[:c, :, None] & mask[j][:, None, :]
            if w == 4:
                m = m & ~jnp.eye(CAP, dtype=bool)[None]
            disp = pos[:c, :, None, :] - pos_j[:, None, :, :]
            r = jnp.sqrt(jnp.sum(disp * disp, -1) + 1e-15)
            W = kernel.W(r, 2) * m.astype(jnp.float32)
            sigma += jnp.sum(W * vol[j][:, None, :], axis=2)
        return sigma

    # v3: v2 but with the kernel's W inlined as plain math (no class call)
    h = kernel.h
    fac = kernel._factor_w(2)

    @jax.jit
    def v3(pos, mask, vol, nbr):
        sigma = jnp.zeros(pos.shape[:2], jnp.float32)[:c]
        for w in range(9):
            j = nbr[:, w]
            pos_j = pos[j]
            m = (mask[:c, :, None] & mask[j][:, None, :]).astype(jnp.float32)
            disp = pos[:c, :, None, :] - pos_j[:, None, :, :]
            r = jnp.sqrt(jnp.sum(disp * disp, -1) + 1e-15)
            q = r / h
            W = jnp.where(q < 2.0, fac * (1 - 0.5 * q) ** 4 * (1 + 2 * q), 0.0) * m
            sigma += jnp.sum(W * vol[j][:, None, :], axis=2)
        return sigma

    pos, mask, vol = fb["Position"], fb["SlotMask"], fb["VolumetricMeasure"]
    bench("v1 production density (no contact)", v1, fb, s.nbr_inner)
    bench("v2 inline same math", v2, pos, mask, vol, s.nbr_inner)
    bench("v3 inline + inlined kernel", v3, pos, mask, vol, s.nbr_inner)

    # v4: FAR padding values replaced by zeros (exp/overflow slowdown probe)
    pos_clean = jnp.where(mask[..., None], pos, 0.0)
    bench("v4 = v3 with zeroed padding positions", v3, pos_clean, mask, vol,
          s.nbr_inner)


if __name__ == "__main__":
    main()
