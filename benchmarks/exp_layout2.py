"""Layout experiment 2: put the cell axis on the VPU lanes.

Pair math as (16_i, 16_j, C) — C on lanes gives dense (8,128) tiles; the
i/j axes live on majors/sublanes, expansion is pure broadcast (no reshape,
which Mosaic rejects), and the j-reduction is a sublane reduce.

Variants (ac1 inner sweep):
  a) jnp (C,16,16)                — current engine baseline
  b) jnp (16,16,C) transposed     — pure-XLA lane-packed
  c) pallas (16,16,T) transposed  — pre-gathered + pre-transposed by XLA
  g) XLA gather+transpose alone   — the input prep cost for (c)
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.ops import pallas_sweep as ps

DX = float(os.environ.get("MB_DX", "0.005"))
K = int(os.environ.get("MB_K", "20"))
CAP, CH, NW = 16, 8, 9
CX, CY, CVX, CVY, CP, CVOL, CMASK = 0, 1, 2, 3, 4, 5, 6


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:52s} {dt * 1e3 / K:9.3f} ms/iter")
    return out


def wendland_dw(q, inv_h, factor_w):
    qc = jnp.minimum(q, 2.0)
    return jnp.where(q < 2.0, (factor_w * inv_h * 0.625) * (qc - 2.0) ** 3 * qc, 0.0)


def ac1_transposed_jnp(xi_t, xj_t, inv_h, factor_w, inv_rho0c0):
    """xi_t: (CH, CAP, C); xj_t: (NW, CH, CAP, C).  Returns (16_i, C) x3."""
    c = xi_t.shape[-1]
    x_i = xi_t[CX][:, None, :]   # (16i, 1, C)
    y_i = xi_t[CY][:, None, :]
    p_i = xi_t[CP][:, None, :]
    m_i = xi_t[CMASK][:, None, :]
    fx = jnp.zeros((CAP, c), xi_t.dtype)
    fy = jnp.zeros((CAP, c), xi_t.dtype)
    rd = jnp.zeros((CAP, c), xi_t.dtype)
    eye = jnp.eye(CAP, dtype=xi_t.dtype)[:, :, None]
    for w in range(NW):
        xj = xj_t[w]
        dx = x_i - xj[CX][None, :, :]        # (16i, 16j, C)
        dy = y_i - xj[CY][None, :, :]
        r2 = dx * dx + dy * dy + 1e-15
        inv_r = jax.lax.rsqrt(r2)
        r = r2 * inv_r
        m = m_i * xj[CMASK][None, :, :]
        if w == 4:
            m = m * (1.0 - eye)
        dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * xj[CVOL][None, :, :]
        p_j = xj[CP][None, :, :]
        psum = (p_i + p_j) * dWV * inv_r
        fx = fx - jnp.sum(psum * dx, axis=1)
        fy = fy - jnp.sum(psum * dy, axis=1)
        rd = rd + jnp.sum((p_i - p_j) * inv_rho0c0 * dWV, axis=1)
    return fx, fy, rd


def _ac1_t_kernel(xi_ref, xj_ref, fx_ref, fy_ref, rd_ref, *, inv_h, factor_w,
                  inv_rho0c0):
    xi = xi_ref[...]           # (CH, CAP, T)
    t = xi.shape[-1]
    x_i = xi[CX][:, None, :]
    y_i = xi[CY][:, None, :]
    p_i = xi[CP][:, None, :]
    m_i = xi[CMASK][:, None, :]
    fx = jnp.zeros((CAP, t), jnp.float32)
    fy = jnp.zeros((CAP, t), jnp.float32)
    rd = jnp.zeros((CAP, t), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP, 1), 1)
    not_eye = jnp.where(row == col, 0.0, 1.0)
    for w in range(NW):
        xj = xj_ref[w]         # (CH, CAP, T)
        dx = x_i - xj[CX][None, :, :]
        dy = y_i - xj[CY][None, :, :]
        r2 = dx * dx + dy * dy + 1e-15
        inv_r = jax.lax.rsqrt(r2)
        r = r2 * inv_r
        m = m_i * xj[CMASK][None, :, :]
        if w == 4:
            m = m * not_eye
        dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * xj[CVOL][None, :, :]
        p_j = xj[CP][None, :, :]
        psum = (p_i + p_j) * dWV * inv_r
        fx = fx - jnp.sum(psum * dx, axis=1)
        fy = fy - jnp.sum(psum * dy, axis=1)
        rd = rd + jnp.sum((p_i - p_j) * inv_rho0c0 * dWV, axis=1)
    fx_ref[...] = fx
    fy_ref[...] = fy
    rd_ref[...] = rd


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "inv_rho0c0",
                                             "tile_c"))
def ac1_t_pallas(xi_t, xj_t, inv_h, factor_w, inv_rho0c0, tile_c=512):
    c = xi_t.shape[-1]
    kern = functools.partial(_ac1_t_kernel, inv_h=inv_h, factor_w=factor_w,
                             inv_rho0c0=inv_rho0c0)
    return pl.pallas_call(
        kern,
        grid=(c // tile_c,),
        in_specs=[
            pl.BlockSpec((CH, CAP, tile_c), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, CH, CAP, tile_c), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((CAP, tile_c), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((CAP, c), jnp.float32)] * 3,
    )(xi_t, xj_t)


def main():
    c_round = int(os.environ.get("MB_CROUND", "2048"))
    case, fluid = dbb.build_case(dx=DX, c_max=c_round)
    sim = dbb.init_sim(case, fluid)
    fb0 = sim.fluid_b
    base = case.base
    kernel = base.kernel
    nbr_i = sim.nbr_inner
    c = nbr_i.shape[0]
    print(f"c_max={c}")

    packed = jax.jit(ps.pack_state_2d)(
        fb0["Position"], fb0["Velocity"], fb0["Pressure"],
        fb0["VolumetricMeasure"], fb0["SlotMask"])
    inv_h = 1.0 / kernel.h
    factor_w = kernel._factor_w(2)
    inv_rc = base.riemann.inv_rho0c0_ave

    # --- g) gather + transpose prep
    @jax.jit
    def prep(p):
        xi_t = p[:c].transpose(2, 1, 0)             # (CH, CAP, C)
        xj_t = p[nbr_i].transpose(1, 3, 2, 0)       # (NW, CH, CAP, C)
        return xi_t, xj_t

    @jax.jit
    def prep_loop(p):
        def body(i, acc):
            xi_t, xj_t = prep(p + 0.0 * i)
            return acc + xi_t[0, 0] + xj_t[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("g) XLA gather+transpose prep", prep_loop, packed)
    xi_t, xj_t = prep(packed)

    # --- a) baseline current jnp
    @jax.jit
    def jnp_16(p):
        def body(_, acc):
            xi = p[:c]
            fx = jnp.zeros((c, CAP), p.dtype)
            rd = jnp.zeros((c, CAP), p.dtype)
            for w in range(NW):
                xj = p[nbr_i[:, w]]
                dx = xi[:, :, None, CX] - xj[:, None, :, CX]
                dy = xi[:, :, None, CY] - xj[:, None, :, CY]
                r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
                m = xi[:, :, None, CMASK] * xj[:, None, :, CMASK]
                if w == 4:
                    m = m * (1.0 - jnp.eye(CAP, dtype=p.dtype))[None]
                dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * xj[:, None, :, CVOL]
                p_i, p_j = xi[:, :, None, CP], xj[:, None, :, CP]
                psum = (p_i + p_j) * dWV / r
                fx = fx - jnp.sum(psum * dx, axis=2)
                rd = rd + jnp.sum((p_i - p_j) * inv_rc * dWV, axis=2)
            return acc + fx[:, 0] + rd[:, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("a) jnp (C,16,16) current", jnp_16, packed)

    # --- b) jnp transposed, gather+transpose INSIDE the loop
    @jax.jit
    def jnp_t(p):
        def body(_, acc):
            xi_t2, xj_t2 = prep(p)
            fx, fy, rd = ac1_transposed_jnp(xi_t2, xj_t2, inv_h, factor_w, inv_rc)
            return acc + fx[0] + fy[0] + rd[0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("b) jnp (16,16,C) transposed incl prep", jnp_t, packed)

    # --- c) pallas transposed (prep inside loop, like real use)
    @jax.jit
    def pallas_t(p):
        def body(_, acc):
            xi_t2, xj_t2 = prep(p)
            fx, fy, rd = ac1_t_pallas(xi_t2, xj_t2, inv_h, factor_w, inv_rc)
            return acc + fx[0] + fy[0] + rd[0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("c) pallas (16,16,T) transposed incl prep", pallas_t, packed)

    # --- c2) pallas kernel only (static pre-gathered input)
    @jax.jit
    def pallas_t_only(xi_t2, xj_t2):
        def body(_, acc):
            fx, fy, rd = ac1_t_pallas(xi_t2 + 0.0 * acc[0, 0], xj_t2,
                                      inv_h, factor_w, inv_rc)
            return acc + fx
        return jax.lax.fori_loop(0, K, body, jnp.zeros((CAP, c), xi_t2.dtype))

    timed("c2) pallas transposed kernel only", pallas_t_only, xi_t, xj_t)

    # correctness: b vs a
    import numpy as np
    fxa, fya, rda = None, None, None
    # recompute single-pass values
    fx_b, fy_b, rd_b = jax.jit(functools.partial(
        ac1_transposed_jnp, inv_h=inv_h, factor_w=factor_w,
        inv_rho0c0=inv_rc))(xi_t, xj_t)
    fx_c, fy_c, rd_c = jax.jit(functools.partial(
        ac1_t_pallas, inv_h=inv_h, factor_w=factor_w,
        inv_rho0c0=inv_rc))(xi_t, xj_t)
    np.testing.assert_allclose(np.asarray(fx_b), np.asarray(fx_c), rtol=2e-5,
                               atol=1e-4)
    print("b == c  (transposed jnp vs transposed pallas agree)")


if __name__ == "__main__":
    main()
