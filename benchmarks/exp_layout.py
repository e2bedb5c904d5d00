"""Layout experiments for the acoustic pair sweep on TPU.

Hypothesis: the (C, cap, cap) pair broadcasts waste 7/8 VPU lanes (minor
dim 16 < 128).  Flattening pairs onto the lane axis as (C, cap*cap=256)
should recover full lanes, in both XLA and Pallas.

Variants (ac1 inner sweep only, same math as fluid_blocks):
  a) jnp (C, 16, 16) broadcasts       — current engine
  b) jnp (C, 256) flattened pairs
  c) pallas (T, 16, 16)               — current kernel (reference point)
  d) pallas (T, 256) flattened
  e) pallas (T, 256), in-kernel window loop, pre-gathered xj
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
from sphinxsys_tpu.physics import fluid_blocks as fbops

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


def expand_i_flat(a):  # (..., 16) -> (..., 256), entry l = a[l // 16]
    return jnp.repeat(a, CAP, axis=-1)


def expand_j_flat(a):  # (..., 16) -> (..., 256), entry l = a[l % 16]
    reps = (1,) * (a.ndim - 1) + (CAP,)
    return jnp.tile(a, reps)


def wendland_dw(q, inv_h, factor_w):
    qc = jnp.minimum(q, 2.0)
    return jnp.where(q < 2.0, (factor_w * inv_h * 0.625) * (qc - 2.0) ** 3 * qc, 0.0)


EYE_FLAT = (jnp.arange(256) // 16 == jnp.arange(256) % 16)


def ac1_flat_jnp(packed, nbr, inv_h, factor_w, inv_rho0c0):
    """(C, 256) flattened-pair ac1 inner sweep in plain XLA."""
    c = nbr.shape[0]
    xi = packed[:c]
    x_i = expand_i_flat(xi[:, :, CX]); y_i = expand_i_flat(xi[:, :, CY])
    p_i = expand_i_flat(xi[:, :, CP]); m_i = expand_i_flat(xi[:, :, CMASK])
    fx = jnp.zeros((c, 256), packed.dtype)
    fy = jnp.zeros((c, 256), packed.dtype)
    rd = jnp.zeros((c, 256), packed.dtype)
    for w in range(NW):
        xj = packed[nbr[:, w]]
        dx = x_i - expand_j_flat(xj[:, :, CX])
        dy = y_i - expand_j_flat(xj[:, :, CY])
        r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
        inv_r = 1.0 / r
        m = m_i * expand_j_flat(xj[:, :, CMASK])
        if w == 4:
            m = m * jnp.where(EYE_FLAT, 0.0, 1.0)
        dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * \
            expand_j_flat(xj[:, :, CVOL])
        p_j = expand_j_flat(xj[:, :, CP])
        psum = (p_i + p_j) * dWV * inv_r
        fx = fx - psum * dx
        fy = fy - psum * dy
        rd = rd + (p_i - p_j) * inv_rho0c0 * dWV
    red = lambda a: jnp.sum(a.reshape(c, CAP, CAP), axis=2)
    return red(fx), red(fy), red(rd)


def _ac1_flat_kernel(xi_ref, xj_ref, fx_ref, fy_ref, rd_ref, *, inv_h,
                     factor_w, inv_rho0c0):
    xi = xi_ref[...]  # (T, CAP, CH)
    t = xi.shape[0]
    x_i = expand_i_flat(xi[:, :, CX]); y_i = expand_i_flat(xi[:, :, CY])
    p_i = expand_i_flat(xi[:, :, CP]); m_i = expand_i_flat(xi[:, :, CMASK])
    fx = jnp.zeros((t, 256), jnp.float32)
    fy = jnp.zeros((t, 256), jnp.float32)
    rd = jnp.zeros((t, 256), jnp.float32)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) // 16 ==
           jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1) % 16)
    for w in range(NW):
        xj = xj_ref[:, w]  # (T, CAP, CH)
        dx = x_i - expand_j_flat(xj[:, :, CX])
        dy = y_i - expand_j_flat(xj[:, :, CY])
        r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
        inv_r = 1.0 / r
        m = m_i * expand_j_flat(xj[:, :, CMASK])
        if w == 4:
            m = m * jnp.where(eye, 0.0, 1.0)
        dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * \
            expand_j_flat(xj[:, :, CVOL])
        p_j = expand_j_flat(xj[:, :, CP])
        psum = (p_i + p_j) * dWV * inv_r
        fx = fx - psum * dx
        fy = fy - psum * dy
        rd = rd + (p_i - p_j) * inv_rho0c0 * dWV
    fx_ref[...] = jnp.sum(fx.reshape(t, CAP, CAP), axis=2)
    fy_ref[...] = jnp.sum(fy.reshape(t, CAP, CAP), axis=2)
    rd_ref[...] = jnp.sum(rd.reshape(t, CAP, CAP), axis=2)


@functools.partial(jax.jit, static_argnames=("inv_h", "factor_w", "inv_rho0c0",
                                             "tile_c"))
def ac1_flat_pallas(packed, nbr, inv_h, factor_w, inv_rho0c0, tile_c=64):
    c = nbr.shape[0]
    xj = packed[nbr]
    xi = packed[:c]
    kern = functools.partial(_ac1_flat_kernel, inv_h=inv_h, factor_w=factor_w,
                             inv_rho0c0=inv_rho0c0)
    return pl.pallas_call(
        kern,
        grid=(c // tile_c,),
        in_specs=[
            pl.BlockSpec((tile_c, CAP, CH), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, NW, CAP, CH), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tile_c, CAP), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((c, CAP), jnp.float32)] * 3,
    )(xi, xj)


def main():
    case, fluid = dbb.build_case(dx=DX)
    sim = dbb.init_sim(case, fluid)
    fb0 = sim.fluid_b
    base = case.base
    kernel = base.kernel
    nbr_i = sim.nbr_inner
    c = nbr_i.shape[0]
    print(f"c_max={c} cap={CAP}")

    packed = jax.jit(ps.pack_state_2d)(
        fb0["Position"], fb0["Velocity"], fb0["Pressure"],
        fb0["VolumetricMeasure"], fb0["SlotMask"])
    inv_h = 1.0 / kernel.h
    factor_w = kernel._factor_w(2)
    inv_rc = base.riemann.inv_rho0c0_ave

    def loop(fn):
        @jax.jit
        def go(p):
            def body(_, acc):
                fx, fy, rd = fn(p)
                return acc + fx[:, 0] + fy[:, 0] + rd[:, 0]
            return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))
        return go

    # a) current jnp engine, isolated to the same 3 outputs: reuse pallas ref
    @jax.jit
    def jnp_16(p):
        def body(_, acc):
            # reproduce the (C,16,16) math from fluid_blocks inline
            xi = p[:c]
            fx = jnp.zeros((c, CAP), p.dtype)
            fy = jnp.zeros((c, CAP), p.dtype)
            rd = jnp.zeros((c, CAP), p.dtype)
            for w in range(NW):
                xj = p[nbr_i[:, w]]
                dx = xi[:, :, None, CX] - xj[:, None, :, CX]
                dy = xi[:, :, None, CY] - xj[:, None, :, CY]
                r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
                inv_r = 1.0 / r
                m = xi[:, :, None, CMASK] * xj[:, None, :, CMASK]
                if w == 4:
                    eye = jnp.eye(CAP, dtype=p.dtype)
                    m = m * (1.0 - eye)[None]
                dWV = wendland_dw(r * inv_h, inv_h, factor_w) * m * \
                    xj[:, None, :, CVOL]
                p_i = xi[:, :, None, CP]
                p_j = xj[:, None, :, CP]
                psum = (p_i + p_j) * dWV * inv_r
                fx = fx - jnp.sum(psum * dx, axis=2)
                fy = fy - jnp.sum(psum * dy, axis=2)
                rd = rd + jnp.sum((p_i - p_j) * inv_rc * dWV, axis=2)
            return acc + fx[:, 0] + fy[:, 0] + rd[:, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("a) jnp (C,16,16)", jnp_16, packed)

    fn_b = lambda p: ac1_flat_jnp(p, nbr_i, inv_h, factor_w, inv_rc)
    timed("b) jnp (C,256) flat", loop(fn_b), packed)

    @jax.jit
    def pallas_16(p):
        def body(_, acc):
            force, rd = ps.ac1_inner_sweep(
                p, nbr_i, kernel_h=kernel.h, factor_w=factor_w,
                inv_rho0c0_ave=inv_rc)
            return acc + force[:, 0, 0] + rd[:, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((c,), p.dtype))

    timed("c) pallas (T,16,16) current", pallas_16, packed)

    fn_d = lambda p: ac1_flat_pallas(p, nbr_i, inv_h, factor_w, inv_rc)
    timed("d) pallas (T,256) flat", loop(fn_d), packed)

    # correctness cross-check b vs a-reference (fluid_blocks)
    fx_b, fy_b, rd_b = jax.jit(fn_b)(packed)
    fx_d, fy_d, rd_d = jax.jit(fn_d)(packed)
    import numpy as np
    np.testing.assert_allclose(np.asarray(fx_b), np.asarray(fx_d), rtol=2e-5,
                               atol=1e-4)
    print("b == d  (flat jnp vs flat pallas agree)")


if __name__ == "__main__":
    main()
