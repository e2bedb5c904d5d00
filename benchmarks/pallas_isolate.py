"""Isolate: XLA row-gather vs Pallas kernel cost vs tile size."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.ops import pallas_sweep as ps
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 16384
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(size=(C + 1, 16, 8)), jnp.float32)
nbr = jnp.asarray(np.sort(rng.integers(0, C, size=(C, 9)), axis=0), jnp.int32)


def bench(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/30*1e3:.2f} ms", flush=True)
    return r


@jax.jit
def gather_only(packed, nbr):
    return packed[nbr]


def kernel_only(tile_c):
    kern = functools.partial(ps._ac1_kernel, inv_h=10.0, factor_w=55.7,
                             inv_rho0c0_ave=0.1)

    @jax.jit
    def f(xi, xj):
        return pl.pallas_call(
            kern,
            grid=(C // tile_c,),
            in_specs=[
                pl.BlockSpec((tile_c, 16, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, 9, 16, 8), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((tile_c, 16), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 3,
            out_shape=[jax.ShapeDtypeStruct((C, 16), jnp.float32)] * 3,
        )(xi, xj)

    return f


xj = gather_only(packed, nbr)
bench("gather (C,9,16,8)", gather_only, packed, nbr)
xi = packed[:C]
for tc in (32, 64):
    try:
        bench(f"kernel only tile_c={tc}", kernel_only(tc), xi, xj)
    except Exception as e:
        print(f"tile_c={tc}: {type(e).__name__}: {str(e)[:120]}", flush=True)

# composed (same code path as production ac1_inner_sweep)
@jax.jit
def composed(packed, nbr):
    return ps.ac1_inner_sweep(packed, nbr, kernel_h=0.1, factor_w=55.7,
                              inv_rho0c0_ave=0.1, tile_c=32)

bench("composed gather+kernel", composed, packed, nbr)

# composed with explicit materialization barrier
@jax.jit
def composed_barrier(packed, nbr):
    xj = jax.lax.optimization_barrier(packed[nbr])
    xi = packed[:C]
    kern = functools.partial(ps._ac1_kernel, inv_h=10.0, factor_w=55.7,
                             inv_rho0c0_ave=0.1)
    return pl.pallas_call(
        kern, grid=(C // 32,),
        in_specs=[
            pl.BlockSpec((32, 16, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 9, 16, 8), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((32, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((C, 16), jnp.float32)] * 3,
    )(xi, xj)

bench("composed with opt barrier", composed_barrier, packed, nbr)
