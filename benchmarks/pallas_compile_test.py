"""Minimal Pallas kernel compile test on TPU with full error output."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.ops import pallas_sweep as ps

C = 1024
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(size=(C + 1, 16, 8)), jnp.float32)
nbr = jnp.asarray(rng.integers(0, C, size=(C, 9)), jnp.int32)

t0 = time.time()
f, rd = ps.ac1_inner_sweep(packed, nbr, kernel_h=0.1, factor_w=55.7,
                           inv_rho0c0_ave=0.1, tile_c=32)
jax.block_until_ready(f)
print("ac1 compile+run OK %.1fs" % (time.time() - t0), f.shape)

t0 = time.perf_counter()
for _ in range(50):
    f, rd = ps.ac1_inner_sweep(packed, nbr, kernel_h=0.1, factor_w=55.7,
                               inv_rho0c0_ave=0.1, tile_c=32)
jax.block_until_ready(f)
print("ac1 per call: %.3f ms" % ((time.perf_counter() - t0) / 50 * 1e3))
