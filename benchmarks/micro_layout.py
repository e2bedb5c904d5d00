"""TPU layout probe for the block-state arrays.

Question: what does an elementwise op on (C, cap), (cap, C), (C, cap, d)
and (d, cap, C) f32 arrays actually cost?  If XLA's physical tiling pads
the minor dims toward (8,128), the (C, 12) and especially (C, 12, 2)
layouts inflate HBM traffic ~10-60x, and the whole block engine should
flip to cap/channel-minor-on-sublanes, C-on-lanes layouts.

Also: row-gather cost in each layout.

Usage: PYTHONPATH=... python benchmarks/micro_layout.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

C, CAP, D = 64000, 12, 2
ITERS = 50


def timeit(name, fn, *args, bytes_logical=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    bw = (bytes_logical / dt / 1e9) if bytes_logical else 0.0
    print(f"{name:52s} {dt*1e3:8.3f} ms  ({bw:6.0f} GB/s logical)",
          flush=True)
    return dt


def loop(body):
    @jax.jit
    def run(*args):
        def it(i, c):
            out = body(*((c,) + args[1:]))
            c2, _ = jax.lax.optimization_barrier((c, out))
            return c2
        return jax.lax.fori_loop(0, ITERS, it, args[0])
    return run


def main():
    key = jax.random.PRNGKey(0)
    a_c_cap = jax.random.normal(key, (C, CAP))          # 3.1 MB
    a_cap_c = jnp.asarray(a_c_cap.T)                    # (12, 64000)
    a_c_cap_d = jax.random.normal(key, (C, CAP, D))     # 6.1 MB
    a_d_cap_c = jnp.asarray(a_c_cap_d.transpose(2, 1, 0))
    a_flat = a_c_cap_d.reshape(C, CAP * D)
    nbr = jax.random.randint(key, (C, 6), 0, C)
    jax.block_until_ready((a_c_cap, a_cap_c, a_c_cap_d, a_d_cap_c, nbr))
    print(f"platform={jax.devices()[0].platform}", flush=True)

    mb = C * CAP * 4
    # elementwise: y = a*1.0001 + 0.5 (read+write = 2x)
    timeit("ew (C,12)", loop(lambda a: a * 1.0001 + 0.5), a_c_cap,
           bytes_logical=2 * mb * ITERS)
    timeit("ew (12,C)", loop(lambda a: a * 1.0001 + 0.5), a_cap_c,
           bytes_logical=2 * mb * ITERS)
    timeit("ew (C,12,2)", loop(lambda a: a * 1.0001 + 0.5), a_c_cap_d,
           bytes_logical=4 * mb * ITERS)
    timeit("ew (2,12,C)", loop(lambda a: a * 1.0001 + 0.5), a_d_cap_c,
           bytes_logical=4 * mb * ITERS)
    timeit("ew (C,24) flat", loop(lambda a: a * 1.0001 + 0.5), a_flat,
           bytes_logical=4 * mb * ITERS)

    # 6-window row gather
    timeit("gather6 (C,24) rows", loop(
        lambda a: jnp.stack([a[nbr[:, w]] for w in range(6)], 0)), a_flat,
        bytes_logical=6 * 4 * mb * ITERS)
    timeit("gather6 (C,12) rows", loop(
        lambda a: jnp.stack([a[nbr[:, w]] for w in range(6)], 0)), a_c_cap,
        bytes_logical=6 * 2 * mb * ITERS)
    # gather along lanes in transposed layout
    timeit("gather6 (12,C) lanes", loop(
        lambda a: jnp.stack([a[:, nbr[:, w]] for w in range(6)], 0)), a_cap_c,
        bytes_logical=6 * 2 * mb * ITERS)

    # the production transpose: (6,C,12,4) -> (6,4,12,C)
    g = jax.random.normal(key, (6, C, CAP, 4))
    timeit("transpose (6,C,12,4)->(6,4,12,C)", loop(
        lambda x: x.transpose(0, 3, 2, 1)), g,
        bytes_logical=2 * 6 * C * CAP * 4 * 4 * ITERS)

    # transpose 2D
    timeit("transpose (C,12)->(12,C)", loop(lambda x: x.T), a_c_cap,
           bytes_logical=2 * mb * ITERS)

    # concat in both layouts
    timeit("concat [(C,12,2),(C,12,1),(C,12,1)]", loop(
        lambda x: jnp.concatenate([x, x[..., :1], x[..., 1:]], -1)),
        a_c_cap_d, bytes_logical=8 * mb * ITERS)
    timeit("concat [(2,12,C),(1,12,C),(1,12,C)]", loop(
        lambda x: jnp.concatenate([x, x[:1], x[1:]], 0)),
        a_d_cap_c, bytes_logical=8 * mb * ITERS)


if __name__ == "__main__":
    main()
