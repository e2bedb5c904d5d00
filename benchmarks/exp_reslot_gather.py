"""Probe re-slot gather layouts at 320k-scale: per-slot row gather vs
sorted-compact + per-block slice variants."""
import time
import jax
import jax.numpy as jnp
import numpy as np

CH = 14
CAP = 12
C_MAX = 64000
M = 320000
S = (C_MAX + 1) * CAP          # slot-array source rows

key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (S, CH), jnp.float32)
# plausible maps: valid rows randomly placed, block starts increasing
rng = np.random.default_rng(0)
slot_particle = rng.integers(0, S, size=(C_MAX * CAP,)).astype(np.int32)
order_n = rng.integers(0, S, size=(M,)).astype(np.int32)
start = np.sort(rng.integers(0, M, size=(C_MAX,))).astype(np.int32)
slot_particle = jnp.asarray(slot_particle)
order_n = jnp.asarray(order_n)
start = jnp.asarray(start)

N_IT = 30


def loop_time(name, body):
    @jax.jit
    def run_loop(p):
        def it(_, carry):
            return jax.lax.optimization_barrier(body(carry))
        return jax.lax.fori_loop(0, N_IT, it, p)
    out = run_loop(packed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_loop(packed)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)*1e3/N_IT:8.3f} ms", flush=True)


def v_old(p):
    rows = p[slot_particle]                       # (C*cap, CH)
    return p + 1e-12 * jnp.pad(rows, ((0, S - C_MAX * CAP), (0, 0)))


def v_sorted_only(p):
    sp = p[order_n]                               # (M, CH)
    return p.at[:M].add(1e-12 * sp)* 1.0 if False else p + 1e-12 * jnp.pad(sp, ((0, S - M), (0, 0)))


def v_slice2d(p):
    sp = jnp.concatenate([p[order_n], jnp.zeros((CAP, CH))], 0)
    def sl(s):
        return jax.lax.dynamic_slice(sp, (s, jnp.int32(0)), (CAP, CH))
    rows = jax.vmap(sl)(start).reshape(C_MAX * CAP, CH)
    return p + 1e-12 * jnp.pad(rows, ((0, S - C_MAX * CAP), (0, 0)))


def v_slice1d(p):
    sp = jnp.concatenate([p[order_n], jnp.zeros((CAP, CH))], 0).reshape(-1)
    def sl(s):
        return jax.lax.dynamic_slice(sp, (s * CH,), (CAP * CH,))
    rows = jax.vmap(sl)(start).reshape(C_MAX * CAP, CH)
    return p + 1e-12 * jnp.pad(rows, ((0, S - C_MAX * CAP), (0, 0)))


def v_take_rows(p):
    # per-slot row gather but from the compact sorted source
    sp = jnp.concatenate([p[order_n], jnp.zeros((CAP, CH))], 0)
    idx = (start[:, None] + jnp.arange(CAP, dtype=jnp.int32)[None, :]).reshape(-1)
    rows = sp[idx]
    return p + 1e-12 * jnp.pad(rows, ((0, S - C_MAX * CAP), (0, 0)))


loop_time("old: per-slot row gather (768k rows)", v_old)
loop_time("sorted compact gather only (320k rows)", v_sorted_only)
loop_time("sorted + vmap 2D dynamic_slice", v_slice2d)
loop_time("sorted + vmap 1D dynamic_slice", v_slice1d)
loop_time("sorted + per-slot row gather", v_take_rows)
