"""Micro-benchmark: window-sweep layouts on TPU.

Variants of one density-summation-like sweep over 9 windows:
  A: (C, capi, capj) broadcasts (current)
  B: flattened (C, capi*capj) pair math (lane-friendly)
  C: B + single packed gather
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

C = int(os.environ.get("PROBE_C", "16000"))
CAP = 16
CH = 8
W = 9


def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.normal(k1, (C + 1, CAP, CH), jnp.float32)
    nbr = jax.random.randint(k2, (C, W), 0, C, jnp.int32)
    mask = jax.random.uniform(k3, (C + 1, CAP)) < 0.6
    return X, nbr, mask


def variant_a(X, nbr, mask):
    pos = X[..., :2]
    vol = X[..., 2]
    out = jnp.zeros((C, CAP), jnp.float32)
    for w in range(W):
        j = nbr[:, w]
        pos_j = pos[j]
        vol_j = vol[j]
        m = mask[:C, :, None] & mask[j][:, None, :]
        disp = pos[:C, :, None, :] - pos_j[:, None, :, :]
        r = jnp.sqrt(jnp.sum(disp * disp, -1) + 1e-15)
        q = r / 0.1
        Wk = jnp.where(q < 2.0, (1 - 0.5 * q) ** 4 * (1 + 2 * q), 0.0) * m
        out = out + jnp.sum(Wk * vol_j[:, None, :], axis=2)
    return out


def variant_b(X, nbr, mask):
    pos = X[..., :2]
    vol = X[..., 2]
    out = jnp.zeros((C, CAP), jnp.float32)
    fm_i = mask[:C].astype(jnp.float32)
    for w in range(W):
        j = nbr[:, w]
        Xj = X[j]
        pos_j = Xj[..., :2]
        vol_j = Xj[..., 2]
        fm = (fm_i[:, :, None] * mask[j].astype(jnp.float32)[:, None, :]).reshape(C, CAP * CAP)
        dx = (pos[:C, :, None, 0] - pos_j[:, None, :, 0]).reshape(C, CAP * CAP)
        dy = (pos[:C, :, None, 1] - pos_j[:, None, :, 1]).reshape(C, CAP * CAP)
        r = jnp.sqrt(dx * dx + dy * dy + 1e-15)
        q = r / 0.1
        Wk = jnp.where(q < 2.0, (1 - 0.5 * q) ** 4 * (1 + 2 * q), 0.0) * fm
        vj = jnp.broadcast_to(vol_j[:, None, :], (C, CAP, CAP)).reshape(C, CAP * CAP)
        out = out + jnp.sum((Wk * vj).reshape(C, CAP, CAP), axis=2)
    return out


def bench(name, fn, args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(30):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 30
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return r


def main():
    args = make_inputs(jax.random.PRNGKey(0))
    ra = bench("A (C,capi,capj)", variant_a, args)
    rb = bench("B flattened (C,256)", variant_b, args)
    print("match:", bool(jnp.allclose(ra, rb, atol=1e-4)))


if __name__ == "__main__":
    main()
