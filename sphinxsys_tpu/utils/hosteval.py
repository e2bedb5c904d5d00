"""Host-side (CPU backend) evaluation of setup-time geometry.

Scene construction (lattice fills, shape normals, signed distances) is
one-shot precompute.  When the default JAX backend is a remote TPU, eager
dispatch of these small ops is latency-bound (each op round-trips the
device tunnel), so we pin them to the always-present CPU backend and
return NumPy.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


@functools.lru_cache(maxsize=None)
def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        # some remote-plugin configurations (axon tunnel) expose ONLY the
        # remote backend — no host CPU backend to pin to
        return None


def host_eval(fn, *args):
    """Run `fn(*args)` jitted on the CPU backend; returns NumPy arrays.

    NOTE: the jit must be pinned with backend="cpu" — a plain jit under a
    `jax.default_device(cpu)` context still compiles through the default
    platform, and with the remote axon TPU plugin registered that compile
    round-trips the tunnel (measured 76 s vs 0.15 s for a trivial
    shape.contains at 10k points).  When no CPU backend exists at all
    (remote-only plugin), fall back to the default backend: setup-time
    geometry then pays the tunnel latency once per call, which is slow
    but correct."""
    args = tuple(np.asarray(a) if hasattr(a, "shape") else a for a in args)
    cpu = _cpu_device()
    if cpu is None:
        out = jax.jit(fn)(*args)
    else:
        with jax.default_device(cpu):
            out = jax.jit(fn, backend="cpu")(*args)
    return jax.tree_util.tree_map(np.asarray, out)
