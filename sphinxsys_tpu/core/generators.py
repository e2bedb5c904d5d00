"""Particle generators (host-side, NumPy).

Counterpart of /root/reference/src/shared/particle_generator/:
  * lattice fill of a shape (particle_generator_lattice.cpp + the 2D/3D
    loops in for_2D_build/particle_generator/particle_generator_lattice_2d.cpp:12-24)
  * observer point sets (base_particle_generator.cpp:78)
  * reload from saved relaxed distributions is in io/restart.py.

Generation is inherently host-side precompute (runs once), so plain NumPy:
lattice positions are the cell centers of a zero-buffer mesh over the
system domain bounds at the reference spacing — cell center =
lower + (i + 0.5) * dx (meshes/base_mesh.cpp Mesh ctor +
CellPositionFromIndex) — kept where shape.contains() is true.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from sphinxsys_tpu.core.geometry import Shape


def lattice_positions(domain_lower, domain_upper, spacing: float) -> np.ndarray:
    """All lattice cell-center candidates over the domain bounds, matching
    the reference Mesh with buffer_width=0: n_cells per axis =
    ceil(extent/dx) + 1 - 1 (base_mesh.cpp:10-15)."""
    lo = np.asarray(domain_lower, dtype=np.float64)
    hi = np.asarray(domain_upper, dtype=np.float64)
    n_cells = np.ceil((hi - lo) / spacing).astype(int)  # all_grid_points - 1
    axes = [lo[d] + (np.arange(n_cells[d]) + 0.5) * spacing for d in range(len(lo))]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


def generate_lattice(shape: Shape, domain_lower, domain_upper, spacing: float,
                     chunk: int = 1 << 20) -> Tuple[np.ndarray, float]:
    """Fill `shape` with lattice particles. Returns (positions (N,dim),
    particle volume = spacing^dim)."""
    from sphinxsys_tpu.utils.hosteval import host_eval

    cand = lattice_positions(domain_lower, domain_upper, spacing)
    keep = []
    for start in range(0, len(cand), chunk):
        block = cand[start:start + chunk]
        inside = host_eval(shape.contains, jnp.asarray(block))
        keep.append(block[inside])
    pos = np.concatenate(keep, axis=0) if keep else np.zeros((0, cand.shape[1]))
    volume = float(spacing) ** cand.shape[1]
    return pos, volume


def generate_observers(points) -> np.ndarray:
    """Observer particle positions (ObserverParticles)."""
    return np.asarray(points, dtype=np.float64)
