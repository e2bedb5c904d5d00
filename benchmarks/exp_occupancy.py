"""Occupancy statistics for the dambreak grid over time.

Decides the hot-kernel design:
  * max particles/cell        -> block cap (8/12/16)
  * occupied cells vs bbox    -> dense-grid (static shifts, no gather)
                                 vs occupied-blocks (gather) trade
  * 8x8-tile fill factor      -> dense-grid predication effectiveness
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import dambreak_2d as db

DX = float(os.environ.get("MB_DX", "0.005"))


def stats(case, s, t):
    pos = np.asarray(s.fluid["Position"][:case.n_fluid])
    grid = case.grid
    lo = np.asarray(grid.lower)
    sp = np.asarray(grid.spacing)
    shape = np.asarray(grid.shape)
    coords_all = np.clip(((pos - lo) / sp).astype(int), 0, shape - 1)
    cid = np.ravel_multi_index((coords_all[:, 0], coords_all[:, 1]), tuple(shape))
    counts = np.bincount(cid, minlength=grid.ncells)
    occ = counts > 0
    n_occ = int(occ.sum())
    # grid coords of occupied cells
    gx, gy = grid.shape  # (nx, ny)? check row-major convention
    shape = grid.shape
    coords = np.stack(np.unravel_index(np.nonzero(occ)[0], shape), 1)
    lo, hi = coords.min(0), coords.max(0)
    bbox_cells = int(np.prod(hi - lo + 1))
    # 8x8 tile occupancy within the full grid
    occ2d = occ.reshape(shape)
    th, tw = 8, 8
    ph = (-shape[0]) % th
    pw = (-shape[1]) % tw
    o = np.pad(occ2d, ((0, ph), (0, pw)))
    tiles = o.reshape(o.shape[0] // th, th, o.shape[1] // tw, tw).any((1, 3))
    print(f"t={t:6.2f}  n_occ={n_occ:6d}  max/cell={counts.max():3d} "
          f"p99/cell={int(np.percentile(counts[occ], 99)):3d} "
          f"avg/cell={counts[occ].mean():5.2f}  bbox_cells={bbox_cells:7d} "
          f"tiles8x8_occ={int(tiles.sum()):6d}/{tiles.size}")


def main():
    case, fluid = db.build_case(dx=DX)
    print(f"grid shape={case.grid.shape} ncells={case.grid.ncells} "
          f"n_fluid={case.n_fluid} cutoff={case.adaptation.cutoff:.4f}")
    s = db.init_sim(case, fluid)
    run = db.make_run_chunk(case)
    stats(case, s, 0.0)
    for t in (0.5, 1.5, 2.5, 3.5, 5.0, 7.0):
        s = run(s, jnp.asarray(t, s.time.dtype))
        jax.block_until_ready(s.fluid["Position"])
        stats(case, s, float(s.time))
        assert not bool(s.overflow)


if __name__ == "__main__":
    main()
