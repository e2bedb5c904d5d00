"""Cell-block pair engine — the TPU-native hot path.

Rationale (measured on TPU v5e): the fixed-capacity neighbor-list engine
(neighbor_list.py) spends ~85 ns/pair because its per-pair random gathers
(`pos[nbr_idx]`, shape (N, K)) defeat the VPU — XLA lowers them to
dynamic-slice loops.  This module replaces per-PAIR gathers with per-CELL
block gathers:

  * particles are count-sorted into dense per-occupied-cell blocks of
    `cap` slots: block arrays have shape (C_max+1, cap, ...) with an
    all-padding sentinel row at index C_max;
  * each occupied cell precomputes the block index of its 3^dim window
    neighbors (`nbr_block`) by binary search over the sorted occupied-cell
    ids — so a pair sweep gathers whole (cap, ch) rows (contiguous,
    lane-aligned) instead of single elements;
  * pair interactions are dense (C, cap_i, cap_j) broadcast ops — pure
    VPU work at ~100% regularity, masked by the distance test.

This is the reference CK stack's count-sort cell list + cell-offset walk
(shared_ck/.../update_cell_linked_list.hpp:40-106, cell_linked_list.hpp:
145-155) re-shaped for a vector machine: the CSR walk becomes a dense
block bilinear sweep, and atomics become sort + deterministic scatters.

The trade: cap^2 * 3^dim / avg_pairs ~ 10-16x more (perfectly regular)
flop slots than true pairs.  On TPU that regularity wins ~20-50x.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.neighbors.cell_list import CellGrid


def _window_offsets(dim: int):
    return list(itertools.product(*([(-1, 0, 1)] * dim)))


class BlockMap(NamedTuple):
    """Slotting of particles into occupied-cell blocks.

    occ_cells:     (C_max,) int32 — sorted occupied cell ids, padded with
                   `ncells` sentinels.
    n_occ:         () int32 — number of occupied cells.
    nbr_block:     (C_max, 3^dim) int32 — block row of each window
                   neighbor cell; sentinel C_max (the all-padding row).
    slot_particle: (C_max*cap,) int32 — particle index filling each slot,
                   sentinel N for empty slots.
    slot_mask:     (C_max*cap,) bool — slot holds a real particle.
    particle_slot: (N,) int32 — inverse map (slot of each particle;
                   undefined for invalid particles).
    overflow:      () bool — cap or C_max exceeded; results invalid.
    """

    occ_cells: jnp.ndarray
    n_occ: jnp.ndarray
    nbr_block: jnp.ndarray
    slot_particle: jnp.ndarray
    slot_mask: jnp.ndarray
    particle_slot: jnp.ndarray
    overflow: jnp.ndarray

    @property
    def c_max(self) -> int:
        return self.occ_cells.shape[0]

    @property
    def cap(self) -> int:
        return self.slot_particle.shape[0] // self.occ_cells.shape[0]


def build_block_map(pos, valid, grid: CellGrid, cap: int, c_max: int) -> BlockMap:
    """Count-sort particles into occupied-cell blocks (one argsort + a few
    scatters; runs once per advection step).

    pos:   (N, dim) — N may itself be a slot array being re-slotted.
    valid: (N,) bool, or an int scalar n_real (rows >= n_real invalid).
    """
    n, dim = pos.shape
    ncells = grid.ncells
    if getattr(valid, "ndim", 0) == 0:
        valid = jnp.arange(n) < valid
    cid = jnp.where(valid, grid.cell_id(pos), ncells)

    order = jnp.argsort(cid)  # stable
    scid = cid[order]
    prev = jnp.concatenate([jnp.full((1,), -1, scid.dtype), scid[:-1]])
    is_first = (scid != prev) & (scid < ncells)
    occ_rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # (N,) block row per sorted particle
    n_occ = jnp.sum(is_first.astype(jnp.int32))

    occ_cells = jnp.full((c_max,), ncells, dtype=jnp.int32)
    occ_cells = occ_cells.at[jnp.where(is_first, occ_rank, c_max)].set(
        scid.astype(jnp.int32), mode="drop")

    start = jnp.zeros((c_max,), dtype=jnp.int32)
    start = start.at[jnp.where(is_first, occ_rank, c_max)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    rank = jnp.arange(n, dtype=jnp.int32) - start[jnp.minimum(occ_rank, c_max - 1)]

    sort_valid = scid < ncells
    slot_ok = sort_valid & (rank < cap) & (occ_rank < c_max)
    slot = jnp.where(slot_ok, occ_rank * cap + rank, c_max * cap)
    slot_particle = jnp.full((c_max * cap,), n, dtype=jnp.int32)
    slot_particle = slot_particle.at[slot].set(order.astype(jnp.int32), mode="drop")
    slot_mask = slot_particle < n

    particle_slot = jnp.full((n,), c_max * cap, dtype=jnp.int32)
    particle_slot = particle_slot.at[jnp.where(slot_ok, order, n)].set(
        slot.astype(jnp.int32), mode="drop")

    overflow = (n_occ > c_max) | jnp.any(sort_valid & (rank >= cap))

    # window-neighbor block rows via binary search in the sorted occ list
    coords = _unflatten(occ_cells, grid)  # (C_max, dim)
    gshape = jnp.asarray(grid.shape, dtype=jnp.int32)
    periodic = grid.periodic or (False,) * dim
    pmask = jnp.asarray(periodic)
    nbrs = []
    for off in _window_offsets(dim):
        nc = coords + jnp.asarray(off, dtype=jnp.int32)
        if any(periodic):
            nc = jnp.where(pmask, jnp.mod(nc, gshape), nc)
        inb = jnp.all((nc >= 0) & (nc < gshape), axis=-1)
        target = jnp.where(inb, grid.flatten_coords(jnp.clip(nc, 0, gshape - 1)),
                           ncells)
        idx = jnp.searchsorted(occ_cells, target.astype(occ_cells.dtype))
        idx_c = jnp.minimum(idx, c_max - 1)
        found = (occ_cells[idx_c] == target) & (target < ncells)
        nbrs.append(jnp.where(found, idx_c, c_max).astype(jnp.int32))
    nbr_block = jnp.stack(nbrs, axis=1)

    return BlockMap(occ_cells=occ_cells, n_occ=n_occ, nbr_block=nbr_block,
                    slot_particle=slot_particle, slot_mask=slot_mask,
                    particle_slot=particle_slot, overflow=overflow)


def _unflatten(flat, grid: CellGrid):
    """Row-major flat cell id -> (..., dim) coords (sentinels give garbage
    coords, masked downstream)."""
    dims = grid.shape
    coords = []
    rem = flat
    for d in range(len(dims) - 1, -1, -1):
        coords.append(rem % dims[d])
        rem = rem // dims[d]
    return jnp.stack(coords[::-1], axis=-1).astype(jnp.int32)


def cross_neighbor_blocks(occ_cells_q, grid: CellGrid, bm_src: BlockMap):
    """Window-neighbor block rows of ANOTHER body's block map (contact
    relations): for each query occupied cell, the source block row of each
    of its 3^dim window cells (sentinel = src c_max)."""
    dim = grid.dim
    ncells = grid.ncells
    c_max_s = bm_src.c_max
    coords = _unflatten(occ_cells_q, grid)
    gshape = jnp.asarray(grid.shape, dtype=jnp.int32)
    periodic = grid.periodic or (False,) * dim
    pmask = jnp.asarray(periodic)
    nbrs = []
    for off in _window_offsets(dim):
        nc = coords + jnp.asarray(off, dtype=jnp.int32)
        if any(periodic):
            nc = jnp.where(pmask, jnp.mod(nc, gshape), nc)
        inb = jnp.all((nc >= 0) & (nc < gshape), axis=-1)
        target = jnp.where(inb, grid.flatten_coords(jnp.clip(nc, 0, gshape - 1)),
                           ncells)
        idx = jnp.searchsorted(bm_src.occ_cells, target.astype(bm_src.occ_cells.dtype))
        idx_c = jnp.minimum(idx, c_max_s - 1)
        found = (bm_src.occ_cells[idx_c] == target) & (target < ncells)
        nbrs.append(jnp.where(found, idx_c, c_max_s).astype(jnp.int32))
    return jnp.stack(nbrs, axis=1)


# ---------------------------------------------------------------------------
# layout conversion
# ---------------------------------------------------------------------------

def to_blocks(bm: BlockMap, arr, fill=0.0):
    """Particle array (N, ...) -> block array (C_max+1, cap, ...) with an
    all-`fill` sentinel row at C_max."""
    n = arr.shape[0]
    cap = bm.cap
    safe = jnp.minimum(bm.slot_particle, n - 1)
    flat = jnp.where(
        bm.slot_mask.reshape((-1,) + (1,) * (arr.ndim - 1)), arr[safe],
        jnp.asarray(fill, dtype=arr.dtype))
    blocks = flat.reshape((bm.c_max, cap) + arr.shape[1:])
    sentinel = jnp.full((1, cap) + arr.shape[1:], fill, dtype=arr.dtype)
    return jnp.concatenate([blocks, sentinel], axis=0)


def from_blocks(bm: BlockMap, blocks, out_n: int):
    """Block array (C_max+1, cap, ...) -> particle array (N, ...)."""
    flat = blocks.reshape((-1,) + blocks.shape[2:])
    safe = jnp.minimum(bm.particle_slot, bm.c_max * bm.cap - 1)
    valid = bm.particle_slot < bm.c_max * bm.cap
    out = flat[safe[:out_n]]
    return jnp.where(valid[:out_n].reshape((-1,) + (1,) * (blocks.ndim - 2)),
                     out, jnp.zeros_like(out))


def gather_window(blocks, nbr_block):
    """Gather the 3^dim window neighbor blocks: (C_max+1, cap, ...) +
    (C_max, W) -> (C_max, W, cap, ...).  Row-granularity gather (each row
    is cap * channels contiguous elements)."""
    return blocks[nbr_block]
