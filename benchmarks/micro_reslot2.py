"""Bisect the re-slot cost at 320k piece by piece (each piece timed in a
fori_loop carrying its own input through an optimization_barrier, so the
body re-executes without structural-carry constraints; the barrier cost
for small carries is negligible).

Usage: PYTHONPATH=... python benchmarks/micro_reslot2.py [dx]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.neighbors import cell_blocks as cb

ITERS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:9.3f} ms/iter", flush=True)
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
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0025
    case, fluid = dbb.build_case(dx=dx, use_pallas=True)
    sim = dbb.init_sim(case, fluid)
    base = case.base
    run_chunk = dbb.make_run_chunk(case)
    dt_adv = 0.25 * base.adaptation.h / db.U_REF
    sim = run_chunk(sim, jnp.asarray(3 * dt_adv, sim.time.dtype))
    jax.block_until_ready(sim.fluid_b["Position"])
    fb = dict(sim.fluid_b)
    c_max = sim.nbr_inner.shape[0]
    n_max = base.n_fluid
    grid, cap = base.grid, case.cap
    eng_fields = list(dbb._FLUID_FIELDS) + ["OriginalID"]
    print(f"dx={dx} S={(c_max+1)*cap} c_max={c_max} ncells={grid.ncells} "
          f"platform={jax.devices()[0].platform}", flush=True)

    # barrier-only baseline with a small carry
    timeit("0 barrier baseline (1 small array)", loop(lambda a: a + 1.0),
           jnp.zeros((8, 128)))

    # inputs
    flat_pos = jax.jit(lambda f: f["Position"].reshape(-1, 2))(fb)
    valid = jax.jit(lambda f: f["SlotMask"].reshape(-1))(fb)
    n = flat_pos.shape[0]
    cid = jax.jit(lambda p, v: jnp.where(v, grid.cell_id(p),
                                         grid.ncells))(flat_pos, valid)
    jax.block_until_ready((flat_pos, valid, cid))

    # 1. flatten of the 11 fields
    def flatten_all(f):
        return [f[k].reshape((-1,) + f[k].shape[2:]) for k in eng_fields]
    timeit("1 flatten 11 block fields", loop(flatten_all), fb)

    # 2. cid compute
    timeit("2 cell ids", loop(
        lambda p: jnp.where(valid, grid.cell_id(p), grid.ncells)), flat_pos)

    # 3. argsort over S
    timeit("3 argsort(cid) S rows", loop(lambda x: jnp.argsort(x)), cid)

    order = jnp.argsort(cid)
    order_n = order[:n_max].astype(jnp.int32)
    scid = cid[order_n].astype(jnp.int32)
    jax.block_until_ready((order_n, scid))

    # 4. post-sort scalar chain (prev/is_first/cumsum)
    def chain(s):
        prev = jnp.concatenate([jnp.full((1,), -1, s.dtype), s[:-1]])
        is_first = (s != prev) & (s < grid.ncells)
        return jnp.cumsum(is_first.astype(jnp.int32))
    timeit("4 cumsum chain (M rows)", loop(chain), scid)
    csum = jax.jit(chain)(scid)
    jax.block_until_ready(csum)

    # 5. searchsorted csum for c_max starts
    r_idx = jnp.arange(c_max, dtype=jnp.int32)
    timeit("5 searchsorted(csum, c_max)", loop(
        lambda cs: jnp.searchsorted(cs, r_idx + 1, side="left")), csum)

    p_r = jnp.searchsorted(csum, r_idx + 1, side="left").astype(jnp.int32)
    n_occ = csum[-1]
    found = r_idx < n_occ
    start = jnp.where(found, p_r, n_max).astype(jnp.int32)
    occ_cells = jnp.where(found, scid[jnp.minimum(p_r, n_max - 1)],
                          grid.ncells)
    jax.block_until_ready((start, occ_cells))

    # 6. dense_map scatter
    timeit("6 dense_map scatter (c_max rows)", loop(
        lambda oc: cb.dense_cell_map(oc, grid.ncells, c_max)), occ_cells)
    dm = cb.dense_cell_map(occ_cells, grid.ncells, c_max)
    jax.block_until_ready(dm)

    # 7. window map (unflatten + 9 dense lookups)
    def windows(oc):
        coords = cb._unflatten(oc, grid)
        gshape = jnp.asarray(grid.shape, dtype=jnp.int32)
        nbrs = []
        for off in cb._window_offsets(2):
            nc = coords + jnp.asarray(off, dtype=jnp.int32)
            inb = jnp.all((nc >= 0) & (nc < gshape), axis=-1)
            target = jnp.where(inb, grid.flatten_coords(
                jnp.clip(nc, 0, gshape - 1)), grid.ncells)
            nbrs.append(dm[target])
        return jnp.stack(nbrs, axis=1)
    timeit("7 window map (9 lookups)", loop(windows), occ_cells)

    # 8. slot_particle build
    def slots(st):
        n_valid = jnp.sum((scid < grid.ncells).astype(jnp.int32))
        nxt = jnp.concatenate([st[1:], jnp.full((1,), n_max, jnp.int32)])
        count = jnp.minimum(nxt, n_valid) - jnp.minimum(st, n_valid)
        k_idx = jnp.arange(cap, dtype=jnp.int32)
        occ_pos = st[:, None] + k_idx[None, :]
        valid_slot = (k_idx[None, :] < jnp.minimum(count, cap)[:, None]) \
            & found[:, None]
        return jnp.where(valid_slot,
                         order_n[jnp.minimum(occ_pos, n_max - 1)], n)
    timeit("8 slot_particle build", loop(slots), start)
    slot_particle = jax.jit(slots)(start).reshape(-1)
    jax.block_until_ready(slot_particle)

    # 9. packed concat (S, 15)
    flats = jax.jit(lambda f: flatten_all(f))(fb)
    jax.block_until_ready(flats)

    def pack(fl):
        cols = []
        for k, v in zip(eng_fields, fl):
            if v.dtype == jnp.int32:
                v = jax.lax.bitcast_convert_type(v, jnp.float32)
            cols.append(v[:, None] if v.ndim == 1 else v)
        return jnp.concatenate(cols, axis=-1)
    timeit("9 packed concat (S,15)", loop(pack), flats)
    packed = jax.jit(pack)(flats)
    jax.block_until_ready(packed)

    # 10. the row gather
    safe = jnp.minimum(slot_particle, n - 1)
    timeit("10 row gather (S' rows of 15)", loop(lambda p: p[safe]), packed)
    rows = packed[safe]
    jax.block_until_ready(rows)

    # 11. unpack to 11 block fields
    maskc = (slot_particle < n)[:, None]

    def unpack(r):
        out = []
        col0 = 0
        for k in eng_fields:
            v = fb[k]
            ncol = 1 if v.ndim == 2 else v.shape[2]
            sub = jnp.where(maskc, r[:, col0:col0 + ncol], 0.0)
            blocks = sub.reshape((c_max, cap, ncol))
            out.append(jnp.concatenate(
                [blocks, jnp.zeros((1, cap, ncol), sub.dtype)], axis=0))
            col0 += ncol
        return out
    timeit("11 unpack to block fields", loop(unpack), rows)

    # 12. wall windows + wall pack (per advection step too)
    timeit("12 wall cross windows", loop(
        lambda oc: cb.cross_neighbor_blocks(oc, grid, case.bm_wall,
                                            src_dense_map=case.wall_dense)),
        occ_cells) if hasattr(case, "wall_dense") else None


if __name__ == "__main__":
    main()
