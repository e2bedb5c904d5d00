"""Prototype 3: transposed-native RE-SLOT vs the current one.

Trace analysis (320k dambreak): the per-advection-step re-slot machinery
costs ~40 ms — an army of ~1.27 ms layout-copy fusions from flattening
the 11 block fields ((C+1,cap,d) physicals are (16,128)-tile padded) plus
the packed (S,15) gather path (padded to (S,128)).

Transposed re-slot: state lives as (cap, C+1)/(d, cap, C+1); packing is
  (CH, cap, C+1) concat -> reshape (CH, S) [benign] -> transpose (S, CH)
  [one big copy] -> row gather -> transpose back [benign dest].

Usage: PYTHONPATH=... python benchmarks/micro_t3.py [dx]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.neighbors import cell_blocks as cb
from benchmarks.micro_t import to_t, timeit, ITERS


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
    c = sim.nbr_inner.shape[0]
    n_max = base.n_fluid
    eng_fields = list(dbb._FLUID_FIELDS) + ["OriginalID"]
    grid, cap = base.grid, case.cap
    print(f"dx={dx} n_fluid={base.n_fluid} c_max={c} cap={cap} "
          f"platform={jax.devices()[0].platform}", flush=True)

    fills = {"Position": 1.0e16, "Mass": 1.0, "VolumetricMeasure": 0.0,
             "Density": db.RHO0_F,
             "OriginalID": jnp.iinfo(jnp.int32).max}

    # ---- current re-slot ----
    def reslot_cur(f):
        flat = {k: f[k].reshape((-1,) + f[k].shape[2:]) for k in eng_fields}
        valid = f["SlotMask"].reshape(-1)
        bm = cb.build_block_map(flat["Position"], valid, grid, cap=cap,
                                c_max=c, n_max=n_max, with_inverse=False)
        fb2 = cb.to_blocks_packed(bm, flat, fills)
        fb2["SlotMask"] = jnp.concatenate(
            [bm.slot_mask.reshape(bm.c_max, bm.cap),
             jnp.zeros((1, bm.cap), bool)], axis=0)
        fb2["_nbr"] = bm.nbr_block
        return fb2

    fb["_nbr"] = sim.nbr_inner

    @jax.jit
    def cur_loop(f):
        return jax.lax.fori_loop(0, ITERS, lambda i, g: reslot_cur(g), f)
    timeit("CURRENT re-slot (incl windows)", cur_loop, fb)

    # ---- transposed re-slot ----
    ft = jax.jit(lambda f: to_t(f, c))(fb)
    ft["OriginalID"] = jnp.asarray(fb["OriginalID"].T)
    ft["_nbr"] = sim.nbr_inner
    jax.block_until_ready(ft)

    def reslot_t(f):
        pos = f["Position"]                       # (d, cap, C+1)
        mask = f["SlotMask"]                      # (cap, C+1)
        dim = pos.shape[0]
        # cell id per slot, (cap, C+1) -> (S,)
        lo = jnp.asarray(grid.lower, pos.dtype)
        ii = [jnp.clip(jnp.floor((pos[k] - lo[k])
                                 * (1.0 / grid.spacing[k])).astype(jnp.int32),
                       0, grid.shape[k] - 1) for k in range(dim)]
        cid2 = ii[0]
        for k in range(1, dim):
            cid2 = cid2 * grid.shape[k] + ii[k]
        cid = jnp.where(mask, cid2, grid.ncells).reshape(-1)

        n = cid.shape[0]
        order = jnp.argsort(cid)
        order_n = order[:n_max].astype(jnp.int32)
        scid = cid[order_n].astype(jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -1, scid.dtype), scid[:-1]])
        is_first = (scid != prev) & (scid < grid.ncells)
        csum = jnp.cumsum(is_first.astype(jnp.int32))
        n_occ = csum[-1]
        r_idx = jnp.arange(c, dtype=jnp.int32)
        p_r = jnp.searchsorted(csum, r_idx + 1, side="left").astype(jnp.int32)
        found = r_idx < n_occ
        start = jnp.where(found, p_r, n_max).astype(jnp.int32)
        occ_cells = jnp.where(found, scid[jnp.minimum(p_r, n_max - 1)],
                              grid.ncells)
        sort_valid = scid < grid.ncells
        n_valid = jnp.sum(sort_valid.astype(jnp.int32))
        nxt = jnp.concatenate([start[1:], jnp.full((1,), n_max, jnp.int32)])
        count = jnp.minimum(nxt, n_valid) - jnp.minimum(start, n_valid)
        k_idx = jnp.arange(cap, dtype=jnp.int32)
        occ_pos = start[:, None] + k_idx[None, :]
        valid_slot = (k_idx[None, :] < jnp.minimum(count, cap)[:, None]) \
            & found[:, None]
        slot_particle = jnp.where(
            valid_slot, order_n[jnp.minimum(occ_pos, n_max - 1)], n)  # (c_max, cap)

        # window-neighbor block map (same as build_block_map)
        dense_map = jnp.full((grid.ncells + 1,), c, dtype=jnp.int32)
        dense_map = dense_map.at[jnp.minimum(occ_cells, grid.ncells)].set(
            jnp.arange(c, dtype=jnp.int32), mode="drop")
        dense_map = dense_map.at[grid.ncells].set(c)
        coords = cb._unflatten(occ_cells, grid)
        gshape = jnp.asarray(grid.shape, dtype=jnp.int32)
        nbrs = []
        for off in cb._window_offsets(dim):
            nc = coords + jnp.asarray(off, dtype=jnp.int32)
            inb = jnp.all((nc >= 0) & (nc < gshape), axis=-1)
            target = jnp.where(inb, grid.flatten_coords(
                jnp.clip(nc, 0, gshape - 1)), grid.ncells)
            nbrs.append(dense_map[target])
        nbr_block = jnp.stack(nbrs, axis=1)

        # pack all float fields: (CH, cap, C+1) -> (CH, S) -> (S, CH)
        cols = []
        for k in eng_fields:
            v = f[k]
            if k == "OriginalID":
                v = jax.lax.bitcast_convert_type(v, jnp.float32)
            cols.append(v[None] if v.ndim == 2 else v)
        packed = jnp.concatenate(cols, axis=0)    # (CH, cap, C+1)
        ch = packed.shape[0]
        flat = packed.reshape(ch, -1).T           # (S, CH) one big copy
        rows = flat[jnp.minimum(slot_particle.reshape(-1), n - 1)]
        out_t = rows.reshape(c, cap, ch).transpose(2, 1, 0)  # (CH, cap, C)
        # sentinel lane + fills
        mask_new = valid_slot.T                   # (cap, c_max)
        mask_full = jnp.concatenate(
            [mask_new, jnp.zeros((cap, 1), bool)], axis=1)
        g = {}
        col0 = 0
        for k in eng_fields:
            v = f[k]
            ncol = 1 if v.ndim == 2 else v.shape[0]
            sub = out_t[col0:col0 + ncol]          # (ncol, cap, c_max)
            sub = jnp.concatenate(
                [sub, jnp.zeros((ncol, cap, 1), sub.dtype)], axis=2)
            fill = fills.get(k, 0.0)
            if k == "OriginalID":
                sub = jax.lax.bitcast_convert_type(sub, jnp.int32)
                sub = jnp.where(mask_full[None], sub,
                                jnp.asarray(fill, jnp.int32))
                g[k] = sub[0]
            else:
                sub = jnp.where(mask_full[None], sub,
                                jnp.asarray(fill, jnp.float32))
                g[k] = sub[0] if v.ndim == 2 else sub
            col0 += ncol
        g["SlotMask"] = mask_full
        g["_nbr"] = nbr_block
        return g

    @jax.jit
    def t_loop(f):
        return jax.lax.fori_loop(0, ITERS, lambda i, g: reslot_t(g), f)
    timeit("TRANSPOSED re-slot", t_loop, ft)

    # parity: re-slot both once, compare per-particle states via OriginalID
    a = jax.jit(reslot_cur)(fb)
    b = jax.jit(reslot_t)(ft)
    ids_a = jnp.where(a["SlotMask"], a["OriginalID"], -1).reshape(-1)
    ids_b = jnp.where(b["SlotMask"], b["OriginalID"], -1).T.reshape(-1)
    oa = jnp.sort(ids_a)
    ob = jnp.sort(ids_b)
    print("parity ids equal:", bool(jnp.all(oa == ob)), flush=True)
    # positions by id
    n = base.n_fluid
    pa = jnp.zeros((n + 1, 2)).at[jnp.minimum(
        jnp.where(a["SlotMask"], a["OriginalID"], n).reshape(-1), n)].set(
        a["Position"].reshape(-1, 2), mode="drop")[:n]
    pb_ = jnp.zeros((n + 1, 2)).at[jnp.minimum(
        jnp.where(b["SlotMask"], b["OriginalID"], n).T.reshape(-1), n)].set(
        b["Position"].transpose(1, 2, 0).reshape(-1, 2), mode="drop")[:n]
    print("parity pos maxdiff:", float(jnp.max(jnp.abs(pa - pb_))), flush=True)


if __name__ == "__main__":
    main()
