"""Explicit-collective SPMD particle stepping: slab decomposition with
ppermute halo exchange (shard_map fast path).

The reference has no distributed backend at all (SURVEY.md §2.1/§5); this
is the net-new TPU scale-out design: the domain is split into x-slabs, one
per device; each device owns the particles in its slab (fixed local
capacity + Alive masks) and sees its neighbors' boundary bands as
read-only ghosts:

  per advection step (all inside ONE shard_map'd jitted program):
    1. MIGRATE: particles that crossed a slab boundary are packed into a
       fixed-capacity band, ppermute'd to the neighbor, and merged into
       dead slots (the open-boundary recycling machinery reused).
    2. HALO: each device compacts its left/right boundary bands (particles
       within `cutoff` of the slab face) and ppermute's them; ghost
       indices stay fixed for the advection step.
    3. local neighbor build over [local + ghostL + ghostR].
    4. dual-criteria acoustic loop: after each sub-step the *values* of
       the halo bands are re-exchanged (positions move on their owner),
       and the CFL reduces become lax.pmin/pmax over the mesh axis.

Collectives used: ppermute (halo + migration, rides ICI neighbor links),
pmin/pmax (dt), psum (diagnostics) — exactly the psum/ppermute recipe the
build brief calls for.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sphinxsys_tpu.neighbors import grid_from_bounds, build_cell_table, build_neighbor_list
from sphinxsys_tpu.physics import fluid as fd

AXIS = "p"


def _pperm_right(x, axis_size):
    """Send x to the right neighbor (device i -> i+1); leftmost receives
    zeros."""
    perm = [(i, i + 1) for i in range(axis_size - 1)]
    return jax.lax.ppermute(x, AXIS, perm)


def _pperm_left(x, axis_size):
    perm = [(i + 1, i) for i in range(axis_size - 1)]
    return jax.lax.ppermute(x, AXIS, perm)


def _compact_band(fields: dict, mask, cap: int, fill_far: float):
    """Pack masked rows into a fixed-capacity band (deterministic rank
    compaction).  Returns dict of (cap, ...) arrays (plus a "BandAlive"
    validity channel — ppermute edge devices receive ZEROS, so aliveness
    must be an explicit flag, not inferred from positions) + count."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1
    tgt = jnp.where(mask & (rank < cap), rank, cap)
    out = {}
    for k, v in fields.items():
        fill = fill_far if k == "Position" else 0.0
        band = jnp.full((cap + 1,) + v.shape[1:], fill, dtype=v.dtype)
        out[k] = band.at[tgt].set(v, mode="drop")[:cap]
    flag = jnp.zeros((cap + 1,), dtype=jnp.float32)
    out["BandAlive"] = flag.at[tgt].set(1.0, mode="drop")[:cap]
    count = jnp.sum(mask)
    return out, count, count > cap


class HaloFluidShard(NamedTuple):
    """Per-device fluid state (dict of (N_loc, ...) arrays incl. Alive)."""

    fluid: Any
    time: jnp.ndarray
    n_adv: jnp.ndarray
    n_ac: jnp.ndarray
    overflow: jnp.ndarray


_EXCHANGE_FIELDS = ["Position", "Velocity", "Density", "Mass",
                    "VolumetricMeasure", "Pressure", "DensityChangeRate",
                    "Force", "ForcePrior", "DensitySummation"]
# ghost rows recompute p = EoS(rho) locally, so Density (+ its rate) is
# exchanged rather than Pressure — the local recomputation then matches the
# owner bit-for-bit (dt is global via pmax)
_HALO_VALUE_FIELDS = ["Position", "Velocity", "Density", "DensityChangeRate",
                      "VolumetricMeasure"]


def make_halo_dambreak_step(case, mesh: Mesh, halo_cap: int = 512,
                            migrate_cap: int = 256):
    """Distributed advection step for the 2D dambreak scene (case from
    cases/dambreak_2d.build_case).  Slabs split [x_lo, x_hi] equally along
    x; the static wall is replicated (it is small and read-only).

    Returns a jitted function  step(sharded_state) -> sharded_state  where
    the state dict holds (n_dev * N_loc, ...) global arrays sharded on the
    particle axis.
    """
    n_dev = mesh.devices.size
    import math as _math

    from sphinxsys_tpu.cases.dambreak_2d import U_REF, RHO0_F

    grid = case.grid
    kernel = case.kernel
    dim = 2
    h = case.adaptation.h
    sigma0 = case.adaptation.sigma0
    cutoff = case.adaptation.cutoff
    x_lo = grid.lower[0]
    x_hi = grid.lower[0] + grid.spacing[0] * grid.shape[0]
    slab_w = (x_hi - x_lo) / n_dev
    FAR = 1.0e16

    wall = case.wall
    wall_table = case.wall_table

    def local_step(fluid):
        """One advection step on this device's shard. fluid: dict of
        (N_loc,...) + Alive."""
        idx = jax.lax.axis_index(AXIS)
        my_lo = x_lo + slab_w * idx
        my_hi = my_lo + slab_w
        alive = fluid["Alive"]
        pos = fluid["Position"]

        # ---- 1. migration ------------------------------------------------
        go_right = alive & (pos[:, 0] >= my_hi) & (idx < n_dev - 1)
        go_left = alive & (pos[:, 0] < my_lo) & (idx > 0)
        fields = {k: fluid[k] for k in _EXCHANGE_FIELDS}
        band_r, cnt_r, ovf_r = _compact_band(fields, go_right, migrate_cap, FAR)
        band_l, cnt_l, ovf_l = _compact_band(fields, go_left, migrate_cap, FAR)
        recv_l = {k: _pperm_right(v, n_dev) for k, v in band_r.items()}  # from left nbr
        recv_r = {k: _pperm_left(v, n_dev) for k, v in band_l.items()}   # from right nbr
        alive = alive & ~(go_right | go_left)
        fluid = dict(fluid)
        fluid["Position"] = jnp.where((go_right | go_left)[:, None], FAR, pos)
        fluid["Alive"] = alive
        # merge arrivals into dead slots (valid arrivals have pos < FAR/2)
        for recv in (recv_l, recv_r):
            arr_alive = recv["BandAlive"] > 0.5
            dead_slots = jnp.nonzero(~fluid["Alive"], size=fluid["Alive"].shape[0],
                                     fill_value=fluid["Alive"].shape[0] - 1)[0]
            arr_rank = jnp.cumsum(arr_alive) - 1
            ok = arr_alive & (arr_rank < jnp.sum(~fluid["Alive"]))
            tgt = jnp.where(ok, dead_slots[jnp.minimum(arr_rank, dead_slots.shape[0] - 1)],
                            fluid["Alive"].shape[0])
            for k in _EXCHANGE_FIELDS:
                fluid[k] = fluid[k].at[tgt].set(recv[k], mode="drop")
            fluid["Alive"] = fluid["Alive"].at[tgt].set(True, mode="drop")
        mig_overflow = ovf_r | ovf_l

        # ---- 2. halo bands ------------------------------------------------
        alive = fluid["Alive"]
        pos = fluid["Position"]
        near_r = alive & (pos[:, 0] >= my_hi - cutoff)
        near_l = alive & (pos[:, 0] < my_lo + cutoff)
        hfields = {k: fluid[k] for k in _HALO_VALUE_FIELDS}
        hband_r, hcnt_r, hovf_r = _compact_band(hfields, near_r, halo_cap, FAR)
        hband_l, hcnt_l, hovf_l = _compact_band(hfields, near_l, halo_cap, FAR)
        ghost_l = {k: _pperm_right(v, n_dev) for k, v in hband_r.items()}
        ghost_r = {k: _pperm_left(v, n_dev) for k, v in hband_l.items()}
        halo_overflow = hovf_r | hovf_l

        # the halo INDEX sets are frozen for this advection step; value
        # re-exchange during sub-steps resends the same compacted bands
        near_r_idx = near_r
        near_l_idx = near_l

        def combined(fl, gl, gr):
            return {k: jnp.concatenate([fl[k], gl[k], gr[k]], axis=0)
                    for k in _HALO_VALUE_FIELDS}

        # invalid ghost rows (incl. zero-filled edge receives) parked FAR
        for g in (ghost_l, ghost_r):
            g["Position"] = jnp.where((g["BandAlive"] > 0.5)[:, None],
                                      g["Position"], FAR)

        n_loc = pos.shape[0]
        comb = combined(hfields, ghost_l, ghost_r)
        comb_alive = jnp.concatenate([
            alive, ghost_l["BandAlive"] > 0.5, ghost_r["BandAlive"] > 0.5])

        # ---- 3. neighbor build over local + ghosts -----------------------
        table = build_cell_table(comb["Position"], comb_alive, grid,
                                 cap=case.cell_cap)
        nl_inner = build_neighbor_list(comb["Position"], comb_alive,
                                       comb["Position"], comb_alive, table,
                                       grid, cutoff, k_max=case.k_inner,
                                       include_self=False)
        nl_wall = build_neighbor_list(fluid["Position"], alive,
                                      wall["Position"], wall["NReal"],
                                      wall_table, grid, cutoff,
                                      k_max=case.k_wall, include_self=True)

        # ---- 4. dual-criteria loop with per-substep halo refresh ----------
        # assemble a combined fluid state (ghost entries only carry the
        # exchanged value fields; other fields are harmless placeholders)
        def expand(fl):
            out = {}
            ng = 2 * halo_cap
            for k, v in fl.items():
                if k in ("Alive", "NReal"):
                    continue
                if k in _HALO_VALUE_FIELDS:
                    continue
                pad = jnp.zeros((ng,) + v.shape[1:], v.dtype) if v.ndim else v
                out[k] = jnp.concatenate([v, pad + (1.0 if k in ("Mass", "Density") else 0.0)], axis=0) if v.ndim else v
            return out

        base = expand(fluid)

        def refresh(fl_comb, fluid_now):
            """re-exchange halo values from the owner's current fields."""
            hf = {k: fluid_now[k] for k in _HALO_VALUE_FIELDS}
            br, _, _ = _compact_band(hf, near_r_idx, halo_cap, FAR)
            bl, _, _ = _compact_band(hf, near_l_idx, halo_cap, FAR)
            gl = {k: _pperm_right(v, n_dev) for k, v in br.items()}
            gr = {k: _pperm_left(v, n_dev) for k, v in bl.items()}
            out = dict(fl_comb)
            for k in _HALO_VALUE_FIELDS:
                out[k] = jnp.concatenate([fluid_now[k], gl[k], gr[k]], axis=0)
            return out

        # advection dt: local reduce + global min via pmin
        fl_for_dt = dict(fluid)
        fl_for_dt["NReal"] = jnp.asarray(n_loc, jnp.int32)  # masked below
        valid = alive

        def masked_max(x):
            return jnp.max(jnp.where(valid, x, 0.0))

        accel_scale = 4.0 * h * jnp.linalg.norm(
            fluid["Force"] + fluid["ForcePrior"], axis=-1) / jnp.maximum(fluid["Mass"], 1e-15)
        v2 = jnp.sum(fluid["Velocity"] ** 2, axis=-1)
        red = masked_max(jnp.maximum(v2, accel_scale))
        red = jax.lax.pmax(red, AXIS)
        dt_adv = 0.25 * h / (jnp.maximum(jnp.sqrt(red), U_REF) + 1e-15)

        # density summation (local rows only; ghosts provide neighbors)
        state_c = dict(base)
        state_c.update({k: jnp.concatenate([fluid[k], comb[k][n_loc:]], axis=0)
                        for k in _HALO_VALUE_FIELDS})
        state_c["NReal"] = jnp.asarray(comb["Position"].shape[0], jnp.int32)
        state_c = fd.density_summation(
            state_c, nl_inner, kernel, dim, RHO0_F, sigma0,
            contacts=[(wall, _pad_nl(nl_wall, 2 * halo_cap), RHO0_F)],
            free_surface=True)

        def ac_cond(carry):
            _, rt, _ = carry
            return rt < dt_adv

        def ac_body(carry):
            sc, rt, k = carry
            c_eos = case.eos.sound_speed(sc["Pressure"], sc["Density"])
            speed = jnp.linalg.norm(sc["Velocity"], axis=-1)
            local = jnp.max(jnp.where(comb_alive, c_eos + speed, 0.0))
            dt = 0.6 * h / (jax.lax.pmax(local, AXIS) + 1e-15)
            sc = fd.acoustic_step_1st_half(sc, nl_inner, kernel, dim, case.eos,
                                           case.riemann, dt, wall=wall,
                                           nl_wall=_pad_nl(nl_wall, 2 * halo_cap))
            sc = fd.acoustic_step_2nd_half(sc, nl_inner, kernel, dim,
                                           case.riemann, dt, wall=wall,
                                           nl_wall=_pad_nl(nl_wall, 2 * halo_cap))
            # write back local rows, re-exchange halo values
            fluid_now = {k: sc[k][:n_loc] for k in sc if getattr(sc[k], "ndim", 0) >= 1}
            sc = refresh(sc, fluid_now)
            return (sc, rt + dt, k + 1)

        state_c, relax_t, n_ac = jax.lax.while_loop(
            ac_cond, ac_body,
            (state_c, jnp.zeros_like(dt_adv), jnp.zeros((), jnp.int32)))

        out = dict(fluid)
        for k in out:
            if k in ("Alive", "NReal"):
                continue
            if k in state_c and getattr(state_c[k], "ndim", 0) >= 1:
                out[k] = state_c[k][:n_loc]
        out["Alive"] = alive
        overflow = mig_overflow | halo_overflow | nl_inner.overflow | nl_wall.overflow
        return out, relax_t, n_ac, overflow

    def _pad_nl(nl, extra):
        """extend a local-query neighbor list to combined-query length with
        empty rows (ghost rows have no wall neighbors of their own)."""
        ns = nl.idx.shape
        pad_idx = jnp.full((extra,) + ns[1:], case.n_wall, dtype=nl.idx.dtype)
        pad_cnt = jnp.zeros((extra,), dtype=nl.count.dtype)
        return type(nl)(idx=jnp.concatenate([nl.idx, pad_idx], axis=0),
                        count=jnp.concatenate([nl.count, pad_cnt], axis=0),
                        overflow=nl.overflow)

    @jax.jit
    def step(sim: HaloFluidShard) -> HaloFluidShard:
        fluid_specs = {k: P(AXIS) for k in sim.fluid}

        def body(fluid):
            out, relax_t, n_ac, ovf = local_step(fluid)
            return out, relax_t, n_ac, ovf

        out, relax_t, n_ac, ovf = shard_map(
            body, mesh=mesh,
            in_specs=(fluid_specs,),
            out_specs=(fluid_specs, P(), P(), P()),
            check_vma=False,
        )(sim.fluid)
        return HaloFluidShard(fluid=out, time=sim.time + relax_t,
                              n_adv=sim.n_adv + 1, n_ac=sim.n_ac + n_ac,
                              overflow=sim.overflow | ovf)

    return step


def distribute_dambreak(case, fluid, mesh: Mesh, n_loc: int | None = None):
    """Partition a dambreak fluid state into per-slab shards: global arrays
    (n_dev * N_loc, ...) sharded along the particle axis, slab-owned rows
    first, padding dead."""
    n_dev = mesh.devices.size
    grid = case.grid
    x_lo = grid.lower[0]
    x_hi = grid.lower[0] + grid.spacing[0] * grid.shape[0]
    slab_w = (x_hi - x_lo) / n_dev
    pos = np.asarray(fluid["Position"])
    n_real = int(fluid["NReal"])
    slab = np.clip(((pos[:, 0] - x_lo) // slab_w).astype(int), 0, n_dev - 1)
    counts = [(slab[:n_real] == d).sum() for d in range(n_dev)]
    n_loc = n_loc or int(1.5 * max(max(counts), 1))
    n_loc = ((n_loc + 7) // 8) * 8

    global_arrays = {}
    FAR = 1.0e16
    for k, v in fluid.items():
        if k == "NReal":
            continue
        v = np.asarray(v)
        shape = (n_dev * n_loc,) + v.shape[1:]
        fill = FAR if k == "Position" else (1.0 if k in ("Mass", "Density", "VolumetricMeasure") else 0.0)
        out = np.full(shape, fill, dtype=v.dtype)
        alive = np.zeros((n_dev * n_loc,), dtype=bool)
        for d in range(n_dev):
            rows = np.nonzero(slab[:n_real] == d)[0][:n_loc]
            out[d * n_loc: d * n_loc + len(rows)] = v[rows]
            alive[d * n_loc: d * n_loc + len(rows)] = True
        global_arrays[k] = jnp.asarray(out)
    global_arrays["Alive"] = jnp.asarray(alive)

    from jax.sharding import NamedSharding

    sharded = {k: jax.device_put(v, NamedSharding(mesh, P(AXIS)))
               for k, v in global_arrays.items()}
    dtype = fluid["Position"].dtype
    return HaloFluidShard(fluid=sharded, time=jnp.zeros((), dtype),
                          n_adv=jnp.zeros((), jnp.int32),
                          n_ac=jnp.zeros((), jnp.int32),
                          overflow=jnp.zeros((), bool))
