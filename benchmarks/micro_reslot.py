"""Sub-bisect re-slot INSIDE one dispatch (fori + optimization_barrier) —
per-call dispatches over the axon tunnel cost ~30 ms each and swamp the
compute."""
import os, time
import jax, jax.numpy as jnp
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.neighbors.cell_blocks import (build_block_map,
                                                 cross_neighbor_blocks,
                                                 to_blocks_packed)

DX = float(os.environ.get("MB_DX", "0.005"))
case, fluid = dbb.build_case(dx=DX, use_pallas=True)
sim = dbb.init_sim(case, fluid)
run = dbb.make_run_chunk(case)
h = case.base.adaptation.h
dt_adv = 0.25 * h / db.U_REF
sim = run(sim, jnp.asarray(30 * dt_adv, sim.time.dtype))
jax.block_until_ready(sim.fluid_b["Position"])
print(f"dx={DX} state ready t={float(sim.time):.4f} c_max={case.c_max}", flush=True)

fb = sim.fluid_b
flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
        for k in dbb._FLUID_FIELDS + ["OriginalID"]}
valid = fb["SlotMask"].reshape(-1)
grid = case.grid
pos = flat["Position"]
fills = dict(dbb._FILLS); fills["OriginalID"] = jnp.iinfo(jnp.int32).max

N_IT = 30

def loop_time(name, body):
    @jax.jit
    def run_loop(p):
        def it(_, carry):
            return jax.lax.optimization_barrier(body(carry))
        return jax.lax.fori_loop(0, N_IT, it, p)
    out = run_loop(pos); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = run_loop(pos)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(f"{name:44s} {(time.perf_counter()-t0)*1e3/N_IT:8.3f} ms", flush=True)

loop_time("argsort keys", lambda p: (
    jnp.argsort(jnp.where(valid, (p[:, 0] * 1e3).astype(jnp.int32), 2**30))
    .astype(jnp.float32).reshape(-1, 1) * 0 + p))
loop_time("build_block_map (via pos jitter)", lambda p: (
    p + 1e-12 * build_block_map(p, valid, grid, cap=case.cap,
                                c_max=case.c_max).occ_cells[:1, None].astype(p.dtype)))

def bm_packed(p):
    bm = build_block_map(p, valid, grid, cap=case.cap, c_max=case.c_max)
    fbp = to_blocks_packed(bm, {**flat, "Position": p}, fills)
    return p + 1e-12 * fbp["Position"].reshape(-1, 2)[:p.shape[0]]
loop_time("block_map + to_blocks_packed", bm_packed)

def full(p):
    fb2, nbr_i, nbr_w, ovf = dbb._slot_fluid(case, {**flat, "Position": p}, valid)
    return p + 1e-12 * fb2["Position"].reshape(-1, 2)[:p.shape[0]]
loop_time("FULL _slot_fluid", full)
