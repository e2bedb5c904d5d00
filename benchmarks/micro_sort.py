"""What does the re-slot actually cost? argsort sizes + component timings."""
import os, time
import jax, jax.numpy as jnp
import numpy as np
from sphinxsys_tpu.cases import dambreak_2d_block as dbb
from sphinxsys_tpu.neighbors.cell_blocks import build_block_map, to_blocks, cross_neighbor_blocks

DX = float(os.environ.get("MB_DX", "0.005"))
K = 10

def timed(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)*1e3/K:9.3f} ms/iter")

def main():
    case, fluid = dbb.build_case(dx=DX)
    sim = dbb.init_sim(case, fluid)
    fb = sim.fluid_b
    flat = {k: fb[k].reshape((-1,) + fb[k].shape[2:])
            for k in dbb._FLUID_FIELDS + ["OriginalID"]}
    valid = fb["SlotMask"].reshape(-1)
    n_slots = valid.shape[0]
    print(f"slots={n_slots} valid={int(valid.sum())} c_max={case.c_max}")

    keys = jnp.where(valid, case.grid.cell_id(flat["Position"]), case.grid.ncells)

    @jax.jit
    def sort_loop(k0):
        def body(i, acc):
            order = jnp.argsort(k0 + i)
            return acc + order[0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
    timed(f"argsort {n_slots} int32", sort_loop, keys.astype(jnp.int32))

    n_c = 90112  # ~80k particles compacted, rounded
    keys_c = keys[:n_c]
    timed(f"argsort {n_c} int32", sort_loop, keys_c.astype(jnp.int32))

    @jax.jit
    def compact_loop(p):
        def body(i, acc):
            rank = jnp.cumsum(valid) - 1
            tgt = jnp.where(valid, rank, n_c)
            outs = []
            for kk in dbb._FLUID_FIELDS + ["OriginalID"]:
                v = flat[kk]
                buf = jnp.zeros((n_c + 1,) + v.shape[1:], v.dtype)
                outs.append(buf.at[tgt].set(v, mode="drop")[:n_c])
            return acc + outs[0][0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), p.dtype))
    timed("compact 323k->90k (11 fields)", compact_loop, flat["Position"])

    # full _slot_fluid as the step uses it (all inputs varying)
    @jax.jit
    def slot_loop(flatv):
        def body(i, acc):
            f2 = dict(flatv)
            f2["Position"] = f2["Position"] + 0.0 * acc
            fb2, nbr_i, nbr_w, ovf = dbb._slot_fluid(case, f2, valid)
            return acc + fb2["Position"][0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    timed("full _slot_fluid (varying inputs)", slot_loop, flat)

    # pieces of build_block_map
    @jax.jit
    def bbm_loop(p):
        def body(i, acc):
            bm = build_block_map(p + 0.0 * acc, valid, case.grid,
                                 cap=case.cap, c_max=case.c_max)
            return acc + bm.occ_cells[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    timed("build_block_map alone", bbm_loop, flat["Position"])

    bm = build_block_map(flat["Position"], valid, case.grid, cap=case.cap,
                         c_max=case.c_max)
    @jax.jit
    def tb_loop(p):
        def body(i, acc):
            outs = [to_blocks(bm, flat[k] + 0 * (acc if flat[k].dtype == jnp.float32 and flat[k].ndim == 1 else 0))
                    if flat[k].dtype == jnp.float32 else to_blocks(bm, flat[k])
                    for k in dbb._FLUID_FIELDS]
            return acc + outs[0][0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))
    timed("to_blocks x11", tb_loop, flat["Position"])

    @jax.jit
    def cross_loop(p):
        def body(i, acc):
            nbr_w = cross_neighbor_blocks(bm.occ_cells + 0 * jnp.int32(acc),
                                          case.grid, case.bm_wall)
            return acc + nbr_w[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.int32))
    timed("cross_neighbor_blocks (wall windows)", cross_loop, flat["Position"])

if __name__ == "__main__":
    main()
