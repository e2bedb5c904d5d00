"""Stage-level bisect of build_block_map at 320k-scale (S=768k slot rows)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

S = 768012
M = 320000
C_MAX = 64000
CAP = 12
NCELLS = 330000

rng = np.random.default_rng(0)
cid_np = np.full(S, NCELLS, np.int32)
vrows = rng.choice(S, size=M, replace=False)
cid_np[vrows] = rng.integers(0, NCELLS, size=M)
cid0 = jnp.asarray(cid_np)

N_IT = 30


def loop_time(name, body, arg):
    @jax.jit
    def run_loop(p):
        def it(_, c):
            return jax.lax.optimization_barrier(body(c))
        return jax.lax.fori_loop(0, N_IT, it, p)
    out = run_loop(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run_loop(arg)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter()-t0)*1e3/N_IT:8.3f} ms", flush=True)


def f_argsort(cid):
    return cid + jnp.sum(jnp.argsort(cid)) % 2


def f_scid(cid):
    order = jnp.argsort(cid)
    scid = cid[order[:M]]
    return cid + jnp.sum(scid) % 2


def f_cumsum(cid):
    order = jnp.argsort(cid)
    scid = cid[order[:M]]
    prev = jnp.concatenate([jnp.full((1,), -1, scid.dtype), scid[:-1]])
    is_first = (scid != prev) & (scid < NCELLS)
    csum = jnp.cumsum(is_first.astype(jnp.int32))
    return cid + jnp.sum(csum) % 2


def _common(cid):
    order = jnp.argsort(cid)
    scid = cid[order[:M]]
    prev = jnp.concatenate([jnp.full((1,), -1, scid.dtype), scid[:-1]])
    is_first = (scid != prev) & (scid < NCELLS)
    csum = jnp.cumsum(is_first.astype(jnp.int32))
    return order, scid, csum


def f_searchsorted(cid):
    order, scid, csum = _common(cid)
    r_idx = jnp.arange(C_MAX, dtype=jnp.int32)
    p_r = jnp.searchsorted(csum, r_idx + 1, side="left").astype(jnp.int32)
    return cid + jnp.sum(p_r) % 2


def f_searchsorted_sortm(cid):
    order, scid, csum = _common(cid)
    r_idx = jnp.arange(C_MAX, dtype=jnp.int32)
    p_r = jnp.searchsorted(csum, r_idx + 1, side="left",
                           method="sort").astype(jnp.int32)
    return cid + jnp.sum(p_r) % 2


def f_start_by_argsort(cid):
    order, scid, csum = _common(cid)
    is_first = jnp.concatenate([csum[:1] > 0, csum[1:] > csum[:-1]])
    idx_first = jnp.argsort(~is_first, stable=True).astype(jnp.int32)
    return cid + jnp.sum(idx_first[:C_MAX]) % 2


def f_slotparticle(cid):
    order, scid, csum = _common(cid)
    n_occ = csum[-1]
    r_idx = jnp.arange(C_MAX, dtype=jnp.int32)
    p_r = jnp.searchsorted(csum, r_idx + 1, side="left").astype(jnp.int32)
    found = r_idx < n_occ
    start = jnp.where(found, p_r, M).astype(jnp.int32)
    k_idx = jnp.arange(CAP, dtype=jnp.int32)
    occ_pos = start[:, None] + k_idx[None, :]
    sp = order[:M][jnp.minimum(occ_pos, M - 1)]
    return cid + jnp.sum(sp) % 2


def f_densemap(cid):
    occ = jnp.sort(cid[:C_MAX])
    dm = jnp.full((NCELLS + 1,), C_MAX, dtype=jnp.int32)
    dm = dm.at[jnp.minimum(occ, NCELLS)].set(
        jnp.arange(C_MAX, dtype=jnp.int32), mode="drop")
    return cid + jnp.sum(dm) % 2


def f_windows(cid):
    occ = jnp.sort(cid[:C_MAX])
    dm = jnp.full((NCELLS + 1,), C_MAX, dtype=jnp.int32)
    dm = dm.at[jnp.minimum(occ, NCELLS)].set(
        jnp.arange(C_MAX, dtype=jnp.int32), mode="drop")
    gx, gy = 825, 400
    cx = occ // gy
    cy = occ % gy
    outs = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            nx, ny = cx + ox, cy + oy
            inb = (nx >= 0) & (nx < gx) & (ny >= 0) & (ny < gy)
            tgt = jnp.where(inb, nx * gy + ny, NCELLS)
            outs.append(dm[tgt])
    return cid + jnp.sum(jnp.stack(outs, 1)) % 2


loop_time("argsort S=768k", f_argsort, cid0)
loop_time("+ scid gather M", f_scid, cid0)
loop_time("+ cumsum M", f_cumsum, cid0)
loop_time("+ searchsorted 64k queries (default)", f_searchsorted, cid0)
loop_time("+ searchsorted (method=sort)", f_searchsorted_sortm, cid0)
loop_time("+ start via stable argsort of ~is_first", f_start_by_argsort, cid0)
loop_time("+ slot_particle occ_pos gather", f_slotparticle, cid0)
loop_time("dense_map scatter alone", f_densemap, cid0)
loop_time("dense_map + 9-window lookups", f_windows, cid0)
