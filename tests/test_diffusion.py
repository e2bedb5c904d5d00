"""Diffusion / reaction / electrophysiology tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.core import geometry as G
from sphinxsys_tpu.core.adaptation import SPHAdaptation
from sphinxsys_tpu.core.generators import generate_lattice
from sphinxsys_tpu.core.state import make_base_state
from sphinxsys_tpu.neighbors import grid_from_bounds, build_cell_table, build_neighbor_list
from sphinxsys_tpu.physics import diffusion as df


def periodic_block(dx=0.025, L=1.0):
    shape = G.Box(G.Transform(translation=(L / 2, L / 2)), halfsize=(L / 2, L / 2))
    pos, vol = generate_lattice(shape, (0, 0), (L, L), dx)
    adaptation = SPHAdaptation(spacing=dx, dim=2)
    state = dict(make_base_state(pos, vol, 1.0, dtype=jnp.float32))
    grid = grid_from_bounds((0, 0), (L, L), adaptation.cutoff, periodic=(True, True))
    table = build_cell_table(state["Position"], state["NReal"], grid, cap=32)
    nl = build_neighbor_list(state["Position"], state["NReal"], state["Position"],
                             state["NReal"], table, grid, adaptation.cutoff,
                             k_max=48, include_self=False)
    return state, nl, adaptation, grid


def test_diffusion_decays_fourier_mode():
    """C = sin(2 pi x): dC/dt = -d (2 pi)^2 C; after time T amplitude
    decays by exp(-4 pi^2 d T)."""
    state, nl, adaptation, grid = periodic_block()
    pos = np.asarray(state["Position"])
    state["C"] = jnp.asarray(np.sin(2 * np.pi * pos[:, 0]), jnp.float32)
    d = 0.05
    diff = df.IsotropicDiffusion(d_coeff=d)
    dt = df.diffusion_time_step(adaptation.h, diff, 2)
    box = grid.periodic_lengths

    @jax.jit
    def run(s, n_steps):
        def body(_, ss):
            return df.diffusion_step_rk2(ss, "C", nl, adaptation.kernel, 2,
                                         diff, dt, box=box)
        return jax.lax.fori_loop(0, n_steps, body, s)

    n_steps = 200
    out = run(state, n_steps)
    T = n_steps * dt
    expected = math.exp(-4 * math.pi**2 * d * T)
    amp0 = np.abs(np.sin(2 * np.pi * pos[:, 0])).max()
    # project onto the mode
    c = np.asarray(out["C"])
    proj = 2 * np.mean(c * np.sin(2 * np.pi * pos[:, 0]))
    # the discrete SPH Laplacian eigenvalue sits ~0.1-0.3%/step below the
    # continuum one at this resolution; allow the accumulated drift
    np.testing.assert_allclose(proj, expected, rtol=0.12)


def test_diffusion_conserves_total():
    state, nl, adaptation, grid = periodic_block(dx=0.05)
    rng = np.random.default_rng(0)
    state["C"] = jnp.asarray(rng.uniform(size=state["Position"].shape[0]), jnp.float32)
    total0 = float(jnp.sum(state["C"]))
    diff = df.IsotropicDiffusion(d_coeff=0.1)
    dt = df.diffusion_time_step(adaptation.h, diff, 2)
    s = state
    for _ in range(20):
        s = df.diffusion_step(s, "C", nl, adaptation.kernel, 2, diff, dt,
                              box=grid.periodic_lengths)
    total = float(jnp.sum(s["C"]))
    np.testing.assert_allclose(total, total0, rtol=1e-4)


def test_directional_diffusion_coefficient():
    d = df.DirectionalDiffusion(d_coeff=1.0, bias_coeff=3.0, bias_direction=(1.0, 0.0))
    e_par = jnp.asarray([1.0, 0.0])
    e_perp = jnp.asarray([0.0, 1.0])
    assert float(d.inter_particle_coeff(e_par)) == 4.0
    assert float(d.inter_particle_coeff(e_perp)) == 1.0


def test_aliev_panfilov_excitation():
    """A supra-threshold voltage must excite toward the plateau (V -> ~1+a)
    and the gate variable must rise; sub-threshold decays to 0."""
    model = df.AlievPanfilowModel()
    n = 2
    state = {
        "Voltage": jnp.asarray([0.5, 0.05]),  # supra / sub threshold
        "GateVariable": jnp.zeros((n,)),
    }
    dt = 0.01
    s = state
    for _ in range(500):
        s = df.reaction_step(s, model, dt)
    v = np.asarray(s["Voltage"])
    assert v[0] > 0.8      # excited upstroke
    assert abs(v[1]) < 0.05  # sub-threshold decays
    assert float(s["GateVariable"][0]) > 0.01


def test_electrophysiology_wave_propagates():
    """A stimulated stripe must propagate a depolarization wave through
    monodomain diffusion + AP reaction."""
    state, nl, adaptation, grid = periodic_block(dx=0.05)
    pos = np.asarray(state["Position"])
    v0 = np.where(pos[:, 0] < 0.15, 0.92, 0.0)
    state["Voltage"] = jnp.asarray(v0, jnp.float32)
    state["GateVariable"] = jnp.zeros_like(state["Voltage"])
    diff = df.IsotropicDiffusion(d_coeff=0.01)
    model = df.AlievPanfilowModel(k=8.0, a=0.15, b=0.15, mu_1=0.2, mu_2=0.3,
                                  epsilon=0.04)
    dt = 0.25 * df.diffusion_time_step(adaptation.h, diff, 2)

    s = state
    for _ in range(120):
        s = df.electrophysiology_step(s, nl, adaptation.kernel, 2, diff,
                                      model, dt, box=grid.periodic_lengths)
    v = np.asarray(s["Voltage"])
    mid = (pos[:, 0] > 0.3) & (pos[:, 0] < 0.5)
    assert v[mid].max() > 0.5  # wave reached the middle
    assert np.isfinite(v).all()
