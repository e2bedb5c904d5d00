"""Diffusion / reaction / electrophysiology tests."""

import pytest

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

pytestmark = pytest.mark.slow  # integration tier (full suite: pytest -m '')


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


# ---------------------------------------------------------------------------
# Neumann / Robin boundary conditions (diffusion_dynamics.hpp:233-337)
# ---------------------------------------------------------------------------

def _run_bc_case(mode, dx):
    import jax.numpy as jnp
    import numpy as np

    from sphinxsys_tpu.cases import diffusion_bcs_2d as dbc

    case = dbc.build_case(mode=mode, dx=dx)
    s = dbc.init_sim(case)
    run = dbc.make_run_chunk(case)
    series = [np.asarray(dbc.observe_phi(case, s))]
    for i in range(1, 11):
        s = run(s, jnp.asarray(i * 0.1))
        series.append(np.asarray(dbc.observe_phi(case, s)))
    return np.asarray(series)


def test_neumann_slab_matches_analytic_gradient():
    """Physics oracle for the Neumann contact term: uniform flux q at the
    bottom of a periodic slab with Dirichlet top -> steady linear profile
    Phi(y) = T_top + q/d (H - y).  The discrete surface-area measure
    (dW V e).(n_i - n_j) under-integrates the interface by O(h) (the
    boundary body is 2 layers thick and the nearest-face normals cancel
    the inner layer), so the gate is 10% at dx = 1/50."""
    import jax.numpy as jnp
    import numpy as np

    from sphinxsys_tpu.core import geometry as G
    from sphinxsys_tpu.core.adaptation import SPHAdaptation
    from sphinxsys_tpu.core.generators import generate_lattice
    from sphinxsys_tpu.neighbors import (build_cell_table,
                                         build_neighbor_list,
                                         grid_from_bounds)
    from sphinxsys_tpu.physics import diffusion as dfn
    from sphinxsys_tpu.physics import general as gd
    import jax

    dx = 1 / 50
    H, L, q = 1.0, 0.5, 50.0
    ad = SPHAdaptation(spacing=dx, dim=2)
    bw = 2 * dx
    dom = G.Box(G.Transform(translation=(L / 2, H / 2)), halfsize=(L / 2, H / 2))
    top = G.Box(G.Transform(translation=(L / 2, H + bw / 2)), halfsize=(L / 2, bw / 2))
    bot = G.Box(G.Transform(translation=(L / 2, -bw / 2)), halfsize=(L / 2, bw / 2))
    lo, hi = (0.0, -bw), (L, H + bw)
    pos_b, vol = generate_lattice(dom, lo, hi, dx)
    pos_t, _ = generate_lattice(top, lo, hi, dx)
    pos_n, _ = generate_lattice(bot, lo, hi, dx)

    def mk(pos):
        return {"Position": jnp.asarray(pos),
                "VolumetricMeasure": jnp.full((len(pos),), vol),
                "NReal": jnp.asarray(len(pos), jnp.int32)}

    body = mk(pos_b)
    body["Phi"] = jnp.full((len(pos_b),), 300.0)
    body = gd.normal_direction_from_shape(body, dom)
    wt = mk(pos_t)
    wt["Phi"] = jnp.full((len(pos_t),), 300.0)
    wn = mk(pos_n)
    wn["PhiFlux"] = jnp.full((len(pos_n),), q)
    wn = gd.normal_direction_from_shape(wn, bot)
    grid = grid_from_bounds(lo, hi, ad.cutoff, periodic=(True, False))
    box = grid.periodic_lengths
    tb = build_cell_table(body["Position"], body["NReal"], grid, cap=16)
    tt = build_cell_table(wt["Position"], wt["NReal"], grid, cap=16)
    tn = build_cell_table(wn["Position"], wn["NReal"], grid, cap=16)
    nli = build_neighbor_list(body["Position"], body["NReal"], body["Position"],
                              body["NReal"], tb, grid, ad.cutoff, k_max=48,
                              include_self=False)
    nld = build_neighbor_list(body["Position"], body["NReal"], wt["Position"],
                              wt["NReal"], tt, grid, ad.cutoff, k_max=32,
                              include_self=True)
    nln = build_neighbor_list(body["Position"], body["NReal"], wn["Position"],
                              wn["NReal"], tn, grid, ad.cutoff, k_max=32,
                              include_self=True)
    diff = dfn.IsotropicDiffusion(1.0)
    dt = dfn.diffusion_time_step(ad.h, diff, 2)

    @jax.jit
    def run(st, t_target):
        def body_fn(carry):
            st, t = carry
            st = dfn.diffusion_step_rk2(st, "Phi", nli, ad.kernel, 2, diff, dt,
                                        dirichlet_contacts=[(wt, nld)],
                                        neumann_contacts=[(wn, nln)], box=box)
            return (st, t + dt)

        return jax.lax.while_loop(lambda c: c[1] < t_target, body_fn, (st, 0.0))

    st, _ = run(body, 3.0)
    phi = np.asarray(st["Phi"])
    y = np.asarray(st["Position"])[:, 1]
    for yy in (0.25, 0.5, 0.75):
        m = np.abs(y - yy) < dx / 2
        exact = 300.0 + q * (1 - yy)
        assert abs(phi[m].mean() - exact) / (exact - 300.0) < 0.10, \
            f"y={yy}: {phi[m].mean()} vs {exact}"


def test_robin_bc_vs_reference_ensemble_db():
    """RobinBC case (diffusion_RobinBC.h) vs the reference's committed
    TemperatureObserver_Phi ensemble DB: within 1.5% of the ensemble mean
    at every snapshot/observer (the reference's own envelope is ~1 sd of
    its thread-scheduling scatter; a re-implementation at matched
    resolution lands within ~3 sd)."""
    import numpy as np

    from sphinxsys_tpu.io import regression as rg

    ours = _run_bc_case("robin", 1 / 100)
    e = rg.EnsembleAverageRegressionTest(
        "/root/reference/tests/2d_examples/test_2d_diffusion_RobinBC/"
        "regression_test_tool", "TemperatureObserver", "Phi")
    mean, _ = e.read_db()
    rel = np.abs(ours - mean) / np.maximum(np.abs(mean), 1.0)
    # early snapshots at the far observers feel the sub-snapshot time
    # alignment of the Dirichlet heat-up wave (max ~3% at t=0.1 decaying
    # monotonically); steady state matches to ~0.2%
    assert rel.max() < 0.035, f"max rel dev {rel.max():.4f}"
    assert rel[-3:].max() < 0.01, f"steady rel dev {rel[-3:].max():.4f}"


def test_neumann_bc_vs_reference_ensemble_db():
    """NeumannBC case (diffusion_NeumannBC.h) vs the reference ensemble DB.
    The pure-flux BC exposes the O(h) discrete-interface-area deficit
    (see test_neumann_slab_matches_analytic_gradient), which at dx = 1/100
    leaves a systematic ~4% gap at the flux observer — gate at 5% of the
    ensemble mean (shape and the other observers track within ~3%)."""
    import numpy as np

    from sphinxsys_tpu.io import regression as rg

    ours = _run_bc_case("neumann", 1 / 100)
    e = rg.EnsembleAverageRegressionTest(
        "/root/reference/tests/2d_examples/test_2d_diffusion_NeumannBC/"
        "regression_test_tool", "TemperatureObserver", "Phi")
    mean, _ = e.read_db()
    rel = np.abs(ours - mean) / np.maximum(np.abs(mean), 1.0)
    assert rel.max() < 0.05, f"max rel dev {rel.max():.4f}"


def test_directional_diffusion_inverse_metric_form():
    """The pair coefficient is 1/(e^T D^-1 e) (reference inverse-Cholesky
    transform, diffusion_reaction.h:190-194): d+b along the fiber, d
    across, and BELOW the naive quadratic form d + b (e.f)^2 at oblique
    angles (harmonic-type interpolation)."""
    import numpy as np
    from sphinxsys_tpu.physics.diffusion import (DirectionalDiffusion,
                                                 LocalDirectionalDiffusion)

    d, b = 1.0, 4.0
    dd = DirectionalDiffusion(d_coeff=d, bias_coeff=b,
                              bias_direction=(1.0, 0.0))
    e_along = jnp.asarray([[1.0, 0.0]])
    e_across = jnp.asarray([[0.0, 1.0]])
    e_45 = jnp.asarray([[2 ** -0.5, 2 ** -0.5]])
    assert abs(float(dd.inter_particle_coeff(e_along)[0]) - (d + b)) < 1e-6
    assert abs(float(dd.inter_particle_coeff(e_across)[0]) - d) < 1e-6
    c45 = float(dd.inter_particle_coeff(e_45)[0])
    quad = d + b * 0.5
    # oblique: inverse-metric < quadratic form
    assert c45 < quad
    Dm = np.array([[d + b, 0.0], [0.0, d]])
    e = np.array([2 ** -0.5, 2 ** -0.5])
    assert abs(c45 - 1.0 / (e @ np.linalg.inv(Dm) @ e)) < 1e-6

    # local variant with equal fibers must reduce to the global form
    ld = LocalDirectionalDiffusion(d_coeff=d, bias_coeff=b)
    f_i = jnp.asarray([[1.0, 0.0]])
    f_j = jnp.asarray([[[1.0, 0.0]]])
    c_loc = float(np.ravel(ld.inter_particle_coeff(e_45[None], f_i, f_j))[0])
    assert abs(c_loc - c45) < 1e-5
