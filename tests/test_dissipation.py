"""Implicit pairwise damping tests."""

import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.core import geometry as G
from sphinxsys_tpu.core.adaptation import SPHAdaptation
from sphinxsys_tpu.core.generators import generate_lattice
from sphinxsys_tpu.core.state import make_fluid_state
from sphinxsys_tpu.neighbors import grid_from_bounds, build_cell_table, build_neighbor_list
from sphinxsys_tpu.physics import dissipation as dp


def setup(dx=0.05):
    shape = G.Box(G.Transform(translation=(0.5, 0.5)), halfsize=(0.5, 0.5))
    pos, vol = generate_lattice(shape, (0, 0), (1, 1), dx)
    adaptation = SPHAdaptation(spacing=dx, dim=2)
    state = dict(make_fluid_state(pos, vol, 1.0, dtype=jnp.float32))
    grid = grid_from_bounds((0, 0), (1, 1), adaptation.cutoff)
    table = build_cell_table(state["Position"], state["NReal"], grid, cap=32)
    nl = build_neighbor_list(state["Position"], state["NReal"], state["Position"],
                             state["NReal"], table, grid, adaptation.cutoff,
                             k_max=48, include_self=False)
    return state, nl, adaptation


def test_damping_conserves_momentum_and_reduces_energy():
    state, nl, adaptation = setup()
    rng = np.random.default_rng(0)
    n = state["Position"].shape[0]
    state["Velocity"] = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    m = np.asarray(state["Mass"])
    p0 = (m[:, None] * np.asarray(state["Velocity"])).sum(0)
    ke0 = float((0.5 * m * (np.asarray(state["Velocity"]) ** 2).sum(-1)).sum())

    out = dp.damping_pairwise(state, "Velocity", nl, adaptation.kernel, 2,
                              eta=0.1, dt=0.05)
    v = np.asarray(out["Velocity"])
    p1 = (m[:, None] * v).sum(0)
    ke1 = float((0.5 * m * (v**2).sum(-1)).sum())
    np.testing.assert_allclose(p1, p0, atol=1e-4 * np.abs(p0).max() + 1e-5)
    assert ke1 < 0.9 * ke0  # damping removes energy


def test_damping_unconditionally_stable_large_dt():
    """Huge dt must not blow up (the implicit denominator saturates)."""
    state, nl, adaptation = setup()
    rng = np.random.default_rng(1)
    n = state["Position"].shape[0]
    v0 = rng.normal(size=(n, 2))
    state["Velocity"] = jnp.asarray(v0, jnp.float32)
    out = dp.damping_pairwise(state, "Velocity", nl, adaptation.kernel, 2,
                              eta=100.0, dt=10.0)
    v = np.asarray(out["Velocity"])
    assert np.isfinite(v).all()
    assert np.abs(v).max() <= np.abs(v0).max() * 1.5


def test_uniform_field_unchanged():
    state, nl, adaptation = setup()
    n = state["Position"].shape[0]
    state["Velocity"] = jnp.ones((n, 2), jnp.float32)
    out = dp.damping_pairwise(state, "Velocity", nl, adaptation.kernel, 2,
                              eta=1.0, dt=0.1)
    np.testing.assert_allclose(np.asarray(out["Velocity"]), 1.0, atol=1e-6)


def test_cg_damping_matches_jacobi_in_shallow_regime():
    """damping_implicit_cg == damping_pairwise when nu dt / h^2 << 1
    (both converge to the same backward-Euler fixed point; the Jacobi
    splitting is only deficient in the deep-implicit regime)."""
    import jax
    import numpy as np
    from sphinxsys_tpu.core.adaptation import SPHAdaptation
    from sphinxsys_tpu.core.state import make_fluid_state
    from sphinxsys_tpu.neighbors import (build_cell_table,
                                         build_neighbor_list,
                                         grid_from_bounds)
    from sphinxsys_tpu.physics import dissipation as dp

    dx = 0.1
    ad = SPHAdaptation(spacing=dx, dim=2)
    xs = np.arange(dx / 2, 2.0, dx)
    pos = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
    st = dict(make_fluid_state(pos, dx * dx, 1.0, dtype=jnp.float64))
    rng = np.random.default_rng(0)
    st["Velocity"] = jnp.asarray(rng.normal(size=pos.shape))
    grid = grid_from_bounds((-4 * dx, -4 * dx), (2.4, 2.4), ad.cutoff)
    table = build_cell_table(st["Position"], st["NReal"], grid, cap=24)
    nl = build_neighbor_list(st["Position"], st["NReal"], st["Position"],
                             st["NReal"], table, grid, ad.cutoff, k_max=32,
                             include_self=False)
    eta, dt = 1.0e-3, 1.0e-3      # shallow: eta dt / (rho h^2) ~ 6e-5
    a = dp.damping_pairwise(dict(st), "Velocity", nl, ad.kernel, 2, eta, dt)
    b = dp.damping_implicit_cg(dict(st), "Velocity", nl, ad.kernel, 2, eta,
                               dt, tol=1e-10)
    # the Jacobi pair weight carries eta/2 per single-visit sweep x 2
    # sweeps; the CG operator uses the 2x Laplacian weight directly —
    # in the shallow limit both reduce to explicit Euler of the same
    # operator
    va, vb = np.asarray(a["Velocity"]), np.asarray(b["Velocity"])
    dv0 = np.abs(np.asarray(st["Velocity"])).max()
    assert np.abs(va - vb).max() < 5e-4 * dv0

    # deep regime: CG removes MORE kinetic energy than the saturated
    # Jacobi splitting
    eta_deep = 50.0
    a2 = dp.damping_pairwise(dict(st), "Velocity", nl, ad.kernel, 2,
                             eta_deep, dt)
    b2 = dp.damping_implicit_cg(dict(st), "Velocity", nl, ad.kernel, 2,
                                eta_deep, dt)
    ke = lambda s_: float((np.asarray(s_["Velocity"]) ** 2).sum())
    assert ke(b2) < ke(a2) < ke(st)
