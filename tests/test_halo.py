"""Distributed (shard_map + ppermute halo exchange) dambreak tests on the
8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphinxsys_tpu.cases import dambreak_2d as db
from sphinxsys_tpu.parallel import halo
from sphinxsys_tpu.parallel.mesh import make_particle_mesh
from sphinxsys_tpu.physics import general as gd


@pytest.fixture(scope="module")
def halo_run():
    assert len(jax.devices()) >= 8
    case, fluid = db.build_case(dx=0.12, cell_cap=16, k_inner=48, k_wall=32)
    mesh = make_particle_mesh(8)
    sim = halo.distribute_dambreak(case, fluid, mesh)
    step = halo.make_halo_dambreak_step(case, mesh, halo_cap=96, migrate_cap=48)
    n0 = int(jnp.sum(sim.fluid["Alive"]))
    for _ in range(12):
        sim = step(sim)
    return case, fluid, sim, n0


def test_halo_conserves_particles(halo_run):
    case, fluid, sim, n0 = halo_run
    assert int(jnp.sum(sim.fluid["Alive"])) == n0
    assert not bool(sim.overflow)


def test_halo_physics_matches_single_device(halo_run):
    """Energy trajectory within a fraction of a percent of the single-chip
    engine at matched physical time."""
    case, fluid, sim, n0 = halo_run
    m = sim.fluid["Alive"]
    ke = jnp.sum(jnp.where(m, 0.5 * sim.fluid["Mass"] *
                           jnp.sum(sim.fluid["Velocity"] ** 2, -1), 0.0))
    pe = jnp.sum(jnp.where(m, sim.fluid["Mass"] *
                           case.gravity.potential(sim.fluid["Position"]), 0.0))
    e_halo = float(ke + pe)

    s1 = db.init_sim(case, fluid)
    run1 = db.make_run_chunk(case)
    # integrate the single-device engine to at least the halo time, then
    # linearly accept the small overshoot
    s1 = run1(s1, sim.time)
    e1 = float(gd.total_mechanical_energy(s1.fluid, case.gravity))
    # the single-device run overshoots the target time by up to one
    # advection step; at this coarse resolution energy decays ~0.5% per
    # step near impact, so allow that window
    assert abs(e_halo - e1) / abs(e1) < 0.025


def test_halo_no_particle_escapes_domain(halo_run):
    case, fluid, sim, n0 = halo_run
    pos = np.asarray(sim.fluid["Position"])
    alive = np.asarray(sim.fluid["Alive"])
    bw = 4 * case.dx
    assert pos[alive, 0].min() > -bw - 1e-6
    assert pos[alive, 0].max() < db.DL + bw
    assert pos[alive, 1].min() > -bw - 1e-6
