"""Stress-form multiphase surface tension (physics/surface_tension.py) vs
/root/reference/src/shared/particle_dynamics/fluid_dynamics/surface_tension.cpp
and the square-droplet case (test_2d_square_droplet)."""

import jax
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.physics import surface_tension as st
from sphinxsys_tpu.cases import square_droplet_2d as sq


def test_flat_interface_stress_is_tangential():
    """For two half-space phases the color gradient must point along the
    interface normal and the surface-tension stress must be TANGENTIAL:
    S n = 0 and trace(S) = sigma |grad C| (2D: one tangential direction)."""
    case, water, air = sq.build_case(dx=0.08)
    s = sq.init_sim(case, water, air)
    w = st.surface_tension_stress(s.water, [(s.air, s.nl_wa, sq.FRAC_W)],
                                  case.kernel, 2, sq.SIGMA)
    pos = np.asarray(w["Position"])
    cg = np.asarray(w["ColorGradient"])
    S = np.asarray(w["SurfaceTensionStress"])
    nd = np.asarray(w["NormDirection"])
    n_real = int(w["NReal"])

    # droplet-boundary particles: top edge of the square, away from corners
    sel = (np.arange(len(pos)) < n_real) & (np.abs(pos[:, 0]) < 0.3) \
        & (pos[:, 1] > 0.5 - 0.1)
    sel &= np.linalg.norm(cg, axis=-1) > 0.5 * np.abs(cg[sel][:, 1]).max() \
        if sel.any() else sel
    assert sel.sum() >= 3
    # color gradient points from the interface INTO the water phase (-y for
    # the top edge: cg = -2 f sum dW V e_ij with e_ij from air toward water)
    assert (cg[sel][:, 1] < 0).all()
    assert (np.abs(cg[sel][:, 0]) < 0.2 * np.abs(cg[sel][:, 1])).all()
    # stress annihilates the normal: S @ n ~ 0
    Sn = np.einsum("nij,nj->ni", S[sel], nd[sel])
    scale = np.abs(S[sel]).max()
    assert np.abs(Sn).max() < 1e-5 * scale
    # trace = sigma |cg| (2D: I - n n^T has one unit eigenvalue)
    tr = S[sel][:, 0, 0] + S[sel][:, 1, 1]
    np.testing.assert_allclose(tr, sq.SIGMA * np.linalg.norm(cg[sel], axis=-1),
                               rtol=1e-5)


def test_surface_tension_time_step_capillary_floor():
    """SurfaceTensionTimeStep: dt = CFL h / max(c + |v|, sqrt(2 pi sigma /
    (rho0 h))) (fluid_time_step.cpp:38-42)."""
    case, water, air = sq.build_case(dx=0.08)
    h = case.adaptation.h
    dt = float(st.surface_tension_time_step(water, case.eos_w, h, sq.RHO0_F,
                                            sq.SIGMA))
    cap = np.sqrt(2 * np.pi * sq.SIGMA / (sq.RHO0_F * h))
    expect = 0.6 * h / max(sq.C_F, cap)   # at rest: c = c0, v = 0
    np.testing.assert_allclose(dt, expect, rtol=1e-5)


def test_square_droplet_rounds_and_satisfies_laplace():
    """The corner radius shrinks from the square's ~0.62 (coarse lattice
    corner) toward the equal-area circle 0.564, the droplet stays
    centered (momentum-conservative formulation), and by t = 1 the
    pressure jump obeys the Laplace law dp = sigma / R (measured 54% of
    sigma/R at dx = 0.08 — CSS-type interface smearing over ~2h plus
    sustained parasitic currents; gate 50%).  Note: an earlier build
    measured 87%, but that value was inflated by the cross-phase Riemann
    orientation bug (the air side read water-scale interface pressures);
    with the reference's (self, other) solver orientation the full-curve
    refdb DTW dropped 6.08 -> 2.50, and THAT test is the authoritative
    parity signal — this one only pins the jump's order/sign."""
    case, water, air = sq.build_case(dx=0.08)
    s = sq.init_sim(case, water, air)
    r0 = sq.water_max_radius(s)
    assert r0 > 0.60                     # corner particle
    run = sq.make_run_chunk(case)
    s = run(s, jnp.asarray(0.2, s.time.dtype))
    assert not bool(s.overflow)
    ke = sq.water_kinetic_energy(s)
    assert 0.0 < ke < 5.0
    assert sq.water_max_radius(s) < r0 - 0.02   # corners pulled in
    w = s.water
    valid = np.arange(w["Position"].shape[0]) < int(w["NReal"])
    com = np.asarray(w["Position"])[valid].mean(axis=0)
    assert np.linalg.norm(com) < 0.05

    s = run(s, jnp.asarray(1.0, s.time.dtype))
    assert not bool(s.overflow)
    w, a = s.water, s.air
    rw = np.linalg.norm(np.asarray(w["Position"]), axis=1)
    ra = np.linalg.norm(np.asarray(a["Position"]), axis=1)
    vw = np.arange(len(rw)) < int(w["NReal"])
    va = np.arange(len(ra)) < int(a["NReal"])
    p_in = float(np.median(np.asarray(w["Pressure"])[vw & (rw < 0.3)]))
    p_out = float(np.median(np.asarray(a["Pressure"])[va & (ra > 0.75)
                                                      & (ra < 0.95)]))
    R = float(np.sqrt(np.asarray(w["VolumetricMeasure"])[vw].sum() / np.pi))
    np.testing.assert_allclose(p_in - p_out, sq.SIGMA / R, rtol=0.50)
