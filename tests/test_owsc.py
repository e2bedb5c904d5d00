"""OWSC pin-jointed flap (cases/owsc_2d.py = test_2d_owsc): articulated
rigid coupling (PinJoint2D) + PTO spring/damper under a dam-break surge."""

import jax
import jax.numpy as jnp
import numpy as np


def test_pin_joint_dynamics_units():
    """pin_joint_step: free undamped pendulum-spring about the pivot
    oscillates at omega_n = sqrt(k/I); the damper extracts energy."""
    from sphinxsys_tpu.physics import rigid as rg

    pj = rg.PinJoint2D(pivot=jnp.zeros(2), theta=jnp.asarray(0.2),
                       omega=jnp.asarray(0.0), mass=jnp.asarray(1.0),
                       inertia=jnp.asarray(0.5), com0=jnp.zeros(2))
    k = 8.0
    dt = 1e-3
    th = []
    for _ in range(5000):
        pj = rg.pin_joint_step(pj, jnp.asarray(0.0), dt, stiffness=k)
        th.append(float(pj.theta))
    th = np.asarray(th)
    # period T = 2 pi sqrt(I/k) = 2 pi / 4
    zc = np.nonzero((th[:-1] > 0) & (th[1:] <= 0))[0] * dt
    period = np.diff(zc).mean()   # same-direction crossings = full period
    assert abs(period - 2 * np.pi / 4.0) < 0.02
    assert abs(th).max() < 0.21          # energy conserved undamped


def test_owsc_flap_pitches_and_captures_energy():
    """Dam-break surge hits the flap: pitch grows past 20 degrees, the
    spring+damper PTO swings it back through vertical (sign reversal) and
    the absorbed energy integral saturates."""
    from sphinxsys_tpu.cases import owsc_2d as ow

    case, fluid = ow.build_case()
    s = ow.init_sim(case, fluid)
    run = ow.make_run_chunk(case)
    thetas, energies = [], []
    for i in range(1, 19):
        s = run(s, jnp.asarray(i * 0.2, s.time.dtype))
        thetas.append(ow.flap_angle_deg(s))
        energies.append(float(s.pto_energy))
    assert not bool(s.overflow)
    thetas = np.asarray(thetas)
    assert np.isfinite(thetas).all()
    assert 20.0 < np.abs(thetas).max() < 85.0     # strong but bounded pitch
    # damped oscillation: the flap swings back through vertical
    assert (thetas < -5).any() and (thetas > 0.5).any()
    # PTO captured energy, saturating after the main event
    assert energies[-1] > 1.0
    # saturated once the flap settles (last 0.4 s adds < 10%)
    assert energies[-1] - energies[-3] < 0.1 * energies[-1]
    assert np.isfinite(np.asarray(s.fluid["Pressure"])).all()
