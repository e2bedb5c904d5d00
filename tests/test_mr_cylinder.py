"""MR free-stream cylinder (test_2d_free_stream_around_cylinder_mr):
composed adaptive-h fluid + open boundaries + fine-grid cylinder contact."""

import jax
import jax.numpy as jnp
import numpy as np


def test_mr_cylinder_startup_physics():
    """Through the ramp (t = 3): no capacity overflow, the flow core near
    the cylinder stays at O(U) (the MR interface injects no spurious
    velocity there), drag is downstream-positive and lift ~ 0, and the
    refinement strip keeps its per-particle smoothing lengths through the
    emitter/disposer recycling."""
    from sphinxsys_tpu.cases import mr_cylinder_2d as mc

    case, fluid = mc.build_case()
    s = mc.init_sim(case, fluid)
    assert not bool(s.overflow)
    run = mc.make_run_chunk(case)
    s = run(s, jnp.asarray(3.0, s.time.dtype))
    assert not bool(s.overflow)

    al = np.asarray(s.fluid["Alive"])
    pos = np.asarray(s.fluid["Position"])[al]
    v = np.asarray(s.fluid["Velocity"])[al]
    hr = np.asarray(s.fluid["SmoothingLengthRatio"])[al]
    assert not np.isnan(v).any()

    # flow core: near the cylinder the speed stays O(U) — interface noise
    # or contact errors would spike it (measured 1.08 at t=3)
    sp = np.linalg.norm(v, axis=1)
    near_cyl = np.hypot(pos[:, 0] - mc.CX, pos[:, 1] - mc.CY) < 2.0
    assert sp[near_cyl].max() < 1.6

    # viscous drag downstream-positive, lift two orders smaller
    fv, fp = mc.cylinder_forces(case, s)
    assert float(fv[0]) > 0.05
    assert abs(float(fv[1])) < 0.2 * float(fv[0])

    # strip integrity under recycling: fine particles deep in the strip
    # keep hr = 2, coarse ones hr = 1
    deep = (pos[:, 1] > 6.0) & (pos[:, 1] < 10.0)
    assert np.all(np.abs(hr[deep] - 2.0) < 1e-6)
    outside = (pos[:, 1] < 4.0) | (pos[:, 1] > 12.0)
    assert np.all(np.abs(hr[outside] - 1.0) < 1e-6)
