"""Anisotropic-lattice oscillating beam (cases/anisotropic_beam_2d.py,
test_2d_anisotropic_beam).

The case's claim is consistency: a 4x-coarser axial resolution with the
AnisotropicKernel must reproduce the ISOTROPIC oscillating beam's
dynamics.  Measured at dp_y = PH/10: aniso amplitude 0.1144 / first
minimum t = 0.21 vs isotropic 0.1142 / 0.21 — gated at 4%.  (The
isotropic case carries its own validation against beam theory in
tests/test_solid.py; the reference's committed DB shows the same
first-mode oscillation at amplitude 0.099 at ITS resolution.)
"""

import pytest

import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import anisotropic_beam_2d as ab
from sphinxsys_tpu.cases import oscillating_beam_2d as ob

pytestmark = pytest.mark.slow  # integration tier (full suite: pytest -m '')


def _tip_trajectory(case, s, run, tipfn, t_end):
    ts = np.arange(0.01, t_end + 1e-9, 0.01)
    ys = []
    for t in ts:
        s = run(s, jnp.asarray(t, s.time.dtype))
        ys.append(tipfn(case, s))
    return ts, np.asarray(ys)


def test_anisotropic_beam_matches_isotropic_dynamics():
    case_a, s_a = ab.build_case()
    # 4x fewer particles than the isotropic lattice over the same span
    assert case_a.n_solid == 280
    run_a = ab.make_run_chunk(case_a)
    ts, ya = _tip_trajectory(case_a, s_a, run_a, ab.tip_displacement, 0.30)

    case_i, s_i = ob.build_case()
    run_i = ob.make_run_chunk(case_i)
    _, yi = _tip_trajectory(case_i, s_i, run_i, ob.tip_displacement, 0.30)

    # amplitude of the first swing pair
    np.testing.assert_allclose(ya.max(), yi.max(), rtol=0.04)
    np.testing.assert_allclose(ya.min(), yi.min(), rtol=0.04)
    # phase: the first minimum lands on the same sample (first-mode period)
    t_min_a = ts[np.argmin(ya)]
    t_min_i = ts[np.argmin(yi)]
    assert abs(t_min_a - t_min_i) <= 0.02
    # and the whole first period tracks pointwise
    assert np.max(np.abs(ya - yi)) < 0.15 * yi.max()
