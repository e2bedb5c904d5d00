"""Poiseuille startup flow (cases/poiseuille_flow_2d.py) vs the analytic
Fourier transient and the reference DB's steady plateau
(/root/reference/tests/2d_examples/test_2d_poiseuille_flow)."""

import pytest

import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import poiseuille_flow_2d as pf

pytestmark = pytest.mark.slow  # integration tier (full suite: pytest -m '')


def test_startup_profile_matches_analytic_transient():
    case, fluid = pf.build_case()
    s = pf.init_sim(case, fluid)
    run = pf.make_run_chunk(case)
    s = run(s, jnp.asarray(2.0, s.time.dtype))
    assert not bool(s.overflow)
    ys, prof = pf.mean_profile(case, s)
    exact = pf.analytic_profile(ys, float(s.time))
    err = np.abs(prof - exact).max() / exact.max()
    assert err < 0.05, err

    s = run(s, jnp.asarray(4.0, s.time.dtype))
    assert not bool(s.overflow)
    ys, prof = pf.mean_profile(case, s)
    exact = pf.analytic_profile(ys, float(s.time))
    err = np.abs(prof - exact).max() / exact.max()
    assert err < 0.05, err
    # centerline heading for 1.5 U_f
    assert prof.max() > 1.3
    # by t=4 the transient has decayed to ~2% and the discrete plateau is
    # reached; compare against the REFERENCE's own recorded plateau 3.6625
    # (its DB tail) — the discrete dummy-wall channel runs ~2% hotter than
    # the continuum analytic 3.6, in both implementations
    ke = pf.kinetic_energy(s)
    np.testing.assert_allclose(ke, 3.6625, rtol=0.01)
