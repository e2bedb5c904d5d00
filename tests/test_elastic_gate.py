"""Elastic gate (test_2d_elastic_gate): dambreak FSI against a clamped
rubber gate, validated against the reference's committed Observer_Position
database on the gate-tip DISPLACEMENT extremes.

The reference DB's own pairwise DTW spread is 0.03-0.06 over a tip
trajectory spanning 45 units — its runs are near-bit-identical, so an
absolute DTW gate cannot absorb cross-implementation lattice/observer
offsets (our tip particle alone sits 0.07 from theirs at t=0).  The
physically meaningful parity is the deflection history's extremes: the
maximum opening deflection and the maximum rise, which depend on the
whole coupled dynamics (fluid pressure work vs elastic energy).
Measured: max x-deflection -45.31 vs reference -45.83 (1.1%), max y-rise
18.91 vs 19.59 (3.4%), full run to t=400 (~4 min CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.slow  # integration tier (full suite: pytest -m '')


def test_elastic_gate_deflection_matches_reference_db():
    from sphinxsys_tpu.cases import elastic_gate_2d as eg
    from sphinxsys_tpu.io import regression as rg

    case, fluid, gate = eg.build_case()
    s = eg.init_sim(case, fluid, gate)
    run = eg.make_run_chunk(case)
    pts = [np.asarray(eg.tip_position(case, s))]
    for i in range(1, 101):
        s = run(s, jnp.asarray(i * 4.0, s.time.dtype))
        pts.append(np.asarray(eg.tip_position(case, s)))
    assert not bool(s.overflow)
    ours = np.asarray(pts)
    assert np.isfinite(ours).all()
    od = ours - ours[0]

    test = rg.DTWRegressionTest(
        "/root/reference/tests/2d_examples/test_2d_elastic_gate/"
        "regression_test_tool", "Observer", "Position")
    assert test.run_files
    for f in test.run_files:
        ref = rg.read_result_xml(f)[0]
        rd = ref - ref[0]
        assert abs(od[:, 0].min() - rd[:, 0].min()) < 0.06 * abs(
            rd[:, 0].min())
        assert abs(od[:, 1].max() - rd[:, 1].max()) < 0.06 * rd[:, 1].max()
    # the gate relaxes back as the column discharges
    assert abs(od[-1, 0]) < 0.95 * abs(od[:, 0].min())
