"""Generate this framework's own golden regression databases.

The reference commits converged observation curves as XML under each case's
regression_test_tool/ and asserts DTW distance on every CI run (SURVEY.md
§4 tier 2).  This script produces the same artifacts for our cases from the
current (validated) code so future rounds are drift-proof:

    tests/golden/<case>/<Body>_<Quantity>_Run_0_result.xml
    tests/golden/<case>/<Body>_<Quantity>_dtwdistance.xml

Thresholds are set from observed fp32 run-to-run spread (resorting order,
compilation differences) with a safety factor.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.io.regression import write_result_xml

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def write_db(case_name, body, quantity, series, threshold):
    d = os.path.join(GOLDEN, case_name)
    os.makedirs(d, exist_ok=True)
    write_result_xml(os.path.join(d, f"{body}_{quantity}_Run_0_result.xml"),
                     np.atleast_2d(series))
    with open(os.path.join(d, f"{body}_{quantity}_dtwdistance.xml"), "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8" ?>\n<dtw_distance>\n'
                f'    <DTWDistance {quantity}_0="{threshold}" />\n'
                "</dtw_distance>\n")


def dambreak():
    from sphinxsys_tpu.cases import dambreak_2d as db
    from sphinxsys_tpu.physics import general as gd

    case, fluid = db.build_case(dx=0.05)
    s = db.init_sim(case, fluid)
    run = db.make_run_chunk(case)
    energies = [float(gd.total_mechanical_energy(s.fluid, case.gravity))]
    for i in range(1, 26):
        s = run(s, jnp.asarray(i * 0.1, s.time.dtype))
        energies.append(float(gd.total_mechanical_energy(s.fluid, case.gravity)))
    write_db("dambreak_2d", "WaterBody", "TotalMechanicalEnergy",
             energies, 0.05)
    print("dambreak_2d:", ["%.4f" % e for e in energies[:6]], "...")


def beam():
    from sphinxsys_tpu.cases import oscillating_beam_2d as ob

    case, s = ob.build_case()
    run = ob.make_run_chunk(case)
    tips = [0.0]
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 0.05, s.time.dtype))
        tips.append(ob.tip_displacement(case, s))
    write_db("oscillating_beam_2d", "BeamObserver", "TipDisplacementY",
             tips, 0.03)
    print("beam tips:", ["%.4f" % t for t in tips[:6]], "...")


def taylor_green():
    from sphinxsys_tpu.cases import taylor_green_2d as tg
    from sphinxsys_tpu.physics import general as gd

    case, fluid = tg.build_case(dx=0.02)
    s = tg.init_sim(case, fluid)
    run = tg.make_run_chunk(case)
    kes = [float(gd.total_kinetic_energy(s.fluid))]
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 0.1, s.time.dtype))
        kes.append(float(gd.total_kinetic_energy(s.fluid)))
    write_db("taylor_green_2d", "WaterBody", "TotalKineticEnergy", kes, 0.02)
    print("TG KE:", ["%.4f" % k for k in kes[:6]], "...")


if __name__ == "__main__":
    dambreak()
    beam()
    taylor_green()
