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




def dambreak_wall_pressure_probe():
    """Local observer probe (the reference's dambreak pressure probe on the
    right wall at (DL, 0.2), Dambreak.cpp FluidObserver) — a sharper
    regression discriminator than global reduces (VERDICT r1 weak #10)."""
    from functools import partial

    from sphinxsys_tpu.cases import dambreak_2d as db
    from sphinxsys_tpu.io.observation import observe_quantity
    from sphinxsys_tpu.neighbors import build_cell_table, build_neighbor_list

    case, fluid = db.build_case(dx=0.05)
    s = db.init_sim(case, fluid)
    run = db.make_run_chunk(case)
    obs = jnp.asarray([[db.DL - 0.5 * case.dx, 0.2]], jnp.float32)

    @jax.jit
    def probe(f):
        table = build_cell_table(f["Position"], f["NReal"], case.grid,
                                 cap=case.cell_cap)
        nl = build_neighbor_list(obs, jnp.asarray(1, jnp.int32), f["Position"],
                                 f["NReal"], table, case.grid,
                                 case.adaptation.cutoff, k_max=64,
                                 include_self=True)
        return observe_quantity(obs, f, "Pressure", nl, case.kernel, 2)[0]

    ps = [float(probe(s.fluid))]
    for i in range(1, 31):
        s = run(s, jnp.asarray(i * 0.12, s.time.dtype))
        ps.append(float(probe(s.fluid)))
    write_db("dambreak_2d", "FluidObserver", "Pressure", ps, 0.6)
    print("dambreak wall pressure:", ["%.3f" % p for p in ps[18:26]])


def shell_cantilever():
    from sphinxsys_tpu.cases import shell_cantilever_2d as sc

    case, s = sc.build_case()
    run = sc.make_run_chunk(case)
    tips = [0.0]
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 0.02, s.time.dtype))
        tips.append(float(sc.tip_displacement(case, s)))
    write_db("shell_cantilever_2d", "Shell", "TipDisplacementY", tips, 0.02)
    print("shell tips:", ["%.4f" % t for t in tips[:6]], "...")


def shell_plate():
    from sphinxsys_tpu.cases import shell_plate_3d as sp

    case, s = sp.build_case()
    run = sp.make_run_chunk(case)
    tips = [0.0]
    for i in range(1, 16):
        s = run(s, jnp.asarray(i * 0.002, s.time.dtype))
        tips.append(float(sp.tip_displacement(case, s)))
    write_db("shell_plate_3d", "Plate", "CenterDeflection", tips, 0.02)
    print("plate tips:", ["%.5f" % t for t in tips[:6]], "...")


def column_collapse():
    from sphinxsys_tpu.cases import column_collapse_2d as cc

    case, soil = cc.build_case()
    s = cc.init_sim(case, soil)
    run = cc.make_run_chunk(case)

    def front(s):
        pos = np.asarray(s.soil["Position"])[: case.n_soil]
        return float(pos[:, 0].max())

    fronts = [front(s)]
    for i in range(1, 16):
        s = run(s, jnp.asarray(i * 0.04, s.time.dtype))
        fronts.append(front(s))
    write_db("column_collapse_2d", "SoilBody", "RunoutFront", fronts, 0.05)
    print("runout:", ["%.3f" % f for f in fronts[:8]], "...")


def two_phase():
    from sphinxsys_tpu.cases import two_phase_dambreak_2d as tp
    from sphinxsys_tpu.physics import general as gd

    case, water, air = tp.build_case()
    s = tp.init_sim(case, water, air)
    run = tp.make_run_chunk(case)
    kes = [float(gd.total_kinetic_energy(s.water))]
    for i in range(1, 16):
        s = run(s, jnp.asarray(i * 0.08, s.time.dtype))
        kes.append(float(gd.total_kinetic_energy(s.water)))
    write_db("two_phase_dambreak_2d", "WaterBody", "TotalKineticEnergy",
             kes, 0.08)
    print("two-phase KE:", ["%.4f" % k for k in kes[:8]], "...")


def ball_shell():
    from sphinxsys_tpu.cases import ball_shell_collision_3d as bs

    case, ball = bs.build_case()
    s = bs.init_sim(case, ball)
    run = bs.make_run_chunk(case)

    def com_z(s):
        m = np.asarray(s.ball["Mass"])
        z = np.asarray(s.ball["Position"])[:, 2]
        return float((m * z).sum() / m.sum())

    zs = [com_z(s)]
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 0.1, s.time.dtype))
        zs.append(com_z(s))
    write_db("ball_shell_collision_3d", "BallBody", "CenterOfMassZ", zs, 0.05)
    print("ball z:", ["%.4f" % z for z in zs[:8]], "...")


def lid_cavity():
    from sphinxsys_tpu.cases import lid_driven_cavity_2d as lc
    from sphinxsys_tpu.physics import general as gd

    case, fluid = lc.build_case()
    s = lc.init_sim(case, fluid)
    run = lc.make_run_chunk(case)
    kes = [float(gd.total_kinetic_energy(s.fluid))]
    for i in range(1, 13):
        s = run(s, jnp.asarray(i * 0.25, s.time.dtype))
        kes.append(float(gd.total_kinetic_energy(s.fluid)))
    # KE grows to ~5; fp32 run-to-run spread (thread count, while-loop trip
    # boundaries) measured at DTW ~0.3 — threshold 0.6
    write_db("lid_driven_cavity_2d", "FluidBody", "TotalKineticEnergy",
             kes, 0.6)
    print("cavity KE:", ["%.5f" % k for k in kes[:8]], "...")


def floating_body():
    from sphinxsys_tpu.cases import floating_body_2d as fb

    case, fluid = fb.build_case()
    s = fb.init_sim(case, fluid)
    run = fb.make_run_chunk(case)

    def com_y(s):
        m = np.asarray(s.block["Mass"])
        y = np.asarray(s.block["Position"])[:, 1]
        return float((m * y).sum() / m.sum())

    ys = [com_y(s)]
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 0.1, s.time.dtype))
        ys.append(com_y(s))
    write_db("floating_body_2d", "FloatingBlock", "CenterOfMassY", ys, 0.03)
    print("float y:", ["%.4f" % y for y in ys[:8]], "...")


def turbulent_channel():
    """Centerpoint TurbulentViscosity curve (the reference channel's DTW
    regression quantity, test_2d_turbulent_channel.cpp:131)."""
    from sphinxsys_tpu.cases import turbulent_channel_2d as tc

    case, fluid = tc.build_case()
    s = tc.init_sim(case, fluid)
    run = tc.make_run_chunk(case)
    series = []
    for i in range(1, 21):
        s = run(s, jnp.asarray(i * 1.0, s.time.dtype))
        f = s.fluid
        # centerpoint = particle nearest (length/2, DH/2)
        import numpy as _np
        pos = _np.asarray(f["Position"])
        j = int(_np.argmin(_np.linalg.norm(
            pos - _np.asarray([case.length / 2, tc.DH / 2]), axis=1)))
        series.append(float(f["TurbulentViscosity"][j]))
    # chaotic series: threshold covers the measured re-run spread (~0.03)
    write_db("turbulent_channel_2d", "WaterBody", "TurbulentViscosity",
             series, 0.08)
    print("turbulent_channel_2d:", ["%.2e" % v for v in series[:6]], "...")


def fvm_cylinder():
    """Total force on the cylinder (the reference FVM case's DTW quantity
    ViscousForceOnSolid, 2d_FVM_flow_around_cylinder.cpp:131)."""
    from sphinxsys_tpu.cases import fvm_cylinder_2d as fc

    case, fluid = fc.build_case()
    s = fc.init_sim(case, fluid)
    run = fc.make_run_chunk(case)
    series = []
    for i in range(1, 31):
        s = run(s, jnp.asarray(i * 2.0, s.time.dtype))
        fx = float(fc.cylinder_force(case, s)[0])
        series.append(fx)
    write_db("fvm_cylinder_2d", "WaterBody", "ForceOnCylinderX", series, 1.5)
    print("fvm_cylinder_2d:", ["%.3f" % v for v in series[:6]], "...")


if __name__ == "__main__":
    import sys

    only = sys.argv[1:] or None
    for fn in (dambreak, beam, taylor_green, dambreak_wall_pressure_probe,
               shell_cantilever, shell_plate, column_collapse, two_phase,
               ball_shell, lid_cavity, floating_body, turbulent_channel,
               fvm_cylinder):
        if only and fn.__name__ not in only:
            continue
        print(f"--- {fn.__name__}")
        fn()
