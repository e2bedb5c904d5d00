"""Production MR-cylinder drag validation vs the reference's
Cylinder_TotalViscousForceFromFluid DTW databases (steady band
0.30-0.38 after the wake develops).  Run:
  PYTHONPATH=/root/repo:/root/.axon_site MRC_PLATFORM=axon MRC_TEND=30 \
    python benchmarks/run_mr_cylinder_validation.py

Status (round 4): RESOLVED — steady viscous drag 0.3077 +- 0.0141 over
t = 21..30 (TPU, relaxed IC), inside the reference band.  The round-3
~2x miss was NOT a resolution/IC issue: the startup body force OVERWROTE
ForcePrior every advection step, which cancelled the viscous prior force
down to its per-step delta (near-inviscid momentum equation -> near-wall
slip -> 2.3x the measured drag).  Fixed by the BaseForcePrior delta
convention (cases/mr_cylinder_2d.py _startup_force, physics/general.py
gravity_force).  The curve is committed at
tests/golden/mr_cylinder/drag_tpu_r4.npy and band-gated in CI
(tests/test_mr_cylinder.py).
"""
import os
import time

import jax

if os.environ.get("MRC_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sphinxsys_tpu.cases import mr_cylinder_2d as mc

t_end = float(os.environ.get("MRC_TEND", "30"))
case, fluid = mc.build_case()
s = mc.init_sim(case, fluid)
run = mc.make_run_chunk(case)
t0 = time.time()
hist = []
n_out = int(t_end / 0.5)
for i in range(1, n_out + 1):
    s = run(s, jnp.asarray(i * 0.5, s.time.dtype))
    fv, fp = mc.cylinder_forces(case, s)
    hist.append((float(s.time), float(fv[0]), float(fv[1])))
    print(f"t={float(s.time):.2f} fv_x={float(fv[0]):+.4f} "
          f"fv_y={float(fv[1]):+.4f} ovf={bool(s.overflow)} "
          f"wall={time.time()-t0:.0f}s", flush=True)
np.save(os.path.join(os.path.dirname(__file__), "mr_cylinder_drag.npy"),
        np.asarray(hist))
tail = [h[1] for h in hist if h[0] > 0.7 * t_end]
print(f"steady viscous drag {np.mean(tail):.4f} +- {np.std(tail):.4f} "
      f"(reference DB band 0.30-0.38)")
