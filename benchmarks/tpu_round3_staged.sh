#!/bin/bash
# Staged TPU work for round 3, run when the axon tunnel recovers:
#   bash benchmarks/tpu_round3_staged.sh 2>&1 | tee /tmp/tpu_staged.log
# Order: cheap probe, 2D bench (320k), 3D bench (1M), reference-DB parity
# curves (3D dambreak + standing wave), fsi2 production curve regeneration.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

timeout 180 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
jax.jit(lambda a: a*2+1)(jnp.ones((8,8))).block_until_ready()
print('TPU OK', round(time.time()-t0,1))" || { echo "tunnel still down"; exit 1; }

BENCH_DX=0.0025 timeout 1200 python bench.py
BENCH_CASE=dambreak_3d BENCH_DX=0.01 BENCH_STEPS=20 BENCH_CAP=32 \
  BENCH_CMAX=125000 timeout 3000 python bench.py
timeout 3000 python benchmarks/run_refdb_parity.py dambreak_3d
timeout 2400 python benchmarks/run_refdb_parity.py standing_wave
timeout 3600 python benchmarks/run_fsi2_validation.py || true
