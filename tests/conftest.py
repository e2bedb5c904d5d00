"""Test configuration: run the suite on CPU with 8 virtual devices so
sharding/collective tests work without TPU hardware (the driver dry-runs
the real multi-chip path separately via __graft_entry__.dryrun_multichip).

Note: the environment's sitecustomize pre-imports jax and registers the
remote `axon` TPU backend; per-op dispatch over that tunnel is far too
slow for a unit-test suite, so we must override the platform via
jax.config (env vars alone are ignored once jax is imported).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# float64 for numerical-accuracy assertions; tests exercising the fp32
# production path request float32 arrays explicitly.
jax.config.update("jax_enable_x64", True)
