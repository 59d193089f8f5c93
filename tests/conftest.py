"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Mirrors the reference's verification posture (double precision CPU,
qp.hpp:141-146 tolerances); TPU execution is exercised by bench.py and the
driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's TPU plugin overrides JAX_PLATFORMS at import time; the
# config update below wins regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
