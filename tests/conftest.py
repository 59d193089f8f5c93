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
import pytest

# The environment's TPU plugin overrides JAX_PLATFORMS at import time; the
# config update below wins regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _fresh_jit_caches_per_module():
    """The XLA *CPU* compiler SIGSEGVs inside backend_compile in LONG-LIVED
    suite processes (accumulated in-process compiler/LLVM-JIT state) -- first
    seen at the ~80th compile in test_pallas_qp (round 2), reproduced in
    round 3 at test_nonlinear::test_outer_unroll_matches_rolled ~30% through
    a full run; every standalone/partial run of the same tests passes, and
    synthetic compile-count pressure alone does not trigger it
    (scripts/repro_xla_cpu_segfault.py). Dropping accumulated executables at
    every module boundary keeps the compiler state small suite-wide; the
    recompiles it causes are minor (modules rarely share programs). Tracked
    in ROADMAP.md environment issues."""
    jax.clear_caches()
    yield
