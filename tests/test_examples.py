"""Every example must run (VERDICT round-3 item 7: examples were dead code
to the suite and would rot).

Each examples/*.py executes in a subprocess in its cheap configuration
(MINI_OPT_EXAMPLE_SMOKE=1 shrinks batch/iteration constants in the
interpret-mode-heavy ones; semantics and assertions unchanged).  Measured
smoke-mode wall times sum to ~3 minutes on a contended CPU host.

The subprocess env forces the CPU backend the same way conftest.py does for
in-process tests -- and additionally drops the axon TPU plugin's trigger
variable, since the plugin overrides JAX_PLATFORMS at import time (CLAUDE.md)
and an example must never contend for the chip from CI.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples")) if f.endswith(".py")
)


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable the axon TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["MINI_OPT_EXAMPLE_SMOKE"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    return env


def test_examples_directory_is_covered():
    """A new example is automatically picked up (or this fails loudly)."""
    assert len(EXAMPLES) >= 13, EXAMPLES


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", example)],
        env=_cpu_env(),
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{example} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr ---\n{proc.stderr[-2000:]}"
    )
