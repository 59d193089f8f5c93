"""Differential fuzzing vs the ACTUAL reference binary (CI smoke sizes).

Drives scripts/diff_fuzz.py's machinery end to end: build the unmodified
reference library (native/diff_fuzz.cc harness), solve the reference's own
randomized families through BOTH solvers on bit-identical instances, and
gate on agreement.  The full-strength run (1000 QPs, 961-start Himmelblau
grid) is recorded in DIFF_FUZZ.json / STATUS.md; these tests keep the
machinery honest at CI sizes.

Skips (not fails) when g++ or the reference tree is unavailable.
"""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "scripts"))

_HAVE_TOOLCHAIN = shutil.which("g++") is not None and os.path.isdir(
    "/root/reference/source"
)

pytestmark = pytest.mark.skipif(
    not _HAVE_TOOLCHAIN, reason="g++ or reference sources unavailable"
)


@pytest.fixture(scope="module")
def binary():
    import diff_fuzz

    try:
        return diff_fuzz.build_binary()
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"reference build failed: {e.stderr[:500]}")


def test_qp_family_agrees_with_reference(binary):
    import diff_fuzz

    out = diff_fuzz.fuzz_qp(binary, 30)
    assert out["pass"], out
    # The strongest signal: identical per-instance iteration counts mean the
    # two implementations take the same path through the algorithm.
    assert out["warm"]["iters_identical_frac"] == 1.0, out
    assert out["naive"]["iters_identical_frac"] == 1.0, out
    assert out["warm"]["term_agree_frac"] == 1.0, out


def test_rosenbrock_agrees_with_reference(binary):
    import diff_fuzz

    out = diff_fuzz.fuzz_rosenbrock(binary)
    assert out["pass"], out
    assert out["term_agree_frac"] == 1.0, out


def test_himmelblau_grid_agrees_with_reference(binary):
    import diff_fuzz

    out = diff_fuzz.fuzz_himmelblau(binary, step=1.5)  # 49 starts
    assert out["pass"], out
    assert out["basin_agree_frac"] == 1.0, out
    assert out["iters_identical_frac"] == 1.0, out
