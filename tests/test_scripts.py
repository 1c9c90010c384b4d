"""The measurement scripts in scripts/ must import and expose --help.

These are the perf-campaign entry points (docs/architecture.md lever
measurements): a bitrotted import there silently kills a round's
measurement evidence, so the CPU suite gates them like the examples.
"""

import glob
import os
import subprocess
import sys

import pytest

_SCRIPTS = sorted(
    p for p in glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "*.py"))
    if not p.endswith("__init__.py")
)


@pytest.mark.parametrize("script", _SCRIPTS,
                         ids=[os.path.basename(p) for p in _SCRIPTS])
def test_script_help_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage:" in proc.stdout.lower()


@pytest.mark.slow
def test_wan_flops_model_matches_xla():
    """bench.wan_forward_tflops must track XLA cost analysis per block —
    the Wan bench metric's achieved-TFLOP/s (and the 14B 81-frame
    projection) both rest on this formula.  Runs the model_flops
    validation (one unrolled WanBlock at a GEMM-dominated tiny shape;
    asserts within 10% of XLA and exact extras accounting)."""
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "model_flops.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--skip-sdxl"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-1000:])
    assert "matches the validated per-block formula" in proc.stdout
