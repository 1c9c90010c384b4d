"""Every example script must import and build its argparse surface.

The examples are the reference's workflow JSONs as runnable scripts
(docs/parity.md "Example workflows"); a broken import or flag rename in
any of them is a user-facing breakage this catches in seconds — full
sampling runs are exercised by the API/pipeline tests on the same tiny
configs the examples default to.
"""

import glob
import os
import subprocess
import sys

import pytest

# whole-module slow tier: model builds + XLA-CPU compiles dominate
pytestmark = pytest.mark.slow


_EXAMPLES = sorted(
    p for p in glob.glob(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "*.py"))
    if not p.endswith("common.py")
)


@pytest.mark.parametrize("script", _EXAMPLES,
                         ids=[os.path.basename(p) for p in _EXAMPLES])
def test_example_help_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(script),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage:" in proc.stdout.lower()
