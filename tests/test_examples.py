"""Examples smoke tier: every shipped example script runs to completion.

Reference analog: /root/reference/example/ (a notebook + sasrec_demo.py,
never executed by any test). Here each example is executed as a real
subprocess — the same way a user would run it — under the CPU backend.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = ["quickstart.py", "serving.py", "tuning.py", "two_stage.py",
            "custom_model.py"]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_script_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, (
        f"{script} failed:\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-2000:]}")
