"""Distributed tests on 8 fake CPU devices, via subprocess (SURVEY.md §5.3).

Subprocess because --xla_force_host_platform_device_count must be set before
jax initializes, and forcing it on the whole suite slows every compile on
this 2-core box (see conftest.py).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(600)
def test_distributed_checks():
    script = os.path.join(os.path.dirname(__file__), "distributed_checks.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, script],
        capture_output=True,
        text=True,
        timeout=570,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "ALL-DISTRIBUTED-OK" in proc.stdout
