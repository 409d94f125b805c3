"""True multi-process distributed validation (jax.distributed over Gloo) —
the cross-host code path a TPU pod exercises over DCN."""

import subprocess
import sys
from pathlib import Path

import pytest


@pytest.mark.timeout(240)
def test_two_process_edge_partitioned_aggregation():
    tool = Path(__file__).resolve().parents[1] / "tools" / "test_multihost.py"
    out = subprocess.run(
        [sys.executable, str(tool), "--processes", "2",
         "--local-devices", "2", "--port", "9931"],
        capture_output=True, timeout=220)
    text = out.stdout.decode() + out.stderr.decode()
    assert out.returncode == 0, text[-2000:]
    assert "MULTIHOST: PASS" in text
