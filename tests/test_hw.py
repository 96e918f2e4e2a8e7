"""Env-gated on-hardware validation (round-3 VERDICT item 5).

MSK144_TPU_HWTESTS=1 python -m pytest tests/test_hw.py -q

runs tools/run_hwtests.py on the REAL TPU chip: compiled BP-kernel parity,
the sharded-mesh decode + throughput check, the CLI shell throughput check,
and the busy-band battery through the fused kernels — and re-pins the
committed evidence JSONs under tests/data/ so hardware evidence regenerates
instead of going stale. Runs in a subprocess because tests/conftest.py
forces the suite onto a virtual CPU mesh.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(not os.environ.get("MSK144_TPU_HWTESTS"),
                    reason="set MSK144_TPU_HWTESTS=1 to validate on the real TPU")
def test_hardware_validation_battery():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "tools/run_hwtests.py"], cwd=REPO, env=env,
        timeout=3600)
    assert proc.returncode == 0, "run_hwtests.py failed (see output above)"
