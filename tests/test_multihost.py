"""Multi-process (multi-controller) CI coverage: SURVEY §4 item 4.

Spawns tools/multihost_demo.py -- 2 processes x 2 virtual CPU devices,
real jax.distributed.initialize -- and asserts per-host decode plus the
global_frame_batch assembly + pjit'ed global reduction agree across
hosts (jax.process_count() > 1 actually exercised).
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # quick tier: -m 'not slow'

REPO = Path(__file__).resolve().parent.parent


def test_multihost_demo_two_processes():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_demo.py"), "2", "3"],
        capture_output=True,
        timeout=550,
        cwd=REPO,
    )
    out = res.stdout.decode() + res.stderr.decode()
    assert res.returncode == 0, out
    assert "multihost demo: OK" in out
    # Non-greedy: both hosts' prints can interleave on one line.
    hosts = re.findall(r"\[host (\d)/2\] decoded (\d+) frames.*?ok=True", out)
    assert sorted(h[0] for h in hosts) == ["0", "1"], out
    assert all(h[1] == "3" for h in hosts)
    # the jitted global reduction must agree on every controller
    gb = re.findall(r"global_batch=\((\d+),", out)
    assert gb and all(g == "6" for g in gb), out
    gsums = re.findall(r"gsum=(\d+)", out)
    assert len(gsums) == 2 and len(set(gsums)) == 1, out
