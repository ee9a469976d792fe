"""Smoke test for the interleaved A/B harness (tools/ab_bench.py).

The harness is the round ritual's regression arbiter (BENCH.md A/B
notes), so its subprocess plumbing - repo-path injection, fresh-session
laps, JSON rep emission on the last stdout line - must not rot.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_one_emits_rep_json():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "ab_bench.py"),
            "scan_project",
            "--run-one", REPO,
            "--reps", "2",
            "--sf", "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    reps = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(reps) == 2 and all(isinstance(t, float) and t > 0 for t in reps)
