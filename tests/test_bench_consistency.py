"""The scaling-evidence artifacts must agree — pinned on every pytest run.

Runs tools/check_bench_consistency.py: BENCH_SCALING.json must be the
summary of its own commit-stamped reps, the stamp must appear in its notes,
the derived bench `scaling` blob must match, and no crawl-path module may
have changed since the rep stamp (else the ladder no longer measures HEAD
and must be re-run).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_scaling_artifacts_consistent():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_bench_consistency.py")],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, f"\n{out.stdout}\n{out.stderr}"
    assert "BENCH-CONSISTENCY OK" in out.stdout
