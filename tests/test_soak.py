"""CI guard for the soak harness (experiments/codec/soak.py).

The resume-equivalence machinery — progress-based kill, finalized-checkpoint
selection, step-keyed crops, post-resume loss comparison — was previously
protected only by the recorded on-chip artifacts (docs/SOAK_REPORT_*.json);
a regression would have surfaced only at the next expensive on-chip soak.
This smoke runs the REAL harness end to end on CPU at tiny scale: run A
continuous, run B SIGKILLed mid-run by the harness itself, resumed from its
last finalized checkpoint, and bit-equivalent post-resume losses asserted
by the harness's own check (VERDICT r4 task 6).
"""

import json
import subprocess
import sys

import pytest

from conftest import REPO_ROOT


@pytest.mark.slow  # three tiny training runs + 2 compiles: ~3-6 min on 1 CPU
def test_soak_kill_resume_smoke(tmp_path):
    out = tmp_path / "soak"
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "experiments/codec/soak.py"),
         "--output_folder", str(out), "--steps", "12",
         "--kill_fraction", "0.5",
         # passthrough to train.py: tiny config, explicit sizes
         "--smoke", "--batch_size", "2", "--device", "cpu"],
        capture_output=True, text=True, timeout=1800, cwd=REPO_ROOT,
    )
    assert result.returncode == 0, (result.stdout[-2000:], result.stderr[-2000:])
    report = json.loads((out / "SOAK_REPORT.json").read_text())
    assert report["equivalent"] is True
    assert report["post_resume_points_checked"] > 0
    assert report["resume_step"] < report["steps"]
    # the kill really happened: run B holds a checkpoint from before the end
    assert "SIGKILL" in result.stdout
