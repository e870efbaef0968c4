"""bench.py end-to-end flow regression (the driver's acceptance artifact).

Round 3's official bench artifact lost all int8 fields to a self-inflicted
SIGALRM wedge; this test pins the reworked flow: one JSON line, headline =
fast-int8 (mixed) with every int8 field populated, no signals involved.
Runs the REAL full-size program graph on the CPU backend with smoke knobs
(batch 1, 1 iter), so it is slow-tier but backend-independent.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_bench_json_line_with_int8_fields(tmp_path):
    env = dict(os.environ)
    env.update(
        BENCH_SKIP_PROBE="1",
        BENCH_BATCH="1",
        BENCH_ITERS="1",
        BENCH_INT8_BUDGET="3000",
        BENCH_AOT_DIR=str(tmp_path / "aot"),
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import bench; bench.main()"],
        env=env, cwd=REPO_ROOT, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, proc.stdout[-2000:]
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "codec_round_trip_throughput"
    assert rec["headline_mode"] == "fast-int8(mixed)"
    assert rec["value"] == rec["int8_mixed_x_realtime"] > 0
    assert rec["bf16_x_realtime"] > 0
    assert rec["int8_x_realtime"] > 0
    assert 0.9 <= rec["int8_code_agreement_vs_bf16"] <= 1.0
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 10.0, rel=1e-6)
