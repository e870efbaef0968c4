"""Training soak: a multi-hundred-step GAN run with a mid-run kill + resume.

Proves optimizer/checkpoint/AOT stability beyond smoke scale for the codec
GAN trainer (the reference's trainer was never released — .gitignore:1-8;
its forward survives at /root/reference/audiocodec/model.py:112-165):

  run A  (continuous): train.py --steps N
  run B  (killed):     train.py --steps N, SIGKILLed at a random moment,
                       then resumed from its last checkpoint to step N
  check: B's post-resume losses must match A's at every common logged step —
         exact-resume (full state: params, both optimizers, step counter) plus
         step-keyed data cropping make a resumed run bitwise-reproduce the
         continuous one on the same hardware.

Usage (full-size on-chip; budget ~25 min warm / ~40 min cold):
  python experiments/codec/soak.py --output_folder /tmp/soak --steps 300 \
      --aot_dir .aot_cache/gan [--smoke] [train.py passthrough args]

NOTE (tunneled TPU): SIGKILL mid-device-operation can wedge the axon tunnel
for ~5-30 min (docs/TPU_NOTES.md quirk #5).  The kill test is the POINT of
this soak, so it stays — schedule the soak after any same-session
measurements, not before.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
TRAIN = str(Path(__file__).resolve().parent / "train.py")


def read_log(folder: Path) -> dict:
    """step -> metrics rows from train_log.jsonl (later rows win on resume)."""
    rows = {}
    log = folder / "train_log.jsonl"
    if log.exists():
        for line in log.read_text().splitlines():
            rec = json.loads(line)
            rows[rec["step"]] = rec
    return rows


def run_train(args_list, kill_at_step: int = None, log_folder: Path = None,
              timeout_s: float = 14400.0) -> int:
    """Run train.py; with ``kill_at_step``, SIGKILL it once its train log
    shows that step reached — progress-based, so the kill lands mid-run
    regardless of compile/AOT-warm-start time (a wall-clock fraction of a
    cold run A would let a warm run B finish before the kill ever fired)."""
    proc = subprocess.Popen([sys.executable, TRAIN] + args_list, cwd=REPO_ROOT)
    if kill_at_step is None:
        return proc.wait()
    deadline = time.time() + timeout_s
    while proc.poll() is None and time.time() < deadline:
        rows = read_log(log_folder)
        if rows and max(rows) >= kill_at_step:
            print(f"soak: SIGKILL at logged step >= {kill_at_step} "
                  f"(pid {proc.pid})", flush=True)
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            return -9
        time.sleep(2.0)
    if proc.poll() is None:
        proc.kill()
        raise RuntimeError("run B exceeded its timeout before reaching the kill step")
    print("soak: run B finished before the kill step was logged", flush=True)
    return proc.returncode


_CKPT_RE = re.compile(r"^ckpt_\d+$")


def last_checkpoint(folder: Path):
    """Latest FINALIZED checkpoint — Orbax leaves ckpt_*.orbax-checkpoint-tmp-*
    dirs behind when the kill lands mid-save; those must never be resumed."""
    ckpts = sorted(p for p in folder.glob("ckpt_*") if _CKPT_RE.match(p.name))
    return str(ckpts[-1]) if ckpts else None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--kill_fraction", type=float, default=0.5,
                    help="kill run B once its log reaches ~this fraction of the steps")
    ap.add_argument("--loss_rtol", type=float, default=1e-4)
    args, passthrough = ap.parse_known_args()

    out = Path(args.output_folder)
    a_dir, b_dir = out / "runA", out / "runB"
    ckpt_every = max(1, args.steps // 6)  # several resume points before the kill
    log_every = max(1, min(10, args.steps // 10))
    common = ["--steps", str(args.steps), "--log_every", str(log_every),
              "--checkpoint_every", str(ckpt_every), "--seed", "7", *passthrough]

    print("=== run A: continuous ===", flush=True)
    t0 = time.time()
    rc = run_train(common + ["--output_folder", str(a_dir)])
    assert rc == 0, f"run A failed rc={rc}"
    a_wall = time.time() - t0
    log_a = read_log(a_dir)
    assert args.steps in log_a, "run A incomplete"

    print("=== run B: killed mid-run, then resumed ===", flush=True)
    kill_step = min(args.steps - 1,
                    max(ckpt_every + 1, int(args.kill_fraction * args.steps)))
    run_train(common + ["--output_folder", str(b_dir)],
              kill_at_step=kill_step, log_folder=b_dir)
    ckpt = last_checkpoint(b_dir)
    assert ckpt, "run B died before its first checkpoint; raise kill_fraction"
    print(f"=== resume from {ckpt} ===", flush=True)
    rc = run_train(common + ["--output_folder", str(b_dir), "--resume", ckpt])
    assert rc == 0, f"resume failed rc={rc}"
    log_b = read_log(b_dir)
    assert args.steps in log_b, "run B incomplete after resume"

    resume_step = int(Path(ckpt).name.split("_")[1])
    checked, worst = 0, 0.0
    for step in sorted(log_a):
        if step <= resume_step or step not in log_b:
            continue
        for key in ("g_loss", "d_loss", "loss"):
            if key in log_a[step] and key in log_b[step]:
                a, b = log_a[step][key], log_b[step][key]
                rel = abs(a - b) / max(abs(a), 1e-9)
                worst = max(worst, rel)
                checked += 1
    assert checked > 0, "no common post-resume logged steps"
    verdict = {
        "steps": args.steps,
        "runA_wall_s": round(a_wall, 1),
        "resume_step": resume_step,
        "post_resume_points_checked": checked,
        "worst_rel_loss_diff": worst,
        "equivalent": worst <= args.loss_rtol,
        "final_losses_A": {k: v for k, v in log_a[args.steps].items()
                           if k not in ("step", "time")},
    }
    (out / "SOAK_REPORT.json").write_text(json.dumps(verdict, indent=1))
    print(json.dumps(verdict, indent=1))
    assert verdict["equivalent"], (
        f"resumed run diverged from continuous: worst rel diff {worst}")


if __name__ == "__main__":
    main()
