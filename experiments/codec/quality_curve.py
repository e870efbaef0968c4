"""Training->quality evidence: one command, one recorded curve artifact.

Builds a small corpus (real demo-page speech + synthetic voices), trains the
codec GAN from random init at reduced width (``train.py --small``), scores a
HELD-OUT set (one unseen demo clip + unseen-seed voices) with the native
evaluator every N steps, and records the quality-vs-step curve.  This is the
link the loss curve alone cannot give: the trainer demonstrably improves
held-out STOI/SI-SNR/PESQ, not just its own objectives (VERDICT r4 task 2;
the reference's unreleased trainer's capability —
/root/reference/audiocodec/model.py:112-165, losses at
hifigan_experiments/hifigan_continue_whisper/hparams/train.yaml:140-228).

Usage (on-chip, ~15 min at the defaults):
  python experiments/codec/quality_curve.py --output_folder /tmp/qc \
      --steps 3000 [--report docs/QUALITY_CURVE.json] [train.py passthrough]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

REF_ASSETS = Path("/root/reference/docs/assets/codec")


def build_corpus(out: Path, sr: int = 16000):
    """Train dir: demo gt_sample1-3 + 24 synthetic voices; eval dir:
    gt_sample4 + 7 unseen-seed voices.  Deterministic."""
    from experiments.codec.train import synthetic_voice
    from simwhisper_codec_tpu.utils.audio_io import load_audio, save_audio

    train_dir, eval_dir = out / "train_data", out / "eval_data"
    train_dir.mkdir(parents=True, exist_ok=True)
    eval_dir.mkdir(parents=True, exist_ok=True)
    n_real = 0
    if REF_ASSETS.is_dir():
        for i in (1, 2, 3):
            p = REF_ASSETS / f"gt_sample{i}.wav"
            if p.exists():
                save_audio(train_dir / f"gt{i}.wav", load_audio(p, sr), sr)
                n_real += 1
        p4 = REF_ASSETS / "gt_sample4.wav"
        if p4.exists():
            save_audio(eval_dir / "gt4.wav", load_audio(p4, sr), sr)
    for i in range(24):
        save_audio(train_dir / f"voice{i:02d}.wav", synthetic_voice(i, 3.0, sr), sr)
    for i in range(7):  # seeds disjoint from training AND from the trainer's
        save_audio(eval_dir / f"heldout{i}.wav",   # built-in 10000+ eval seeds
                   synthetic_voice(20_000 + i, 3.0, sr), sr)
    return train_dir, eval_dir, n_real


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--output_folder", required=True)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--eval_every", type=int, default=None)
    ap.add_argument("--report", default=str(REPO_ROOT / "docs" / "QUALITY_CURVE.json"))
    args, passthrough = ap.parse_known_args()

    out = Path(args.output_folder)
    train_dir, eval_dir, n_real = build_corpus(out)
    eval_every = args.eval_every or max(50, args.steps // 12)
    run_dir = out / "run"

    t0 = time.time()
    cmd = [sys.executable, str(REPO_ROOT / "experiments/codec/train.py"),
           "--small", "--data_folder", str(train_dir),
           "--eval_folder", str(eval_dir), "--eval_every", str(eval_every),
           "--output_folder", str(run_dir), "--steps", str(args.steps),
           "--batch_size", "16", "--segment_seconds", "2.0",
           "--checkpoint_every", str(args.steps), "--log_every",
           str(max(10, eval_every // 2)), *passthrough]
    print("quality_curve:", " ".join(cmd), flush=True)
    rc = subprocess.run(cmd, cwd=REPO_ROOT).returncode
    assert rc == 0, f"training failed rc={rc}"

    curve = [json.loads(line)
             for line in (run_dir / "quality_log.jsonl").read_text().splitlines()]
    losses = [json.loads(line)
              for line in (run_dir / "train_log.jsonl").read_text().splitlines()]
    base, final = curve[0], curve[-1]
    report = {
        "steps": args.steps,
        "eval_every": eval_every,
        "wall_s": round(time.time() - t0, 1),
        "train_files": {"real_demo_speech": n_real, "synthetic_voices": 24},
        "heldout_files": {"real_demo_speech": int((eval_dir / "gt4.wav").exists()),
                          "synthetic_voices": 7},
        "curve": curve,
        "random_init": base,
        "final": final,
        "improvement": {k: round(final[k] - base[k], 4)
                        for k in ("stoi", "si_snr", "pesq_wb")
                        if base.get(k) is not None and final.get(k) is not None},
        "final_losses": {k: v for k, v in losses[-1].items()
                         if k not in ("step", "time")},
        "improved": (final["stoi"] > base["stoi"] + 0.05
                     and final["si_snr"] > base["si_snr"] + 3.0
                     and final["pesq_wb"] > base["pesq_wb"] + 0.2),
    }
    Path(args.report).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items() if k != "curve"}, indent=1))
    print(f"wrote {args.report} ({len(curve)} curve points)")
    assert report["improved"], "held-out quality did not improve from random init"


if __name__ == "__main__":
    main()
