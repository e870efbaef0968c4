"""One-command real-weight readiness drill (VERDICT r4 task 8).

When the published ``SimWhisperCodec.pt`` appears, parity day should be one
command, not four.  Given the codec checkpoint (+ optional tower
checkpoints), this runs:

  1. convert   — torch .pt -> native Orbax (tools/convert_checkpoint.py)
  2. parity    — real-weight encode/decode vs the torch oracle, bit-exact
                 codes across the chunk loop (needs /root/reference mounted;
                 the load surface certified: audiocodec/model.py:375-396)
  3. bench     — the serving benchmark (bench.py; throughput is
                 weight-independent, recorded for the release notes)
  4. corpus    — tools/eval_corpus.py --full-report over a synthetic corpus
                 with the real weights + metric towers (zero gated metrics)

and emits a single readiness JSON.  ``--dry_run`` synthesizes every
checkpoint in the reference's own formats (full-geometry random weights)
and runs the identical pipeline — the drill that proves the command works
before the weights exist.

Usage:
  python tools/release_check.py --codec_checkpoint weights/SimWhisperCodec.pt \
      [--asr_model D --utmos_checkpoint F --ecapa_checkpoint F] \
      [--workdir /tmp/release_check] [--skip bench] [--corpus_n 12]
  python tools/release_check.py --dry_run          # synthetic everything
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")


def _run(cmd, timeout=7200):
    proc = subprocess.run(cmd, cwd=REPO_ROOT, capture_output=True, text=True,
                          timeout=timeout)
    return proc.returncode, (proc.stdout + proc.stderr)[-3000:]


def stage_convert(args, work: Path) -> dict:
    out = work / "orbax"
    rc, log = _run([sys.executable, "tools/convert_checkpoint.py",
                    "--config", args.config,
                    "--torch_checkpoint", args.codec_checkpoint,
                    "--out", str(out)])
    return {"ok": rc == 0, "orbax_dir": str(out), "log_tail": log[-800:]}


def stage_parity(args) -> dict:
    """Real-weight parity: both sides load the SAME .pt; codes must be
    bit-exact across the chunk loop, waveforms within fp tolerance."""
    from simwhisper_codec_tpu.utils.oracle import add_reference_to_path

    if not add_reference_to_path(REFERENCE):
        return {"ok": None, "skipped": "reference repo not mounted"}
    import torch
    import yaml

    from audiocodec.model import AudioCodec as RefCodec

    from simwhisper_codec_tpu.config import CodecConfig
    from simwhisper_codec_tpu.models.codec import AudioCodec
    from simwhisper_codec_tpu.utils.checkpoint import load_codec_params

    with open(REPO_ROOT / args.config) as f:
        gp = yaml.safe_load(f)["generator_params"]
    gp["acoustic_encoder"]["freeze"] = False
    gp.pop("init_from_whisper", None)
    gp.pop("whisper_model_path", None)

    ref = RefCodec(gp)
    sd = torch.load(args.codec_checkpoint, map_location="cpu", weights_only=False)
    ref.load_state_dict(sd.get("model", sd))
    ref = ref.eval()
    cfg = CodecConfig.from_dict(gp)
    ours = AudioCodec(cfg, load_codec_params(args.codec_checkpoint, cfg),
                      batch_size=2, mode="parity")

    rng = np.random.default_rng(20)
    wavs = [(rng.standard_normal(n) * 0.1).astype(np.float32)
            for n in (33 * 16000, 213000)]  # chunk loop + partial chunk
    with torch.no_grad():
        ref_enc = ref.encode([torch.from_numpy(w) for w in wavs],
                             overlap_seconds=10, device=torch.device("cpu"))
    our_enc = ours.encode(wavs, overlap_seconds=10)
    mismatch = 0
    for rc_, oc in zip(ref_enc["codes_list"], our_enc["codes_list"]):
        assert rc_.numpy().shape == np.asarray(oc).shape
        mismatch += int((rc_.numpy() != np.asarray(oc)).sum())

    with torch.no_grad():
        ref_dec = ref.decode(ref_enc["codes_list"], overlap_seconds=10,
                             device=torch.device("cpu"))
    our_dec = ours.decode(our_enc["codes_list"], overlap_seconds=10)
    wav_err = max(
        float(np.max(np.abs(r.numpy() - np.asarray(o))))
        for r, o in zip(ref_dec["syn_wav_list"], our_dec["syn_wav_list"]))
    return {"ok": mismatch == 0 and wav_err < 2e-2,
            "code_mismatches": mismatch, "max_wav_abs_err": round(wav_err, 6)}


def stage_bench(args) -> dict:
    rc, log = _run([sys.executable, "bench.py"])
    line = next((ln for ln in reversed(log.splitlines())
                 if ln.strip().startswith("{")), None)
    try:
        metric = json.loads(line) if line else None
    except json.JSONDecodeError:
        metric = None
    return {"ok": rc == 0 and metric is not None, "metric": metric,
            **({} if rc == 0 else {"log_tail": log[-800:]})}


def stage_corpus(args, work: Path) -> dict:
    report = work / "corpus_report.json"
    cmd = [sys.executable, "tools/eval_corpus.py",
           "--checkpoint_path", args.codec_checkpoint,
           "--synthetic", str(args.corpus_n),
           "--output_dir", str(work / "corpus_out"),
           "--report_json", str(report), "--full-report"]
    for flag, val in (("--asr_model", args.asr_model),
                      ("--utmos_checkpoint", args.utmos_checkpoint),
                      ("--ecapa_checkpoint", args.ecapa_checkpoint)):
        if val:
            cmd += [flag, val]
    if args.device:
        cmd += ["--device", args.device]
    rc, log = _run(cmd)
    rep = json.loads(report.read_text()) if report.exists() else None
    gated = (rep or {}).get("gated_metrics") or []
    return {"ok": rc == 0 and rep is not None and not gated,
            "gated_metrics": gated, "report": str(report),
            "quality": {k: v for k, v in (rep or {}).items()
                        if k in ("stoi", "pesq_wb", "pesq_nb", "si_snr", "wer",
                                 "utmos", "speaker_sim", "bitrate_bps")},
            **({} if rc == 0 else {"log_tail": log[-800:]})}


def synthesize_checkpoints(args, work: Path) -> None:
    """--dry_run: full-geometry random checkpoints in the upstream formats."""
    import torch
    import yaml

    from simwhisper_codec_tpu.utils.oracle import add_reference_to_path

    assert add_reference_to_path(REFERENCE), \
        "--dry_run needs /root/reference for the formats"
    from audiocodec.model import AudioCodec as RefCodec

    with open(REPO_ROOT / args.config) as f:
        gp = yaml.safe_load(f)["generator_params"]
    gp["acoustic_encoder"]["freeze"] = False
    gp.pop("init_from_whisper", None)
    gp.pop("whisper_model_path", None)
    torch.manual_seed(0)
    pt = work / "SimWhisperCodec.synthetic.pt"
    torch.save({"model": RefCodec(gp).state_dict()}, pt)
    args.codec_checkpoint = str(pt)

    towers = work / "tower_weights"
    if not (args.asr_model or args.utmos_checkpoint or args.ecapa_checkpoint):
        rc, log = _run([sys.executable, "tools/make_synthetic_tower_weights.py",
                        "--out", str(towers)])
        assert rc == 0, f"tower synthesis failed: {log[-800:]}"
        args.asr_model = str(towers / "hubert_ctc")
        args.utmos_checkpoint = str(towers / "utmos22_strong.ckpt")
        args.ecapa_checkpoint = str(towers / "wavlm_large_finetune.pth")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--codec_checkpoint", default=None)
    ap.add_argument("--config", default="config/SimWhisperCodec.yaml")
    ap.add_argument("--asr_model", default=None)
    ap.add_argument("--utmos_checkpoint", default=None)
    ap.add_argument("--ecapa_checkpoint", default=None)
    ap.add_argument("--workdir", default="/tmp/release_check")
    ap.add_argument("--corpus_n", type=int, default=12)
    ap.add_argument("--device", default=None,
                    help="forwarded to the corpus stage (e.g. cpu)")
    ap.add_argument("--skip", default="",
                    help="comma list from {convert,parity,bench,corpus}")
    ap.add_argument("--dry_run", action="store_true",
                    help="synthesize all checkpoints (readiness drill)")
    ap.add_argument("--out", default=None,
                    help="readiness JSON (default <workdir>/READINESS.json)")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    if args.dry_run:
        synthesize_checkpoints(args, work)
    if not args.codec_checkpoint:
        ap.error("--codec_checkpoint required (or --dry_run)")

    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    stages = {"convert": lambda: stage_convert(args, work),
              "parity": lambda: stage_parity(args),
              "bench": lambda: stage_bench(args),
              "corpus": lambda: stage_corpus(args, work)}
    results = {"codec_checkpoint": args.codec_checkpoint,
               "dry_run": args.dry_run, "stages": {}}
    for name, fn in stages.items():
        if name in skip:
            results["stages"][name] = {"ok": None, "skipped": "--skip"}
            continue
        t0 = time.time()
        try:
            r = fn()
        except Exception as e:  # a stage failure must not hide the others
            r = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        r["wall_s"] = round(time.time() - t0, 1)
        results["stages"][name] = r
        print(f"[{name}] {json.dumps(r)[:400]}", flush=True)

    ran = [r for r in results["stages"].values() if r["ok"] is not None]
    results["ready"] = bool(ran) and all(r["ok"] for r in ran)
    out = Path(args.out or work / "READINESS.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps({"ready": results["ready"],
                      "stages": {k: v["ok"] for k, v in results["stages"].items()}}))
    print(f"wrote {out}")
    sys.exit(0 if results["ready"] else 1)


if __name__ == "__main__":
    main()
