"""Corpus throughput/reconstruction CLI: directory -> WAVs + RTF/bitrate stats.

Drives ``eval/corpus.py`` (length-bucketed fixed-shape batches, optional
data-parallel mesh, process-sharded file lists).

``--full-report`` runs the ENTIRE evaluation chain as one pipeline —
corpus round trip, then objective quality (STOI, PESQ-WB/NB, SI-SNR, LSD,
MCD) over the (original, reconstructed) pairs, plus the availability status
of every weight-gated metric (WER ASR, UTMOS, speaker SIM) — and emits one
consolidated JSON.  With ``--synthetic N`` it first generates an
N-utterance synthetic ``.flac`` corpus (in-repo FLAC encoder), so the whole
chain is runnable in CI with zero external data; the recorded artifact
lives at ``docs/CORPUS_REPORT.json``.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from simwhisper_codec_tpu.eval.corpus import evaluate_corpus
from simwhisper_codec_tpu.models.codec import AudioCodec
from simwhisper_codec_tpu.utils.audio_io import set_logging


def make_synthetic_corpus(out_dir: Path, n: int, seed: int = 0,
                          dur_range=(1.0, 4.0)) -> None:
    """N speech-like utterances (varied f0/envelope) as 16 kHz flac."""
    import numpy as np

    from simwhisper_codec_tpu.utils.flac import write_flac

    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    sr = 16000
    for i in range(n):
        dur = rng.uniform(*dur_range)
        t = np.arange(int(sr * dur)) / sr
        f0 = rng.uniform(90, 240) + 25 * np.sin(2 * np.pi * rng.uniform(1, 4) * t)
        sig = sum(np.sin(2 * np.pi * h * np.cumsum(f0) / sr + rng.uniform(0, 6)) / h
                  for h in range(1, 12))
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1.5, 3.5) * t
                             + rng.uniform(0, 6)), 0, None) ** 2
        wav = sig * env * 0.15 + 0.002 * rng.standard_normal(len(t))
        write_flac(out_dir / f"synt{i:03d}.flac",
                   np.clip(wav * 32768, -32768, 32767).astype(np.int64), sr)


def quality_report(input_dir: str, output_dir: str, limit=None) -> dict:
    """Pair originals/reconstructions by stem and average objective metrics
    (the metric set lives in tools/base_eval/evaluator.py::pair_metrics,
    shared with evaluate_model.py so the two harnesses cannot diverge)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent / "base_eval"))
    import evaluator

    from simwhisper_codec_tpu.eval import metrics as M
    from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio

    recon = {Path(p).stem: p for p in find_audio_files(output_dir)}
    rows = []
    for orig_path in find_audio_files(input_dir)[: limit or None]:
        stem = Path(orig_path).stem
        if stem not in recon:
            continue
        rows.append(evaluator.pair_metrics(
            load_audio(orig_path, 16000), load_audio(recon[stem], 16000), 16000))
    out = {k: round(v, 4) for k, v in evaluator.average_metrics(rows).items()}
    out["num_pairs"] = len(rows)
    out["pesq_impl"] = "itu-wrapper" if M.have_pesq() else "native-p862"
    if out["pesq_impl"] == "native-p862":
        # absolute-scale provenance for comparisons against BASELINE.md
        out["pesq_scale_anchor"] = (
            "anchored via in-repo G.711/G.726 fixtures + published corpus "
            "averages (docs/PESQ_CALIBRATION.json); |delta| <= 0.1 at toll "
            "quality, <= 0.35 at low-rate ADPCM")
    return out


def tower_metrics(input_dir: str, recon_dir: str, asr_model: str = None,
                  utmos_ckpt: str = None, ecapa_ckpt: str = None,
                  trans_dir: str = None, limit=None) -> dict:
    """Run the weight-gated metric towers over (original, reconstructed) pairs.

    WER semantics follow the reference harness (tools/wer/calculate_wer.py:
    428-502): with ``trans_dir`` (LibriSpeech ``*.trans.txt``) both the
    reconstructed and original recognitions score against ground truth and the
    delta is reported; without transcripts the reconstructed recognitions
    score against the original recognitions (codec-induced WER — the
    plumbing-proving mode for synthetic corpora).  UTMOS scores both dirs
    (calculate_utmos.py) and SIM is mean pairwise cosine (spk_sim_cal.py).
    """
    from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio

    recon = {Path(p).stem: p for p in find_audio_files(recon_dir)}
    pairs = [(Path(p).stem, p, recon[Path(p).stem])
             for p in find_audio_files(input_dir)[: limit or None]
             if Path(p).stem in recon]
    out = {"num_pairs": len(pairs)}

    if asr_model:
        from simwhisper_codec_tpu.eval.wer import Calculator, CTCTranscriber

        asr = CTCTranscriber(asr_model)
        truths = {}
        if trans_dir:
            for tf in Path(trans_dir).rglob("*.trans.txt"):
                for line in tf.read_text().splitlines():
                    if " " in line:
                        utt, text = line.split(" ", 1)
                        truths[utt] = text
        calc_rec, calc_orig = Calculator(), Calculator()
        # one scoring population, never mixed: with transcripts, score ONLY
        # truth-covered stems against ground truth (both dirs, reference
        # semantics) and report the uncovered count; without transcripts,
        # score every pair rec-vs-orig-ASR (codec-induced WER)
        uncovered = 0
        for stem, orig_path, rec_path in pairs:
            truth = truths.get(stem)
            if truths and truth is None:
                uncovered += 1
                continue
            hyp_orig = asr.transcribe(load_audio(orig_path, 16000))
            hyp_rec = asr.transcribe(load_audio(rec_path, 16000))
            if truth is not None:
                calc_rec.calculate(stem, hyp_rec, truth)
                calc_orig.calculate(stem, hyp_orig, truth)
            else:
                calc_rec.calculate(stem, hyp_rec, hyp_orig)
        out["wer_rec"] = round(100 * calc_rec.wer, 3)
        if truths:
            out["wer_orig"] = round(100 * calc_orig.wer, 3)
            out["wer_delta"] = round(out["wer_rec"] - out["wer_orig"], 3)
            if uncovered:
                out["wer_pairs_without_transcript"] = uncovered
        else:
            out["wer_mode"] = "rec-vs-orig-asr (no transcripts)"

    if utmos_ckpt:
        import numpy as np

        from simwhisper_codec_tpu.eval.utmos import UTMOSScorer

        scorer = UTMOSScorer(utmos_ckpt)
        rec_scores = [scorer.score(load_audio(p, 16000)) for _, _, p in pairs]
        orig_scores = [scorer.score(load_audio(p, 16000)) for _, p, _ in pairs]
        out["utmos_rec"] = round(float(np.mean(rec_scores)), 4)
        out["utmos_orig"] = round(float(np.mean(orig_scores)), 4)

    if ecapa_ckpt:
        import numpy as np

        from simwhisper_codec_tpu.eval.speaker import SpeakerEmbedder

        emb = SpeakerEmbedder.from_checkpoint(ecapa_ckpt)
        sims = []
        for _, orig_path, rec_path in pairs:
            a = emb.embed(load_audio(orig_path, 16000))
            b = emb.embed(load_audio(rec_path, 16000))
            sims.append(float(np.dot(a, b) /
                              (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)))
        out["speaker_sim"] = round(float(np.mean(sims)), 4)
    return out


def gated_metric_status() -> dict:
    """Which weight-gated metrics can run in this environment, and why not."""
    from simwhisper_codec_tpu.eval.wer import have_asr

    status = {}
    status["wer"] = ("available" if have_asr()
                     else "gated: HuBERT-CTC weights not in local HF cache")
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained("microsoft/wavlm-large", local_files_only=True)
        status["speaker_sim"] = "available (needs --ecapa_checkpoint for the trunk)"
    except Exception:
        status["speaker_sim"] = "gated: WavLM-large weights not in local HF cache"
    status["utmos"] = "gated: needs a lightning UTMOS checkpoint (tools/utmos)"
    return status


def main() -> None:
    set_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default="config/SimWhisperCodec.yaml")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--allow_random", action="store_true",
                   help="random weights from --config_path (pipeline smoke runs)")
    p.add_argument("--input_dir", default=None)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--overlap_seconds", type=int, default=10)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--mode", default="fast", choices=["fast", "fast-int8", "fast-int8-full", "parity"])
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--device", default=None)
    p.add_argument("--codebook_stats", action="store_true",
                   help="also report code usage/entropy diagnostics")
    p.add_argument("--full-report", dest="full_report", action="store_true",
                   help="append objective quality metrics + gated-metric status")
    p.add_argument("--asr_model", default=None,
                   help="HF name/dir for the WER CTC tower (hubert-large-ls960-ft "
                        "layout; tools/make_synthetic_tower_weights.py generates a "
                        "shape-true synthetic dir)")
    p.add_argument("--utmos_checkpoint", default=None,
                   help="utmos22_strong lightning .ckpt (or synthetic twin)")
    p.add_argument("--ecapa_checkpoint", default=None,
                   help="wavlm_large_finetune.pth (or synthetic twin)")
    p.add_argument("--trans_dir", default=None,
                   help="dir of LibriSpeech *.trans.txt ground truth for WER")
    p.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="generate an N-utterance synthetic flac corpus as input")
    p.add_argument("--synthetic_dur", default="1,4", metavar="LO,HI",
                   help="synthetic utterance duration range in seconds "
                        "(serving-scale artifacts want ~28,30 so each file "
                        "fills its 30 s chunk instead of padding 10x)")
    p.add_argument("--wire", default="float32", choices=["float32", "pcm16"],
                   help="host<->device waveform transfer format; pcm16 halves "
                        "transfer bytes (bit-exact for 16-bit sources at the "
                        "target rate — the corpus formats here)")
    p.add_argument("--report_json", default=None,
                   help="also write the consolidated report to this path")
    args = p.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.synthetic:
        if not args.output_dir:
            p.error("--synthetic requires --output_dir")
        args.input_dir = str(Path(args.output_dir) / "synthetic_corpus")
        lo, hi = (float(x) for x in args.synthetic_dur.split(","))
        make_synthetic_corpus(Path(args.input_dir), args.synthetic,
                              dur_range=(lo, hi))
    elif not args.input_dir:
        p.error("--input_dir is required (or use --synthetic N)")
    if args.full_report and not args.output_dir:
        p.error("--full-report requires --output_dir")

    if args.allow_random:
        import jax as _jax

        from simwhisper_codec_tpu.config import load_config
        from simwhisper_codec_tpu.models.codec import init_params

        cfg = load_config(args.config_path)
        codec = AudioCodec(cfg, init_params(_jax.random.PRNGKey(0), cfg),
                           batch_size=args.batch_size, mode=args.mode,
                           data_parallel=args.data_parallel, wire=args.wire)
    else:
        if not args.checkpoint_path:
            p.error("--checkpoint_path is required (or use --allow_random)")
        codec = AudioCodec.load_from_checkpoint(
            args.config_path, args.checkpoint_path,
            batch_size=args.batch_size, mode=args.mode,
            data_parallel=args.data_parallel, wire=args.wire,
        )
    recon_dir = (str(Path(args.output_dir) / "reconstructed")
                 if args.full_report else args.output_dir)
    stats = evaluate_corpus(
        codec, args.input_dir, recon_dir,
        batch_size=args.batch_size, overlap_seconds=args.overlap_seconds, limit=args.limit,
    )
    if args.codebook_stats:
        from simwhisper_codec_tpu.eval.codebook import corpus_codebook_stats
        from simwhisper_codec_tpu.utils.audio_io import find_audio_files

        paths = find_audio_files(args.input_dir)
        if args.limit:
            paths = paths[: args.limit]
        stats["codebook"] = corpus_codebook_stats(
            codec, paths, overlap_seconds=args.overlap_seconds, batch_size=args.batch_size
        )
    if args.full_report:
        stats["quality"] = quality_report(args.input_dir, recon_dir, args.limit)
        if args.asr_model or args.utmos_checkpoint or args.ecapa_checkpoint:
            stats["towers"] = tower_metrics(
                args.input_dir, recon_dir, asr_model=args.asr_model,
                utmos_ckpt=args.utmos_checkpoint, ecapa_ckpt=args.ecapa_checkpoint,
                trans_dir=args.trans_dir, limit=args.limit,
            )
        status = gated_metric_status()
        if args.asr_model:
            status["wer"] = f"ran ({args.asr_model})"
        if args.utmos_checkpoint:
            status["utmos"] = f"ran ({args.utmos_checkpoint})"
        if args.ecapa_checkpoint:
            status["speaker_sim"] = f"ran ({args.ecapa_checkpoint})"
        stats["gated_metrics"] = status
        stats["mode"] = args.mode
        stats["weights"] = "random" if args.allow_random else args.checkpoint_path
    out = json.dumps(stats, indent=2)
    print(out)
    if args.report_json:
        Path(args.report_json).write_text(out)


if __name__ == "__main__":
    main()
