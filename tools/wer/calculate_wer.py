"""WER evaluation: transcribe reconstructed + original audio, report both WERs.

Mirrors ``tools/wer/calculate_wer.py:428-502``: collects ``*.trans.txt``
references (LibriSpeech layout), greedy-decodes each WAV with a HuBERT CTC
ASR, normalizes, and aggregates WER with the DP edit-distance Calculator.

The whole pipeline is native JAX — the HuBERT-CTC forward runs on
``models/ssl.py`` with greedy decode in ``eval/wer.py``; only the cached HF
weight files are read (zero-egress gate, mirroring the reference's download).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.eval.wer import Calculator, CTCTranscriber, have_asr
from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio


def collect_transcripts(root: str) -> dict:
    """Read LibriSpeech-style ``*.trans.txt``: lines of '<utt_id> <text>'."""
    out = {}
    for trans in Path(root).rglob("*.trans.txt"):
        for line in trans.read_text().splitlines():
            parts = line.strip().split(" ", 1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--original_dir", type=str, required=True,
                        help="LibriSpeech-style dir with wavs + *.trans.txt")
    parser.add_argument("--synthesized_dir", type=str, required=True)
    parser.add_argument("--model", type=str, default="facebook/hubert-large-ls960-ft")
    parser.add_argument("--device", type=str, default=None,
                        help="jax platform override, e.g. cpu (the axon TPU "
                             "plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if not have_asr(args.model):
        print(
            f"ASR model {args.model} is not in the local HF cache and this "
            "environment has no network egress; WER evaluation requires the "
            "cached model. The edit-distance/normalization pipeline is "
            "available as simwhisper_codec_tpu.eval.wer."
        )
        sys.exit(2)

    transcripts = collect_transcripts(args.original_dir)
    asr = CTCTranscriber(args.model, device=args.device)

    # one directory walk, stem -> path (first match wins, like sorted zip in
    # the reference harness); rescanning per utterance would be O(N^2) stats
    orig_by_stem = {}
    for p in find_audio_files(args.original_dir):
        orig_by_stem.setdefault(Path(p).stem, p)

    calc_rec, calc_orig = Calculator(), Calculator()
    for synth_path in find_audio_files(args.synthesized_dir):
        utt_id = Path(synth_path).stem
        if utt_id not in transcripts:
            continue
        ref_text = transcripts[utt_id]
        hyp_rec = asr.transcribe(load_audio(synth_path, 16000), 16000)
        # reference argument order: (transcription, ground truth) — the WER
        # denominator is the transcription token count (calculate_wer.py:339-343)
        calc_rec.calculate(utt_id, hyp_rec, ref_text)

        orig_path = orig_by_stem.get(utt_id)
        if orig_path is not None:
            hyp_orig = asr.transcribe(load_audio(orig_path, 16000), 16000)
            calc_orig.calculate(utt_id, hyp_orig, ref_text)

    print("reconstructed:", calc_rec.report())
    print("original:     ", calc_orig.report())
    print(f"delta WER: {100*(calc_rec.wer - calc_orig.wer):.2f}%")


if __name__ == "__main__":
    main()
