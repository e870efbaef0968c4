"""UTMOS MOS prediction over a directory of WAVs.

Mirrors ``tools/utmos/calculate_utmos.py:1-27`` (reference), with the model
itself implemented natively in JAX (``simwhisper_codec_tpu/eval/utmos.py``)
instead of fairseq/pytorch-lightning.  Only the published
``utmos22_strong`` checkpoint file is required — ``torch.load`` reads it,
the weights convert into the JAX tower, scoring runs on the accelerator.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def have_utmos(ckpt_path: str) -> bool:
    """The checkpoint is the only hard gate (zero-egress: cannot download)."""
    if not Path(ckpt_path).exists():
        return False
    try:
        import torch  # noqa: F401  (reads the lightning pickle)

        return True
    except ImportError:
        return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default="./weights/utmos22_strong.ckpt")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--device", type=str, default=None,
                        help="jax platform override, e.g. cpu (the axon TPU "
                             "plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if not have_utmos(args.ckpt):
        print(
            "UTMOS checkpoint not found (zero-egress: cannot auto-download). "
            f"Place the utmos22_strong lightning .ckpt at {args.ckpt}; the "
            "model itself runs natively in JAX (no fairseq needed)."
        )
        sys.exit(2)

    import numpy as np

    from simwhisper_codec_tpu.eval.utmos import UTMOSScorer
    from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio

    scorer = UTMOSScorer(args.ckpt)
    scores = []
    for path in find_audio_files(args.input_dir):
        try:
            wav = load_audio(path, target_sample_rate=args.sample_rate)
            scores.append(scorer.score(wav, 16000))
        except Exception as e:  # per-file resilience (reference eval-loop semantics)
            print(f"skipping {path}: {e}")
    print(f"UTMOS mean over {len(scores)} files: {np.mean(scores):.3f}")


if __name__ == "__main__":
    main()
