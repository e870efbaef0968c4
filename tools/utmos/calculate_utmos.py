"""UTMOS MOS prediction over a directory of WAVs.

Mirrors ``tools/utmos/calculate_utmos.py:1-27``.  The reference vendors the
UTMOS model (wav2vec2 SSL + judge-embedding BLSTM), whose checkpoint is
auto-downloaded via fairseq/pytorch-lightning — neither the weights nor
fairseq are available in a zero-egress environment, so this CLI gates cleanly:
it runs when a local UTMOS checkpoint (strong/utmos22) and its deps are
present, and reports exactly what is missing otherwise.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def have_utmos(ckpt_path: str) -> bool:
    if not Path(ckpt_path).exists():
        return False
    try:
        import fairseq  # noqa: F401
        import pytorch_lightning  # noqa: F401

        return True
    except ImportError:
        return False


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default="./weights/utmos22_strong.ckpt")
    parser.add_argument("--sample_rate", type=int, default=16000)
    args = parser.parse_args()

    if not have_utmos(args.ckpt):
        print(
            "UTMOS requires the utmos22_strong checkpoint plus fairseq/"
            "pytorch-lightning, which are unavailable here (zero-egress). "
            f"Place the checkpoint at {args.ckpt} and install the deps to run."
        )
        sys.exit(2)

    # Checkpoint + deps present: run the standard UTMOS scorer.
    import numpy as np
    import torch

    from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from utmos_model import UTMOSScorer  # vendored scorer

    scorer = UTMOSScorer(args.ckpt)
    scores = []
    for path in find_audio_files(args.input_dir):
        wav = load_audio(path, target_sample_rate=args.sample_rate)
        scores.append(scorer.score(torch.from_numpy(wav), args.sample_rate))
    print(f"UTMOS mean over {len(scores)} files: {np.mean(scores):.3f}")


if __name__ == "__main__":
    main()
