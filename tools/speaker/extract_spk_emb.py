"""Extract speaker embeddings for a directory of WAVs, cached as .npy.

Mirrors ``tools/speaker/extract_spk_emb.py:38-94``: walk a directory, embed
each utterance, cache embeddings per utterance (the reference caches ``.pt``;
here ``.npy``), skipping files already embedded.  Uses the native fbank
ECAPA-TDNN (eval/speaker.py) — pass an Orbax checkpoint for trained weights.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--emb_dir", required=True)
    p.add_argument("--ecapa_checkpoint", default=None)
    p.add_argument("--sample_rate", type=int, default=16000)
    args = p.parse_args()

    from spk_sim_cal import load_extractor  # sibling module

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    extractor = load_extractor(args.ecapa_checkpoint)

    out = Path(args.emb_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = 0
    for path in find_audio_files(args.input_dir):
        target = out / (Path(path).stem + ".npy")
        if target.exists():
            continue
        try:
            wav = load_audio(path, target_sample_rate=args.sample_rate)
            emb = extractor.embed(wav, args.sample_rate)
            np.save(target, emb)
            done += 1
        except Exception as e:  # per-file resilience (extract_spk_emb.py pattern)
            print(f"skipping {path}: {e}")
    print(f"embedded {done} new utterances into {out}")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
