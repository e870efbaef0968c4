"""Speaker similarity: cosine similarity of speaker embeddings over paired dirs.

Mirrors ``tools/speaker/spk_sim_cal.py:13-75`` + ``extract_spk_emb.py:38-94``.
The reference embeds with ECAPA-TDNN on WavLM-large features (s3prl/fairseq
upstream, downloaded weights).  In a zero-egress environment the model-backed
path gates cleanly; the pairing/cosine logic and embedding cache layout are
native and work with any embedding extractor exposing
``embed(wav, sample_rate) -> np.ndarray``.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def load_extractor(checkpoint: str = None, feat_type: str = None):
    """ECAPA-TDNN extractor (eval/speaker.py), reference-matching.

    With ``checkpoint`` = the published ``wavlm_large_finetune.pth`` (torch),
    loads the full WavLM-large + ECAPA scorer natively in JAX (the reference
    pipeline behind the published 0.83 SIM, ``extract_spk_emb.py:14-25``) —
    no s3prl/fairseq needed.  Without a checkpoint, a random-weight fbank
    variant runs for pipeline smoke tests.
    """
    from simwhisper_codec_tpu.eval.speaker import SpeakerEmbedder

    if checkpoint:
        return SpeakerEmbedder.from_checkpoint(checkpoint)
    return SpeakerEmbedder(feat_type=feat_type or "fbank")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--original_dir", type=str, required=True)
    parser.add_argument("--synthesized_dir", type=str, required=True)
    parser.add_argument("--orig_emb_dir", type=str, default=None,
                        help="dir of precomputed <utt>.npy embeddings for originals")
    parser.add_argument("--synth_emb_dir", type=str, default=None)
    parser.add_argument("--ecapa_checkpoint", type=str, default=None,
                        help="wavlm_large_finetune.pth (torch) for the reference "
                             "WavLM-large ECAPA scorer")
    parser.add_argument("--device", type=str, default=None,
                        help="jax platform override, e.g. cpu (the axon TPU "
                             "plugin ignores JAX_PLATFORMS)")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.orig_emb_dir and args.synth_emb_dir:
        sims = []
        for orig_npy in sorted(Path(args.orig_emb_dir).glob("*.npy")):
            synth_npy = Path(args.synth_emb_dir) / orig_npy.name
            if synth_npy.exists():
                sims.append(cosine(np.load(orig_npy).reshape(-1), np.load(synth_npy).reshape(-1)))
        print(f"SIM mean over {len(sims)} pairs: {np.mean(sims):.4f}")
        return

    extractor = load_extractor(args.ecapa_checkpoint)
    sims = []
    for o, s in zip(find_audio_files(args.original_dir), find_audio_files(args.synthesized_dir)):
        eo = extractor.embed(load_audio(o, 16000), 16000)
        es = extractor.embed(load_audio(s, 16000), 16000)
        sims.append(cosine(eo, es))
    print(f"SIM mean over {len(sims)} pairs: {np.mean(sims):.4f}")


if __name__ == "__main__":
    main()
