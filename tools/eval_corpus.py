"""Corpus throughput/reconstruction CLI: directory -> WAVs + RTF/bitrate stats.

Drives ``eval/corpus.py`` (length-bucketed fixed-shape batches, optional
data-parallel mesh, process-sharded file lists).  Combine with
``tools/base_eval/evaluate_model.py`` for objective quality metrics over the
produced reconstructions.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from simwhisper_codec_tpu.eval.corpus import evaluate_corpus
from simwhisper_codec_tpu.models.codec import AudioCodec
from simwhisper_codec_tpu.utils.audio_io import set_logging


def main() -> None:
    set_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", default="config/SimWhisperCodec.yaml")
    p.add_argument("--checkpoint_path", required=True)
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--overlap_seconds", type=int, default=10)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--mode", default="fast", choices=["fast", "fast-int8", "parity"])
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--device", default=None)
    p.add_argument("--codebook_stats", action="store_true",
                   help="also report code usage/entropy diagnostics")
    args = p.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    codec = AudioCodec.load_from_checkpoint(
        args.config_path, args.checkpoint_path,
        batch_size=args.batch_size, mode=args.mode, data_parallel=args.data_parallel,
    )
    stats = evaluate_corpus(
        codec, args.input_dir, args.output_dir,
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
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
