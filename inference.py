"""Batch inference CLI: directory of audio -> codes -> reconstructed WAVs.

Mirrors the reference entry point (``/root/reference/inference.py:9-67``):
same flags, same chunked encode/decode round-trip, same output naming
(``<stem>.wav``, 16-bit PCM).  Runs the TPU-native codec; ``--device`` accepts
a JAX platform name (tpu/cpu) instead of a torch device.
"""

import argparse
import logging
import os

import numpy as np

from simwhisper_codec_tpu.models.codec import AudioCodec
from simwhisper_codec_tpu.utils.audio_io import (
    find_audio_files,
    save_audio,
    set_logging,
)
from simwhisper_codec_tpu.utils.native_loader import load_audio_batch


def main() -> None:
    set_logging()

    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, default="./config/SimWhisperCodec.yaml")
    parser.add_argument("--checkpoint_path", type=str, default="./weights/SimWhisperCodec.pt")
    parser.add_argument("--device", type=str, default=None,
                        help="JAX platform override (e.g. cpu); default = ambient platform")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--input_dir", type=str, default="input_wavs")
    parser.add_argument("--output_dir", type=str, default="output_wavs")
    parser.add_argument("--overlap_seconds", type=int, default=10)
    parser.add_argument("--precision", type=str, default="highest", choices=["highest", "default"])
    parser.add_argument("--mode", type=str, default="parity", choices=["parity", "fast", "fast-int8", "fast-int8-full"],
                        help="parity: f32 bit-exact codes; fast: bf16 serving path")
    parser.add_argument("--aot_dir", type=str, default=None,
                        help="AOT executable cache dir (warm session start)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all local devices")
    args = parser.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    generator = AudioCodec.load_from_checkpoint(
        config_path=args.config_path, ckpt_path=args.checkpoint_path,
        batch_size=args.batch_size, precision=args.precision,
        mode=args.mode, data_parallel=args.data_parallel, aot_dir=args.aot_dir,
    )

    audio_paths = find_audio_files(input_dir=args.input_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    logging.info("Processing %d audio files, output to %s", len(audio_paths), args.output_dir)

    batch_size = args.batch_size
    for i in range(0, len(audio_paths), batch_size):
        batch_paths = audio_paths[i : i + batch_size]
        logging.info(
            "Processing batch %d/%d, files: %s",
            i // batch_size + 1, (len(audio_paths) + batch_size - 1) // batch_size, batch_paths,
        )

        # multithreaded C++ decode for wav/flac (native/audioloader.cpp),
        # Python decoders otherwise; failures raise, as the reference's
        # torchaudio.load would (utils/helpers.py:77-93)
        wav_list = load_audio_batch(
            batch_paths, target_sample_rate=generator.input_sample_rate
        )
        logging.info("Loaded %d files, lengths %s", len(wav_list), [len(w) for w in wav_list])

        encode_result = generator.encode(wav_list, overlap_seconds=args.overlap_seconds)
        codes_list = encode_result["codes_list"]
        logging.info("Encoding done, code lengths: %s", [c.shape[-1] for c in codes_list])

        decode_result = generator.decode(codes_list, overlap_seconds=args.overlap_seconds)
        syn_wav_list = decode_result["syn_wav_list"]
        logging.info("Decoding done, waveform lengths: %s", [len(w) for w in syn_wav_list])

        for path, syn_wav in zip(batch_paths, syn_wav_list):
            output_filename = os.path.splitext(os.path.basename(path))[0] + ".wav"
            output_path = os.path.join(args.output_dir, output_filename)
            save_audio(output_path, np.asarray(syn_wav), sample_rate=generator.output_sample_rate)
            logging.info("Saved %s", output_path)

    logging.info("All audio processing completed")


if __name__ == "__main__":
    main()
