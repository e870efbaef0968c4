"""Data-parallel corpus evaluation: directory -> reconstructions + RTF report.

The new capability the reference lacks (its ``inference.py`` is single-GPU,
ad-hoc batches): length-bucketed fixed-shape batches sharded over a
``Mesh('data')``, with per-stage timing and an aggregate real-time-factor
report.  File discovery is process-sharded for multi-host running.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from simwhisper_codec_tpu.models.codec import AudioCodec
from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio, save_audio
from simwhisper_codec_tpu.utils.data import length_bucket_batches, shard_files_by_process

logger = logging.getLogger(__name__)


def evaluate_corpus(
    codec: AudioCodec,
    input_dir: str,
    output_dir: Optional[str] = None,
    batch_size: int = 8,
    overlap_seconds: int = 10,
    limit: Optional[int] = None,
) -> dict:
    """Encode+decode every file; returns throughput stats (and writes WAVs)."""
    paths = shard_files_by_process(
        find_audio_files(input_dir), jax.process_index(), jax.process_count()
    )
    if limit:
        paths = paths[:limit]
    if output_dir:
        Path(output_dir).mkdir(parents=True, exist_ok=True)

    wavs = [load_audio(p, target_sample_rate=codec.input_sample_rate) for p in paths]
    lengths = [len(w) for w in wavs]
    batches = length_bucket_batches(lengths, batch_size)

    total_audio_seconds = sum(lengths) / codec.input_sample_rate
    codes_total = 0
    t0 = time.perf_counter()
    for batch_idx in batches:
        batch_wavs = [wavs[i] for i in batch_idx]
        enc = codec.encode(batch_wavs, overlap_seconds=overlap_seconds)
        dec = codec.decode(enc["codes_list"], overlap_seconds=overlap_seconds)
        codes_total += sum(c.shape[-1] for c in enc["codes_list"])
        if output_dir:
            for i, syn in zip(batch_idx, dec["syn_wav_list"]):
                out_path = Path(output_dir) / (Path(paths[i]).stem + ".wav")
                save_audio(out_path, np.asarray(syn), codec.output_sample_rate)
    elapsed = time.perf_counter() - t0

    stats = {
        "files": len(paths),
        "audio_seconds": round(total_audio_seconds, 2),
        "wall_seconds": round(elapsed, 2),
        "x_realtime": round(total_audio_seconds / max(elapsed, 1e-9), 2),
        "bitrate_bps": round(codes_total * 8 * np.log2(2016) / max(total_audio_seconds, 1e-9), 1),
        "num_batches": len(batches),
    }
    logger.info("corpus eval: %s", json.dumps(stats))
    return stats
