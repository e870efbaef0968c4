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
from simwhisper_codec_tpu.ops.fsq import bits_per_frame
from simwhisper_codec_tpu.utils.audio_io import (
    find_audio_files,
    probe_audio_length,
    save_audio,
)
from simwhisper_codec_tpu.utils.native_loader import load_audio_batch
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
    """Encode+decode every file; returns throughput stats (and writes WAVs).

    Per-file failures (corrupt/undecodable audio) are logged and skipped, as
    in the reference eval loops (``evaluate_model.py:128-141``,
    ``extract_code.py:186-215``); only one batch of audio is resident at a
    time (lengths come from a header probe).
    """
    paths = shard_files_by_process(
        find_audio_files(input_dir), jax.process_index(), jax.process_count()
    )
    if limit:
        paths = paths[:limit]
    if output_dir:
        Path(output_dir).mkdir(parents=True, exist_ok=True)

    lengths, good_paths, errors = [], [], []
    for p in paths:
        try:
            lengths.append(probe_audio_length(p, codec.input_sample_rate))
            good_paths.append(p)
        except Exception as e:  # corrupt header/file: skip, keep evaluating
            logger.warning("skipping unreadable file %s: %s", p, e)
            errors.append(str(p))
    paths = good_paths
    batches = length_bucket_batches(lengths, batch_size)

    total_audio_seconds = 0.0
    codes_total = 0
    files_done = 0
    warmup_seconds = None  # first batch = program compiles; split out so the
    # steady-state RTF is meaningful on small corpora (BENCH covers peak)
    warmup_audio_seconds = 0.0  # the first batch's audio must leave the
    # steady numerator too, or steady RTF overstates on small corpora

    # double-buffered input + async writeback: the host-side FLAC decode and
    # WAV writes overlap the tunnel/device time of the in-flight batch (the
    # loop body mostly *waits* on transfers, so even a 1-core host hides
    # most of its decode cost here)
    from concurrent.futures import ThreadPoolExecutor

    def _load(batch_idx):
        # multithreaded C++ decode for wav/flac, Python for the rest; per-file
        # failures come back as None (skip, keep evaluating — the reference's
        # per-file try/except semantics, evaluate_model.py:128-141)
        return load_audio_batch(
            [paths[i] for i in batch_idx],
            target_sample_rate=codec.input_sample_rate, on_error="none",
        )

    pool = ThreadPoolExecutor(max_workers=2)
    write_futures = []
    pending = pool.submit(_load, batches[0]) if batches else None
    t0 = time.perf_counter()
    for bnum, batch_idx in enumerate(batches):
        loaded = pending.result()
        pending = (pool.submit(_load, batches[bnum + 1])
                   if bnum + 1 < len(batches) else None)
        batch_wavs, kept_idx = [], []
        for i, wav in zip(batch_idx, loaded):
            if wav is None:  # decode failure mid-corpus: skip the file
                logger.warning("skipping undecodable file %s", paths[i])
                errors.append(str(paths[i]))
            else:
                batch_wavs.append(wav)
                kept_idx.append(i)
        if not batch_wavs:
            continue
        enc = codec.encode(batch_wavs, overlap_seconds=overlap_seconds)
        dec = codec.decode(enc["codes_list"], overlap_seconds=overlap_seconds)
        total_audio_seconds += sum(len(w) for w in batch_wavs) / codec.input_sample_rate
        codes_total += sum(c.shape[-1] for c in enc["codes_list"])
        files_done += len(batch_wavs)
        if warmup_seconds is None:
            warmup_seconds = time.perf_counter() - t0
            warmup_audio_seconds = total_audio_seconds
        if output_dir:
            def _write(pairs=list(zip(kept_idx, dec["syn_wav_list"]))):
                for i, syn in pairs:
                    out_path = Path(output_dir) / (Path(paths[i]).stem + ".wav")
                    save_audio(out_path, np.asarray(syn), codec.output_sample_rate)
            # bounded backlog: before queueing a new write, wait for all but
            # the most recent one — at most two batches of decoded audio are
            # pinned by pending writes, even when the disk is slower than the
            # device (otherwise the backlog grows without bound)
            while len(write_futures) > 1:
                write_futures.pop(0).result()
            write_futures.append(pool.submit(_write))
    for f in write_futures:
        f.result()  # writes are part of the pipeline: surface errors, then stop the clock
    pool.shutdown(wait=True)
    elapsed = time.perf_counter() - t0

    frame_bits = bits_per_frame(codec.cfg.quantizer)  # 8 groups x log2(8*7*6*6) for the published config
    steady = elapsed - (warmup_seconds or 0.0)
    stats = {
        "files": files_done,
        "skipped": len(errors),
        "audio_seconds": round(total_audio_seconds, 2),
        "wall_seconds": round(elapsed, 2),
        "x_realtime": round(total_audio_seconds / max(elapsed, 1e-9), 2),
        "warmup_seconds": round(warmup_seconds or 0.0, 2),
        "steady_x_realtime": round(
            (total_audio_seconds - warmup_audio_seconds) / steady, 2
        ) if steady > 0.5 and total_audio_seconds > warmup_audio_seconds else None,
        "bitrate_bps": round(codes_total * frame_bits / max(total_audio_seconds, 1e-9), 1),
        "num_batches": len(batches),
    }
    if errors:
        stats["skipped_files"] = errors
    logger.info("corpus eval: %s", json.dumps(stats))
    return stats
