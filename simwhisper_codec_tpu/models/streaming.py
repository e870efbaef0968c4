"""Streaming codec sessions: incremental encode/decode over the chunk grid.

New capability (the reference is batch-only): push audio samples in, pull
code frames out as soon as each 30 s window's stride worth of context is
available — the exact same chunk arithmetic as ``AudioCodec.encode/decode``
(stride = 30 s - overlap), so a streamed session produces bit-identical codes
to the offline batch call once flushed.  Latency floor is the stride (the
algorithm's look-ahead), not implementation-imposed.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from simwhisper_codec_tpu.models.codec import AudioCodec


class StreamingEncoder:
    """Push samples with ``feed``; collect codes; ``flush`` at end of stream."""

    def __init__(self, codec: AudioCodec, overlap_seconds: int = 10):
        self.codec = codec
        self.chunk_size = codec.max_audio_seconds * codec.input_sample_rate
        self.duration_size = (codec.max_audio_seconds - overlap_seconds) * codec.input_sample_rate
        self.code_duration = self.duration_size // codec.encoder_downsample_rate
        self._buffer = np.zeros(0, np.float32)
        self._consumed = 0  # samples already emitted as codes (in strides)
        self._total = 0

    def feed(self, samples: np.ndarray) -> Optional[np.ndarray]:
        """Append samples; returns (G, code_duration) codes when a stride
        completes, else None."""
        self._buffer = np.concatenate([self._buffer, np.asarray(samples, np.float32).reshape(-1)])
        self._total += len(np.asarray(samples).reshape(-1))
        if len(self._buffer) >= self.chunk_size:
            return self._emit(self._buffer[: self.chunk_size], full=True)
        return None

    def _emit(self, window: np.ndarray, full: bool) -> np.ndarray:
        length = len(window)
        result = self.codec.inference_tokenize(window[None, :], np.array([length]))
        codes = np.asarray(result["codes"])[:, 0, :]
        code_len = int(np.asarray(result["codes_lengths"])[0])
        keep = min(code_len, self.code_duration) if full else code_len
        out = codes[:, :keep]
        if full:
            self._buffer = self._buffer[self.duration_size :]
        return out

    def flush(self) -> Optional[np.ndarray]:
        """Emit codes for the stream tail, replicating the batch chunk loop
        exactly: the tail is processed as further strided windows, and the
        result is trimmed to total_samples // downsample_rate."""
        total_codes = self._total // self.codec.encoder_downsample_rate
        emitted = (self._total - len(self._buffer)) // self.codec.encoder_downsample_rate
        outs: List[np.ndarray] = []
        while emitted < total_codes and len(self._buffer) > 0:
            window = self._buffer[: self.chunk_size]
            codes = self._emit(window, full=False)
            keep = min(codes.shape[1], self.code_duration, total_codes - emitted)
            outs.append(codes[:, :keep])
            emitted += keep
            self._buffer = self._buffer[self.duration_size :]
        if not outs:
            return None
        return np.concatenate(outs, axis=1)


class StreamingDecoder:
    """Push code frames with ``feed``; collect waveform strides; ``flush``."""

    def __init__(self, codec: AudioCodec, overlap_seconds: int = 10):
        self.codec = codec
        self.chunk_codes = codec.max_audio_seconds * codec.input_sample_rate // codec.encoder_downsample_rate
        self.duration_codes = (
            (codec.max_audio_seconds - overlap_seconds) * codec.input_sample_rate
            // codec.encoder_downsample_rate
        )
        self._buffer = np.zeros((codec.num_groups, 0), np.int32)
        self._total = 0

    def feed(self, codes: np.ndarray) -> Optional[np.ndarray]:
        """Append (G, T) codes; returns a waveform stride when available."""
        self._buffer = np.concatenate([self._buffer, np.asarray(codes, np.int32)], axis=1)
        self._total += np.asarray(codes).shape[1]
        if self._buffer.shape[1] >= self.chunk_codes:
            return self._emit(self._buffer[:, : self.chunk_codes], full=True)
        return None

    def _emit(self, window: np.ndarray, full: bool) -> np.ndarray:
        t = window.shape[1]
        result = self.codec.inference_detokenize(window[:, None, :], np.array([t]), chunk_width=t)
        wav = np.asarray(result["y"])[0]
        keep = self.duration_codes if full else t
        out = wav[: keep * self.codec.decoder_upsample_rate]
        if full:
            self._buffer = self._buffer[:, self.duration_codes :]
        return out

    def flush(self) -> Optional[np.ndarray]:
        """Drain the tail as further strided windows (exact batch semantics)."""
        outs: List[np.ndarray] = []
        while self._buffer.shape[1] > 0:
            window = self._buffer[:, : self.chunk_codes]
            wav = self._emit(window, full=False)
            keep = min(self.duration_codes, window.shape[1])
            outs.append(wav[: keep * self.codec.decoder_upsample_rate])
            self._buffer = self._buffer[:, self.duration_codes :]
        if not outs:
            return None
        return np.concatenate(outs)


def stream_encode(codec: AudioCodec, sample_iter: Iterator[np.ndarray], overlap_seconds: int = 10):
    """Generator: audio sample blocks in -> code blocks out (then a final flush)."""
    enc = StreamingEncoder(codec, overlap_seconds)
    for block in sample_iter:
        out = enc.feed(block)
        if out is not None and out.shape[1]:
            yield out
    tail = enc.flush()
    if tail is not None and tail.shape[1]:
        yield tail
