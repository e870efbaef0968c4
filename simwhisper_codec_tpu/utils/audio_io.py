"""Host-side audio I/O: load/resample/save, file discovery, logging setup.

Reference: ``utils/helpers.py`` — load_audio (:77-93), save_audio (:95-103),
find_audio_files (:105-111), set_logging (:60-75).

The reference uses torchaudio; this framework keeps I/O torch-free on the
host: stdlib ``wave`` for WAV PCM, soundfile if available for flac/mp3, and a
polyphase kaiser-windowed resampler (scipy) matching torchaudio's default
``sinc_interp_hann``-class quality.
"""

from __future__ import annotations

import logging
import os
import wave
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

AUDIO_EXTENSIONS = (".flac", ".mp3", ".wav")


def set_logging(level=logging.INFO) -> None:
    """RANK-tagged logging format (helpers.py:60-75)."""
    rank = int(os.environ.get("RANK", 0))
    logging.basicConfig(
        level=level,
        format=f"%(asctime)s [RANK {rank}] (%(module)s:%(lineno)d) %(levelname)s : %(message)s",
        force=True,
    )


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (host-side; replaces torchaudio.functional.resample)."""
    if orig_sr == target_sr:
        return wav
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(wav, target_sr // g, orig_sr // g).astype(np.float32)


def _load_wav_stdlib(path: str) -> tuple:
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch)
    return data, sr


def load_audio(path: str, target_sample_rate: int = 16000) -> np.ndarray:
    """Load audio -> mono float32 at target rate (helpers.py:77-93 semantics)."""
    path = str(path)
    data: Optional[np.ndarray] = None
    sr = None
    if path.lower().endswith(".wav"):
        try:
            data, sr = _load_wav_stdlib(path)
        except Exception:
            data = None
    if data is None:
        try:
            import soundfile as sf

            data, sr = sf.read(path, dtype="float32")
        except ImportError as e:
            raise RuntimeError(
                f"cannot decode {path}: stdlib wave failed and soundfile is unavailable"
            ) from e
    if data.ndim > 1:
        data = data.mean(axis=1)  # mono mix, matching torch.mean(dim=0)
    return resample(data.astype(np.float32), sr, target_sample_rate)


def probe_audio_length(path: str, target_sample_rate: int = 16000) -> int:
    """Length (samples at target rate) without decoding when possible.

    WAV headers carry frame count + rate, so corpus-scale length bucketing
    does not need the whole corpus resident in RAM (reference loads per file,
    ``evaluate_model.py:128-141``); other formats fall back to a full decode.
    """
    path = str(path)
    if path.lower().endswith(".wav"):
        try:
            with wave.open(path, "rb") as f:
                n, sr = f.getnframes(), f.getframerate()
            if sr == target_sample_rate:
                return n
            from math import gcd

            g = gcd(sr, target_sample_rate)
            # matches scipy.signal.resample_poly's output length
            return -(-n * (target_sample_rate // g) // (sr // g))
        except Exception:
            pass
    return len(load_audio(path, target_sample_rate))


def save_audio(path: str, wav: np.ndarray, sample_rate: int = 16000) -> None:
    """Save 16-bit PCM WAV (helpers.py:95-103: PCM_S, bits 16)."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    pcm = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def find_audio_files(input_dir: str) -> List[str]:
    """Recursively find flac/mp3/wav files, sorted (helpers.py:105-111)."""
    out: List[str] = []
    for root, _dirs, files in os.walk(input_dir):
        for name in files:
            if name.lower().endswith(AUDIO_EXTENSIONS):
                out.append(os.path.join(root, name))
    return sorted(out)
