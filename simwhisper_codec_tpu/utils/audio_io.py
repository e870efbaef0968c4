"""Host-side audio I/O: load/resample/save, file discovery, logging setup.

Reference: ``utils/helpers.py`` — load_audio (:77-93), save_audio (:95-103),
find_audio_files (:105-111), set_logging (:60-75).

The reference uses torchaudio; this framework keeps I/O torch-free on the
host: stdlib ``wave`` for WAV PCM, the in-repo decoder for FLAC
(utils/flac.py), the system libmpg123 for MP3 (utils/mp3.py), and a
numpy implementation of torchaudio's default resampler (windowed-sinc
polyphase, ``sinc_interp_hann``, lowpass_filter_width=6, rolloff=0.99 —
``torchaudio.functional.resample`` as called by ``utils/helpers.py:86-87``),
so resampled inputs produce the same code indices as the reference pipeline.
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


def sinc_hann_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6, rolloff: float = 0.99,
                     dtype=np.float64) -> tuple:
    """torchaudio ``_get_sinc_resample_kernel`` (sinc_interp_hann defaults).

    Frequencies must already be reduced by their gcd.  Returns
    ``(kernels (new_freq, 2*width + orig_freq), width)``: one windowed-sinc
    filter per output phase, sampled on the input grid, scaled by
    ``base_freq / orig_freq``.
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(np.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=dtype)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=dtype)[:, None] / new_freq + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t_pi = t * np.pi
    with np.errstate(invalid="ignore", divide="ignore"):
        kernels = np.where(t_pi == 0, 1.0, np.sin(t_pi) / t_pi)
    kernels *= window * (base_freq / orig_freq)
    return kernels, width


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Windowed-sinc polyphase resampling, torchaudio-equivalent.

    Implements ``torchaudio.functional.resample``'s default
    ``sinc_interp_hann`` path (the reference's load path,
    ``utils/helpers.py:86-87``): per-phase hann-windowed sinc filters applied
    at stride ``orig_freq`` and interleaved, output trimmed to
    ``ceil(len * new / orig)``.  Pinned against the same kernel applied
    through scipy's independent ``upfirdn`` machinery in
    ``tests/test_resample.py`` (and against torchaudio itself when that
    package is importable).
    """
    if orig_sr == target_sr:
        return wav
    from math import gcd

    g = gcd(int(orig_sr), int(target_sr))
    orig_freq, new_freq = int(orig_sr) // g, int(target_sr) // g
    length = wav.shape[-1]
    kernels, width = sinc_hann_kernel(orig_freq, new_freq)

    x = np.pad(np.asarray(wav, np.float64), (width, width + orig_freq))
    # frames of the padded signal at stride orig_freq, one kernel-width each:
    # output[phase, frame] = kernels[phase] . x[frame*orig : frame*orig + K]
    K = kernels.shape[1]
    n_frames = (x.shape[-1] - K) // orig_freq + 1
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, K), strides=(x.strides[-1] * orig_freq, x.strides[-1]),
    )
    out = (frames @ kernels.T).reshape(-1)  # interleave phases
    target_length = -(-length * new_freq // orig_freq)  # ceil
    return out[:target_length].astype(np.float32)


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
    """Load audio -> mono float32 at target rate (helpers.py:77-93 semantics).

    WAV via stdlib ``wave``; FLAC via the in-repo decoder (utils/flac.py);
    MP3 via the system libmpg123 (utils/mp3.py) — the reference's full
    extension surface (helpers.py:105-111) with zero pip dependencies;
    soundfile is only a last resort for anything else.
    """
    path = str(path)
    data: Optional[np.ndarray] = None
    sr = None
    if path.lower().endswith(".wav"):
        try:
            data, sr = _load_wav_stdlib(path)
        except Exception:
            data = None
    native_err: Optional[Exception] = None
    if data is None and path.lower().endswith(".flac"):
        from simwhisper_codec_tpu.utils.flac import read_flac

        try:
            data, sr = read_flac(path)
        except Exception as e:  # unusual file: let the soundfile fallback try
            native_err = e
            data = None
    if data is None and path.lower().endswith(".mp3"):
        from simwhisper_codec_tpu.utils import mp3

        if mp3.have_mpg123():
            try:
                data, sr = mp3.read_mp3(path)
            except Exception as e:
                native_err = e
                data = None
    if data is None:
        try:
            import soundfile as sf

            data, sr = sf.read(path, dtype="float32")
        except ImportError as e:
            if native_err is not None:  # surface the REAL decode error
                raise RuntimeError(
                    f"cannot decode {path}: native decoder failed "
                    f"({native_err}) and soundfile is unavailable"
                ) from native_err
            raise RuntimeError(
                f"cannot decode {path}: no native decoder for this format and "
                "soundfile is unavailable"
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
    n = sr = None
    if path.lower().endswith(".wav"):
        try:
            with wave.open(path, "rb") as f:
                n, sr = f.getnframes(), f.getframerate()
        except Exception:
            n = None
    elif path.lower().endswith(".flac"):
        try:
            from simwhisper_codec_tpu.utils.flac import probe_flac

            info = probe_flac(path)
            if info["total_samples"]:
                n, sr = info["total_samples"], info["sample_rate"]
        except Exception:
            n = None
    elif path.lower().endswith(".mp3"):
        try:
            from simwhisper_codec_tpu.utils import mp3

            if mp3.have_mpg123():
                n, sr, _ch = mp3.probe_mp3(path)
        except Exception:
            n = None
    if n is not None:
        if sr == target_sample_rate:
            return n
        from math import gcd

        g = gcd(sr, target_sample_rate)
        # matches the resampler's ceil output length
        return -(-n * (target_sample_rate // g) // (sr // g))
    return len(load_audio(path, target_sample_rate))


def save_audio(path: str, wav: np.ndarray, sample_rate: int = 16000) -> None:
    """Save 16-bit PCM WAV (helpers.py:95-103: PCM_S, bits 16).

    int16 input is written as-is (the codec's ``wire="pcm16"`` path already
    quantized on device with this exact formula)."""
    wav = np.asarray(wav)
    if wav.dtype == np.int16:
        pcm = wav.reshape(-1).astype("<i2")
    else:
        wav = wav.astype(np.float32).reshape(-1)
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
