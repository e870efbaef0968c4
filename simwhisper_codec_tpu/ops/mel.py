"""Whisper-style log-mel frontend, fully in-graph on TPU.

The reference computes mels on the host (CPU numpy/torch STFT) and round-trips
waveforms GPU->CPU->GPU per chunk (``audiocodec/model.py:180-187``,
``audiocodec/nn/feature_extractor.py:86-112``).  Here the whole frontend is a
fixed-shape jitted computation:

 - framing = 5 static strided slices + concat (hop 160 divides into 80-sample
   subchunks; no gather, no dynamic shapes);
 - the 400-point rFFT is a dense DFT matmul on the MXU (two (400, 201)
   cos/sin matrices with the Hann window folded in) — deterministic, tiny
   (~1 GFLOP per 30 s chunk), and fusable with the mel projection matmul;
 - log10 / max-8.0 floor / (x+4)/4 normalization matches
   ``feature_extractor.py:98-109`` including the dropped last STFT frame and
   the per-sample global max coupling.

Numerics parity: matches the reference torch path to ~1e-5 (the reference
itself documents 1e-5 torch-vs-numpy tolerance, feature_extractor.py:86-90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.config import FeatureExtractorConfig


def hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    mels = 3.0 * freq / 200.0
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    safe = np.maximum(freq, 1e-12)  # avoid log(0) in the unselected branch
    return np.where(freq >= min_log_hz, min_log_mel + np.log(safe / min_log_hz) * logstep, mels)


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freq = 200.0 * mels / 3.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, 1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)


def slaney_mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
) -> np.ndarray:
    """Triangular slaney-scale, slaney-normalized filterbank.

    Returns (num_frequency_bins, num_mel_filters) float64, matching the output
    of the HF ``mel_filter_bank(..., norm='slaney', mel_scale='slaney')`` the
    reference uses (feature_extractor.py:50-58).
    """
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = hz_to_mel_slaney(np.array(min_frequency))
    mel_max = hz_to_mel_slaney(np.array(max_frequency))
    mel_pts = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    f_diff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # (F, M+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (hz_pts[2 : num_mel_filters + 2] - hz_pts[:num_mel_filters])
    return fb * enorm[None, :]


class MelConstants(NamedTuple):
    """Precomputed host-side constants for the in-graph frontend."""

    dft_cos: np.ndarray  # (n_fft, n_freq) windowed real DFT basis, f32
    dft_sin: np.ndarray  # (n_fft, n_freq)
    mel_fb: np.ndarray   # (n_freq, n_mels) f32
    n_fft: int
    hop: int
    n_samples: int
    n_frames: int        # output frames (last STFT frame dropped)
    n_mels: int


def make_constants(cfg: FeatureExtractorConfig) -> MelConstants:
    n_fft, hop = cfg.n_fft, cfg.hop_length
    n_freq = n_fft // 2 + 1
    max_freq = cfg.max_frequency if cfg.max_frequency is not None else cfg.sampling_rate / 2
    fb = slaney_mel_filter_bank(n_freq, cfg.feature_size, 0.0, max_freq, cfg.sampling_rate)

    # periodic Hann, matching torch.hann_window(n_fft) (feature_extractor.py:92)
    n = np.arange(n_fft, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))

    k = np.arange(n_freq, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, n_freq)
    dft_cos = (np.cos(phase) * window[:, None]).astype(np.float32)
    dft_sin = (-np.sin(phase) * window[:, None]).astype(np.float32)

    return MelConstants(
        dft_cos=dft_cos,
        dft_sin=dft_sin,
        mel_fb=fb.astype(np.float32),
        n_fft=n_fft,
        hop=hop,
        n_samples=cfg.n_samples,
        n_frames=cfg.n_samples // hop,
        n_mels=cfg.feature_size,
    )


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, n_frames: int) -> jnp.ndarray:
    """(B, S) -> (B, n_frames, n_fft) centered frames with reflect padding.

    torch.stft(center=True) semantics: pad n_fft//2 on both sides (reflect),
    frame t covers padded[t*hop : t*hop + n_fft].  With g = gcd(n_fft, hop)
    subchunks the frame extraction becomes static strided slices — XLA copies,
    no gather.
    """
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    g = int(np.gcd(n_fft, hop))
    per_frame = n_fft // g
    step = hop // g
    total = x.shape[1] // g
    chunks = x[:, : total * g].reshape(x.shape[0], total, g)
    parts = [
        jax.lax.slice_in_dim(chunks, k, k + step * (n_frames - 1) + 1, step, axis=1)
        for k in range(per_frame)
    ]
    return jnp.concatenate(parts, axis=-1)  # (B, n_frames, n_fft)


def log_mel(
    consts: MelConstants,
    wav: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, n_samples) f32 waveform -> (B, n_frames, n_mels) normalized log-mel.

    The waveform must already be zero-padded/truncated to exactly ``n_samples``
    (the reference pads every utterance to 30 s, feature_extractor.py:207-214).
    """
    frames = frame_signal(wav.astype(jnp.float32), consts.n_fft, consts.hop, consts.n_frames)
    re = jnp.matmul(frames, jnp.asarray(consts.dft_cos), precision=precision)
    im = jnp.matmul(frames, jnp.asarray(consts.dft_sin), precision=precision)
    power = re * re + im * im  # (B, T, F)
    mel = jnp.matmul(power, jnp.asarray(consts.mel_fb), precision=precision)  # (B, T, M)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)  # per-sample global max
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_dithered(
    consts: MelConstants,
    wav: jnp.ndarray,
    key,
    dither: float,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """log_mel with additive Gaussian dither (feature_extractor.py:94-95)."""
    if dither != 0.0:
        wav = wav + dither * jax.random.normal(key, wav.shape, wav.dtype)
    return log_mel(consts, wav, precision=precision)


def zero_mean_unit_var_norm(
    wav: jnp.ndarray, lengths: jnp.ndarray, padding_value: float = 0.0
) -> jnp.ndarray:
    """Per-sample zero-mean/unit-variance over the valid region, padding reset
    to ``padding_value`` (feature_extractor.py:114-134)."""
    t = wav.shape[-1]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(wav.dtype)
    denom = jnp.maximum(lengths.astype(wav.dtype), 1.0)[:, None]
    mean = jnp.sum(wav * mask, axis=-1, keepdims=True) / denom
    var = jnp.sum(jnp.square(wav - mean) * mask, axis=-1, keepdims=True) / denom
    normed = (wav - mean) / jnp.sqrt(var + 1e-7)
    return jnp.where(mask > 0, normed, padding_value)


def mel_lengths(sample_lengths: jnp.ndarray, hop: int, max_frames: int) -> jnp.ndarray:
    """Valid mel frame count per sample: ceil(len/hop) capped at max_frames.

    Matches the strided attention-mask length the reference derives
    (feature_extractor.py:237, model.py:191).
    """
    return jnp.minimum((sample_lengths + hop - 1) // hop, max_frames)
