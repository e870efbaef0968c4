"""SnakeBeta activation with anti-aliased (kaiser-sinc 2x oversampled) wrapper.

Reference: ``audiocodec/nn/activations.py:62-120`` (SnakeBeta),
``audiocodec/nn/alias_free_torch/{filter,resample,act}.py`` (Activation1d =
2x upsample -> snake -> 2x downsample with fixed kaiser-sinc filters).

TPU-first notes: the kaiser-sinc filters are fixed 12-tap buffers computed
host-side in float64 then cast; both resamplers are depthwise convs with a
shared filter, which XLA fuses with the surrounding elementwise snake. The
whole Activation1d is ~4 ops — no Python-level module machinery.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.ops.conv import shared_filter_shifts


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc lowpass taps, matching alias_free_torch/filter.py:25-54."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    # np.kaiser == torch.kaiser_window(periodic=False)
    window = np.kaiser(kernel_size, beta)

    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros_like(time, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


class AliasFreeConstants(NamedTuple):
    up_taps: np.ndarray    # (12,) kaiser-sinc for 2x upsample
    down_taps: np.ndarray  # (12,) kaiser-sinc for 2x (strided) downsample
    ratio: int
    kernel_size: int


def make_alias_free_constants(ratio: int = 2, kernel_size: int = 12) -> AliasFreeConstants:
    taps = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    return AliasFreeConstants(up_taps=taps, down_taps=taps, ratio=ratio, kernel_size=kernel_size)


def snake_beta(x: jnp.ndarray, alpha_log: jnp.ndarray, beta_log: jnp.ndarray) -> jnp.ndarray:
    """SnakeBeta with log-scale parameters: x + exp(-beta) * sin(x*exp(alpha))^2.

    x: (B, T, C); alpha_log/beta_log: (C,).  Matches activations.py:107-119
    (alpha_logscale=True, eps 1e-9 in the denominator).
    """
    alpha = jnp.exp(alpha_log.astype(x.dtype))
    beta = jnp.exp(beta_log.astype(x.dtype))
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + 1e-9)) * (s * s)


def upsample2x(consts: AliasFreeConstants, x: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x upsample (resample.py UpSample1d). x: (B, T, C) -> (B, 2T, C).

    TPU-native polyphase formulation: the stride-2 transposed depthwise conv
    decomposes into two 6-tap shift-multiply-add phases which are interleaved
    — no grouped conv (which can lower to per-channel loops on TPU), just 12
    vector FMAs over (B, T, C).

    Derivation (k=12, r=2, replicate pad 5, crop 15): out[n] = sum_j f[j] *
    xp[(n-j)/2] over j with n's parity; cropped y[2u] uses odd taps reversed
    at offset 2, y[2u+1] even taps reversed at offset 3.
    """
    k = consts.kernel_size
    assert consts.ratio == 2 and k == 12
    b, t, c = x.shape
    pad = k // 2 - 1  # 5
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    f = consts.up_taps
    taps0 = jnp.asarray(f[11::-2].copy())  # f[11], f[9], ..., f[1]
    taps1 = jnp.asarray(f[10::-2].copy())  # f[10], f[8], ..., f[0]
    y0 = shared_filter_shifts(xp, 2.0 * taps0, t_out=t, offset=2)
    y1 = shared_filter_shifts(xp, 2.0 * taps1, t_out=t, offset=3)
    return jnp.stack([y0, y1], axis=2).reshape(b, 2 * t, c)


def downsample2x(consts: AliasFreeConstants, x: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample (resample.py DownSample1d). x: (B, 2T, C) -> (B, T, C).

    Polyphase: y[t] = sum_i f[2i]*xp[2t+2i] + f[2i+1]*xp[2t+2i+1]; the even/odd
    input phases turn the strided depthwise conv into two 6-tap shift-FMA
    chains.
    """
    k = consts.kernel_size
    assert consts.ratio == 2 and k == 12
    b, t2, c = x.shape
    t = t2 // 2
    pad_left, pad_right = k // 2 - 1, k // 2  # 5, 6
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    xe = xp[:, 0::2, :]  # (B, T+6, C) even phase
    xo = xp[:, 1::2, :]  # (B, T+5, C) odd phase
    f = consts.down_taps
    ye = shared_filter_shifts(xe, jnp.asarray(f[0::2].copy()), t_out=t, offset=0)
    yo = shared_filter_shifts(xo, jnp.asarray(f[1::2].copy()), t_out=t, offset=0)
    return ye + yo


def activation1d(
    consts: AliasFreeConstants,
    x: jnp.ndarray,
    alpha_log: jnp.ndarray,
    beta_log: jnp.ndarray,
) -> jnp.ndarray:
    """Alias-free SnakeBeta: up 2x -> snake -> down 2x (alias_free_torch/act.py:8-27)."""
    return downsample2x(consts, snake_beta(upsample2x(consts, x), alpha_log, beta_log))
