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

from simwhisper_codec_tpu.ops.conv import depthwise_shared_filter


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
    """Anti-aliased 2x upsample (resample.py UpSample1d). x: (B, T, C) -> (B, 2T, C)."""
    r, k = consts.ratio, consts.kernel_size
    pad = k // r - 1
    pad_left = pad * r + (k - r) // 2
    pad_right = pad * r + (k - r + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # torch conv_transpose1d(stride=r) == lhs-dilated conv with flipped taps;
    # taps are symmetric-in-construction but flip anyway for exactness.
    taps = jnp.flip(jnp.asarray(consts.up_taps), axis=0)
    y = r * depthwise_shared_filter(x, taps, lhs_dilation=r, pad_lo=k - 1, pad_hi=k - 1)
    return y[:, pad_left : y.shape[1] - pad_right, :]


def downsample2x(consts: AliasFreeConstants, x: jnp.ndarray) -> jnp.ndarray:
    """Anti-aliased 2x downsample (resample.py DownSample1d). x: (B, 2T, C) -> (B, T, C)."""
    k = consts.kernel_size
    even = int(k % 2 == 0)
    pad_left = k // 2 - even
    pad_right = k // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return depthwise_shared_filter(x, jnp.asarray(consts.down_taps), stride=consts.ratio)


def activation1d(
    consts: AliasFreeConstants,
    x: jnp.ndarray,
    alpha_log: jnp.ndarray,
    beta_log: jnp.ndarray,
) -> jnp.ndarray:
    """Alias-free SnakeBeta: up 2x -> snake -> down 2x (alias_free_torch/act.py:8-27)."""
    return downsample2x(consts, snake_beta(upsample2x(consts, x), alpha_log, beta_log))
