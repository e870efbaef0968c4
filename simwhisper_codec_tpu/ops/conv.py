"""1-D convolution primitives in TPU-friendly channels-last (NWC) layout.

All convs take weights as ``(W, C_in/groups, C_out)`` ("WIO"), the layout XLA
prefers on TPU; the checkpoint importer transposes from torch's OIW / IOW.
Weight normalization (reference ``modules.py:30-35``) is folded into the
weights at load time — the reference itself removes it for inference
(``model.py:101-110``) — so runtime convs are plain dense convs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DN = ("NWC", "WIO", "NWC")


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: int = 0,
    groups: int = 1,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Conv1d matching torch.nn.Conv1d semantics. x: (B, T, C_in)."""
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """ConvTranspose1d matching torch semantics (output_padding=0).

    x: (B, T, C_in), w: (W, C_in/groups, C_out) — the kernel is stored
    un-flipped in the same orientation as torch's ConvTranspose1d weight
    (the importer maps torch (I, O, W) -> (W, I, O) directly).

    out[n] = b + sum_t x[t] . w[n - stride*t]; output length (T-1)*stride + W
    minus 2*padding (reference decoder deconvs: modules.py:405-419).
    """
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0).astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv1d_shifts(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    dilation: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Depthwise conv as K shifted multiply-adds — the TPU-native lowering.

    ``feature_group_count=C`` convs can lower to per-channel loops on TPU; for
    small kernels the conv is just K vector FMAs over the full (B, T, C)
    tensor, fully parallel on the VPU.  x: (B, T, C), w: (K, C).
    Matches torch depthwise Conv1d(groups=C) semantics.
    """
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    t_out = x.shape[1] + 2 * padding - dilation * (k - 1)
    y = None
    for i in range(k):
        seg = jax.lax.slice_in_dim(xp, i * dilation, i * dilation + t_out, axis=1)
        term = seg * w[i].astype(x.dtype)[None, None, :]
        y = term if y is None else y + term
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def shared_filter_shifts(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    *,
    t_out: int,
    offset: int = 0,
    stride_phase: Optional[int] = None,
) -> jnp.ndarray:
    """Sum_i taps[i] * x[:, offset + i (+ stride'd index), :] over a pre-padded x.

    Helper for the polyphase alias-free resamplers: ``stride_phase=2`` reads
    every other input sample (x already phase-decomposed by the caller when
    needed).  taps: (K,) shared across channels.
    """
    k = taps.shape[0]
    step = stride_phase or 1
    y = None
    for i in range(k):
        start = offset + i * step
        seg = jax.lax.slice_in_dim(x, start, start + t_out, axis=1)
        term = seg * taps[i].astype(x.dtype)
        y = term if y is None else y + term
    return y


def depthwise_shared_filter(x: jnp.ndarray, taps: jnp.ndarray, *, stride: int = 1, lhs_dilation: int = 1, pad_lo: int = 0, pad_hi: int = 0, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Depthwise conv where every channel shares the same 1-D ``taps`` filter.

    Used by the alias-free kaiser-sinc up/down samplers
    (reference alias_free_torch/resample.py:10-48).  x: (B, T, C).
    """
    c = x.shape[-1]
    w = jnp.broadcast_to(taps.astype(x.dtype)[:, None, None], (taps.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=_DN,
        feature_group_count=c,
        precision=precision,
    )
