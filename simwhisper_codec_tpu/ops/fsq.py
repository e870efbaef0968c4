"""Finite Scalar Quantization (FSQ) and grouped FSQ — pure jnp, weightless.

TPU-first design notes
----------------------
The reference (``audiocodec/nn/quantizer.py:47-318``) loops over 8 groups in
Python, each applying an identical FSQ with levels [8, 7, 6, 6].  Here the
whole GroupFSQ is a single vectorized computation over the full latent dim
(32 channels): per-channel level constants are laid out as one (D,) vector and
the group-index reduction is an 8x4 segment-sum expressed as a reshape —
no Python loop, one fused XLA kernel.

Semantics match the reference exactly:
  - compress: ``scale * tanh(x + shift) - offset`` with
    ``scale = (L-1)/2 * (1-eps)``, ``offset = 0.5`` for even L else 0,
    ``shift = tan(offset / scale)``  (quantizer.py:129-140)
  - round with straight-through gradient      (quantizer.py:121-127)
  - normalize by ``L // 2``                    (quantizer.py:150-157)
  - index = sum over dims of nonneg * cumprod-base, int32 (quantizer.py:169-179)
  - decode = ``(idx // base) % L`` recentered   (quantizer.py:207-224)

Layout: latents are channels-last ``(B, T, D)`` (TPU lane-friendly); code
indices are ``(num_groups, B, T)`` int32 to match the reference API.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.config import QuantizerConfig


class FSQConstants(NamedTuple):
    """Per-channel constants for the flattened GroupFSQ (all shape (D,))."""

    num_levels: np.ndarray      # int32 (D,)
    dim_base: np.ndarray        # int32 (D,)  cumprod base within each group
    scale: np.ndarray           # f32 (D,)    (L-1)/2 * (1-eps)
    offset: np.ndarray          # f32 (D,)    0.5 for even L else 0
    shift: np.ndarray           # f32 (D,)    tan(offset/scale)
    half: np.ndarray            # f32 (D,)    L // 2 (normalization scale)
    num_groups: int
    dims_per_group: int


def make_constants(cfg: QuantizerConfig) -> FSQConstants:
    levels = list(cfg.num_levels_per_group)
    d = len(levels)
    base = np.cumprod([1] + levels[:-1]).astype(np.int32)  # quantizer.py:64
    lv = np.array(levels, dtype=np.int32)
    scale = ((lv - 1) / 2.0 * (1.0 - cfg.eps)).astype(np.float32)
    offset = np.where(lv % 2 == 0, 0.5, 0.0).astype(np.float32)
    shift = np.tan(offset / scale).astype(np.float32)
    half = (lv // 2).astype(np.float32)
    g = cfg.num_groups
    return FSQConstants(
        num_levels=np.tile(lv, g),
        dim_base=np.tile(base, g),
        scale=np.tile(scale, g),
        offset=np.tile(offset, g),
        shift=np.tile(shift, g),
        half=np.tile(half, g),
        num_groups=g,
        dims_per_group=d,
    )


def compress(consts: FSQConstants, x: jnp.ndarray) -> jnp.ndarray:
    """Bounded compression (reference quantizer.py:129-140). x: (..., D)."""
    scale = jnp.asarray(consts.scale, x.dtype)
    offset = jnp.asarray(consts.offset, x.dtype)
    shift = jnp.asarray(consts.shift, x.dtype)
    return scale * jnp.tanh(x + shift) - offset


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest-even with straight-through gradient (quantizer.py:121-127)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def inputs_to_codes(consts: FSQConstants, x: jnp.ndarray) -> jnp.ndarray:
    """Continuous latent -> quantized codes in [-1, 1]. x: (..., D)."""
    compressed = compress(consts, x)
    rounded = ste_round(compressed)
    return rounded / jnp.asarray(consts.half, x.dtype)


def codes_to_indices(consts: FSQConstants, codes: jnp.ndarray) -> jnp.ndarray:
    """Codes (..., D) -> group indices (..., G) int32 (quantizer.py:169-179).

    nonneg = half * code + half; index_g = sum_d nonneg_d * base_d.

    nonneg is mathematically an integer in [0, L).  The reference's float
    arithmetic lands on it exactly (separate f32 mul/add round back to the
    integer), but XLA may fuse ``half*code+half`` into an FMA whose single
    rounding leaves N - eps and truncates to N-1.  Rounding to int32 before
    the base-weighted sum gives the true index on every backend, bit-equal to
    the reference.
    """
    half = jnp.asarray(consts.half, codes.dtype)
    nonneg = jnp.round(half * codes + half).astype(jnp.int32)
    weighted = nonneg * jnp.asarray(consts.dim_base, jnp.int32)
    g, d = consts.num_groups, consts.dims_per_group
    weighted = weighted.reshape(codes.shape[:-1] + (g, d))
    return jnp.sum(weighted, axis=-1).astype(jnp.int32)


def indices_to_codes(consts: FSQConstants, indices: jnp.ndarray) -> jnp.ndarray:
    """Group indices (..., G) int32 -> codes (..., D) (quantizer.py:207-224)."""
    g, d = consts.num_groups, consts.dims_per_group
    idx = jnp.repeat(indices[..., None], d, axis=-1).reshape(indices.shape[:-1] + (g * d,))
    base = jnp.asarray(consts.dim_base, jnp.int32)
    lv = jnp.asarray(consts.num_levels, jnp.int32)
    nonneg = (idx // base) % lv
    half = jnp.asarray(consts.half, jnp.float32)
    return (nonneg.astype(jnp.float32) - half) / half


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) bool validity mask (quantizer.py:9-30)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def group_fsq_forward(
    consts: FSQConstants,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full GroupFSQ forward (quantizer.py:273-290).

    Args:
        x: latent (B, T, D) channels-last.
        lengths: optional (B,) valid frame counts.

    Returns:
        dequantized (B, T, D) and indices (G, B, T) int32, both zero-masked
        beyond ``lengths`` like the reference.
    """
    codes = inputs_to_codes(consts, x)
    indices = codes_to_indices(consts, codes)  # (B, T, G)
    if lengths is not None:
        mask = length_mask(lengths, x.shape[1])
        codes = codes * mask[..., None].astype(codes.dtype)
        indices = indices * mask[..., None].astype(indices.dtype)
    return codes, jnp.transpose(indices, (2, 0, 1))


def group_fsq_encode(
    consts: FSQConstants, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Latent (B, T, D) -> indices (G, B, T) int32 (quantizer.py:292-304)."""
    _, indices = group_fsq_forward(consts, x, lengths)
    return indices


def group_fsq_decode(
    consts: FSQConstants, indices: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Indices (G, B, T) int32 -> dequantized latent (B, T, D) (quantizer.py:306-318)."""
    idx_btg = jnp.transpose(indices, (1, 2, 0))
    codes = indices_to_codes(consts, idx_btg)
    if lengths is not None:
        mask = length_mask(lengths, codes.shape[1])
        codes = codes * mask[..., None].astype(codes.dtype)
    return codes


def codebook_size(cfg: QuantizerConfig) -> int:
    return cfg.codebook_size_per_group ** cfg.num_groups


def bits_per_frame(cfg: QuantizerConfig) -> float:
    return cfg.num_groups * math.log2(cfg.codebook_size_per_group)
