"""Vocos vocoder: ConvNeXt backbone + ISTFT head, TPU-first.

Reference: ``audiocodec/nn/modules.py`` — Vocos (:1545-1574), VocosBackbone
(:1441-1504), ConvNeXtBlock (:1190-1248), ISTFTHead (:1033-1082).

TPU-first notes
---------------
- The 24 ConvNeXt blocks are a single ``lax.scan`` over stacked params: one
  compiled block (dwconv k7 + LN + pw 512->4096 -> GELU -> 4096->512 +
  layer-scale + residual), with the two pointwise matmuls dominating — pure
  MXU work at (B*T, 512)x(512, 4096).
- ``frame_valid`` implements a traced "virtual right edge": inputs are
  re-zeroed beyond the edge before every conv so a fixed-shape T-frame run
  reproduces the reference's shorter-array boundary behavior exactly (conv
  zero-padding at the array edge). Needed for decode-chunk parity.
- The ISTFT head's linear and the irDFT matmul of the ISTFT fuse back-to-back
  on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.config import VocosConfig
from simwhisper_codec_tpu.models.transformer import layer_norm
from simwhisper_codec_tpu.ops.conv import conv1d, depthwise_conv1d_shifts
from simwhisper_codec_tpu.ops.stft import ISTFTConstants, istft_same, make_istft_constants


class VocosConstants(NamedTuple):
    istft: ISTFTConstants


def make_constants(cfg: VocosConfig) -> VocosConstants:
    return VocosConstants(istft=make_istft_constants(cfg.n_fft, cfg.hop_size))


def _edge_mask(t: int, frame_valid: Optional[jnp.ndarray], dtype) -> Optional[jnp.ndarray]:
    if frame_valid is None:
        return None
    return (jnp.arange(t) < frame_valid).astype(dtype)[None, :, None]


def convnext_block(
    p: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    precision=jax.lax.Precision.HIGHEST,
    fused: bool = False,
    frame_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ConvNeXt block (modules.py:1229-1248).

    ``fused=True`` runs the LN->pw1->GELU->pw2->scale->residual chain as one
    Pallas kernel (ops/fused_convnext.py) — ~35% faster on TPU, tanh-GELU
    (serving path; parity mode keeps the exact-GELU XLA chain).
    ``fused="dw"`` additionally folds the depthwise k7 conv + edge mask into
    the same kernel via halo DMA: the activation is read from HBM once per
    block instead of four times (``frame_valid`` carries the mask bound).
    """
    residual = x
    if fused == "dw":
        from simwhisper_codec_tpu.ops.fused_convnext import (
            fused_convnext_block_dw,
            pick_block_t,
        )

        if pick_block_t(x.shape[1]):
            return fused_convnext_block_dw(x, p, frame_valid=frame_valid)
        fused = True  # geometry fallback: two-step fused path
    if mask is not None:
        x = x * mask
    # depthwise k7 as 7 shift-FMAs (w stored (7, 1, C) -> (7, C))
    x = depthwise_conv1d_shifts(x, p["dwconv"]["w"][:, 0, :], p["dwconv"]["b"], padding=3)
    if fused == "int8":
        # int8 pointwise chain (2x MXU rate; quantized via ops/quant.py)
        from simwhisper_codec_tpu.ops.fused_convnext import fused_ln_ffn_int8

        b, t, c = x.shape
        out = fused_ln_ffn_int8(
            x.reshape(b * t, c), residual.reshape(b * t, c),
            p["norm"]["scale"], p["norm"]["bias"],
            p["pw1_q"], p["pw1_s"], p["pw1"]["b"],
            p["pw2_q"], p["pw2_s"], p["pw2"]["b"],
            p["gamma"], eps=1e-6,
        )
        return out.reshape(b, t, c)
    if fused:
        from simwhisper_codec_tpu.ops.fused_convnext import fused_convnext_ffn

        b, t, c = x.shape
        out = fused_convnext_ffn(x.reshape(b * t, c), residual.reshape(b * t, c), p)
        return out.reshape(b, t, c)
    # pointwise chain on a flattened (B*T, C) view — 2-D matmuls tile ~25%
    # better on the MXU than the batched 3-D form (measured; docs/TPU_NOTES.md)
    b, t, c = x.shape
    x = x.reshape(b * t, c)
    x = layer_norm(p["norm"], x, eps=1e-6)
    x = jnp.matmul(x, p["pw1"]["w"].astype(x.dtype), precision=precision) + p["pw1"]["b"].astype(x.dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.matmul(x, p["pw2"]["w"].astype(x.dtype), precision=precision) + p["pw2"]["b"].astype(x.dtype)
    x = (p["gamma"].astype(x.dtype) * x).reshape(b, t, c)
    return residual + x


def vocos_forward(
    cfg: VocosConfig,
    consts: VocosConstants,
    p: dict,
    mel: jnp.ndarray,
    lengths: jnp.ndarray,
    frame_valid: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, input_channels) -> waveform (B, T * hop_size), lengths * hop_size.

    ``frame_valid`` (traced scalar): virtual right edge in frames; use when the
    fixed T exceeds the chunk the reference would have processed.
    """
    t = mel.shape[1]
    mask = _edge_mask(t, frame_valid, mel.dtype)

    x = mel if mask is None else mel * mask
    x = conv1d(x, p["embed"]["w"], p["embed"]["b"], padding=3, precision=precision)
    x = layer_norm(p["norm"], x, eps=1e-6)

    def body(carry, bp):
        return convnext_block(bp, carry, mask, precision, fused=fused,
                              frame_valid=frame_valid), None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    x = layer_norm(p["final_ln"], x, eps=1e-6)

    # ISTFT head (modules.py:1053-1082)
    x = jnp.matmul(x, p["head"]["w"].astype(x.dtype), precision=precision) + p["head"]["b"].astype(x.dtype)
    n_freq = cfg.n_fft // 2 + 1
    mag = jnp.exp(x[..., :n_freq])
    mag = jnp.clip(mag, max=1e2)
    phase = x[..., n_freq:]
    spec_re = (mag * jnp.cos(phase)).astype(jnp.float32)
    spec_im = (mag * jnp.sin(phase)).astype(jnp.float32)

    audio = istft_same(consts.istft, spec_re, spec_im, frame_valid)
    return audio.astype(mel.dtype), lengths * cfg.hop_size


def init_vocos(key, cfg: VocosConfig) -> dict:
    """Random init matching the reference trunc-normal(0.02) scheme (modules.py:1487-1490)."""
    from simwhisper_codec_tpu.models.sampling import _trunc_normal

    keys = jax.random.split(key, cfg.num_layers + 2)
    d, inter = cfg.dim, cfg.intermediate_dim

    def block(k):
        ks = jax.random.split(k, 3)
        return {
            "dwconv": {"w": _trunc_normal(ks[0], (7, 1, d)), "b": jnp.zeros((d,))},
            "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "pw1": {"w": _trunc_normal(ks[1], (d, inter)), "b": jnp.zeros((inter,))},
            "pw2": {"w": _trunc_normal(ks[2], (inter, d)), "b": jnp.zeros((d,))},
            "gamma": jnp.full((d,), cfg.layer_scale_init_value, jnp.float32),
        }

    blocks = [block(k) for k in keys[2:]]
    return {
        "embed": {"w": _trunc_normal(keys[0], (7, cfg.input_channels, d)), "b": jnp.zeros((d,))},
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "final_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "head": {"w": _trunc_normal(keys[1], (d, cfg.n_fft + 2)), "b": jnp.zeros((cfg.n_fft + 2,))},
    }
