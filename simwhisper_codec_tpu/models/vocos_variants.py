"""Vocos variants: ResNet backbone, IMDCT heads, AdaLayerNorm conditioning.

Reference: ``audiocodec/nn/modules.py`` — ResBlock1 (:1281-1422),
VocosResNetBackbone (:1507-1542), IMDCTSymExpHead/IMDCTCosHead (:1085-1187),
AdaLayerNorm (:1251-1278).  Not in the production path (the shipped codec uses
the ConvNeXt backbone + ISTFT head) but part of the component inventory; all
channels-last, weight-norm folded at import like the rest of the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.ops.conv import conv1d
from simwhisper_codec_tpu.ops.stft import imdct, make_mdct_constants


def symexp(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) * (exp(|x|) - 1)  (modules.py:755-756)."""
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def ada_layer_norm(p: dict, x: jnp.ndarray, cond_id: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """AdaLayerNorm: LN without affine, then per-class scale/shift embeddings.

    p: {"scale": (N, D), "shift": (N, D)}; cond_id: () or (B,) int.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    scale = jnp.take(p["scale"], cond_id, axis=0).astype(jnp.float32)
    shift = jnp.take(p["shift"], cond_id, axis=0).astype(jnp.float32)
    if scale.ndim == 2:  # per-sample cond (B, D) -> (B, 1, D)
        scale, shift = scale[:, None, :], shift[:, None, :]
    return (y * scale + shift).astype(x.dtype)


def res_block1(p: dict, x: jnp.ndarray, kernel: int = 3, dilations=(1, 3, 5), slope: float = 0.1) -> jnp.ndarray:
    """HiFi-GAN-style ResBlock1 without upsampling (modules.py:1403-1412).

    p: {"convs1": [..], "convs2": [..], "gamma": [(C,) or None]}, conv weights
    pre-folded (weight norm removed at import).
    """
    for c1, c2, gamma, d in zip(p["convs1"], p["convs2"], p["gamma"], dilations):
        pad1 = (kernel * d - d) // 2
        xt = jnp.where(x >= 0, x, slope * x)
        xt = conv1d(xt, c1["w"], c1["b"], dilation=d, padding=pad1)
        xt = jnp.where(xt >= 0, xt, slope * xt)
        xt = conv1d(xt, c2["w"], c2["b"], padding=(kernel - 1) // 2)
        if gamma is not None:
            xt = gamma.astype(xt.dtype) * xt
        x = x + xt
    return x


def vocos_resnet_backbone(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """VocosResNetBackbone (modules.py:1538-1542): embed conv k3 + ResBlock1 stack.

    x: (B, T, input_channels) -> (B, T, dim).
    """
    h = conv1d(x, p["embed"]["w"], p["embed"]["b"], padding=1)
    for block in p["resnet"]:
        h = res_block1(block, h)
    return h


class IMDCTHeadConstants:
    def __init__(self, mdct_frame_len: int, padding: str = "same"):
        self.mdct = make_mdct_constants(mdct_frame_len, padding)


def imdct_symexp_head(
    consts: IMDCTHeadConstants, p: dict, x: jnp.ndarray, clip_audio: bool = False
) -> jnp.ndarray:
    """IMDCTSymExpHead (modules.py:1098-1187): linear -> symexp -> IMDCT."""
    coeffs = x @ p["out"]["w"].astype(x.dtype) + p["out"]["b"].astype(x.dtype)
    coeffs = symexp(coeffs)
    coeffs = jnp.clip(coeffs, -1e2, 1e2)
    audio = imdct(consts.mdct, coeffs.astype(jnp.float32))
    if clip_audio:
        audio = jnp.clip(audio, -1.0, 1.0)
    return audio


def imdct_cos_head(
    consts: IMDCTHeadConstants, p: dict, x: jnp.ndarray, clip_audio: bool = False
) -> jnp.ndarray:
    """IMDCTCosHead: linear -> m*cos(p) with exp(m) magnitude (modules.py:1139-1187)."""
    out = x @ p["out"]["w"].astype(x.dtype) + p["out"]["b"].astype(x.dtype)
    m, phase = jnp.split(out, 2, axis=-1)
    m = jnp.clip(jnp.exp(m), max=1e2)
    audio = imdct(consts.mdct, (m * jnp.cos(phase)).astype(jnp.float32))
    if clip_audio:
        audio = jnp.clip(audio, -1.0, 1.0)
    return audio


# -- importers for the variant modules ---------------------------------------


def convert_res_block1(sd, prefix, n=3) -> dict:
    from simwhisper_codec_tpu.utils.checkpoint import _conv1d, _get, _join

    gammas = []
    for i in range(n):
        key = _join(prefix, f"gamma.{i}")
        gammas.append(_get(sd, key).reshape(-1) if key in sd else None)
    return {
        "convs1": [_conv1d(sd, _join(prefix, f"convs1.{i}"), weight_norm=True) for i in range(n)],
        "convs2": [_conv1d(sd, _join(prefix, f"convs2.{i}"), weight_norm=True) for i in range(n)],
        "gamma": gammas,
    }


def convert_vocos_resnet_backbone(sd, prefix, num_blocks: int) -> dict:
    from simwhisper_codec_tpu.utils.checkpoint import _conv1d, _join

    return {
        "embed": _conv1d(sd, _join(prefix, "embed"), weight_norm=True),
        "resnet": [
            convert_res_block1(sd, _join(prefix, f"resnet.{i}")) for i in range(num_blocks)
        ],
    }


def convert_imdct_head(sd, prefix) -> dict:
    from simwhisper_codec_tpu.utils.checkpoint import _join, _linear

    return {"out": _linear(sd, _join(prefix, "out"))}
