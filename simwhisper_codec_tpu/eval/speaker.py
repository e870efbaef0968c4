"""ECAPA-TDNN speaker embedder, TPU-native (JAX).

Reference: ``tools/speaker/utils/ecapa_tdnn.py:163-307`` — ECAPA_TDNN_SMALL
(channels 512, emb 192) over WavLM-large features via s3prl.  This native
implementation provides the same architecture with an fbank frontend (the
reference's ``feat_type='fbank'`` option) so the speaker-similarity pipeline
runs end-to-end without s3prl/fairseq; with pretrained WavLM weights
unavailable in a zero-egress environment, converted checkpoints can be loaded
into the same param tree.

Architecture: TDNN k5 -> 3x SE-Res2Block (k3, dil 2/3/4, scale 8) ->
concat -> conv 1x1 (1536) -> attentive stat pooling -> BN -> linear -> 192-d.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.ops.conv import conv1d

EMB_DIM = 192
CHANNELS = 512
SCALE = 8


def _bn(p, x, eps=1e-5):
    """Inference-mode batch norm over (B, T, C) with stored stats."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def _tdnn_layer(p, x, kernel, dilation):
    pad = (kernel - 1) * dilation // 2
    h = conv1d(x, p["conv"]["w"], p["conv"]["b"], dilation=dilation, padding=pad)
    return _bn(p["bn"], jax.nn.relu(h))


def _se_block(p, x):
    """Squeeze-excitation over channels."""
    s = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
    s = jax.nn.relu(s @ p["fc1"]["w"] + p["fc1"]["b"])
    s = jax.nn.sigmoid(s @ p["fc2"]["w"] + p["fc2"]["b"])
    return x * s


def _res2_conv(p, x, kernel, dilation):
    """Res2Net hierarchical convolution: split channels into SCALE groups."""
    parts = jnp.split(x, SCALE, axis=-1)
    outs = [parts[0]]
    sp = None
    pad = (kernel - 1) * dilation // 2
    for i in range(1, SCALE):
        sp = parts[i] if sp is None else sp + parts[i]
        sp = conv1d(sp, p[f"conv{i}"]["w"], p[f"conv{i}"]["b"], dilation=dilation, padding=pad)
        sp = jax.nn.relu(sp)
        outs.append(sp)
    return jnp.concatenate(outs, axis=-1)


def _se_res2_block(p, x, kernel, dilation):
    residual = x
    h = _tdnn_layer(p["tdnn1"], x, 1, 1)
    h = _res2_conv(p["res2"], h, kernel, dilation)
    h = _tdnn_layer(p["tdnn2"], h, 1, 1)
    h = _se_block(p["se"], h)
    return h + residual


def _attentive_stats(p, x, eps=1e-7):
    """Attentive statistics pooling with global context (channels last)."""
    b, t, c = x.shape
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + eps)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    a = jnp.tanh(conv1d(ctx, p["att1"]["w"], p["att1"]["b"]))
    a = conv1d(a, p["att2"]["w"], p["att2"]["b"])
    a = jax.nn.softmax(a, axis=1)
    mu = jnp.sum(a * x, axis=1)
    sigma = jnp.sqrt(jnp.clip(jnp.sum(a * x * x, axis=1) - mu * mu, min=eps))
    return jnp.concatenate([mu, sigma], axis=-1)


def ecapa_forward(p: dict, feats: jnp.ndarray) -> jnp.ndarray:
    """feats (B, T, F) -> embeddings (B, 192)."""
    h = _tdnn_layer(p["layer1"], feats, 5, 1)
    h1 = _se_res2_block(p["block1"], h, 3, 2)
    h2 = _se_res2_block(p["block2"], h1, 3, 3)
    h3 = _se_res2_block(p["block3"], h2, 3, 4)
    cat = jnp.concatenate([h1, h2, h3], axis=-1)
    h = jax.nn.relu(conv1d(cat, p["mfa"]["w"], p["mfa"]["b"]))
    pooled = _attentive_stats(p["pool"], h)
    pooled = _bn(p["pool_bn"], pooled[:, None, :])[:, 0, :]
    return pooled @ p["fc"]["w"] + p["fc"]["b"]


def _init_conv(key, k, cin, cout):
    bound = 1.0 / math.sqrt(cin * k)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _init_bn(c):
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _init_tdnn(key, k, cin, cout):
    return {"conv": _init_conv(key, k, cin, cout), "bn": _init_bn(cout)}


def _init_linear(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _init_se_res2(key, c):
    keys = jax.random.split(key, SCALE + 4)
    width = c // SCALE
    res2 = {
        f"conv{i}": _init_conv(keys[i], 3, width, width) for i in range(1, SCALE)
    }
    return {
        "tdnn1": _init_tdnn(keys[SCALE], 1, c, c),
        "res2": res2,
        "tdnn2": _init_tdnn(keys[SCALE + 1], 1, c, c),
        "se": {
            "fc1": _init_linear(keys[SCALE + 2], c, 128),
            "fc2": _init_linear(keys[SCALE + 3], 128, c),
        },
    }


def init_ecapa(key, feat_dim: int = 80) -> dict:
    keys = jax.random.split(key, 8)
    c = CHANNELS
    cat = 3 * c
    return {
        "layer1": _init_tdnn(keys[0], 5, feat_dim, c),
        "block1": _init_se_res2(keys[1], c),
        "block2": _init_se_res2(keys[2], c),
        "block3": _init_se_res2(keys[3], c),
        "mfa": _init_conv(keys[4], 1, cat, cat),
        "pool": {
            "att1": _init_conv(keys[5], 1, 3 * cat, 128),
            "att2": _init_conv(keys[6], 1, 128, cat),
        },
        "pool_bn": _init_bn(2 * cat),
        "fc": _init_linear(keys[7], 2 * cat, EMB_DIM),
    }


class SpeakerEmbedder:
    """fbank frontend + ECAPA, exposing embed(wav, sr) for the SIM tool."""

    def __init__(self, params: dict = None, seed: int = 0):
        from simwhisper_codec_tpu.config import FeatureExtractorConfig
        from simwhisper_codec_tpu.ops import mel as mel_ops

        self.params = params or init_ecapa(jax.random.PRNGKey(seed))
        self._mel_cfg = FeatureExtractorConfig()
        self._fwd = jax.jit(ecapa_forward)
        self._mel_cache = {}

    def _mel_consts(self, n_samples: int):
        import dataclasses

        from simwhisper_codec_tpu.ops import mel as mel_ops

        if n_samples not in self._mel_cache:
            fe = dataclasses.replace(
                self._mel_cfg, n_samples=n_samples, nb_max_frames=n_samples // 160
            )
            self._mel_cache[n_samples] = mel_ops.make_constants(fe)
        return self._mel_cache[n_samples]

    def embed(self, wav: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        from simwhisper_codec_tpu.ops import mel as mel_ops

        n = len(wav) // 160 * 160
        consts = self._mel_consts(max(n, 400))
        feats = mel_ops.log_mel(consts, jnp.asarray(wav[None, :max(n, 400)]))
        return np.asarray(self._fwd(self.params, feats))[0]
