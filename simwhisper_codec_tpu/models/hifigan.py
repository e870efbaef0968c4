"""HiFi-GAN generator + discriminators (MPD/MSD), TPU-native.

Capability target: the reference's HiFi-GAN ablation recipes
(``hifigan_experiments/hifigan_continue_{whisper,hubert}``) configure
SpeechBrain's ``UnitHifiganGenerator`` / ``HifiganDiscriminator``
(``hparams/train.yaml:140-228``); the models themselves live in SpeechBrain,
not the reference repo.  This module implements the same architecture
natively:

 - Generator (HiFi-GAN V1, continuous-feature input): conv_pre k7 on 768-d
   features -> 5 transposed-conv upsample stages (factors [5,4,4,2,2], kernels
   [11,8,8,4,4], channels 512 halving) each followed by a multi-receptive-
   field fusion of 3 ResBlocks (k [3,7,11], dilations [1,3,5]) -> conv_post k7
   -> tanh.  Upsampling 5*4*4*2*2 = 320 = the 50 Hz feature hop.
 - Multi-Period Discriminator: periods (2,3,5,7,11), 2-D convs over (T/p, p).
 - Multi-Scale Discriminator: 3 scales with avg-pool 4/2/1 downsampling.

All convs carry explicit weight-norm parametrization {g, v} (trained, like
the torch originals; folded only for export) — except the first MSD scale,
which uses spectral norm exactly as the original discriminator stack does
(SpeechBrain ``DiscriminatorS(use_spectral_norm=True)``, reference
``hparams/train.yaml:165-188``): w/sigma with sigma from power iteration,
torch ``parametrizations.spectral_norm`` semantics (dim=0, eps=1e-12).  The
u/v power-iteration buffers live in the param tree as extra leaves;
``spectral_norm_power_iteration`` advances them once per training step (the
torch original iterates on every forward — 4x per step; one iteration per
step tracks sigma just as tightly since weights move by ~lr per step).

Everything is channels-last (B, T, C); discriminator stacks are Python-level
lists (heterogeneous shapes — no scan), generators' resblocks likewise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.ops.conv import conv1d, conv_transpose1d


@dataclass(frozen=True)
class HifiGanConfig:
    in_channels: int = 768
    out_channels: int = 1
    upsample_initial_channel: int = 512
    upsample_factors: Tuple[int, ...] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (11, 8, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_factors:
            out *= u
        return out


# -- weight-normed conv parametrization -------------------------------------


def wn_weight(p: dict) -> jnp.ndarray:
    """Dense weight from weight-norm params: w = g * v / ||v|| (per out-channel).

    v layout (W, I, O): norm over (W, I) per output channel; g: (O,).
    """
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    return p["g"] * v / norm


def wn_conv(p, x, **kw):
    return conv1d(x, wn_weight(p), p.get("b"), **kw)


def wn_conv_t(p, x, **kw):
    """Weight-normed transposed conv; v layout (W, I, O), norm over (W, O) per
    input channel (torch ConvTranspose1d weight-norm dim=0 is the in-channel)."""
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-12)
    w = p["g"] * v / norm
    return conv_transpose1d(x, w, p.get("b"), **kw)


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


# -- generator ---------------------------------------------------------------


def resblock1(cfg: HifiGanConfig, p: dict, x: jnp.ndarray, kernel: int, dilations) -> jnp.ndarray:
    """HiFi-GAN V1 ResBlock: (lrelu -> dil conv -> lrelu -> conv) x len(dilations)."""
    for i, d in enumerate(dilations):
        pad1 = (kernel * d - d) // 2
        xt = _lrelu(x, cfg.lrelu_slope)
        xt = wn_conv(p["convs1"][i], xt, dilation=d, padding=pad1)
        xt = _lrelu(xt, cfg.lrelu_slope)
        xt = wn_conv(p["convs2"][i], xt, padding=(kernel - 1) // 2)
        x = x + xt
    return x


def generator_forward(cfg: HifiGanConfig, p: dict, features: jnp.ndarray) -> jnp.ndarray:
    """(B, T, in_channels) continuous features -> (B, T * total_upsample) waveform."""
    x = wn_conv(p["conv_pre"], features, padding=3)
    for i, (u, k) in enumerate(zip(cfg.upsample_factors, cfg.upsample_kernel_sizes)):
        x = _lrelu(x, cfg.lrelu_slope)
        x = wn_conv_t(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            out = resblock1(cfg, p["resblocks"][i][j], x, rk, rd)
            acc = out if acc is None else acc + out
        x = acc / len(cfg.resblock_kernel_sizes)
    x = _lrelu(x, cfg.lrelu_slope)
    x = wn_conv(p["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]


def _init_wn_conv(key, w, cin, cout, scale=0.01):
    k1, _ = jax.random.split(key)
    v = scale * jax.random.normal(k1, (w, cin, cout), jnp.float32)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    return {"v": v, "g": g, "b": jnp.zeros((cout,), jnp.float32)}


def _init_wn_conv_t(key, w, cin, cout, scale=0.01):
    k1, _ = jax.random.split(key)
    v = scale * jax.random.normal(k1, (w, cin, cout), jnp.float32)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True))
    return {"v": v, "g": g, "b": jnp.zeros((cout,), jnp.float32)}


def init_generator(key, cfg: HifiGanConfig) -> dict:
    keys = jax.random.split(key, 160)
    ki = iter(range(160))
    ch = cfg.upsample_initial_channel
    p = {"conv_pre": _init_wn_conv(keys[next(ki)], 7, cfg.in_channels, ch)}
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_factors, cfg.upsample_kernel_sizes)):
        cout = ch // (2 ** (i + 1))
        cin = ch // (2**i)
        ups.append(_init_wn_conv_t(keys[next(ki)], k, cin, cout))
        stage = []
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            stage.append(
                {
                    "convs1": [_init_wn_conv(keys[next(ki)], rk, cout, cout) for _ in rd],
                    "convs2": [_init_wn_conv(keys[next(ki)], rk, cout, cout) for _ in rd],
                }
            )
        resblocks.append(stage)
    p["ups"] = ups
    p["resblocks"] = resblocks
    p["conv_post"] = _init_wn_conv(keys[next(ki)], 7, ch // (2 ** len(cfg.upsample_factors)), cfg.out_channels)
    return p


# -- discriminators ----------------------------------------------------------

MPD_PERIODS = (2, 3, 5, 7, 11)


def _wn_conv2d(p, x, stride, padding):
    """Weight-normed 2-D conv; v layout (H, W, I, O), x (B, H, W, C)."""
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
    w = p["g"] * v / norm
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def period_discriminator_forward(p: dict, x: jnp.ndarray, period: int, slope=0.1):
    """x (B, T) -> (score map, feature list). 2-D convs over (T/period, period)."""
    b, t = x.shape
    pad = (period - t % period) % period
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
    x = x.reshape(b, -1, period, 1)  # (B, T/p, p, 1)
    feats = []
    for conv in p["convs"]:
        x = _wn_conv2d(conv, x, (3, 1), [(2, 2), (0, 0)])
        x = _lrelu(x, slope)
        feats.append(x)
    x = _wn_conv2d(p["conv_post"], x, (1, 1), [(1, 1), (0, 0)])
    feats.append(x)
    return x.reshape(b, -1), feats


def _init_wn_conv2d(key, h, w, cin, cout, scale=0.01):
    v = scale * jax.random.normal(key, (h, w, cin, cout), jnp.float32)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
    return {"v": v, "g": g, "b": jnp.zeros((cout,), jnp.float32)}


def init_period_discriminator(key) -> dict:
    chs = [1, 32, 128, 512, 1024, 1024]
    keys = jax.random.split(key, len(chs))
    convs = [
        _init_wn_conv2d(keys[i], 5, 1, chs[i], chs[i + 1]) for i in range(len(chs) - 1)
    ]
    return {"convs": convs, "conv_post": _init_wn_conv2d(keys[-1], 3, 1, 1024, 1)}


# -- spectral-norm conv parametrization (first MSD scale) --------------------


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize(dim=0)``: x / max(||x||, eps)."""
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def _sn_weight_mat(w: jnp.ndarray) -> jnp.ndarray:
    """(W, I, O) conv kernel -> torch's (O, I*W) spectral-norm matrix view."""
    return jnp.transpose(w, (2, 1, 0)).reshape(w.shape[-1], -1)


def sn_weight(p: dict) -> jnp.ndarray:
    """Effective weight w / sigma with sigma = u^T W v from the stored
    power-iteration buffers (torch ``parametrizations.spectral_norm`` with
    the buffers advanced by :func:`spectral_norm_power_iteration`)."""
    wm = _sn_weight_mat(p["w"])
    u = jax.lax.stop_gradient(p["u"])
    v = jax.lax.stop_gradient(p["v_vec"])
    sigma = u @ (wm @ v)
    return p["w"] / sigma


def sn_power_iteration(p: dict, n_iter: int = 1) -> dict:
    """One (or n) power-method step(s) on the buffers, torch order:
    u <- normalize(W v); v <- normalize(W^T u)."""
    wm = jax.lax.stop_gradient(_sn_weight_mat(p["w"]))
    u, v = p["u"], p["v_vec"]
    for _ in range(n_iter):
        u = _l2norm(wm @ v)
        v = _l2norm(wm.T @ u)
    return {**p, "u": u, "v_vec": v}


def sn_conv(p, x, **kw):
    return conv1d(x, sn_weight(p), p["b"], **kw)


def _init_sn_conv(key, w, cin, cout, scale=0.01, n_init_iter: int = 15):
    kw_, ku, kv = jax.random.split(key, 3)
    p = {
        "w": scale * jax.random.normal(kw_, (w, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
        "u": _l2norm(jax.random.normal(ku, (cout,), jnp.float32)),
        "v_vec": _l2norm(jax.random.normal(kv, (w * cin,), jnp.float32)),
    }
    # torch runs 15 power iterations at parametrization registration
    return sn_power_iteration(p, n_init_iter)


def spectral_norm_power_iteration(d_params: dict) -> dict:
    """Advance every spectral-normed conv's u/v buffers (first MSD scale).

    Call once per training step before the discriminator forwards — the
    functional analogue of torch updating the buffers inside forward.
    """
    msd = list(d_params["msd"])
    first = dict(msd[0])
    first["convs"] = [sn_power_iteration(c) if "u" in c else c for c in first["convs"]]
    if "u" in first["conv_post"]:
        first["conv_post"] = sn_power_iteration(first["conv_post"])
    msd[0] = first
    return {**d_params, "msd": msd}


def restore_sn_buffers(dst: dict, src: dict) -> dict:
    """Copy the spectral-norm u/v buffers from ``src`` into ``dst``.

    The optimizer must not touch the buffers — their grads are zero but
    AdamW's decoupled weight decay would still shrink the unit vectors — so
    the train step restores them after ``optax.apply_updates``.
    """
    msd = list(dst["msd"])
    first = dict(msd[0])

    def copy(d, s):
        return {**d, "u": s["u"], "v_vec": s["v_vec"]} if "u" in d else d

    first["convs"] = [copy(d, s) for d, s in zip(first["convs"], src["msd"][0]["convs"])]
    first["conv_post"] = copy(first["conv_post"], src["msd"][0]["conv_post"])
    msd[0] = first
    return {**dst, "msd": msd}


_MSD_SPEC = [
    # (kernel, stride, groups, out_channels)
    (15, 1, 1, 128),
    (41, 2, 4, 128),
    (41, 2, 16, 256),
    (41, 4, 16, 512),
    (41, 4, 16, 1024),
    (41, 1, 16, 1024),
    (5, 1, 1, 1024),
]


def scale_discriminator_forward(p: dict, x: jnp.ndarray, slope=0.1):
    """x (B, T) -> (score, features).  Convs dispatch on parametrization:
    ``u`` in params = spectral norm (first scale), else weight norm."""
    h = x[..., None]  # (B, T, 1)
    feats = []
    for conv, (k, s, g, _c) in zip(p["convs"], _MSD_SPEC):
        apply = sn_conv if "u" in conv else wn_conv
        h = apply(conv, h, stride=s, padding=k // 2, groups=g)
        h = _lrelu(h, slope)
        feats.append(h)
    apply = sn_conv if "u" in p["conv_post"] else wn_conv
    h = apply(p["conv_post"], h, padding=1)
    feats.append(h)
    return h[..., 0], feats


def init_scale_discriminator(key, use_spectral_norm: bool = False) -> dict:
    keys = jax.random.split(key, len(_MSD_SPEC) + 1)
    init = _init_sn_conv if use_spectral_norm else _init_wn_conv
    convs = []
    cin = 1
    for i, (k, s, g, cout) in enumerate(_MSD_SPEC):
        convs.append(init(keys[i], k, cin // g, cout))
        cin = cout
    return {"convs": convs, "conv_post": init(keys[-1], 3, 1024, 1)}


def _avg_pool(x: jnp.ndarray, k: int = 4, stride: int = 2, pad: int = 2) -> jnp.ndarray:
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    window = jnp.ones((k,), x.dtype) / k
    return jax.lax.conv_general_dilated(
        x[..., None], window[:, None, None], (stride,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0]


def discriminator_forward(p: dict, x: jnp.ndarray):
    """Full HifiganDiscriminator: MPD over 5 periods + MSD over 3 scales.

    Returns (scores, feature_lists) — lists over sub-discriminators.
    """
    scores, feats = [], []
    for i, period in enumerate(MPD_PERIODS):
        s, f = period_discriminator_forward(p["mpd"][i], x, period)
        scores.append(s)
        feats.append(f)
    h = x
    for i in range(3):
        if i > 0:
            h = _avg_pool(h)
        s, f = scale_discriminator_forward(p["msd"][i], h)
        scores.append(s)
        feats.append(f)
    return scores, feats


def init_discriminator(key) -> dict:
    keys = jax.random.split(key, 8)
    return {
        "mpd": [init_period_discriminator(keys[i]) for i in range(5)],
        # scale 1 = spectral norm, scales 2/3 = weight norm — the original
        # HiFi-GAN MSD stack (reference hparams/train.yaml:165-188)
        "msd": [
            init_scale_discriminator(keys[5 + i], use_spectral_norm=(i == 0))
            for i in range(3)
        ],
    }
