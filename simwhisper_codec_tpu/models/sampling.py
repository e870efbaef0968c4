"""Frame-stack down/up sampling (50 Hz <-> 12.5 Hz) with Snake residual units.

Reference: ``audiocodec/nn/modules.py:476-634`` (FrameStackDownConv /
FrameStackUpConv) and ``modules.py:37-49`` (ResidualUnit).

TPU-first notes: everything is channels-last (B, T, C); the frame stack /
unstack are pure reshapes laid out so imported torch conv weights line up
(reference channel order ``(d s)``: channel c = d*stack + s_i).  The three
ResidualUnits have distinct dilations (1, 3, 9), so they are unrolled rather
than scanned — each is 2 convs + 2 alias-free activations, all fused by XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.config import SampleStackConfig
from simwhisper_codec_tpu.ops.conv import conv1d
from simwhisper_codec_tpu.ops.snake import AliasFreeConstants, activation1d


def residual_unit(
    af: AliasFreeConstants, p: dict, x: jnp.ndarray, dilation: int
) -> jnp.ndarray:
    """Snake -> WN conv k7 (dilated) -> Snake -> WN conv k1, residual (modules.py:37-49)."""
    pad = (7 - 1) * dilation // 2
    h = activation1d(af, x, p["snake1"]["alpha"], p["snake1"]["beta"])
    h = conv1d(h, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation, padding=pad)
    h = activation1d(af, h, p["snake2"]["alpha"], p["snake2"]["beta"])
    h = conv1d(h, p["conv2"]["w"], p["conv2"]["b"])
    return x + h


def frame_stack_down(
    cfg: SampleStackConfig,
    af: AliasFreeConstants,
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, in_dim) -> (B, ceil(T/s), latent_dim)  (modules.py:519-550)."""
    s = cfg.stack_factor
    b, t, d = x.shape
    out_lengths = (lengths + s - 1) // s
    t_pad = (t + s - 1) // s * s
    if t_pad > t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    # stack: out channel c = d*s + s_i  (reference 'b d (t s) -> b (d s) t')
    x = x.reshape(b, t_pad // s, s, d).transpose(0, 1, 3, 2).reshape(b, t_pad // s, d * s)
    h = conv1d(x, p["in_proj"]["w"], p["in_proj"]["b"])
    for i, dil in enumerate(cfg.dilations):
        h = residual_unit(af, p["res_blocks"][i], h, dil)
    z = conv1d(h, p["to_latent"]["w"], p["to_latent"]["b"])
    return z, out_lengths


def frame_stack_up(
    cfg: SampleStackConfig,
    af: AliasFreeConstants,
    p: dict,
    z: jnp.ndarray,
    lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, latent_dim) -> (B, T*s, out_dim)  (modules.py:601-631)."""
    s = cfg.stack_factor
    h = conv1d(z, p["from_latent"]["w"], p["from_latent"]["b"])
    for i, dil in enumerate(cfg.dilations):
        h = residual_unit(af, p["res_blocks"][i], h, dil)
    h = conv1d(h, p["to_stacked"]["w"], p["to_stacked"]["b"])
    b, t, _ = h.shape
    d = cfg.out_dim
    # unstack: channel c = d*s + s_i -> time t*s + s_i  ('b (d s) t -> b d (t s)')
    y = h.reshape(b, t, d, s).transpose(0, 1, 3, 2).reshape(b, t * s, d)
    return y, lengths * s


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _init_conv(key, w_shape):
    return {"w": _trunc_normal(key, w_shape), "b": jnp.zeros((w_shape[-1],), jnp.float32)}


def _init_res_unit(key, dim):
    keys = jax.random.split(key, 2)

    def zeros():
        # fresh buffer per leaf — shared buffers break argument donation
        return jnp.zeros((dim,), jnp.float32)

    return {
        "snake1": {"alpha": zeros(), "beta": zeros()},
        "conv1": _init_conv(keys[0], (7, dim, dim)),
        "snake2": {"alpha": zeros(), "beta": zeros()},
        "conv2": _init_conv(keys[1], (1, dim, dim)),
    }


def init_frame_stack_down(key, cfg: SampleStackConfig) -> dict:
    keys = jax.random.split(key, 2 + len(cfg.dilations))
    stacked = cfg.in_dim * cfg.stack_factor
    return {
        "in_proj": _init_conv(keys[0], (1, stacked, cfg.hidden_dim)),
        "res_blocks": [
            _init_res_unit(keys[2 + i], cfg.hidden_dim) for i in range(len(cfg.dilations))
        ],
        "to_latent": _init_conv(keys[1], (1, cfg.hidden_dim, cfg.latent_dim)),
    }


def init_frame_stack_up(key, cfg: SampleStackConfig) -> dict:
    keys = jax.random.split(key, 2 + len(cfg.dilations))
    stacked = cfg.out_dim * cfg.stack_factor
    return {
        "from_latent": _init_conv(keys[0], (1, cfg.latent_dim, cfg.hidden_dim)),
        "res_blocks": [
            _init_res_unit(keys[2 + i], cfg.hidden_dim) for i in range(len(cfg.dilations))
        ],
        "to_stacked": _init_conv(keys[1], (1, cfg.hidden_dim, stacked)),
    }
