"""Sharded training step for the codec (DP x TP over a device mesh).

The reference deliberately excludes its codec trainer (.gitignore:1-8); the
surviving ``AudioCodec.forward`` (model.py:112-165) defines the training
forward: mel -> encoder (frozen) -> downsample -> FSQ (STE) -> upsample ->
decoder -> Vocos -> waveform.  This module provides the TPU-native training
loop around it: multi-scale mel + waveform reconstruction losses, AdamW with
the frozen-encoder mask (model.py:90-99), and a jitted step whose batch is
sharded over the ``data`` mesh axis and whose matmuls are tensor-parallel
over ``model`` (see parallel/mesh.py).  Adversarial (GAN) training lives in
train/gan.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simwhisper_codec_tpu.config import CodecConfig
from simwhisper_codec_tpu.models.codec import CodecConstants, training_forward
from simwhisper_codec_tpu.ops import mel as mel_ops


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _label_frozen(params: dict) -> dict:
    """'frozen' for the acoustic encoder (reference freezes it), else 'train'."""
    return {k: jax.tree.map(lambda _: "frozen" if k == "encoder" else "train", v)
            for k, v in params.items()}


def make_optimizer(cfg: CodecConfig, learning_rate: float = 1e-4, weight_decay: float = 1e-2):
    tx = optax.multi_transform(
        {
            "train": optax.adamw(learning_rate, b1=0.9, b2=0.99, weight_decay=weight_decay),
            "frozen": optax.set_to_zero(),
        },
        _label_frozen,
    )
    return tx


SPECTRAL_SCALES: Tuple[Tuple[int, int], ...] = ((512, 128), (1024, 256), (2048, 512))


class SpectralLossConsts(NamedTuple):
    """Windowed DFT bases for the multi-scale spectral loss, one pair per scale.

    Passed as a jit ARGUMENT, never closed over: the (2048, 1025) bases alone
    are ~17 MB, and inlining them as HLO constants makes the compile payload
    exceed the axon tunnel's request limit (TPU_NOTES quirk #4, HTTP 413).
    """

    cos_bases: Tuple[jnp.ndarray, ...]
    sin_bases: Tuple[jnp.ndarray, ...]


def make_spectral_consts(
    scales: Tuple[Tuple[int, int], ...] = SPECTRAL_SCALES,
) -> SpectralLossConsts:
    cos_bases, sin_bases = [], []
    for n_fft, _hop in scales:
        n = np.arange(n_fft)
        window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
        k = np.arange(n_fft // 2 + 1)
        phase = 2.0 * np.pi * np.outer(n, k) / n_fft
        cos_bases.append(jnp.asarray((np.cos(phase) * window[:, None]).astype(np.float32)))
        sin_bases.append(jnp.asarray((-np.sin(phase) * window[:, None]).astype(np.float32)))
    return SpectralLossConsts(tuple(cos_bases), tuple(sin_bases))


def stft_mag(x: jnp.ndarray, hop: int, cos_b: jnp.ndarray, sin_b: jnp.ndarray) -> jnp.ndarray:
    """|STFT| for spectral losses, via the framing + matmul-DFT path."""
    n_fft = cos_b.shape[0]
    n_frames = x.shape[-1] // hop
    frames = mel_ops.frame_signal(x, n_fft, hop, n_frames)
    re = frames @ cos_b
    im = frames @ sin_b
    return jnp.sqrt(re * re + im * im + 1e-9)


def reconstruction_loss(
    cfg: CodecConfig,
    recon: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
    spec_consts: SpectralLossConsts = None,
    scales: Tuple[Tuple[int, int], ...] = SPECTRAL_SCALES,
) -> Dict[str, jnp.ndarray]:
    """Multi-scale spectral + L1 waveform loss (the standard codec recipe the
    reference's unreleased trainer would pair with its GAN losses)."""
    if spec_consts is None:
        spec_consts = make_spectral_consts(scales)
    t = min(recon.shape[-1], target.shape[-1])
    recon, target = recon[..., :t], target[..., :t]
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(recon.dtype)
    denom = jnp.maximum(mask.sum(), 1.0)

    wav_l1 = jnp.sum(jnp.abs(recon - target) * mask) / denom

    spec_loss = 0.0
    for (n_fft, hop), cos_b, sin_b in zip(scales, spec_consts.cos_bases, spec_consts.sin_bases):
        if t < n_fft:
            continue
        mr = stft_mag(recon, hop, cos_b, sin_b)
        mt = stft_mag(target, hop, cos_b, sin_b)
        spec_loss += jnp.mean(jnp.abs(mr - mt))
        spec_loss += jnp.mean(jnp.abs(jnp.log(mr + 1e-5) - jnp.log(mt + 1e-5)))

    total = wav_l1 + spec_loss
    return {"loss": total, "wav_l1": wav_l1, "spec": spec_loss}


def make_train_step(
    cfg: CodecConfig,
    consts: CodecConstants,
    tx,
    scales: Tuple[Tuple[int, int], ...] = SPECTRAL_SCALES,
):
    """Build the jittable (shardable) train step:
    (state, batch, spec_consts) -> (state, metrics).

    batch = {"mel": (B, T_mel, n_mels), "mel_lens": (B,),
             "audio": (B, S), "audio_lens": (B,)}
    ``spec_consts = make_spectral_consts(scales)`` travels as an argument so
    the loss DFT bases are jit parameters, not inlined HLO constants.
    """

    def loss_fn(params, batch, spec_consts):
        out = training_forward(cfg, consts, params, batch["mel"], batch["mel_lens"])
        losses = reconstruction_loss(
            cfg, out["reconstructed_audio"], batch["audio"], batch["audio_lens"],
            spec_consts, scales,
        )
        return losses["loss"], losses

    def train_step(
        state: TrainState, batch, spec_consts: SpectralLossConsts
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, spec_consts
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(cfg: CodecConfig, params: dict, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
