"""Full codec adversarial trainer (the reference's unreleased-trainer capability).

The reference ships ``AudioCodec.forward`` (model.py:112-165) and DDP
scaffolding but gitignores its trainer and discriminators (.gitignore:1-8).
This module completes the training story TPU-natively: the codec training
forward (frozen encoder, FSQ with STE) paired with HiFi-GAN MPD+MSD
discriminators and the standard codec GAN recipe (MSE-GAN + feature-match +
multi-scale mel reconstruction), as one jitted D-step/G-step program whose
batch shards over the ``data`` mesh axis.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from simwhisper_codec_tpu.config import CodecConfig
from simwhisper_codec_tpu.models.codec import CodecConstants, training_forward
from simwhisper_codec_tpu.models.hifigan import (
    discriminator_forward,
    restore_sn_buffers,
    spectral_norm_power_iteration,
)
from simwhisper_codec_tpu.train.gan import (
    MelLossArrays,
    MelLossConstants,
    feature_match_loss,
    log_mel_for_loss,
    make_mel_loss_constants,
    mel_loss_arrays,
    mse_d_loss,
    mse_g_loss,
)
from simwhisper_codec_tpu.train.step import _label_frozen


class CodecGanState(NamedTuple):
    params: dict       # codec params (encoder frozen via optimizer mask)
    d_params: dict     # discriminator params
    g_opt: optax.OptState
    d_opt: optax.OptState
    step: jnp.ndarray


def make_codec_gan_optimizers(cfg: CodecConfig, learning_rate: float = 2e-4):
    g_tx = optax.multi_transform(
        {
            "train": optax.adamw(learning_rate, b1=0.8, b2=0.99),
            "frozen": optax.set_to_zero(),
        },
        _label_frozen,
    )
    d_tx = optax.adamw(learning_rate, b1=0.8, b2=0.99)
    return g_tx, d_tx


def make_codec_gan_step(
    cfg: CodecConfig,
    consts: CodecConstants,
    mel_consts: MelLossConstants,
    g_tx,
    d_tx,
    adv_weight: float = 1.0,
    feat_match_weight: float = 10.0,
    mel_weight: float = 45.0,
):
    """(state, batch, mel_arrays) -> (state, metrics); batch has
    mel/mel_lens/audio/audio_lens.  ``mel_arrays = mel_loss_arrays(mel_consts)``
    is a jit argument so the loss DFT bases are not inlined into the HLO
    (TPU_NOTES quirk #4 — the tunnel 413s large constant-heavy programs)."""

    def fwd(params, batch):
        out = training_forward(cfg, consts, params, batch["mel"], batch["mel_lens"])
        recon = out["reconstructed_audio"]
        t = min(recon.shape[-1], batch["audio"].shape[-1])
        return recon[..., :t], batch["audio"][..., :t]

    def step(
        state: CodecGanState, batch, mel_arrays: MelLossArrays
    ) -> Tuple[CodecGanState, Dict[str, jnp.ndarray]]:
        fake, real = fwd(state.params, batch)
        fake_sg = jax.lax.stop_gradient(fake)

        # advance spectral-norm u/v buffers once per step (hifigan.py)
        state = state._replace(
            d_params=spectral_norm_power_iteration(state.d_params)
        )

        def d_loss_fn(d_params):
            sf, _ = discriminator_forward(d_params, fake_sg)
            sr, _ = discriminator_forward(d_params, real)
            loss, *_ = mse_d_loss(sr, sf)
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        d_params = restore_sn_buffers(d_params, state.d_params)

        def g_loss_fn(params):
            y_hat, target = fwd(params, batch)
            sf, ff = discriminator_forward(d_params, y_hat)
            _, fr = discriminator_forward(d_params, target)
            adv = mse_g_loss(sf)
            fm = feature_match_loss(fr, ff)
            mel_l1 = jnp.mean(
                jnp.abs(
                    log_mel_for_loss(mel_consts, y_hat, mel_arrays)
                    - log_mel_for_loss(mel_consts, target, mel_arrays)
                )
            )
            total = adv_weight * adv + feat_match_weight * fm + mel_weight * mel_l1
            return total, {"adv": adv, "feat_match": fm, "mel_l1": mel_l1}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.params)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.params)
        params = optax.apply_updates(state.params, g_updates)

        metrics = {"g_loss": g_loss, "d_loss": d_loss, **aux}
        return CodecGanState(params, d_params, g_opt, d_opt, state.step + 1), metrics

    return step


def init_codec_gan_state(cfg: CodecConfig, params: dict, d_params: dict, g_tx, d_tx) -> CodecGanState:
    return CodecGanState(
        params=params,
        d_params=d_params,
        g_opt=g_tx.init(params),
        d_opt=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
    )
