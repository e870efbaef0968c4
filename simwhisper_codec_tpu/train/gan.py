"""HiFi-GAN adversarial training: losses + jitted two-optimizer step.

Capability target: the reference's SpeechBrain GAN loop
(``hifigan_experiments/hifigan_continue_whisper/train.py:106-151``):
per batch — D step on detached fake, fresh D scores with the updated D, then
G step; AdamW (lr 2e-4, betas 0.8/0.99) x2 with per-epoch ExponentialLR
(gamma 0.9999); losses = MSE-GAN (w 1) + feature-match (w 10) + L1 log-mel
(w 45) per ``hparams/train.yaml:140-228``.

The whole (D update -> re-score -> G update) sequence is ONE jitted TPU
program; batch shards over the ``data`` mesh axis like the codec train step.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simwhisper_codec_tpu.models.hifigan import (
    HifiGanConfig,
    discriminator_forward,
    generator_forward,
    restore_sn_buffers,
    spectral_norm_power_iteration,
)
from simwhisper_codec_tpu.ops.mel import frame_signal, slaney_mel_filter_bank


class MelLossConstants(NamedTuple):
    basis_re: np.ndarray
    basis_im: np.ndarray
    mel_fb: np.ndarray
    n_fft: int
    hop: int


class MelLossArrays(NamedTuple):
    """The array-only view of MelLossConstants, passed as a jit ARGUMENT.

    The DFT bases are ~0.5 MB each; closing over them inside a traced loss
    inlines them as HLO constants, which the axon tunnel rejects for large
    programs (docs/TPU_NOTES.md quirk #4: HTTP 413).  Passing them as
    arguments keeps the HLO small and lets XLA keep one device copy.
    """

    basis_re: jnp.ndarray
    basis_im: jnp.ndarray
    mel_fb: jnp.ndarray


def mel_loss_arrays(consts: MelLossConstants) -> MelLossArrays:
    return MelLossArrays(
        jnp.asarray(consts.basis_re),
        jnp.asarray(consts.basis_im),
        jnp.asarray(consts.mel_fb),
    )


def make_mel_loss_constants(
    sample_rate: int = 16000, n_fft: int = 1024, win: int = 1024, hop: int = 256,
    n_mels: int = 80, f_min: float = 0.0, f_max: float = None,
) -> MelLossConstants:
    """torchaudio-style MelSpectrogram constants (power=1, slaney norm+scale)."""
    f_max = f_max if f_max is not None else sample_rate / 2
    n_freq = n_fft // 2 + 1
    fb = slaney_mel_filter_bank(n_freq, n_mels, f_min, f_max, sample_rate)
    n = np.arange(win, dtype=np.float64)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win))
    if win < n_fft:
        lp = (n_fft - win) // 2
        window = np.pad(window, (lp, n_fft - win - lp))
    m = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(m, k) / n_fft
    return MelLossConstants(
        basis_re=(np.cos(phase) * window[:, None]).astype(np.float32),
        basis_im=(-np.sin(phase) * window[:, None]).astype(np.float32),
        mel_fb=fb.astype(np.float32),
        n_fft=n_fft,
        hop=hop,
    )


def log_mel_for_loss(
    consts: MelLossConstants, wav: jnp.ndarray, arrays: MelLossArrays = None
) -> jnp.ndarray:
    """(B, S) -> (B, T, n_mels) log(clamp(mel(|STFT|), 1e-5)) (dynamic range compression).

    ``arrays`` should be passed through the enclosing jit's arguments; when
    omitted the bases are materialized from ``consts`` (inlined as constants —
    fine for eager/small uses, avoid inside large jitted programs).
    """
    if arrays is None:
        arrays = mel_loss_arrays(consts)
    n_frames = wav.shape[-1] // consts.hop + 1
    frames = frame_signal(wav, consts.n_fft, consts.hop, n_frames)
    re = frames @ arrays.basis_re
    im = frames @ arrays.basis_im
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    mel = mag @ arrays.mel_fb
    return jnp.log(jnp.clip(mel, min=1e-5))


# -- losses (speechbrain HifiGAN loss family) --------------------------------


def mse_g_loss(scores_fake) -> jnp.ndarray:
    return sum(jnp.mean((1.0 - s) ** 2) for s in scores_fake)


def mse_d_loss(scores_real, scores_fake) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    loss_real = sum(jnp.mean((1.0 - s) ** 2) for s in scores_real)
    loss_fake = sum(jnp.mean(s**2) for s in scores_fake)
    return loss_real + loss_fake, loss_real, loss_fake


def feature_match_loss(feats_real, feats_fake) -> jnp.ndarray:
    total = 0.0
    count = 0
    for fr_list, ff_list in zip(feats_real, feats_fake):
        for fr, ff in zip(fr_list, ff_list):
            total += jnp.mean(jnp.abs(jax.lax.stop_gradient(fr) - ff))
            count += 1
    return total / max(count, 1)


class GanTrainState(NamedTuple):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState
    step: jnp.ndarray


def make_gan_optimizers(learning_rate: float = 2e-4, b1: float = 0.8, b2: float = 0.99):
    """AdamW pair with injectable LR schedule (ExponentialLR applied per epoch
    by the driver via optax.scale_by_schedule-compatible inject)."""
    g_tx = optax.inject_hyperparams(optax.adamw)(learning_rate=learning_rate, b1=b1, b2=b2)
    d_tx = optax.inject_hyperparams(optax.adamw)(learning_rate=learning_rate, b1=b1, b2=b2)
    return g_tx, d_tx


def make_gan_train_step(
    gcfg: HifiGanConfig,
    mel_consts: MelLossConstants,
    g_tx,
    d_tx,
    mseg_weight: float = 1.0,
    feat_match_weight: float = 10.0,
    l1_spec_weight: float = 45.0,
):
    """One jitted program: G fwd -> D step (detached fake) -> fresh scores -> G step.

    The returned step takes ``(state, batch, mel_arrays)`` — pass
    ``mel_loss_arrays(mel_consts)`` so the DFT bases travel as arguments
    rather than HLO constants (TPU_NOTES quirk #4).
    """

    def step(
        state: GanTrainState, batch, mel_arrays: MelLossArrays
    ) -> Tuple[GanTrainState, Dict[str, jnp.ndarray]]:
        feats, audio = batch["features"], batch["audio"]  # (B,T,C), (B,S)

        fake = generator_forward(gcfg, state.g_params, feats)
        fake_sg = jax.lax.stop_gradient(fake)

        # advance the first-MSD-scale spectral-norm u/v buffers once per step
        # (the torch original iterates inside each forward; see hifigan.py)
        state = state._replace(
            d_params=spectral_norm_power_iteration(state.d_params)
        )

        def d_loss_fn(d_params):
            scores_fake, _ = discriminator_forward(d_params, fake_sg)
            scores_real, _ = discriminator_forward(d_params, audio)
            loss, lr_, lf_ = mse_d_loss(scores_real, scores_fake)
            return loss, (lr_, lf_)

        (d_loss, (d_real, d_fake)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        d_params = restore_sn_buffers(d_params, state.d_params)

        def g_loss_fn(g_params):
            y_hat = generator_forward(gcfg, g_params, feats)
            scores_fake, feats_fake = discriminator_forward(d_params, y_hat)
            _, feats_real = discriminator_forward(d_params, audio)
            adv = mse_g_loss(scores_fake)
            fm = feature_match_loss(feats_real, feats_fake)
            l1_spec = jnp.mean(
                jnp.abs(
                    log_mel_for_loss(mel_consts, y_hat, mel_arrays)
                    - log_mel_for_loss(mel_consts, audio, mel_arrays)
                )
            )
            total = mseg_weight * adv + feat_match_weight * fm + l1_spec_weight * l1_spec
            return total, {"adv": adv, "feat_match": fm, "l1_spec": l1_spec}

        (g_loss, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss,
            "d_real": d_real,
            "d_fake": d_fake,
            **g_metrics,
        }
        return (
            GanTrainState(g_params, d_params, g_opt, d_opt, state.step + 1),
            metrics,
        )

    return step


def decay_learning_rate(state: GanTrainState, gamma: float = 0.9999) -> GanTrainState:
    """Per-epoch ExponentialLR on both optimizers (train.yaml:246-252)."""

    def scale(opt_state):
        opt_state.hyperparams["learning_rate"] = opt_state.hyperparams["learning_rate"] * gamma
        return opt_state

    return state._replace(g_opt=scale(state.g_opt), d_opt=scale(state.d_opt))


def sample_segment(
    rng: np.random.Generator,
    audio: np.ndarray,
    features: np.ndarray,
    segment_size: int,
    feature_hop: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Aligned random crop: audio segment + matching feature window.

    Mirrors the reference's ``sample_interval`` LCM alignment
    (hifigan_continue_whisper/train.py:314-334): crop starts are drawn on the
    feature grid so audio[s*hop : s*hop+segment] aligns with features
    [s : s + segment//hop].
    """
    feat_len = segment_size // feature_hop
    max_start = min(len(audio) // feature_hop, len(features)) - feat_len
    start = int(rng.integers(0, max_start + 1)) if max_start > 0 else 0
    a = audio[start * feature_hop : start * feature_hop + segment_size]
    f = features[start : start + feat_len]
    if len(a) < segment_size:
        a = np.pad(a, (0, segment_size - len(a)))
    if len(f) < feat_len:
        f = np.pad(f, ((0, feat_len - len(f)), (0, 0)))
    return a, f
