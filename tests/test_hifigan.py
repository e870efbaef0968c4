"""HiFi-GAN generator/discriminator shapes and one adversarial train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.models import hifigan as hg
from simwhisper_codec_tpu.train import gan

CFG = hg.HifiGanConfig(in_channels=16, upsample_initial_channel=64)


def test_generator_shapes():
    params = hg.init_generator(jax.random.PRNGKey(0), CFG)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 16)), jnp.float32)
    y = hg.generator_forward(CFG, params, feats)
    assert y.shape == (2, 8 * 320)  # total upsample 5*4*4*2*2 = 320
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.abs(y).max()) <= 1.0  # tanh output


def test_discriminator_shapes():
    params = hg.init_discriminator(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2560)) * 0.1, jnp.float32)
    scores, feats = hg.discriminator_forward(params, x)
    assert len(scores) == 8  # 5 periods + 3 scales
    assert len(feats) == 8
    for s in scores:
        assert s.shape[0] == 2
        assert np.isfinite(np.asarray(s)).all()


def test_gan_train_step_runs_and_improves_spec_loss():
    g_params = hg.init_generator(jax.random.PRNGKey(2), CFG)
    d_params = hg.init_discriminator(jax.random.PRNGKey(3))
    mel_consts = gan.make_mel_loss_constants()
    g_tx, d_tx = gan.make_gan_optimizers(learning_rate=1e-3)
    state = gan.GanTrainState(
        g_params, d_params, g_tx.init(g_params), d_tx.init(d_params), jnp.zeros((), jnp.int32)
    )
    step = jax.jit(gan.make_gan_train_step(CFG, mel_consts, g_tx, d_tx))

    rng = np.random.default_rng(4)
    batch = {
        "features": jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((2, 2560)) * 0.1, jnp.float32),
    }
    mel_arrays = gan.mel_loss_arrays(mel_consts)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, mel_arrays)
        losses.append(float(metrics["l1_spec"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.step) == 3
    # overfitting a single batch: spectral loss should not explode
    assert losses[-1] < losses[0] * 1.5


def test_lr_decay():
    g_params = hg.init_generator(jax.random.PRNGKey(5), CFG)
    d_params = hg.init_discriminator(jax.random.PRNGKey(6))
    g_tx, d_tx = gan.make_gan_optimizers(learning_rate=2e-4)
    state = gan.GanTrainState(
        g_params, d_params, g_tx.init(g_params), d_tx.init(d_params), jnp.zeros((), jnp.int32)
    )
    lr0 = float(state.g_opt.hyperparams["learning_rate"])
    state = gan.decay_learning_rate(state, gamma=0.5)
    assert abs(float(state.g_opt.hyperparams["learning_rate"]) - lr0 * 0.5) < 1e-12


def test_sample_segment_alignment():
    rng = np.random.default_rng(7)
    audio = rng.standard_normal(32000).astype(np.float32)
    feats = rng.standard_normal((100, 16)).astype(np.float32)
    a, f = gan.sample_segment(rng, audio, feats, segment_size=8960, feature_hop=320)
    assert a.shape == (8960,)
    assert f.shape == (28, 16)
    # alignment: find f's row in feats to locate start
    start = next(i for i in range(100 - 27) if np.allclose(feats[i : i + 28], f))
    np.testing.assert_allclose(a, audio[start * 320 : start * 320 + 8960])
