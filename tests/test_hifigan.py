"""HiFi-GAN generator/discriminator shapes and one adversarial train step."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy torch-oracle tests; core tier skips

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


def test_spectral_norm_matches_torch():
    """sn_weight + power iteration vs torch.nn.utils.parametrizations.spectral_norm.

    Same initial u/v buffers -> one training-mode torch forward must equal one
    sn_power_iteration followed by sn_weight (weight AND updated buffers).
    """
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(7)
    O, I, K = 6, 4, 15
    w_t = torch.tensor(rng.standard_normal((O, I, K)), dtype=torch.float64)

    conv = torch.nn.Conv1d(I, O, K, bias=False).double()
    with torch.no_grad():
        conv.weight.copy_(w_t)
    conv = torch.nn.utils.parametrizations.spectral_norm(conv)
    sn_mod = conv.parametrizations.weight[0]

    # copy torch's registration-time buffers into the JAX param tree
    # (torch layout (O,I,K) -> conv1d layout (K,I,O))
    p = {
        "w": jnp.asarray(w_t.numpy().transpose(2, 1, 0)),
        "b": jnp.zeros((O,)),
        "u": jnp.asarray(sn_mod._u.detach().numpy()),
        "v_vec": jnp.asarray(sn_mod._v.detach().numpy()),
    }

    conv.train()
    w_eff_torch = conv.weight.detach().numpy()  # does one power iteration

    p2 = hg.sn_power_iteration(p)
    w_eff = np.asarray(hg.sn_weight(p2), np.float64)

    np.testing.assert_allclose(w_eff.transpose(2, 1, 0), w_eff_torch, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p2["u"]), sn_mod._u.detach().numpy(), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(p2["v_vec"]), sn_mod._v.detach().numpy(), rtol=1e-5, atol=1e-8)


def test_sn_buffers_survive_train_step():
    """u/v stay unit-norm through the optimizer (restore_sn_buffers) and the
    power iteration actually advances them."""
    g_params = hg.init_generator(jax.random.PRNGKey(4), CFG)
    d_params = hg.init_discriminator(jax.random.PRNGKey(5))
    u0 = np.asarray(d_params["msd"][0]["convs"][0]["u"])
    mel_consts = gan.make_mel_loss_constants()
    g_tx, d_tx = gan.make_gan_optimizers(2e-4)
    state = gan.GanTrainState(
        g_params, d_params, g_tx.init(g_params), d_tx.init(d_params),
        jnp.zeros((), jnp.int32),
    )
    step = jax.jit(gan.make_gan_train_step(CFG, mel_consts, g_tx, d_tx))
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((2, 2560)) * 0.1, jnp.float32),
    }
    state2, _ = step(state, batch, gan.mel_loss_arrays(mel_consts))
    u1 = np.asarray(state2.d_params["msd"][0]["convs"][0]["u"])
    assert abs(np.linalg.norm(u1) - 1.0) < 1e-5  # not decayed by AdamW
    assert not np.allclose(u0, u1)  # power iteration advanced
    # weight-norm scales untouched by the buffer restore
    assert "g" in state2.d_params["msd"][1]["convs"][0]
