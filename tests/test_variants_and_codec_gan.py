"""Variant Vocos modules parity + generic Transformer + codec GAN trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import HAS_REFERENCE, add_reference_to_path

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_resnet_backbone_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import VocosResNetBackbone

    from simwhisper_codec_tpu.models import vocos_variants as vv

    torch.manual_seed(0)
    ref = VocosResNetBackbone(input_channels=12, dim=24, num_blocks=2).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = vv.convert_vocos_resnet_backbone(sd, "", num_blocks=2)

    x = np.random.default_rng(0).standard_normal((2, 12, 30)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()  # (B, T, C)
    y = np.asarray(vv.vocos_resnet_backbone(p, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(y, y_ref, atol=3e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_imdct_heads_parity():
    add_reference_to_path()
    import scipy.signal

    if not hasattr(scipy.signal, "cosine"):
        scipy.signal.cosine = scipy.signal.windows.cosine
    from audiocodec.nn.modules import IMDCTCosHead, IMDCTSymExpHead

    from simwhisper_codec_tpu.models import vocos_variants as vv
    from simwhisper_codec_tpu.utils.checkpoint import _linear

    torch.manual_seed(1)
    x = np.random.default_rng(1).standard_normal((2, 10, 16)).astype(np.float32) * 0.3

    ref_sym = IMDCTSymExpHead(dim=16, mdct_frame_len=32).eval()
    sd = {k: v.detach().numpy() for k, v in ref_sym.state_dict().items()}
    consts = vv.IMDCTHeadConstants(32)
    with torch.no_grad():
        y_ref = ref_sym(torch.from_numpy(x)).numpy()
    y = np.asarray(vv.imdct_symexp_head(consts, {"out": _linear(sd, "out")}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4)

    ref_cos = IMDCTCosHead(dim=16, mdct_frame_len=32).eval()
    sd = {k: v.detach().numpy() for k, v in ref_cos.state_dict().items()}
    with torch.no_grad():
        y_ref = ref_cos(torch.from_numpy(x)).numpy()
    y = np.asarray(vv.imdct_cos_head(consts, {"out": _linear(sd, "out")}, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_generic_transformer_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import Transformer

    from simwhisper_codec_tpu.models import transformer as jt
    from simwhisper_codec_tpu.utils.checkpoint import _layer_norm, _stack, _transformer_layer

    torch.manual_seed(2)
    ref = Transformer(
        input_dim=32, d_model=32, output_dim=32, max_source_positions=50,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = {
        "layers": _stack([_transformer_layer(sd, f"layers.{i}") for i in range(2)]),
        "ln": _layer_norm(sd, "layer_norm"),
    }
    pos = jt.sinusoids(50, 32)

    x = np.random.default_rng(2).standard_normal((2, 32, 20)).astype(np.float32)
    lens = np.array([20, 9])
    with torch.no_grad():
        y_ref, l_ref = ref(torch.from_numpy(x), torch.from_numpy(lens))
    y, l = jt.generic_transformer_forward(
        p, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(lens), 4, jnp.asarray(pos)
    )
    np.testing.assert_array_equal(np.asarray(l), l_ref.numpy())
    # reference returns (B, T, D) here (no final transpose, modules.py:729-732)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=5e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_ada_layer_norm_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import AdaLayerNorm

    from simwhisper_codec_tpu.models.vocos_variants import ada_layer_norm

    torch.manual_seed(3)
    ref = AdaLayerNorm(num_embeddings=4, embedding_dim=8).eval()
    with torch.no_grad():
        ref.scale.weight.add_(torch.randn_like(ref.scale.weight) * 0.1)
        ref.shift.weight.add_(torch.randn_like(ref.shift.weight) * 0.1)
    p = {
        "scale": ref.scale.weight.detach().numpy(),
        "shift": ref.shift.weight.detach().numpy(),
    }
    x = np.random.default_rng(3).standard_normal((2, 5, 8)).astype(np.float32)
    cond = np.array(3)  # reference supports scalar cond ids only
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cond)).numpy()
    y = np.asarray(ada_layer_norm(p, jnp.asarray(x), jnp.asarray(cond)))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_codec_gan_step():
    from simwhisper_codec_tpu.models.codec import CodecConstants, init_params
    from simwhisper_codec_tpu.models.hifigan import init_discriminator
    from simwhisper_codec_tpu.train import codec_gan
    from simwhisper_codec_tpu.train.gan import make_mel_loss_constants, mel_loss_arrays

    from test_parallel import TINY

    cfg = TINY
    consts = CodecConstants(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    d_params = init_discriminator(jax.random.PRNGKey(1))
    g_tx, d_tx = codec_gan.make_codec_gan_optimizers(cfg)
    state = codec_gan.init_codec_gan_state(cfg, params, d_params, g_tx, d_tx)
    mel_consts = make_mel_loss_constants()
    step = jax.jit(codec_gan.make_codec_gan_step(cfg, consts, mel_consts, g_tx, d_tx))

    rng = np.random.default_rng(0)
    t_mel = 16  # -> 8 enc frames -> 2 codes -> 16 mel out -> 2560 samples
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, t_mel, 80)), jnp.float32),
        "mel_lens": jnp.full((2,), t_mel, jnp.int32),
        "audio": jnp.asarray(rng.standard_normal((2, t_mel * 160)) * 0.1, jnp.float32),
        "audio_lens": jnp.full((2,), t_mel * 160, jnp.int32),
    }
    enc_before = jax.tree.leaves(state.params["encoder"])[0].copy()
    state, metrics = step(state, batch, mel_loss_arrays(mel_consts))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # frozen encoder unchanged, decoder changed
    enc_after = jax.tree.leaves(state.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc_before), np.asarray(enc_after))
    dec_delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(params["decoder"]), jax.tree.leaves(state.params["decoder"]))
    )
    assert dec_delta > 0


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_codec_gan_state_resume_roundtrip(tmp_path):
    """Orbax save/restore of the trainer state preserves params + step exactly
    (the --resume path of experiments/codec/train.py)."""
    from simwhisper_codec_tpu.models.codec import CodecConstants, init_params
    from simwhisper_codec_tpu.models.hifigan import init_discriminator
    from simwhisper_codec_tpu.train import codec_gan
    from simwhisper_codec_tpu.utils.checkpoint import load_orbax, save_orbax

    from test_parallel import TINY

    params = init_params(jax.random.PRNGKey(0), TINY)
    d_params = init_discriminator(jax.random.PRNGKey(1))
    g_tx, d_tx = codec_gan.make_codec_gan_optimizers(TINY)
    state = codec_gan.init_codec_gan_state(TINY, params, d_params, g_tx, d_tx)
    state = state._replace(step=jnp.asarray(7, jnp.int32))

    save_orbax(str(tmp_path / "ckpt"), state._asdict())
    restored = codec_gan.CodecGanState(**load_orbax(str(tmp_path / "ckpt"), state._asdict()))
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
