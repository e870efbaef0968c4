"""Encoder/decoder transformer parity tests vs the reference torch modules."""

import numpy as np
import pytest

import jax.numpy as jnp

from simwhisper_codec_tpu.config import DecoderConfig, EncoderConfig
from simwhisper_codec_tpu.models import transformer as jt
from simwhisper_codec_tpu.utils import checkpoint as ckpt

from conftest import HAS_REFERENCE, add_reference_to_path

torch = pytest.importorskip("torch")

ENC = EncoderConfig(
    num_mel_bins=20, d_model=64, encoder_layers=2, encoder_attention_heads=4,
    encoder_ffn_dim=128, is_acoustic=True,
)
DEC = DecoderConfig(
    num_mel_bins=20, d_model=64, decoder_layers=2, decoder_attention_heads=4,
    decoder_ffn_dim=128,
)


def test_sinusoids_match_reference_formula():
    if not HAS_REFERENCE:
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from audiocodec.nn.modules import sinusoids as ref_sin

    ours = jt.sinusoids(100, 64)
    theirs = ref_sin(100, 64).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_encoder_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import OmniAudioEncoder

    torch.manual_seed(1)
    ref = OmniAudioEncoder(
        num_mel_bins=20, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, is_acoustic=True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_encoder(sd, ENC, prefix="")

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((3, 20, 64)).astype(np.float32)  # (B, n_mels, T)
    lens = np.array([64, 40, 9])

    with torch.no_grad():
        out_ref, len_ref = ref(torch.from_numpy(mel), torch.from_numpy(lens))

    out, out_len = jt.encoder_forward(
        ENC, params, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(lens)
    )
    np.testing.assert_array_equal(np.asarray(out_len), len_ref.numpy())
    np.testing.assert_allclose(
        np.asarray(out), out_ref.permute(0, 2, 1).numpy(), atol=5e-5
    )


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_encoder_parity_non_acoustic():
    """is_acoustic=False branch: conv GELUs + positional embedding."""
    add_reference_to_path()
    from audiocodec.nn.modules import OmniAudioEncoder

    torch.manual_seed(2)
    cfg = EncoderConfig(
        num_mel_bins=20, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, is_acoustic=False,
    )
    ref = OmniAudioEncoder(
        num_mel_bins=20, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, is_acoustic=False,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_encoder(sd, cfg, prefix="")
    pos = jt.sinusoids(cfg.max_source_positions, cfg.d_model)

    rng = np.random.default_rng(6)
    mel = rng.standard_normal((2, 20, 32)).astype(np.float32)
    lens = np.array([32, 20])
    with torch.no_grad():
        out_ref, len_ref = ref(torch.from_numpy(mel), torch.from_numpy(lens))
    out, out_len = jt.encoder_forward(
        cfg, params, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(lens), pos_emb=jnp.asarray(pos)
    )
    np.testing.assert_array_equal(np.asarray(out_len), len_ref.numpy())
    np.testing.assert_allclose(np.asarray(out), out_ref.permute(0, 2, 1).numpy(), atol=5e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_decoder_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import OmniAudioDecoder

    torch.manual_seed(3)
    ref = OmniAudioDecoder(
        num_mel_bins=20, d_model=64, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=128,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_decoder(sd, DEC, prefix="")

    rng = np.random.default_rng(7)
    h = rng.standard_normal((2, 64, 24)).astype(np.float32)  # (B, D, T)
    lens = np.array([24, 10])
    with torch.no_grad():
        out_ref, len_ref = ref(torch.from_numpy(h), torch.from_numpy(lens))

    out, out_len = jt.decoder_forward(DEC, params, jnp.asarray(h.transpose(0, 2, 1)), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(out_len), len_ref.numpy())
    assert out.shape == (2, 48, 20)
    np.testing.assert_allclose(np.asarray(out), out_ref.permute(0, 2, 1).numpy(), atol=5e-5)


def test_packed_attention_matches_dense():
    """packed (single-matmul QKV) == dense varlen attention at f32."""
    import jax
    import jax.numpy as jnp

    from simwhisper_codec_tpu.models import transformer as T

    rng = np.random.default_rng(0)
    b, t, d, h = 2, 24, 32, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.3, jnp.float32)
    lengths = jnp.asarray([t, t - 7], jnp.int32)
    p = {
        name: {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32),
               "b": jnp.asarray(rng.standard_normal((d,)) * 0.05, jnp.float32)}
        for name in ("q", "k", "v", "o")
    }
    p["k"]["b"] = jnp.zeros((d,))  # whisper convention: no k bias
    bias = T.attention_bias(lengths, t)
    want = T.varlen_attention(p, x, bias, h, jax.lax.Precision.HIGHEST)
    got = T.packed_attention(p, x, lengths, h, jax.lax.Precision.HIGHEST,
                             score_dtype=jnp.float32)
    # valid region matches; padded queries may differ (they're masked upstream)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want)[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[1, : t - 7], np.asarray(want)[1, : t - 7], atol=2e-5)
