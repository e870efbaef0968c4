"""Speaker-SIM parity: JAX ECAPA + WavLM frontend vs the reference torch code.

The reference scores SIM with ``ECAPA_TDNN_SMALL(feat_dim=1024,
feat_type='wavlm_large')`` (``/root/reference/tools/speaker/``).  Oracles:

 * the ECAPA trunk — the reference module itself, loaded with its
   fairseq/s3prl imports stubbed out (they are only needed for the upstream
   download path, not the math), random weights, through the real converter;
 * the WavLM tower — HF torch (test_ssl.py) + a key-layout roundtrip for the
   microsoft/UniSpeech naming used by the published checkpoint;
 * the weighted-sum + instance-norm frontend — torch reimplementation of
   ``get_feat`` (ecapa_tdnn.py:253-277).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # heavy torch-oracle tests; core tier skips

from simwhisper_codec_tpu.eval import speaker as jspk
from simwhisper_codec_tpu.models import ssl as jssl

REF_ECAPA = Path("/root/reference/tools/speaker/utils/ecapa_tdnn.py")


@pytest.fixture(scope="module")
def ref_ecapa_module():
    """Load the reference ECAPA module with its heavy deps stubbed.

    ``from .utils import UpstreamExpert`` pulls fairseq/s3prl and
    ``torchaudio.transforms`` has no wheel here; neither is needed to run the
    trunk math, so stub both and exec the file standalone.
    """
    if not REF_ECAPA.exists():
        pytest.skip("reference repo not mounted")
    src = REF_ECAPA.read_text()
    src = src.replace("from .utils import UpstreamExpert", "UpstreamExpert = None")
    src = src.replace("import torchaudio.transforms as trans", "trans = _stub_trans")

    class _StubMel(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

    mod = types.ModuleType("ref_ecapa")
    mod._stub_trans = types.SimpleNamespace(
        MelSpectrogram=_StubMel, MFCC=_StubMel, Resample=_StubMel
    )
    exec(compile(src, str(REF_ECAPA), "exec"), mod.__dict__)
    return mod


def test_instance_norm_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 40, 7)).astype(np.float32) * 3 + 1
    inorm = torch.nn.InstanceNorm1d(7)
    ref = inorm(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    got = np.asarray(jspk.instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ecapa_trunk_matches_reference(ref_ecapa_module):
    """Random-weight reference ECAPA vs converted JAX forward, bit-tight."""
    torch.manual_seed(0)
    # small channels keep the test fast; scale stays 8 as in the reference
    ref = ref_ecapa_module.ECAPA_TDNN(
        feat_dim=24, channels=64, emb_dim=32, feat_type="fbank"
    ).eval()
    # lawlict hardcodes cat 1536 for channels=512; rebuild the tail for c=64
    cat = 3 * 64
    ref.conv = torch.nn.Conv1d(cat, cat, kernel_size=1)
    ref.pooling = ref_ecapa_module.AttentiveStatsPool(cat, attention_channels=16)
    ref.bn = torch.nn.BatchNorm1d(2 * cat)
    ref.linear = torch.nn.Linear(2 * cat, 32)
    ref.eval()
    # randomize BN stats so the test catches mean/var wiring
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jspk.convert_ecapa_state_dict(sd)

    feats = np.random.default_rng(1).standard_normal((2, 50, 24)).astype(np.float32)
    feats_n = np.asarray(jspk.instance_norm(jnp.asarray(feats)))
    ref.get_feat = lambda x: x  # bypass the frontend; feed normed features
    with torch.no_grad():
        want = ref(torch.from_numpy(feats_n.transpose(0, 2, 1))).numpy()
    got = np.asarray(jspk.ecapa_forward(params, jnp.asarray(feats_n)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_weighted_sum_frontend_matches_reference_get_feat():
    """softmax(feature_weight)-weighted hidden-state sum + 1e-6 + InstanceNorm
    (ecapa_tdnn.py:266-277) on synthetic hidden states."""
    rng = np.random.default_rng(2)
    hs = rng.standard_normal((5, 2, 13, 6)).astype(np.float32)
    w = rng.standard_normal((5,)).astype(np.float32)

    x = torch.from_numpy(hs)
    norm_w = torch.nn.functional.softmax(torch.from_numpy(w), dim=-1)[
        :, None, None, None
    ]
    ref = (norm_w * x).sum(dim=0).transpose(1, 2) + 1e-6  # (B, D, T)
    ref = torch.nn.InstanceNorm1d(6)(ref).numpy().transpose(0, 2, 1)

    weighted = jnp.einsum("l,lbtd->btd", jax.nn.softmax(jnp.asarray(w)), jnp.asarray(hs)) + 1e-6
    got = np.asarray(jspk.instance_norm(weighted))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_msft_wavlm_layout_converter_roundtrip():
    """microsoft/UniSpeech key naming maps onto the identical param tree."""
    from transformers import WavLMConfig, WavLMModel

    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_hf_ssl, convert_msft_wavlm

    torch.manual_seed(3)
    hf = WavLMModel(
        WavLMConfig(
            do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
            num_buckets=32, max_bucket_distance=80, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        )
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = jssl.SSLConfig(
        d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
        conv_dims=(32, 32, 32), conv_kernels=(10, 3, 2), conv_strides=(5, 2, 2),
        conv_pos_kernel=16, conv_pos_groups=4,
        pre_ln=True, extract_norm="layer", conv_bias=True,
        rel_pos_bias=True, num_buckets=32, max_distance=80,
    )

    ms = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("feature_projection.layer_norm", "layer_norm")
        nk = nk.replace("feature_projection.projection", "post_extract_proj")
        nk = nk.replace("encoder.pos_conv_embed.conv.parametrizations.weight.original0",
                        "encoder.pos_conv.0.weight_g")
        nk = nk.replace("encoder.pos_conv_embed.conv.parametrizations.weight.original1",
                        "encoder.pos_conv.0.weight_v")
        nk = nk.replace("encoder.pos_conv_embed.conv.weight_g", "encoder.pos_conv.0.weight_g")
        nk = nk.replace("encoder.pos_conv_embed.conv.weight_v", "encoder.pos_conv.0.weight_v")
        nk = nk.replace("encoder.pos_conv_embed.conv.bias", "encoder.pos_conv.0.bias")
        nk = nk.replace(".attention.rel_attn_embed", ".self_attn.relative_attention_bias")
        nk = nk.replace(".attention.gru_rel_pos_linear", ".self_attn.grep_linear")
        nk = nk.replace(".attention.gru_rel_pos_const", ".self_attn.grep_a")
        nk = nk.replace(".attention.q_proj", ".self_attn.q_proj")
        nk = nk.replace(".attention.k_proj", ".self_attn.k_proj")
        nk = nk.replace(".attention.v_proj", ".self_attn.v_proj")
        nk = nk.replace(".attention.out_proj", ".self_attn.out_proj")
        nk = nk.replace(".layer_norm.", ".self_attn_layer_norm.") if ".layers." in nk and ".layer_norm." in nk and "final" not in nk and "conv_layers" not in nk else nk
        nk = nk.replace(".feed_forward.intermediate_dense", ".fc1")
        nk = nk.replace(".feed_forward.output_dense", ".fc2")
        if "feature_extractor.conv_layers." in nk:
            nk = nk.replace(".conv.weight", ".0.weight").replace(".conv.bias", ".0.bias")
            nk = nk.replace(".layer_norm.weight", ".2.1.weight").replace(".layer_norm.bias", ".2.1.bias")
        ms[nk] = v

    a = convert_hf_ssl(sd, cfg)
    b = convert_msft_wavlm(ms, cfg)
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_wavlm_ecapa_embedder_smoke():
    """Full wavlm_large-path embedder on a tiny tower: shape + determinism."""
    cfg = jssl.SSLConfig(
        d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        conv_dims=(16, 16), conv_kernels=(10, 4), conv_strides=(5, 4),
        conv_pos_kernel=16, conv_pos_groups=4,
        pre_ln=True, extract_norm="layer", conv_bias=True,
        rel_pos_bias=True, num_buckets=32, max_distance=80,
    )
    emb = jspk.SpeakerEmbedder(
        jspk.init_ecapa(jax.random.PRNGKey(0), feat_dim=32),
        feat_type="wavlm_large", ssl_cfg=cfg,
    )
    wav = (np.random.default_rng(4).standard_normal(6400) * 0.1).astype(np.float32)
    e1 = emb.embed(wav, 16000)
    e2 = emb.embed(wav.copy(), 16000)
    assert e1.shape == (jspk.EMB_DIM,)
    assert np.isfinite(e1).all()
    np.testing.assert_array_equal(e1, e2)


def test_fbank_frontend_matches_torch_stft():
    """Framing/window/FFT path vs torch.stft with torchaudio's settings."""
    fe = jspk.FbankFrontend(feat_dim=24)
    wav = (np.random.default_rng(5).standard_normal((1, 3200)) * 0.3).astype(np.float32)

    window = torch.hann_window(400, periodic=True)
    spec = torch.stft(
        torch.from_numpy(wav), n_fft=512, hop_length=160, win_length=400,
        window=window, center=True, pad_mode="reflect", return_complex=True,
        normalized=False, onesided=True,
    )
    power = (spec.abs() ** 2).numpy()  # (B, F, T)
    ref_mel = np.einsum("bft,fm->btm", power, fe.mel_fb)
    ref = np.asarray(jspk.instance_norm(jnp.asarray(np.log(ref_mel + 1e-6))))

    got = np.asarray(fe(jnp.asarray(wav)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_wavlm_ecapa_padded_bucket_matches_exact_length():
    """The production property behind length bucketing: embed() pads to a
    1 s-geometric bucket with masked statistics, and must reproduce the
    exact-length (unpadded, unmasked) computation — the reference's
    per-utterance semantics (extract_spk_emb.py:72-77)."""
    cfg = jssl.SSLConfig(
        d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
        conv_dims=(16, 16), conv_kernels=(10, 4), conv_strides=(5, 4),
        conv_pos_kernel=16, conv_pos_groups=4,
        pre_ln=True, extract_norm="layer", conv_bias=True,
        rel_pos_bias=True, num_buckets=32, max_distance=80,
    )
    emb = jspk.SpeakerEmbedder(
        jspk.init_ecapa(jax.random.PRNGKey(1), feat_dim=32),
        feat_type="wavlm_large", ssl_cfg=cfg,
    )
    wav = (np.random.default_rng(8).standard_normal(6400) * 0.1).astype(np.float32)
    got = emb.embed(wav, 16000)  # internally pads 6400 -> 16000 with masking

    feats_exact, _ = jspk.wavlm_weighted_features(
        cfg, emb.wavlm_params, emb.feature_weight, jnp.asarray(wav[None, :])
    )
    want = np.asarray(jspk.ecapa_forward(emb.params, feats_exact))[0]
    np.testing.assert_allclose(got, want, atol=2e-5)
