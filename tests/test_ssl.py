"""SSL tower parity vs HF torch oracles (random tiny configs, no downloads).

Covers the three reference dependencies: wav2vec2 (UTMOS tower), HuBERT
(E2 feature extraction), WavLM (speaker SIM) — post-LN vs pre-LN encoders,
group vs layer conv norm, and the WavLM gated relative position bias.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # heavy torch-oracle tests; core tier skips
transformers = pytest.importorskip("transformers")

from simwhisper_codec_tpu.models import ssl as jssl
from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_fairseq_wav2vec2, convert_hf_ssl

TINY_KW = dict(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 2),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    layerdrop=0.0,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
    activation_dropout=0.0,
)

TINY_CFG = dict(
    d_model=64,
    num_layers=2,
    num_heads=4,
    ffn_dim=128,
    conv_dims=(32, 32, 32),
    conv_kernels=(10, 3, 2),
    conv_strides=(5, 2, 2),
    conv_pos_kernel=16,
    conv_pos_groups=4,
)


def _wav(b=2, s=8000, seed=0):
    return (np.random.default_rng(seed).standard_normal((b, s)) * 0.1).astype(np.float32)


def _run_parity(hf_model, cfg, sd_converter, atol=2e-4):
    hf_model = hf_model.eval()
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = sd_converter(sd, cfg)

    wav = _wav()
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(wav), output_hidden_states=True)
    out = jssl.ssl_forward(cfg, params, jnp.asarray(wav))

    ref_hidden = np.stack([h.numpy() for h in ref.hidden_states])
    got_hidden = np.asarray(out["hidden_states"])
    assert got_hidden.shape == ref_hidden.shape
    for i in range(ref_hidden.shape[0]):
        err = np.abs(got_hidden[i] - ref_hidden[i]).max()
        assert err < atol, f"hidden_states[{i}] max err {err:.2e}"
    np.testing.assert_allclose(
        np.asarray(out["x"]), ref.last_hidden_state.numpy(), atol=atol
    )


def test_wav2vec2_base_arch_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(do_stable_layer_norm=False, feat_extract_norm="group",
                       conv_bias=False, **TINY_KW)
    )
    cfg = jssl.SSLConfig(pre_ln=False, extract_norm="group", conv_bias=False, **TINY_CFG)
    _run_parity(hf, cfg, convert_hf_ssl)


def test_hubert_base_arch_parity():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(1)
    hf = HubertModel(
        HubertConfig(do_stable_layer_norm=False, feat_extract_norm="group",
                     conv_bias=False, **TINY_KW)
    )
    cfg = jssl.SSLConfig(pre_ln=False, extract_norm="group", conv_bias=False, **TINY_CFG)
    _run_parity(hf, cfg, convert_hf_ssl)


def test_wavlm_large_arch_parity():
    """Pre-LN + layer-norm conv stack + gated relative position bias."""
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(2)
    hf = WavLMModel(
        WavLMConfig(do_stable_layer_norm=True, feat_extract_norm="layer",
                    conv_bias=True, num_buckets=32, max_bucket_distance=80, **TINY_KW)
    )
    cfg = jssl.SSLConfig(pre_ln=True, extract_norm="layer", conv_bias=True,
                         rel_pos_bias=True, num_buckets=32, max_distance=80, **TINY_CFG)
    _run_parity(hf, cfg, convert_hf_ssl)


def test_lengths_match_exact_length_runs():
    """Right-padded batch == per-sample exact-length (unpadded) runs.

    This is the semantics the reference toolchain needs (it always feeds
    unpadded utterances: utmos.py:49-63, continuous_hubert_ssl.py); note it is
    deliberately STRICTER than HF's attention_mask batching, which leaves the
    conv extractor's GroupNorm statistics unmasked over padding.
    """
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(3)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(do_stable_layer_norm=False, feat_extract_norm="group",
                       conv_bias=False, **TINY_KW)
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = jssl.SSLConfig(pre_ln=False, extract_norm="group", conv_bias=False, **TINY_CFG)
    params = convert_hf_ssl(sd, cfg)

    wav = _wav(b=2, s=8000, seed=4)
    lengths = np.array([8000, 5000], np.int32)
    wav[1, 5000:] = 0.0
    out = jssl.ssl_forward(cfg, params, jnp.asarray(wav), jnp.asarray(lengths))

    frame_lens = np.asarray(out["frame_lengths"])
    got = np.asarray(out["x"])
    for b in range(2):
        with torch.no_grad():
            ref = hf(torch.from_numpy(wav[b : b + 1, : lengths[b]]))
        t = frame_lens[b]
        assert t == ref.last_hidden_state.shape[1]
        np.testing.assert_allclose(got[b, :t], ref.last_hidden_state.numpy()[0],
                                   atol=2e-4)


def test_fairseq_layout_converter_roundtrip():
    """fairseq key layout (UTMOS wav2vec_small) maps onto the same forward."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(5)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(do_stable_layer_norm=False, feat_extract_norm="group",
                       conv_bias=False, **TINY_KW)
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = jssl.SSLConfig(pre_ln=False, extract_norm="group", conv_bias=False, **TINY_CFG)

    # rebuild the same weights under fairseq names and check both converters agree
    fs = {}
    for i in range(3):
        fs[f"feature_extractor.conv_layers.{i}.0.weight"] = sd[
            f"feature_extractor.conv_layers.{i}.conv.weight"
        ]
    fs["feature_extractor.conv_layers.0.2.weight"] = sd[
        "feature_extractor.conv_layers.0.layer_norm.weight"
    ]
    fs["feature_extractor.conv_layers.0.2.bias"] = sd[
        "feature_extractor.conv_layers.0.layer_norm.bias"
    ]
    fs["layer_norm.weight"] = sd["feature_projection.layer_norm.weight"]
    fs["layer_norm.bias"] = sd["feature_projection.layer_norm.bias"]
    fs["post_extract_proj.weight"] = sd["feature_projection.projection.weight"]
    fs["post_extract_proj.bias"] = sd["feature_projection.projection.bias"]
    for hf_key in list(sd):
        if hf_key.startswith("encoder.pos_conv_embed.conv."):
            suffix = hf_key.split("encoder.pos_conv_embed.conv.")[1]
            suffix = {"parametrizations.weight.original0": "weight_g",
                      "parametrizations.weight.original1": "weight_v"}.get(suffix, suffix)
            fs[f"encoder.pos_conv.0.{suffix}"] = sd[hf_key]
    fs["encoder.layer_norm.weight"] = sd["encoder.layer_norm.weight"]
    fs["encoder.layer_norm.bias"] = sd["encoder.layer_norm.bias"]
    for i in range(2):
        for ab in ("weight", "bias"):
            for m in ("q_proj", "k_proj", "v_proj", "out_proj"):
                fs[f"encoder.layers.{i}.self_attn.{m}.{ab}"] = sd[
                    f"encoder.layers.{i}.attention.{m}.{ab}"
                ]
            fs[f"encoder.layers.{i}.self_attn_layer_norm.{ab}"] = sd[
                f"encoder.layers.{i}.layer_norm.{ab}"
            ]
            fs[f"encoder.layers.{i}.fc1.{ab}"] = sd[
                f"encoder.layers.{i}.feed_forward.intermediate_dense.{ab}"
            ]
            fs[f"encoder.layers.{i}.fc2.{ab}"] = sd[
                f"encoder.layers.{i}.feed_forward.output_dense.{ab}"
            ]
            fs[f"encoder.layers.{i}.final_layer_norm.{ab}"] = sd[
                f"encoder.layers.{i}.final_layer_norm.{ab}"
            ]

    a = convert_hf_ssl(sd, cfg)
    b = convert_fairseq_wav2vec2(fs, cfg)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_hubert_feature_extractor_layer_pick_matches_hf():
    """E2 extractor (experiments/hifigan_continue): native tower layer pick vs
    HF torch hidden_states, including the length bucketing in extract()."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from experiments.hifigan_continue.extract_features import HubertFeatureExtractor
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(6)
    hf = HubertModel(
        HubertConfig(do_stable_layer_norm=False, feat_extract_norm="group",
                     conv_bias=False, **TINY_KW)
    ).eval()
    cfg = jssl.SSLConfig(pre_ln=False, extract_norm="group", conv_bias=False, **TINY_CFG)
    params = convert_hf_ssl({k: v.detach().numpy() for k, v in hf.state_dict().items()}, cfg)

    layer_id = 1
    ext = HubertFeatureExtractor(ssl_cfg=cfg, params=params, layer_id=layer_id)
    wav = _wav(b=1, s=7000, seed=7)[0]
    got = ext.extract(wav)

    with torch.no_grad():
        ref = hf(torch.from_numpy(wav[None]), output_hidden_states=True)
    want = ref.hidden_states[layer_id][0].numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
