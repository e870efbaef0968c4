"""Inverse state-dict converters (tools/make_synthetic_tower_weights.py).

Pins, at tiny shapes, that the emitted torch-layout state dicts convert back
through the PRODUCTION converters (utils/ssl_checkpoint.py, eval/speaker.py,
eval/utmos.py) to leaf-exact copies of the source JAX trees — the property
that makes the full-size synthetic tower checkpoints trustworthy stand-ins
for the published files' layout.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import jax

import make_synthetic_tower_weights as gen
from simwhisper_codec_tpu.models.ssl import SSLConfig, init_ssl_params

TINY_FAIRSEQ = SSLConfig(
    d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
    conv_dims=(16, 16), conv_kernels=(10, 4), conv_strides=(5, 4),
    conv_pos_kernel=16, conv_pos_groups=4,
)
TINY_MSFT = SSLConfig(
    d_model=32, num_layers=2, num_heads=4, ffn_dim=64,
    conv_dims=(16, 16), conv_kernels=(10, 4), conv_strides=(5, 4),
    conv_pos_kernel=16, conv_pos_groups=4,
    pre_ln=True, extract_norm="layer", conv_bias=True,
    rel_pos_bias=True, num_buckets=8, max_distance=16,
)


def test_fairseq_inverse_roundtrip():
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_fairseq_wav2vec2

    tree = init_ssl_params(jax.random.PRNGKey(0), TINY_FAIRSEQ)
    sd = {k: v.numpy() for k, v in gen.ssl_tree_to_fairseq(tree, TINY_FAIRSEQ).items()}
    gen._assert_trees_equal(convert_fairseq_wav2vec2(sd, TINY_FAIRSEQ), tree, "fairseq")


def test_msft_inverse_roundtrip():
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_msft_wavlm

    tree = init_ssl_params(jax.random.PRNGKey(1), TINY_MSFT)
    sd = {k: v.numpy() for k, v in gen.ssl_tree_to_fairseq(
        tree, TINY_MSFT, prefix="feature_extract.model.", msft=True).items()}
    gen._assert_trees_equal(
        convert_msft_wavlm(sd, TINY_MSFT, prefix="feature_extract.model."),
        tree, "msft")


def test_ecapa_inverse_roundtrip():
    from simwhisper_codec_tpu.eval.speaker import convert_ecapa_state_dict, init_ecapa

    tree = init_ecapa(jax.random.PRNGKey(2), feat_dim=32)
    sd = {k: v.numpy() for k, v in gen.ecapa_tree_to_torch(tree).items()}
    gen._assert_trees_equal(convert_ecapa_state_dict(sd), tree, "ecapa")


def test_utmos_inverse_roundtrip():
    from simwhisper_codec_tpu.eval.utmos import UTMOSConfig, convert_utmos_checkpoint

    cfg = UTMOSConfig(ssl=TINY_FAIRSEQ, num_domains=2, num_judges=5,
                      lstm_hidden=8, emb_dim=4, proj_hidden=16)
    from simwhisper_codec_tpu.eval.utmos import init_utmos_params

    tree = init_utmos_params(jax.random.PRNGKey(3), cfg)
    sd = {k: v.numpy() for k, v in gen.utmos_tree_to_lightning(tree, cfg).items()}
    gen._assert_trees_equal(convert_utmos_checkpoint(sd, cfg), tree, "utmos")


def test_mismatch_detected():
    """The round-trip guard actually fires on a corrupted tensor."""
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_fairseq_wav2vec2

    tree = init_ssl_params(jax.random.PRNGKey(0), TINY_FAIRSEQ)
    sd = {k: v.numpy() for k, v in gen.ssl_tree_to_fairseq(tree, TINY_FAIRSEQ).items()}
    sd["post_extract_proj.weight"] = sd["post_extract_proj.weight"] + 1.0
    with pytest.raises(AssertionError):
        gen._assert_trees_equal(convert_fairseq_wav2vec2(sd, TINY_FAIRSEQ), tree, "x")
