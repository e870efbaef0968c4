"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Substitutes for multi-chip hardware: DP x TP training step, sharded tokenize
equivalence, and the driver's dryrun path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from simwhisper_codec_tpu.config import (
    CodecConfig,
    DecoderConfig,
    EncoderConfig,
    SampleStackConfig,
    VocosConfig,
)
from simwhisper_codec_tpu.models.codec import CodecConstants, init_params, tokenize
from simwhisper_codec_tpu.parallel import mesh as pmesh

TINY = CodecConfig(
    acoustic_encoder=EncoderConfig(d_model=64, encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=128),
    acoustic_decoder=DecoderConfig(d_model=64, decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=128),
    downsample=SampleStackConfig(in_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48),
    upsample=SampleStackConfig(out_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48),
    vocos=VocosConfig(input_channels=80, dim=64, intermediate_dim=128, num_layers=2),
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_tokenize_matches_single_device():
    cfg = TINY
    consts = CodecConstants(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((8, 32000)).astype(np.float32) * 0.1
    wav = np.pad(wav, ((0, 0), (0, cfg.chunk_samples - 32000)))
    lengths = np.full((8,), 32000, np.int64)

    ref = tokenize(cfg, consts, params, jnp.asarray(wav), jnp.asarray(lengths))
    ref_codes = np.asarray(ref["codes"])

    mesh = pmesh.make_mesh(8, model_axis=2)
    sharded_params = pmesh.shard_params(params, mesh)
    wav_s = jax.device_put(jnp.asarray(wav), pmesh.batch_sharding(mesh))
    len_s = jax.device_put(jnp.asarray(lengths), pmesh.batch_sharding(mesh))

    fn = jax.jit(lambda p, w, l: tokenize(cfg, consts, p, w, l))
    out = fn(sharded_params, wav_s, len_s)
    np.testing.assert_array_equal(np.asarray(out["codes"]), ref_codes)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_sharded_detokenize_matches_single_device():
    from simwhisper_codec_tpu.models.codec import detokenize

    cfg = TINY
    consts = CodecConstants(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(2)
    wav = rng.standard_normal((8, 32000)).astype(np.float32) * 0.1
    wav = np.pad(wav, ((0, 0), (0, cfg.chunk_samples - 32000)))
    lengths = np.full((8,), 32000, np.int64)
    tok = tokenize(cfg, consts, params, jnp.asarray(wav), jnp.asarray(lengths))
    total = jnp.asarray(cfg.code_frames, jnp.int32)

    ref = detokenize(cfg, consts, params, tok["codes"], tok["codes_lengths"], total)
    ref_y = np.asarray(ref["y"])

    mesh = pmesh.make_mesh(8, model_axis=2)
    sharded_params = pmesh.shard_params(params, mesh)
    codes_s = jax.device_put(tok["codes"], NamedSharding(mesh, P(None, "data")))
    lens_s = jax.device_put(tok["codes_lengths"], pmesh.batch_sharding(mesh))

    fn = jax.jit(lambda p, c, l: detokenize(cfg, consts, p, c, l, total))
    out = fn(sharded_params, codes_s, lens_s)
    np.testing.assert_allclose(np.asarray(out["y"]), ref_y, atol=1e-5)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_dryrun_model_axis_4():
    """TP over 4-way sharded heads/FFN (2 data x 4 model) reproduces single-device grads."""
    import __graft_entry__ as ge

    ge._dryrun_multichip_impl(8, model_axis=4)


def test_entry_compiles_tiny():
    """entry() returns a jittable fn; check it traces (tiny abstract eval only)."""
    import __graft_entry__ as ge

    fn, (params, wav, lengths) = ge.entry()
    # full-size compile is for the driver; here just verify abstract tracing
    shapes = jax.eval_shape(fn, params, wav, lengths)
    y_shape, codes_shape = shapes
    assert codes_shape.shape == (8, 1, 375)
    assert y_shape.shape == (1, 480000)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_data_parallel_codec_matches_single():
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params

    params = init_params(jax.random.PRNGKey(0), TINY)
    single = AudioCodec(TINY, params)
    dp = AudioCodec(TINY, params, data_parallel=True)
    assert dp.mesh is not None

    rng = np.random.default_rng(1)
    # batch of 3 (not divisible by 8 devices -> exercises padding)
    wavs = [(rng.standard_normal(n) * 0.1).astype(np.float32) for n in (40000, 33000, 21000)]

    enc_s = single.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_d = dp.encode(wavs, overlap_seconds=10)["codes_list"]
    for a, b in zip(enc_s, enc_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dec_s = single.decode(enc_s, overlap_seconds=10)["syn_wav_list"]
    dec_d = dp.decode(enc_s, overlap_seconds=10)["syn_wav_list"]
    for a, b in zip(dec_s, dec_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
