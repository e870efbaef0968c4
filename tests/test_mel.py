"""Log-mel frontend parity tests vs the reference MelFeatureExtractor."""

import numpy as np
import pytest

import jax.numpy as jnp

from simwhisper_codec_tpu.config import FeatureExtractorConfig
from simwhisper_codec_tpu.ops import mel

from conftest import HAS_REFERENCE, add_reference_to_path

CFG = FeatureExtractorConfig()


def test_filterbank_matches_hf():
    """Our slaney filterbank must equal the HF one the reference uses."""
    from transformers.audio_utils import mel_filter_bank

    ours = mel.slaney_mel_filter_bank(201, 80, 0.0, 8000.0, 16000)
    theirs = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_frame_signal_shapes_and_values():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    frames = np.asarray(mel.frame_signal(jnp.asarray(x), 400, 160, 10))
    assert frames.shape == (2, 10, 400)
    # frame t should equal padded[t*hop : t*hop+n_fft]
    padded = np.pad(x, ((0, 0), (200, 200)), mode="reflect")
    for t in [0, 3, 9]:
        np.testing.assert_array_equal(frames[:, t], padded[:, t * 160 : t * 160 + 400])


def test_mel_lengths():
    lens = jnp.array([480000, 160, 159, 161, 0])
    out = np.asarray(mel.mel_lengths(lens, 160, 3000))
    np.testing.assert_array_equal(out, [3000, 1, 1, 2, 0])


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_parity_vs_reference_extractor():
    add_reference_to_path()
    from audiocodec.nn.feature_extractor import MelFeatureExtractor

    ref = MelFeatureExtractor(
        feature_size=80, sampling_rate=16000, hop_length=160, chunk_length=30, n_fft=400
    )
    rng = np.random.default_rng(42)
    # two utterances of different lengths (zero-padded to 30 s by the extractor)
    lens = [48000, 16123]
    wavs = [rng.standard_normal(l).astype(np.float32) * 0.1 for l in lens]
    feats = ref(wavs, sampling_rate=16000, return_tensors="np", return_attention_mask=True)
    ref_mel = feats["input_features"]  # (B, 80, 3000)
    ref_lens = feats["attention_mask"].sum(-1)

    consts = mel.make_constants(CFG)
    batch = np.zeros((2, 480000), dtype=np.float32)
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    ours = np.asarray(mel.log_mel(consts, jnp.asarray(batch)))  # (B, 3000, 80)

    assert ours.shape == (2, 3000, 80)
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref_mel, atol=5e-5)

    our_lens = np.asarray(mel.mel_lengths(jnp.array(lens), 160, 3000))
    np.testing.assert_array_equal(our_lens, ref_lens)
