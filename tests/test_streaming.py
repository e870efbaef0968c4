"""Streaming sessions produce bit-identical results to the offline batch calls."""

import numpy as np
import pytest

from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
from simwhisper_codec_tpu.models.streaming import StreamingDecoder, StreamingEncoder, stream_encode

from test_parallel import TINY


@pytest.fixture(scope="module")
def codec():
    import jax

    return AudioCodec(TINY, init_params(jax.random.PRNGKey(0), TINY))


def test_streaming_encoder_matches_batch(codec):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(47 * 16000) * 0.1).astype(np.float32)  # 2+ strides

    batch_codes = codec.encode([wav], overlap_seconds=10)["codes_list"][0]

    enc = StreamingEncoder(codec, overlap_seconds=10)
    chunks = []
    for start in range(0, len(wav), 12345):  # odd block size
        out = enc.feed(wav[start : start + 12345])
        if out is not None:
            chunks.append(out)
    tail = enc.flush()
    if tail is not None:
        chunks.append(tail)
    streamed = np.concatenate(chunks, axis=1)

    assert streamed.shape == batch_codes.shape
    np.testing.assert_array_equal(streamed, np.asarray(batch_codes))


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_streaming_decoder_matches_batch(codec):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(41 * 16000) * 0.1).astype(np.float32)
    codes = codec.encode([wav], overlap_seconds=10)["codes_list"][0]
    batch_wav = codec.decode([codes], overlap_seconds=10)["syn_wav_list"][0]

    dec = StreamingDecoder(codec, overlap_seconds=10)
    outs = []
    for start in range(0, codes.shape[1], 37):
        out = dec.feed(codes[:, start : start + 37])
        if out is not None:
            outs.append(out)
    tail = dec.flush()
    if tail is not None:
        outs.append(tail)
    streamed = np.concatenate(outs)

    assert streamed.shape == batch_wav.shape
    np.testing.assert_allclose(streamed, np.asarray(batch_wav), atol=1e-6)


def test_stream_encode_generator(codec):
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(35 * 16000) * 0.1).astype(np.float32)
    blocks = (wav[i : i + 16000] for i in range(0, len(wav), 16000))
    streamed = np.concatenate(list(stream_encode(codec, blocks)), axis=1)
    batch = codec.encode([wav], overlap_seconds=10)["codes_list"][0]
    np.testing.assert_array_equal(streamed, np.asarray(batch))
