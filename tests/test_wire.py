"""PCM16 wire format: int16 host<->device waveform transfers.

``wire="pcm16"`` halves transfer bytes (the serving bottleneck on tunneled
and PCIe hosts).  It must be BIT-EXACT vs the float wire whenever the source
audio lies on the 16-bit PCM grid at the target rate — which is every format
the reference pipeline touches (helpers.py:95-103 writes 16-bit PCM between
every stage and the eval tools reload it).
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
from simwhisper_codec_tpu.utils.audio_io import load_audio, save_audio

from test_parallel import TINY


@pytest.fixture(scope="module")
def codecs():
    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    f32 = AudioCodec(TINY, params, mode="parity")
    pcm = AudioCodec(TINY, params, mode="parity", wire="pcm16")
    return f32, pcm


def _grid_wavs(rng, lengths):
    """Waveforms exactly on the int16/32768 grid (= decoded 16-bit PCM)."""
    return [
        (rng.integers(-20000, 20000, n).astype(np.float32) / 32768.0)
        for n in lengths
    ]


def test_encode_codes_bit_exact_on_pcm_grid(codecs):
    f32, pcm = codecs
    wavs = _grid_wavs(np.random.default_rng(0), [16000, 9000])
    c_f32 = f32.encode(wavs, overlap_seconds=10)["codes_list"]
    c_pcm = pcm.encode(wavs, overlap_seconds=10)["codes_list"]
    for a, b in zip(c_f32, c_pcm):
        np.testing.assert_array_equal(a, b)


def test_encode_accepts_int16_input_directly(codecs):
    f32, _ = codecs
    rng = np.random.default_rng(1)
    ints = [rng.integers(-20000, 20000, 12000).astype(np.int16)]
    floats = [ints[0].astype(np.float32) / 32768.0]
    c_int = f32.encode(ints, overlap_seconds=10)["codes_list"]
    c_flt = f32.encode(floats, overlap_seconds=10)["codes_list"]
    np.testing.assert_array_equal(c_int[0], c_flt[0])


def test_encode_mixed_dtype_batch_on_float_wire(codecs):
    """A batch mixing int16 and float32 entries on the float wire must
    rescale the int16 items to [-1, 1] — not write raw sample values like
    20000.0 into the f32 tensor (advisor finding, round 4)."""
    f32, _ = codecs
    rng = np.random.default_rng(4)
    ints = rng.integers(-20000, 20000, 12000).astype(np.int16)
    flt = (rng.integers(-20000, 20000, 9000).astype(np.float32) / 32768.0)
    c_mixed = f32.encode([ints, flt], overlap_seconds=10)["codes_list"]
    c_pure = f32.encode(
        [ints.astype(np.float32) / 32768.0, flt], overlap_seconds=10
    )["codes_list"]
    for a, b in zip(c_mixed, c_pure):
        np.testing.assert_array_equal(a, b)


def test_decode_pcm16_matches_host_quantized_float(codecs):
    f32, pcm = codecs
    wavs = _grid_wavs(np.random.default_rng(2), [14000])
    codes = f32.encode(wavs, overlap_seconds=10)["codes_list"]
    y_f32 = f32.decode(codes, overlap_seconds=10)["syn_wav_list"][0]
    y_pcm = pcm.decode(codes, overlap_seconds=10)["syn_wav_list"][0]
    assert y_pcm.dtype == np.int16
    host = np.clip(y_f32 * 32768.0, -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(y_pcm, host)


def test_save_audio_int16_passthrough(tmp_path):
    rng = np.random.default_rng(3)
    y = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    q = np.clip(y * 32768.0, -32768, 32767).astype(np.int16)
    save_audio(tmp_path / "f.wav", y)
    save_audio(tmp_path / "i.wav", q)
    assert (tmp_path / "f.wav").read_bytes() == (tmp_path / "i.wav").read_bytes()
    np.testing.assert_array_equal(
        load_audio(tmp_path / "i.wav"), q.astype(np.float32) / 32768.0
    )


def test_wire_rejects_unknown_format():
    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    with pytest.raises(ValueError, match="wire"):
        AudioCodec(TINY, params, wire="int8")
