"""Resampler parity: torchaudio ``sinc_interp_hann`` semantics, pinned.

The reference loads audio through ``torchaudio.functional.resample`` defaults
(``utils/helpers.py:86-87``).  torchaudio is not installed in this image, so
the primary pin is a brute-force oracle evaluated directly from the
mathematical definition (independent of the polyphase/stride machinery):

    y[m] = sum_j x[j] * f(j/orig - m/new),
    f(tau) = (base/orig) * sinc(pi * tau') * hann(tau'),
    tau' = clip(tau * base, +-lowpass_filter_width), base = min(orig,new)*rolloff

plus an exact A/B against torchaudio itself when that package is importable.
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.utils.audio_io import resample, sinc_hann_kernel

LPW, ROLLOFF = 6, 0.99


def brute_force_resample(x: np.ndarray, orig: int, new: int) -> np.ndarray:
    """Direct evaluation of the windowed-sinc interpolation sum."""
    from math import gcd

    g = gcd(orig, new)
    orig, new = orig // g, new // g
    base = min(orig, new) * ROLLOFF
    width = int(np.ceil(LPW * orig / base))
    out_len = -(-len(x) * new // orig)
    y = np.zeros(out_len)
    for m in range(out_len):
        center = m * orig / new  # position in input samples
        j0 = max(0, int(np.floor(center)) - width)
        j1 = min(len(x), int(np.ceil(center)) + width + 1)
        j = np.arange(j0, j1)
        tau = (j - center) / orig * base
        tau = np.clip(tau, -LPW, LPW)
        window = np.cos(tau * np.pi / LPW / 2) ** 2
        y[m] = np.dot(x[j0:j1], np.sinc(tau) * window) * (base / orig)
    return y


@pytest.mark.parametrize("orig,new", [
    (8000, 16000), (48000, 16000), (24000, 16000),
    (22050, 16000), (44100, 16000), (16000, 22050),
])
def test_resample_matches_bruteforce_definition(orig, new):
    rng = np.random.default_rng(orig + new)
    x = rng.standard_normal(400).astype(np.float32)
    got = resample(x, orig, new)
    want = brute_force_resample(x.astype(np.float64), orig, new)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def test_output_length_is_ceil():
    for orig, new, n in [(22050, 16000, 22050), (44100, 16000, 12345), (8000, 16000, 999)]:
        y = resample(np.zeros(n, np.float32), orig, new)
        from math import gcd
        g = gcd(orig, new)
        assert len(y) == -(-n * (new // g) // (orig // g))


def test_tone_preserved():
    """1 kHz tone through 44.1k -> 16k: amplitude and frequency survive."""
    sr_in, sr_out, f0 = 44100, 16000, 1000.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    mid = y[1000:-1000]
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.01
    # dominant DFT bin == 1 kHz
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak_hz = np.argmax(spec) * sr_out / len(mid)
    assert abs(peak_hz - f0) < 5.0


def test_kernel_scale_sums_to_unity():
    """DC gain: each polyphase filter integrates to ~1 (passband flat at DC)."""
    for orig, new in [(441, 320), (3, 1), (1, 2), (147, 160)]:
        kernels, _ = sinc_hann_kernel(orig, new)
        np.testing.assert_allclose(kernels.sum(axis=1), 1.0, atol=5e-3)


def test_matches_torchaudio_if_available():
    torchaudio = pytest.importorskip("torchaudio")
    if not hasattr(getattr(torchaudio, "functional", None), "resample"):
        pytest.skip("torchaudio in sys.modules is the conftest mel-helper shim")
    import torch

    rng = np.random.default_rng(0)
    for orig, new in [(22050, 16000), (44100, 16000), (24000, 16000), (8000, 16000)]:
        x = rng.standard_normal(5000).astype(np.float32)
        want = torchaudio.functional.resample(torch.from_numpy(x), orig, new).numpy()
        got = resample(x, orig, new)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_codes_stable_through_resample_chain():
    """Code indices from the fast polyphase path == from the brute-force
    oracle waveform (the resampler difference cannot shift FSQ codes)."""
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
    from test_parallel import TINY

    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    codec = AudioCodec(TINY, params, mode="parity")

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    wav_fast = resample(x, 22050, 16000)
    wav_oracle = brute_force_resample(x.astype(np.float64), 22050, 16000).astype(np.float32)
    c1 = codec.encode([wav_fast])["codes_list"][0]
    c2 = codec.encode([wav_oracle])["codes_list"][0]
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
