"""Fixture codecs (eval/fixture_codecs.py) + PESQ absolute-scale anchoring.

The G.711/G.726/MNRU fixtures exist to anchor native PESQ's absolute scale
against literature-published ITU-PESQ values (tools/pesq_calibrate.py,
docs/PESQ_CALIBRATION.json).  These tests pin the codec implementations'
quality characteristics, the anchor ordering, and the waveform-coherence
regime term that separates vocoded from waveform-preserving distortion.
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.eval.fixture_codecs import (
    alaw_decode, alaw_encode, g711_alaw, g711_ulaw, g726, mnru,
    ulaw_decode, ulaw_encode,
)
from simwhisper_codec_tpu.eval import pesq_native as P

from conftest import HAS_REFERENCE


def make_voice(seconds=2.0, sr=8000, seed=17):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f0 = 105 + 20 * np.sin(2 * np.pi * 1.9 * t)
    sig = sum(np.sin(2 * np.pi * h * np.cumsum(f0) / sr + rng.uniform(0, 6)) / h ** 0.6
              for h in range(1, 16))
    env = np.clip(np.sin(2 * np.pi * 2.0 * t) - 0.2, 0, None) ** 2 * 2.0
    return (sig * env * 0.1).astype(np.float64)


def snr_db(x, y):
    n = min(len(x), len(y))
    return 10 * np.log10(np.sum(x[:n] ** 2) / (np.sum((x[:n] - y[:n]) ** 2) + 1e-30))


class TestG711:
    def test_roundtrip_snr(self):
        x = make_voice()
        assert snr_db(x, g711_ulaw(x)) > 30  # log-PCM SQNR ~35-38 dB on speech
        assert snr_db(x, g711_alaw(x)) > 30

    def test_codes_are_8bit_and_deterministic(self):
        x = (make_voice() * 32768).astype(np.int16)
        for enc, dec in ((ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)):
            c = enc(x)
            assert c.dtype == np.uint8
            np.testing.assert_array_equal(c, enc(x))
            # companding is idempotent: re-encoding the decode is a fixpoint
            y = dec(c)
            np.testing.assert_array_equal(dec(enc(y)), y)

    def test_ulaw_zero_and_extremes(self):
        np.testing.assert_array_equal(
            ulaw_decode(ulaw_encode(np.array([0], np.int16))), [0])
        big = ulaw_decode(ulaw_encode(np.array([32000, -32000], np.int16)))
        assert big[0] > 30000 and big[1] < -30000


class TestG726:
    def test_snr_ladder_monotone_in_rate(self):
        x = make_voice()
        snrs = [snr_db(x[400:], g726(x, r)[400:])  # skip adaptation startup
                for r in (40000, 32000, 24000, 16000)]
        assert all(a > b for a, b in zip(snrs, snrs[1:])), snrs
        assert 24 < snrs[1] < 36, snrs  # 32 kbit/s ADPCM ~25-30 dB on speech
        assert snrs[3] > 12, snrs

    def test_deterministic_and_rejects_bad_rate(self):
        x = make_voice(seconds=0.5)
        np.testing.assert_array_equal(g726(x, 32000), g726(x, 32000))
        with pytest.raises(ValueError, match="bitrate"):
            g726(x, 48000)


def test_mnru_snr_matches_q():
    x = make_voice()
    for q in (10.0, 20.0, 30.0):
        assert abs(snr_db(x, mnru(x, q)) - q) < 1.0


def test_pesq_anchor_ladder_ordering():
    """Native PESQ-NB must order the fixtures as the literature does:
    G.711 > G.726-32 > G.726-24 > G.726-16."""
    x = make_voice(seconds=2.5, seed=23)
    scores = [P.pesq(8000, x, y, "nb") for y in
              (g711_ulaw(x), g726(x, 32000), g726(x, 24000), g726(x, 16000))]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.9   # G.711 at the literature range
    assert scores[-1] < 3.9  # 16 kbit/s clearly below toll quality


class TestCoherenceRegimeTerm:
    """The waveform-coherence excess must be ZERO for waveform-preserving
    codecs and FIRE for spectral-envelope-preserving resynthesis."""

    def _excess(self, ref, deg, fs, wb):
        raw, ds, da, coh = P.pesq_raw(ref, deg, fs, wb=wb, _components=True)
        drop = 0.1 * ds + 0.0309 * da
        return max(0.0, coh - (P._COH_A * drop + P._COH_B * drop ** 2
                               + P._COH_FLOOR))

    def test_zero_for_waveform_codecs(self):
        x = make_voice(seconds=2.5, seed=31)
        for y in (g711_ulaw(x), g726(x, 32000), g726(x, 16000), mnru(x, 15.0)):
            assert self._excess(x, y, 8000, wb=False) == 0.0

    def test_fires_for_phase_randomized_resynthesis(self):
        """Magnitude-preserving phase randomization = the vocoder signature:
        short-time spectra match, waveform does not.  The regime term must
        fire and the score must drop well below the clean ceiling."""
        x16 = make_voice(seconds=2.5, sr=16000, seed=37)
        n_fft, hop = 512, 256
        win = np.hanning(n_fft)
        rng = np.random.default_rng(0)
        y = np.zeros(len(x16))
        wsum = np.zeros(len(x16))
        for s in range(0, len(x16) - n_fft, hop):
            spec = np.fft.rfft(x16[s:s + n_fft] * win)
            phase = np.exp(1j * rng.uniform(0, 2 * np.pi, len(spec)))
            frame = np.fft.irfft(np.abs(spec) * phase, n_fft) * win
            y[s:s + n_fft] += frame
            wsum[s:s + n_fft] += win ** 2
        y /= np.maximum(wsum, 1e-6)
        assert self._excess(x16, y, 16000, wb=True) > 2 * P._COH_TAU
        score = P.pesq(16000, x16, y, "wb")
        assert score < P.pesq(16000, x16, x16, "wb") - 1.0, score


@pytest.mark.skipif(not HAS_REFERENCE, reason="demo-page speech pairs")
def test_demo_simwhisper_reads_in_published_range():
    """The headline fix: demo simwhisper pairs must read near the published
    corpus average (2.72 WB) + showcase margin — not the pre-anchor 4.4."""
    from pathlib import Path

    from simwhisper_codec_tpu.utils.audio_io import load_audio

    assets = Path("/root/reference/docs/assets/codec")
    scores = []
    for i in (1, 2):  # two pairs keep the core tier fast
        r = np.asarray(load_audio(assets / f"gt_sample{i}.wav", 16000), np.float64)
        d = np.asarray(load_audio(assets / f"simwhisper_sample{i}.wav", 16000), np.float64)
        m = min(len(r), len(d))
        scores.append(P.pesq(16000, r[:m], d[:m], "wb"))
    assert 2.6 < float(np.mean(scores)) < 3.8, scores
