"""MP3 decode via the system libmpg123 (utils/mp3.py).

The reference's loader accepts wav/flac/mp3 (utils/helpers.py:77-93,105-111
via torchaudio); these tests pin the zero-pip-dependency mp3 path: LAME
fixture encode -> mpg123 float32 decode -> load_audio mono/resample
semantics.
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.utils import mp3
from simwhisper_codec_tpu.utils.audio_io import (
    find_audio_files,
    load_audio,
    probe_audio_length,
)

pytestmark = pytest.mark.skipif(
    not (mp3.have_mpg123() and mp3.have_lame()),
    reason="system libmpg123/libmp3lame unavailable",
)


def _tone(sr: int, seconds: float = 2.0, freq: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _aligned_corr(ref: np.ndarray, dec: np.ndarray, max_lag: int = 4000) -> float:
    """Correlation after compensating the MP3 encoder/decoder delay."""
    n = min(len(ref), len(dec) - max_lag)
    lags = [float(np.dot(ref[:n], dec[k:k + n])) for k in range(max_lag)]
    k = int(np.argmax(lags))
    seg_r, seg_d = ref[:n], dec[k:k + n]
    return float(np.dot(seg_r, seg_d) / (np.linalg.norm(seg_r) * np.linalg.norm(seg_d)))


def test_mono_round_trip(tmp_path):
    sr = 16000
    wav = _tone(sr)
    path = tmp_path / "tone.mp3"
    mp3.write_mp3(path, wav, sr)
    dec, rate = mp3.read_mp3(path)
    assert rate == sr
    assert dec.dtype == np.float32
    assert dec.ndim == 1
    # the fixture encoder writes the LAME/Xing tag, so mpg123's gapless
    # trimming returns exactly the source sample count
    assert len(dec) == len(wav)
    # lossy codec: demand near-perfect correlation, not sample equality
    assert _aligned_corr(wav, dec) > 0.99


def test_probe_matches_decode(tmp_path):
    sr = 16000
    path = tmp_path / "tone.mp3"
    mp3.write_mp3(path, _tone(sr), sr)
    n, rate, ch = mp3.probe_mp3(path)
    dec, _ = mp3.read_mp3(path)
    assert (n, rate, ch) == (len(dec), sr, 1)
    assert probe_audio_length(path, sr) == len(load_audio(path, sr))


def test_stereo_mono_mix(tmp_path):
    """load_audio mean-mixes channels (helpers.py:84 torch.mean(dim=0))."""
    sr = 16000
    wav = _tone(sr)
    path = tmp_path / "st.mp3"
    mp3.write_mp3(path, np.stack([wav, -wav], axis=1), sr)
    dec, rate = mp3.read_mp3(path)
    assert dec.ndim == 2 and dec.shape[1] == 2
    mixed = load_audio(path, sr)
    # L = -R -> mean-mix cancels exactly
    assert np.abs(mixed).max() < 1e-4


def test_load_audio_resamples(tmp_path):
    sr = 32000
    wav = _tone(sr)
    path = tmp_path / "hi.mp3"
    mp3.write_mp3(path, wav, sr)
    out = load_audio(path, 16000)
    n_src, rate, _ = mp3.probe_mp3(path)
    assert rate == sr
    assert len(out) == -(-n_src // 2)  # ceil, matching the resampler
    # 440 Hz survives 32k -> 16k; correlation against a 16 kHz tone
    assert _aligned_corr(_tone(16000), out, max_lag=2200) > 0.99


def test_find_audio_files_includes_mp3(tmp_path):
    mp3.write_mp3(tmp_path / "a.mp3", _tone(16000, 0.5), 16000)
    assert [str(tmp_path / "a.mp3")] == find_audio_files(tmp_path)


def test_garbage_raises(tmp_path):
    bad = tmp_path / "bad.mp3"
    bad.write_bytes(b"\x00" * 64)
    with pytest.raises(RuntimeError):
        mp3.read_mp3(bad)
