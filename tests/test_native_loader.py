"""Native C++ audio loader: build, decode, resample, batch, save round-trip."""

import numpy as np
import pytest

from simwhisper_codec_tpu.utils import native_loader as nl
from simwhisper_codec_tpu.utils.audio_io import load_audio as py_load, save_audio as py_save


@pytest.fixture(scope="module")
def lib_available():
    if not nl.available():
        pytest.skip("no C++ toolchain for native loader")
    return True


def make_tone(n=16000, sr=16000, f=440.0):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_native_load_matches_python(lib_available, tmp_path):
    x = make_tone()
    p = tmp_path / "tone.wav"
    py_save(p, x, 16000)
    a = nl.load_audio(str(p), 16000)
    b = py_load(str(p), 16000)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_resample_quality(lib_available, tmp_path):
    sr_in, sr_out, f = 22050, 16000, 440.0
    x = make_tone(n=22050, sr=sr_in, f=f)
    p = tmp_path / "t22.wav"
    py_save(p, x, sr_in)
    y = nl.load_audio(str(p), sr_out)
    assert abs(len(y) - 16000) <= 2
    # the resampled tone keeps its frequency: correlate with ideal tone
    t = np.arange(len(y)) / sr_out
    ref_c = np.cos(2 * np.pi * f * t)
    ref_s = np.sin(2 * np.pi * f * t)
    mid = slice(1000, len(y) - 1000)
    power = np.hypot(np.mean(y[mid] * ref_c[mid]), np.mean(y[mid] * ref_s[mid])) * 2
    assert abs(power - 0.3) < 0.01
    # and no significant energy elsewhere
    residual = y[mid] - power * (
        ref_c[mid] * np.mean(y[mid] * ref_c[mid]) + ref_s[mid] * np.mean(y[mid] * ref_s[mid])
    ) * 2 / power
    assert np.sqrt(np.mean(residual**2)) < 0.02


def test_native_batch(lib_available, tmp_path):
    paths = []
    refs = []
    for i in range(6):
        x = make_tone(n=8000 + 1000 * i, f=200 + 50 * i)
        p = tmp_path / f"b{i}.wav"
        py_save(p, x, 16000)
        paths.append(str(p))
        refs.append(py_load(str(p), 16000))
    outs = nl.load_audio_batch(paths, 16000, num_threads=3)
    assert len(outs) == 6
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o, r, atol=1e-6)


def test_native_save_roundtrip(lib_available, tmp_path):
    x = make_tone()
    p = tmp_path / "out.wav"
    nl.save_audio(str(p), x, 16000)
    y = py_load(str(p), 16000)
    assert np.abs(x - y).max() < 1e-3


def test_batch_mixed_formats_and_error_tolerance(tmp_path):
    """load_audio_batch splits wav/flac (native) from mp3 (Python), preserves
    order, and with on_error='none' returns None for undecodable files —
    the corpus evaluator's per-file skip semantics (eval/corpus.py)."""
    from simwhisper_codec_tpu.utils import mp3

    x = make_tone()
    wav_p = tmp_path / "a.wav"
    py_save(wav_p, x, 16000)
    bad_p = tmp_path / "bad.wav"
    bad_p.write_bytes(b"RIFFgarbage")
    paths = [str(wav_p), str(bad_p)]
    refs = {0: py_load(str(wav_p), 16000)}

    if mp3.have_mpg123() and mp3.have_lame():
        mp3_p = tmp_path / "c.mp3"
        mp3.write_mp3(mp3_p, x, 16000)
        paths.append(str(mp3_p))
        refs[2] = py_load(str(mp3_p), 16000)

    outs = nl.load_audio_batch(paths, 16000, on_error="none")
    assert len(outs) == len(paths)
    assert outs[1] is None  # corrupt file skipped, not raised
    for i, ref in refs.items():
        np.testing.assert_allclose(outs[i], ref, atol=1e-6)

    with pytest.raises(Exception):
        nl.load_audio_batch(paths, 16000, on_error="raise")
