"""FLAC codec tests: Python roundtrips, C++ cross-check, load_audio wiring.

The reference reads flac corpora via torchaudio (utils/helpers.py:77-93);
this framework's decoder is its own (utils/flac.py + native/audioloader.cpp),
so the tests pin: lossless roundtrip over every subframe type / stereo mode,
bit-exact C++ vs Python decoder agreement, CRC corruption detection, and the
load_audio / probe_audio_length / corpus-eval integration on .flac inputs.
"""

import numpy as np
import pytest

from simwhisper_codec_tpu.utils import flac as F
from simwhisper_codec_tpu.utils.audio_io import load_audio, probe_audio_length

rng = np.random.default_rng(42)


def speechlike(n=20000, sr=16000, amp=8000):
    t = np.arange(n)
    sig = (amp * np.sin(2 * np.pi * 220 * t / sr)
           + amp * 0.3 * np.sin(2 * np.pi * 520 * t / sr)
           + 100 * rng.standard_normal(n))
    return np.clip(sig, -32768, 32767).astype(np.int64)


def roundtrip(pcm, sr=16000, **kw):
    blob = F.encode_flac(pcm, sr, **kw)
    out, rate = F.decode_flac(blob)
    x = np.asarray(pcm)
    if x.ndim == 1:
        x = x[:, None]
    np.testing.assert_array_equal(out, x.astype(np.float32) / 32768.0)
    assert rate == sr
    return blob


@pytest.mark.parametrize("kw", [
    {},                                        # fixed-order subframes
    {"force_verbatim": True},                  # verbatim
    {"use_lpc": True, "lpc_order": 8},         # LPC
    {"use_lpc": True, "lpc_order": 32},        # max LPC order
    {"block_size": 192},                       # many frames + partial last
])
def test_mono_roundtrip(kw):
    roundtrip(speechlike(5000), **kw)


def test_constant_and_empty():
    roundtrip(np.full(5000, -321, np.int64))
    roundtrip(np.zeros(0, np.int64))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(mode):
    left = speechlike(7000)
    right = np.clip((left * 0.7).astype(np.int64) + speechlike(7000) // 8, -32768, 32767)
    roundtrip(np.stack([left, right], axis=1), stereo_mode=mode)


def test_crc_corruption_detected():
    blob = bytearray(F.encode_flac(speechlike(2000), 16000))
    blob[len(blob) // 2] ^= 0x40  # flip a bit mid-frame
    with pytest.raises(F.FlacError):
        F.decode_flac(bytes(blob))
    # and decodes fine with verification off (structure still parseable) or on
    F.decode_flac(F.encode_flac(speechlike(2000), 16000))


def test_probe_matches_decode(tmp_path):
    sig = speechlike(12345)
    p = tmp_path / "x.flac"
    F.write_flac(p, sig, 22050)
    info = F.probe_flac(str(p))
    assert info == {"sample_rate": 22050, "channels": 1, "bps": 16,
                    "total_samples": 12345}


def test_load_audio_decodes_flac(tmp_path):
    sig = speechlike(16000)
    p = tmp_path / "utt.flac"
    F.write_flac(p, sig, 16000)
    wav = load_audio(p, 16000)
    np.testing.assert_array_equal(wav, sig.astype(np.float32) / 32768.0)
    # resampled load (22.05k flac -> 16k) runs through the sinc resampler
    p2 = tmp_path / "utt22.flac"
    F.write_flac(p2, sig, 22050)
    wav2 = load_audio(p2, 16000)
    assert len(wav2) == -(-16000 * 320 // 441)
    assert probe_audio_length(p2, 16000) == len(wav2)


def test_native_decoder_matches_python(tmp_path):
    """C++ twin: bit-exact mono output, including stereo decorrelation mixes."""
    from simwhisper_codec_tpu.utils import native_loader

    if not native_loader.available():
        pytest.skip("no C++ toolchain")

    cases = []
    sig = speechlike(9000)
    cases.append((sig, {}))
    cases.append((sig, {"use_lpc": True, "lpc_order": 8}))
    cases.append((sig, {"force_verbatim": True}))
    st = np.stack([sig, np.clip(sig // 3 + speechlike(9000) // 7, -32768, 32767)], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        cases.append((st, {"stereo_mode": mode}))

    for i, (pcm, kw) in enumerate(cases):
        p = tmp_path / f"c{i}.flac"
        F.write_flac(p, pcm, 16000, **kw)
        native = native_loader.load_audio(p, 16000)
        x = np.asarray(pcm)
        if x.ndim == 1:
            x = x[:, None]
        ref = (x.astype(np.float32) / 32768.0).mean(axis=1)
        np.testing.assert_allclose(native, ref, atol=1e-7), (i, kw)

    # batch API over flac
    paths = sorted(tmp_path.glob("*.flac"))
    outs = native_loader.load_audio_batch(paths, 16000)
    assert len(outs) == len(paths)
    for o in outs:
        assert np.isfinite(o).all() and len(o) == 9000


def test_native_resample_matches_python(tmp_path):
    """The C++ sinc_interp_hann resampler == the Python one (same algorithm)."""
    from simwhisper_codec_tpu.utils import native_loader
    from simwhisper_codec_tpu.utils.audio_io import resample, save_audio

    if not native_loader.available():
        pytest.skip("no C++ toolchain")

    x = (rng.standard_normal(22050) * 0.2).astype(np.float32)
    p = tmp_path / "r.wav"
    save_audio(p, x, 22050)
    stored = load_audio(p, 22050)  # 16-bit quantized
    want = resample(stored, 22050, 16000)
    got = native_loader.load_audio(p, 16000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_corpus_eval_runs_on_flac_dir(tmp_path):
    """End-to-end: a .flac corpus through the tiny codec corpus evaluator."""
    import jax

    from simwhisper_codec_tpu.eval.corpus import evaluate_corpus
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
    from test_parallel import TINY

    in_dir = tmp_path / "corpus"
    in_dir.mkdir()
    for i, n in enumerate((16000, 12000)):
        F.write_flac(in_dir / f"u{i}.flac", speechlike(n) // 4, 16000)

    params = init_params(jax.random.PRNGKey(0), TINY)
    codec = AudioCodec(TINY, params)
    report = evaluate_corpus(codec, str(in_dir), str(tmp_path / "out"),
                             batch_size=2)
    assert report["files"] == 2 and report["skipped"] == 0
    assert report["x_realtime"] > 0
    assert sorted(p.name for p in (tmp_path / "out").glob("*.wav")) == ["u0.wav", "u1.wav"]


def test_trailing_junk_tolerated(tmp_path):
    """Trailing bytes after the last frame (e.g. an ID3v1 'TAG' block) must
    not fail the decode — real decoders stop at STREAMINFO total_samples."""
    sig = speechlike(5000)
    blob = F.encode_flac(sig, 16000)
    junk = blob + b"TAG" + bytes(125)  # ID3v1 tag is exactly 128 bytes
    out, rate = F.decode_flac(junk)
    np.testing.assert_array_equal(out[:, 0], sig.astype(np.float32) / 32768.0)
    assert rate == 16000

    # the C++ twin must tolerate it identically
    from simwhisper_codec_tpu.utils import native_loader

    if native_loader.available():
        p = tmp_path / "junk.flac"
        p.write_bytes(junk)
        native = native_loader.load_audio(str(p), 16000)
        ref = load_audio(p, 16000)
        np.testing.assert_allclose(native, ref, atol=1e-6)
