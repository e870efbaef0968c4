"""Fast (bf16 + Pallas attention) serving mode: runs and stays close to parity."""

import numpy as np
import pytest

from simwhisper_codec_tpu.models.codec import AudioCodec, init_params

from test_parallel import TINY


@pytest.fixture(scope="module")
def codecs():
    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    parity = AudioCodec(TINY, params, mode="parity")
    # flash runs via the Pallas interpreter on CPU — covers the kernel path
    fast = AudioCodec(TINY, params, mode="fast", attn_impl="flash")
    return parity, fast


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_fast_mode_round_trip(codecs):
    parity, fast = codecs
    rng = np.random.default_rng(0)
    wavs = [(rng.standard_normal(48000) * 0.1).astype(np.float32)]

    enc_p = parity.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_f = fast.encode(wavs, overlap_seconds=10)["codes_list"]
    assert enc_p[0].shape == enc_f[0].shape
    # bf16 encoder: most code indices agree with the f32 path
    agreement = float((enc_p[0] == enc_f[0]).mean())
    assert agreement > 0.85, f"fast-mode code agreement {agreement:.3f}"

    dec_f = fast.decode(enc_p, overlap_seconds=10)["syn_wav_list"]
    dec_p = parity.decode(enc_p, overlap_seconds=10)["syn_wav_list"]
    assert dec_f[0].shape == dec_p[0].shape
    assert np.isfinite(dec_f[0]).all()
    # waveforms correlate strongly
    a, b = dec_p[0], dec_f[0]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert corr > 0.95, f"fast-mode waveform correlation {corr:.3f}"


def test_fast_mode_settings_is_single_source_of_truth():
    """bench.py and AudioCodec(mode='fast') must run the SAME program config."""
    import jax

    from simwhisper_codec_tpu.models.codec import fast_mode_settings

    fk = fast_mode_settings()
    assert fk["compute_dtype"] == "bfloat16"
    assert fk["attn_impl"].startswith("chunked")
    assert fk["precision"] == jax.lax.Precision.DEFAULT
    # CPU backends must not enable the Pallas interpreter
    cpu = fast_mode_settings("cpu")
    assert not cpu["fused_ffn"] and not cpu["fused_vocos"]
    tpu = fast_mode_settings("tpu")
    assert tpu["fused_ffn"] and tpu["fused_vocos"]

    codec = AudioCodec(TINY, init_params(__import__("jax").random.PRNGKey(0), TINY),
                       mode="fast")
    assert codec.cfg.compute_dtype == fk["compute_dtype"]
    assert codec._attn_impl == fk["attn_impl"]


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_fast_int8_mode_round_trip():
    """int8 serving modes.

    fast-int8 (bf16 encode + int8 decode): codes BIT-IDENTICAL to the bf16
    fast path — the quantized stacks all sit after the quantizer.
    fast-int8-full (int8 both sides): codes mostly agree with parity.
    """
    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    parity = AudioCodec(TINY, params, mode="parity")
    fast = AudioCodec(TINY, params, mode="fast")
    q = AudioCodec(TINY, params, mode="fast-int8")
    qf = AudioCodec(TINY, params, mode="fast-int8-full")
    rng = np.random.default_rng(1)
    wavs = [(rng.standard_normal(32000) * 0.1).astype(np.float32)]

    enc_p = parity.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_f = fast.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_q = q.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_qf = qf.encode(wavs, overlap_seconds=10)["codes_list"]
    np.testing.assert_array_equal(np.asarray(enc_q[0]), np.asarray(enc_f[0]))
    agree_full = float(np.mean(np.asarray(enc_p[0]) == np.asarray(enc_qf[0])))
    assert agree_full > 0.85, f"full-int8 code agreement too low: {agree_full}"

    dec = q.decode(enc_q, overlap_seconds=10)["syn_wav_list"]
    assert np.isfinite(dec[0]).all()
    dec_f = qf.decode(enc_qf, overlap_seconds=10)["syn_wav_list"]
    assert np.isfinite(dec_f[0]).all()


@pytest.mark.slow  # interpret-mode Pallas on the tiny model, ~30 s
def test_pflash_attn_impl_through_codec():
    """attn_impl='pflash:64' wired through AudioCodec matches parity codes
    (interpret-mode kernel on CPU; the TPU serving default is pflash:768)."""
    import jax

    params = init_params(jax.random.PRNGKey(0), TINY)
    parity = AudioCodec(TINY, params, mode="parity")
    pf = AudioCodec(TINY, params, mode="fast", attn_impl="pflash:64")
    rng = np.random.default_rng(2)
    wavs = [(rng.standard_normal(24000) * 0.1).astype(np.float32)]

    enc_p = parity.encode(wavs, overlap_seconds=10)["codes_list"]
    enc_f = pf.encode(wavs, overlap_seconds=10)["codes_list"]
    agree = float(np.mean(np.asarray(enc_p[0]) == np.asarray(enc_f[0])))
    assert agree > 0.9, f"pflash codec-level agreement too low: {agree}"
    dec = pf.decode(enc_f, overlap_seconds=10)["syn_wav_list"]
    assert np.isfinite(dec[0]).all()


def test_pflash_geometry_fallback():
    """Default fast mode must not trace-crash on head geometries the Pallas
    core can't 128-align (e.g. hd=16 with 4 heads): AudioCodec falls back to
    the chunked XLA path.  Production 768d/12h (hd=64) keeps pflash."""
    from simwhisper_codec_tpu.models import codec as codec_mod
    from simwhisper_codec_tpu.ops.flash_attention import pflash_supported

    assert pflash_supported(768, 12)      # production geometry
    assert not pflash_supported(64, 4)    # TINY: 128//16=8 doesn't divide 4

    orig = codec_mod.fast_mode_settings
    try:
        # simulate the TPU serving default on the CPU test backend
        codec_mod.fast_mode_settings = lambda backend=None: {
            **orig("cpu"), "attn_impl": "pflash:768",
        }
        c = AudioCodec(TINY, init_params(
            __import__("jax").random.PRNGKey(0), TINY), mode="fast")
        assert c._attn_impl.startswith("chunked")
        # explicit attn_impl is honored verbatim (tests drive interpret mode)
        c2 = AudioCodec(TINY, init_params(
            __import__("jax").random.PRNGKey(0), TINY), mode="fast",
            attn_impl="pflash:64")
        assert c2._attn_impl == "pflash:64"
    finally:
        codec_mod.fast_mode_settings = orig
