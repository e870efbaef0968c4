"""AOT warm-start (utils/aot.py): executable dump/reload roundtrip on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.utils.aot import warm_jit


def test_warm_jit_roundtrip(tmp_path):
    calls = {"n": 0}

    def fn(a, b):
        calls["n"] += 1  # trace-time counter
        return a @ b + 1.0

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    want = np.asarray(a @ b + 1.0)

    w1 = warm_jit(fn, aot_dir=str(tmp_path), tag="t", fingerprint="v1")
    np.testing.assert_allclose(np.asarray(w1(a, b)), want, rtol=1e-6)
    assert calls["n"] == 1

    artifacts = list(tmp_path.glob("t-*.jaxexe"))
    if not artifacts:
        pytest.skip("executable serialization unsupported on this backend")

    w2 = warm_jit(fn, aot_dir=str(tmp_path), tag="t", fingerprint="v1")
    np.testing.assert_allclose(np.asarray(w2(a, b)), want, rtol=1e-6)
    assert w2.source == "warm"
    assert calls["n"] == 1  # never retraced

    # different fingerprint -> different key -> cold compile
    w3 = warm_jit(fn, aot_dir=str(tmp_path), tag="t", fingerprint="v2")
    w3(a, b)
    assert w3.source == "cold"


def test_warm_jit_codec(tmp_path):
    """AudioCodec(aot_dir=...): second instance warm-starts both programs."""
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
    from test_parallel import TINY

    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    wavs = [(rng.standard_normal(24000) * 0.1).astype(np.float32)]

    c1 = AudioCodec(TINY, params, aot_dir=str(tmp_path))
    codes1 = c1.encode(wavs, overlap_seconds=10)["codes_list"]
    wav1 = c1.decode(codes1, overlap_seconds=10)["syn_wav_list"][0]
    if not list(tmp_path.glob("tokenize-*.jaxexe")):
        pytest.skip("executable serialization unsupported on this backend")

    c2 = AudioCodec(TINY, params, aot_dir=str(tmp_path))
    codes2 = c2.encode(wavs, overlap_seconds=10)["codes_list"]
    wav2 = c2.decode(codes2, overlap_seconds=10)["syn_wav_list"][0]
    assert c2._tokenize.source == "warm"
    assert c2._detokenize.source == "warm"
    np.testing.assert_array_equal(np.asarray(codes1[0]), np.asarray(codes2[0]))
    np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))
