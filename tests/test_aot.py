"""AOT warm-start (utils/aot.py).

The pytest session forces an 8-virtual-device CPU platform (conftest), and
PjRt executable deserialization cannot execute on a different device
topology than it was serialized under — exactly the situation warm_jit's
first-call validation handles by recompiling.  So:

 - the TRUE warm roundtrip runs in a single-device CPU subprocess,
 - the in-process tests pin the graceful fallback + correctness on the
   8-device platform,
 - the real-hardware warm start is recorded in docs/TPU_NOTES.md
   (506 s cold -> 1.7 s warm on the tunneled v5e).
"""

import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REPO_ROOT
from simwhisper_codec_tpu.utils.aot import warm_jit


def test_warm_jit_roundtrip_single_device(tmp_path):
    """True dump/reload roundtrip on a 1-device platform (subprocess)."""
    script = textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = ""
        sys.path.insert(0, {str(REPO_ROOT)!r})
        import numpy as np
        import jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from simwhisper_codec_tpu.utils.aot import warm_jit

        calls = {{"n": 0}}
        def fn(a, b):
            calls["n"] += 1
            return a @ b + 1.0

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
        want = np.asarray(a @ b + 1.0)

        w1 = warm_jit(fn, aot_dir={str(tmp_path)!r}, tag="t", fingerprint="v1")
        np.testing.assert_allclose(np.asarray(w1(a, b)), want, rtol=1e-6)
        assert w1.source == "cold" and calls["n"] == 1

        w2 = warm_jit(fn, aot_dir={str(tmp_path)!r}, tag="t", fingerprint="v1")
        np.testing.assert_allclose(np.asarray(w2(a, b)), want, rtol=1e-6)
        assert w2.source == "warm", w2.source
        assert calls["n"] == 1  # never retraced

        # a second aval signature resolves its own executable (no disable)
        a2 = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        np.testing.assert_allclose(np.asarray(w2(a2, b)),
                                   np.asarray(a2 @ b + 1.0), rtol=1e-6)
        # different fingerprint -> cold
        w3 = warm_jit(fn, aot_dir={str(tmp_path)!r}, tag="t", fingerprint="v2")
        w3(a, b)
        assert w3.source == "cold"
        print("SUBPROC_OK")
    """)
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300)
    if "serialization unavailable" in r.stderr:
        pytest.skip("executable serialization unsupported on this backend")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SUBPROC_OK" in r.stdout


def test_warm_artifact_from_other_topology_falls_back(tmp_path):
    """An artifact serialized under a different device topology triggers the
    first-call validation -> recompile -> correct results (no crash)."""
    # serialize under 1 device in a subprocess
    script = textwrap.dedent(f"""
        import os, sys
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = ""
        sys.path.insert(0, {str(REPO_ROOT)!r})
        import numpy as np, jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from simwhisper_codec_tpu.utils.aot import warm_jit
        def fn(a, b):
            return a @ b + 1.0
        a = jnp.ones((8, 16), jnp.float32); b = jnp.ones((16, 4), jnp.float32)
        w = warm_jit(fn, aot_dir={str(tmp_path)!r}, tag="x", fingerprint="f")
        w(a, b)
        print("WROTE", w.source)
    """)
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    if not list(tmp_path.glob("x-*.jaxexe")):
        pytest.skip("executable serialization unsupported on this backend")

    # now load in THIS process (8 virtual devices): must fall back cleanly
    def fn(a, b):
        return a @ b + 1.0

    a = jnp.ones((8, 16), jnp.float32)
    b = jnp.ones((16, 4), jnp.float32)
    w = warm_jit(fn, aot_dir=str(tmp_path), tag="x", fingerprint="f")
    out = np.asarray(w(a, b))
    np.testing.assert_allclose(out, np.asarray(a @ b + 1.0), rtol=1e-6)
    # whichever path was taken, later calls keep working
    np.testing.assert_allclose(np.asarray(w(a, b)), out, rtol=1e-6)


def test_warm_jit_codec(tmp_path):
    """AudioCodec(aot_dir=...): two instances produce identical outputs and
    never crash, whatever the platform does with the artifacts."""
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params
    from test_parallel import TINY

    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    wavs = [(rng.standard_normal(24000) * 0.1).astype(np.float32)]

    c1 = AudioCodec(TINY, params, aot_dir=str(tmp_path))
    codes1 = c1.encode(wavs, overlap_seconds=10)["codes_list"]
    wav1 = c1.decode(codes1, overlap_seconds=10)["syn_wav_list"][0]

    c2 = AudioCodec(TINY, params, aot_dir=str(tmp_path))
    codes2 = c2.encode(wavs, overlap_seconds=10)["codes_list"]
    wav2 = c2.decode(codes2, overlap_seconds=10)["syn_wav_list"][0]
    np.testing.assert_array_equal(np.asarray(codes1[0]), np.asarray(codes2[0]))
    np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))


def test_warm_jit_multiple_signatures(tmp_path):
    """Each distinct aval signature resolves its own executable (the sig-keyed
    fast path must not reuse an executable across batch shapes), and a second
    process warm-loads both artifacts."""
    import jax
    import jax.numpy as jnp

    from simwhisper_codec_tpu.utils.aot import warm_jit

    def fn(x):
        return (x * 2.0).sum(axis=-1)

    w = warm_jit(fn, aot_dir=str(tmp_path), tag="multi", fingerprint="t")
    a = jnp.ones((2, 8), jnp.float32)
    b = jnp.ones((4, 8), jnp.float32)
    assert w(a).shape == (2,)
    assert w(b).shape == (4,)
    assert len(w._by_key) == 2
    # repeated calls take the fast path and stay correct
    import numpy as np

    np.testing.assert_allclose(np.asarray(w(a)), np.full((2,), 16.0))
    np.testing.assert_allclose(np.asarray(w(b)), np.full((4,), 16.0))
    # fresh wrapper (fresh process stand-in): both artifacts warm-load
    w2 = warm_jit(fn, aot_dir=str(tmp_path), tag="multi", fingerprint="t")
    np.testing.assert_allclose(np.asarray(w2(a)), np.full((2,), 16.0))
    assert w2.source in ("warm", "cold")  # serialization may be unsupported on cpu
    np.testing.assert_allclose(np.asarray(w2(b)), np.full((4,), 16.0))
