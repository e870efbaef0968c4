"""Serving daemon: spawn against a tiny checkpoint, exercise all endpoints."""

import http.client
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

import yaml

from conftest import HAS_REFERENCE, REPO_ROOT, add_reference_to_path

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo used to build the ckpt")
@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_serve_end_to_end(tmp_path):
    add_reference_to_path()
    from audiocodec.model import AudioCodec as RefCodec

    from test_codec_e2e import GENERATOR_PARAMS

    torch.manual_seed(0)
    ref = RefCodec(GENERATOR_PARAMS)
    ckpt_path = tmp_path / "ckpt.pt"
    torch.save({"model": ref.state_dict()}, ckpt_path)
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.safe_dump({"generator_params": GENERATOR_PARAMS}))

    port = 8391
    proc = subprocess.Popen(
        [
            sys.executable, str(REPO_ROOT / "serve.py"),
            "--config", str(config_path), "--checkpoint", str(ckpt_path),
            "--port", str(port), "--mode", "parity", "--device", "cpu",
        ],
        cwd=REPO_ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        # wait for warmup
        deadline = time.time() + 300
        last_err = None
        while time.time() < deadline:
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                conn.request("GET", "/healthz")
                resp = conn.getresponse()
                assert resp.status == 200
                break
            except (ConnectionRefusedError, OSError) as e:
                last_err = e
                time.sleep(2)
        else:
            raise TimeoutError(f"server never came up: {last_err}")

        wav = (np.random.default_rng(0).standard_normal(32000) * 0.1).astype(np.float32)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/encode", body=wav.tobytes())
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        shape = tuple(int(v) for v in resp.getheader("X-Code-Shape").split(","))
        codes = np.frombuffer(resp.read(), np.int32).reshape(shape)
        assert shape == (8, 32000 // 1280)

        conn.request("POST", "/decode", body=codes.tobytes(),
                     headers={"X-Code-Shape": f"{shape[0]},{shape[1]}"})
        resp = conn.getresponse()
        assert resp.status == 200
        out = np.frombuffer(resp.read(), np.float32)
        assert out.shape == (32000 // 1280 * 1280,)
        assert np.isfinite(out).all()

        conn.request("POST", "/reconstruct", body=wav.tobytes())
        resp = conn.getresponse()
        assert resp.status == 200
        out2 = np.frombuffer(resp.read(), np.float32)
        np.testing.assert_allclose(out2, out, atol=1e-6)

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["served"] >= 3
    finally:
        proc.terminate()
        proc.wait(timeout=30)
