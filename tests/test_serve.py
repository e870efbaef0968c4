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


def test_microbatcher_overload_and_body_cap():
    """Saturation semantics without a model: bounded queue -> 503, body cap
    -> 413, healthz carries the rejected counter.  An in-process server with
    an echo runner that blocks on an event stands in for the codec."""
    import sys as _sys
    import threading

    _sys.path.insert(0, str(REPO_ROOT))
    from serve import CodecHTTPServer, MicroBatcher, Overloaded, make_handler

    release = threading.Event()

    def slow_echo_runner(kind, payloads):
        release.wait(timeout=30)
        return payloads

    batcher = MicroBatcher(slow_echo_runner, max_batch=1, window_ms=1.0,
                           queue_depth=1)
    server = CodecHTTPServer(("127.0.0.1", 0),
                                 make_handler(batcher, 16000,
                                              max_body_bytes=4096))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        statuses = []

        def post(body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/reconstruct", body=body)
            resp = conn.getresponse()
            statuses.append(resp.status)
            resp.read()

        body = np.zeros(256, np.float32).tobytes()
        # the batcher thread takes the first request (blocks in the runner),
        # the second fills the depth-1 queue, the rest must be rejected fast
        threads = [threading.Thread(target=post, args=(body,)) for _ in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.05)  # deterministic arrival order
        release.set()
        for t in threads:
            t.join(timeout=60)
        assert not any(t.is_alive() for t in threads), "request deadlocked"
        assert statuses.count(200) >= 2  # first taken + one queued
        assert statuses.count(503) >= 1
        assert all(s in (200, 503) for s in statuses), statuses
        assert batcher.rejected == statuses.count(503)

        # body above the 4 KiB cap: rejected with 413 before being read
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/encode", body=np.zeros(4096, np.float32).tobytes())
        assert conn.getresponse().status == 413

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["rejected"] == batcher.rejected
        assert "queue_depth" in health
    finally:
        server.shutdown()
        server.server_close()


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

        # saturation: 32 concurrent clients against the real daemon.  Every
        # request must terminate with 200 (served) or 503 (bounded-queue
        # rejection) — no hangs, no 500s, and at least half are served.
        import threading

        results = []

        def client(i):
            try:
                c = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
                c.request("POST", "/reconstruct",
                          body=(np.sin(np.arange(16000) * (0.01 + 0.001 * i))
                                .astype(np.float32) * 0.1).tobytes())
                r = c.getresponse()
                data = r.read()
                if r.status == 200:
                    out = np.frombuffer(data, np.float32)
                    assert np.isfinite(out).all()
                results.append(r.status)
            except Exception as e:  # pragma: no cover - failure detail
                results.append(repr(e))

        threads = [threading.Thread(target=client, args=(i,)) for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not any(t.is_alive() for t in threads), "client deadlocked"
        assert all(s in (200, 503) for s in results), results
        assert results.count(200) >= 16, results
    finally:
        proc.terminate()
        proc.wait(timeout=30)
