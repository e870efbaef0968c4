"""Serving daemon load test: saturation throughput + latency percentiles.

Drives a running ``serve.py`` daemon with N concurrent clients posting
real-length audio to ``/reconstruct`` and records, per concurrency level:
served/rejected counts, audio-seconds/s of ACCEPTED work, and p50/p90/p99
end-to-end latency.  No request may terminate with anything but 200
(served) or 503 (bounded-queue rejection) — a 500/hang fails the run.
Output: one JSON artifact (default ``docs/SERVING_LOAD.json``).

The reference has no serving daemon at all (batch CLI only,
/root/reference/inference.py:9-67); this tool records the behavior at
saturation that VERDICT r4 asked for on top of the bounded-queue
hardening in serve.py.

Usage (daemon already running, e.g. on the TPU host):
  python serve.py --checkpoint ... --mode fast-int8 --port 8300 &
  python tools/serve_loadtest.py --port 8300 --levels 1,8,32 \
      --seconds_per_clip 4 --requests_per_client 4
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]


def wait_healthy(host: str, port: int, deadline_s: float) -> dict:
    deadline = time.time() + deadline_s
    last = None
    while time.time() < deadline:
        try:
            conn = http.client.HTTPConnection(host, port, timeout=5)
            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            body = json.loads(resp.read())
            if resp.status == 200:
                return body
        except (ConnectionRefusedError, OSError, ValueError) as e:
            last = e
        time.sleep(2)
    raise TimeoutError(f"daemon never became healthy: {last}")


def run_level(host: str, port: int, n_clients: int, requests_per_client: int,
              clip: np.ndarray, timeout_s: float) -> dict:
    statuses, latencies = [], []
    lock = threading.Lock()

    def client(i: int):
        rng = np.random.default_rng(i)
        for _ in range(requests_per_client):
            body = (clip * (0.8 + 0.2 * rng.random())).astype(np.float32).tobytes()
            t0 = time.time()
            try:
                c = http.client.HTTPConnection(host, port, timeout=timeout_s)
                c.request("POST", "/reconstruct", body=body)
                r = c.getresponse()
                data = r.read()
                dt = time.time() - t0
                ok = r.status
                if r.status == 200:
                    out = np.frombuffer(data, np.float32)
                    if not np.isfinite(out).all():
                        ok = "non-finite output"
            except Exception as e:  # noqa: BLE001 - recorded, fails the level
                ok, dt = repr(e), time.time() - t0
            with lock:
                statuses.append(ok)
                if ok == 200:
                    latencies.append(dt)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=timeout_s * requests_per_client)
    wall = time.time() - t0
    hung = sum(t.is_alive() for t in threads)

    served = statuses.count(200)
    rejected = statuses.count(503)
    lat = np.sort(np.asarray(latencies)) if latencies else np.zeros(1)
    clip_seconds = len(clip) / 16000.0
    return {
        "clients": n_clients,
        "requests": len(statuses),
        "served": served,
        "rejected_503": rejected,
        "errors": [s for s in statuses if s not in (200, 503)],
        "hung_clients": hung,
        "wall_s": round(wall, 2),
        "served_audio_seconds_per_s": round(served * clip_seconds / wall, 2),
        "p50_ms": round(float(lat[int(0.50 * (len(lat) - 1))]) * 1e3, 1),
        "p90_ms": round(float(lat[int(0.90 * (len(lat) - 1))]) * 1e3, 1),
        "p99_ms": round(float(lat[int(0.99 * (len(lat) - 1))]) * 1e3, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8300)
    ap.add_argument("--levels", default="1,8,32",
                    help="comma list of concurrency levels")
    ap.add_argument("--requests_per_client", type=int, default=4)
    ap.add_argument("--seconds_per_clip", type=float, default=4.0)
    ap.add_argument("--timeout_s", type=float, default=600.0)
    ap.add_argument("--report", default=str(REPO_ROOT / "docs" / "SERVING_LOAD.json"))
    args = ap.parse_args()

    health = wait_healthy(args.host, args.port, args.timeout_s)
    rng = np.random.default_rng(0)
    n = int(args.seconds_per_clip * 16000)
    t = np.arange(n) / 16000.0
    clip = (0.1 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
            + 0.01 * rng.standard_normal(n)).astype(np.float32)

    levels = [int(v) for v in args.levels.split(",")]
    results = []
    for lvl in levels:
        r = run_level(args.host, args.port, lvl, args.requests_per_client,
                      clip, args.timeout_s)
        print(json.dumps(r), flush=True)
        results.append(r)

    report = {
        "daemon_health": health,
        "clip_seconds": args.seconds_per_clip,
        "requests_per_client": args.requests_per_client,
        "levels": results,
        "clean_under_saturation": all(
            not r["errors"] and not r["hung_clients"] for r in results),
    }
    Path(args.report).write_text(json.dumps(report, indent=1))
    print(f"wrote {args.report}")
    sys.exit(0 if report["clean_under_saturation"] else 1)


if __name__ == "__main__":
    main()
