"""Codec serving daemon: HTTP service for encode/decode at production throughput.

New capability (the reference is batch-CLI only).  Stdlib-only HTTP server in
front of the fixed-shape jitted codec programs, with micro-batching: requests
arriving within a short window are padded into one device batch, amortizing
the per-dispatch latency that dominates single-stream serving.

Endpoints (Content-Type application/octet-stream unless noted):
  POST /encode      raw 16 kHz mono f32 PCM body -> int32 codes (G*T), header
                    X-Code-Shape: "8,T"
  POST /decode      int32 codes body + X-Code-Shape header -> f32 PCM
  POST /reconstruct f32 PCM -> f32 PCM (round trip)
  GET  /healthz     JSON status + throughput counters

Overload behavior: the micro-batch queue is bounded (--queue_depth); when it
is full new requests get 503 + Retry-After instead of growing host memory.
Request bodies above --max_body_mb (default 64) get 413 without being read.

Wire precision: with the default ``--wire float32`` the endpoint contract is
exact f32 PCM end to end.  ``--wire pcm16`` halves host<->device transfer
bytes (the dominant cost on tunneled/PCIe hosts) at the price of quantizing
waveforms to the int16 grid IN EVERY MODE — outputs then differ from the f32
contract by <1 LSB16 (~3e-5).  Opt in for throughput, not for bit-parity.

Run:  python serve.py --checkpoint weights/SimWhisperCodec.pt --port 8300
"""

from __future__ import annotations

import argparse
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from simwhisper_codec_tpu.utils.audio_io import set_logging

logger = logging.getLogger(__name__)


class Overloaded(Exception):
    """Raised when the micro-batch queue is full; handlers answer 503."""


class CodecHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a saturation-sized TCP accept backlog.

    The stdlib default ``request_queue_size`` is 5: a burst of concurrent
    connects overflows the kernel listen backlog and clients see connection
    resets before the application-level 503 path can answer.  128 lets a
    saturation burst reach the handler, where the bounded micro-batch queue
    turns overload into fast 503s instead of TCP-level failures.
    """

    request_queue_size = 128
    daemon_threads = True


class MicroBatcher:
    """Collects requests for up to ``window_ms`` and runs them as one batch.

    The queue is bounded: at most ``queue_depth`` requests wait for the
    device at any time.  ``submit`` never blocks on a full queue — it raises
    :class:`Overloaded` immediately, so saturation surfaces as fast 503s
    instead of unbounded host memory growth and timeout pileups.
    """

    def __init__(self, runner, max_batch: int = 8, window_ms: float = 5.0,
                 queue_depth: int = 64):
        self.runner = runner
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self.q: "queue.Queue" = queue.Queue(maxsize=max(1, queue_depth))
        self.served = 0
        self.rejected = 0
        self.audio_seconds = 0.0
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, kind: str, payload):
        done = threading.Event()
        slot = {"kind": kind, "payload": payload, "done": done, "result": None, "error": None}
        try:
            self.q.put_nowait(slot)
        except queue.Full:
            self.rejected += 1
            raise Overloaded(f"queue full ({self.q.maxsize} waiting)") from None
        done.wait()
        if slot["error"]:
            raise slot["error"]
        return slot["result"]

    def _loop(self):
        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=timeout))
                except queue.Empty:
                    break
            by_kind: dict = {}
            for slot in batch:
                by_kind.setdefault(slot["kind"], []).append(slot)
            for kind, slots in by_kind.items():
                try:
                    results = self.runner(kind, [s["payload"] for s in slots])
                    for s, r in zip(slots, results):
                        s["result"] = r
                except Exception as e:  # surface per-request
                    for s in slots:
                        s["error"] = e
                finally:
                    for s in slots:
                        s["done"].set()
            self.served += len(batch)


def make_runner(codec):
    def runner(kind: str, payloads):
        if kind == "encode":
            out = codec.encode(payloads, overlap_seconds=10)
            return out["codes_list"]
        if kind == "decode":
            out = codec.decode(payloads, overlap_seconds=10)
            return out["syn_wav_list"]
        if kind == "reconstruct":
            codes = codec.encode(payloads, overlap_seconds=10)["codes_list"]
            return codec.decode(codes, overlap_seconds=10)["syn_wav_list"]
        raise ValueError(kind)

    return runner


def _wav_to_f32(wav: np.ndarray) -> np.ndarray:
    """Rescale a pcm16-wire int16 waveform to the protocol's f32 PCM."""
    if wav.dtype == np.int16:
        return wav.astype(np.float32) / 32768.0
    return np.asarray(wav, np.float32)


class BodyTooLarge(Exception):
    """Request body exceeds the configured cap; handlers answer 413."""


def make_handler(batcher: MicroBatcher, sample_rate: int,
                 max_body_bytes: int = 64 * 1024 * 1024):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            logger.debug(fmt, *args)

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            if n > max_body_bytes:
                # refuse before reading: a multi-GB POST must not be pulled
                # into host memory just to be rejected
                raise BodyTooLarge(f"body {n} bytes > cap {max_body_bytes}")
            return self.rfile.read(n)

        def _send(self, code: int, body: bytes, headers=None):
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps(
                    {"status": "ok", "served": batcher.served,
                     "rejected": batcher.rejected,
                     "queue_depth": batcher.q.qsize(),
                     "audio_seconds": round(batcher.audio_seconds, 1)}
                ).encode()
                self._send(200, body, {"Content-Type": "application/json"})
            else:
                self._send(404, b"not found")

        def do_POST(self):
            try:
                raw = self._read_body()
                if self.path == "/encode":
                    wav = np.frombuffer(raw, np.float32)
                    batcher.audio_seconds += len(wav) / sample_rate
                    codes = batcher.submit("encode", wav)
                    self._send(200, np.ascontiguousarray(codes, np.int32).tobytes(),
                               {"X-Code-Shape": f"{codes.shape[0]},{codes.shape[1]}"})
                elif self.path == "/decode":
                    g, t = (int(v) for v in self.headers["X-Code-Shape"].split(","))
                    codes = np.frombuffer(raw, np.int32).reshape(g, t)
                    wav = batcher.submit("decode", codes)
                    self._send(200, _wav_to_f32(wav).tobytes())
                elif self.path == "/reconstruct":
                    wav = np.frombuffer(raw, np.float32)
                    batcher.audio_seconds += len(wav) / sample_rate
                    out = batcher.submit("reconstruct", wav)
                    self._send(200, _wav_to_f32(out).tobytes())
                else:
                    self._send(404, b"not found")
            except Overloaded as e:
                # fast rejection under saturation: clients back off + retry
                self._send(503, str(e).encode(), {"Retry-After": "1"})
            except BodyTooLarge as e:
                self._send(413, str(e).encode())
            except Exception as e:
                logger.exception("request failed")
                self._send(500, str(e).encode())

    return Handler


def main(argv=None):
    set_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config/SimWhisperCodec.yaml")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8300)
    # fast-int8 (mixed) is the serving default: codes bit-identical to bf16
    # (they are a function of the encode side only, which stays bf16), int8
    # decode perceptually transparent (PESQ-WB 4.64 ceiling, STOI >= 0.997 vs
    # bf16 — docs/TPU_NOTES.md), ~+15% throughput.  "fast" keeps the bf16
    # waveform bit-stream for users who pinned outputs against it.
    p.add_argument("--mode", default="fast-int8", choices=["fast", "fast-int8", "fast-int8-full", "parity"])
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--window_ms", type=float, default=5.0)
    p.add_argument("--queue_depth", type=int, default=64,
                   help="max requests waiting for the device; beyond this "
                        "new requests get 503 + Retry-After")
    p.add_argument("--max_body_mb", type=float, default=64.0,
                   help="reject request bodies above this size with 413 "
                        "before reading them into memory")
    p.add_argument("--device", default=None)
    p.add_argument("--aot_dir", default=None,
                   help="AOT executable cache dir (warm session start; "
                        "also via SIMWHISPER_AOT_DIR)")
    # float32 (default) honors the endpoints' exact-f32 contract in every
    # mode.  pcm16 is the throughput opt-in for tunneled/PCIe hosts: half
    # the host<->device bytes per request, but waveforms are quantized to
    # the int16 grid (<1 LSB16 difference; see module docstring).
    p.add_argument("--wire", default="float32", choices=["float32", "pcm16"])
    args = p.parse_args(argv)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    from simwhisper_codec_tpu.models.codec import AudioCodec

    codec = AudioCodec.load_from_checkpoint(args.config, args.checkpoint,
                                            mode=args.mode, aot_dir=args.aot_dir,
                                            wire=args.wire)
    # warm the compiled programs so first requests aren't compile-bound
    warm = [np.zeros(16000, np.float32)]
    codec.decode(codec.encode(warm)["codes_list"])
    logger.info("codec warm; serving on %s:%d (mode=%s)", args.host, args.port, args.mode)

    batcher = MicroBatcher(make_runner(codec), args.max_batch, args.window_ms,
                           queue_depth=args.queue_depth)
    server = CodecHTTPServer(
        (args.host, args.port),
        make_handler(batcher, codec.input_sample_rate,
                     max_body_bytes=int(args.max_body_mb * 1024 * 1024)))
    server.serve_forever()


if __name__ == "__main__":
    main()
