"""Benchmark: full-size codec encode+decode round-trip throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no speed numbers (SURVEY.md §6); the driver target is
>= 10x real-time per chip.  The headline ``value`` is the serving default,
``mode="fast-int8"`` (mixed): bf16 tokenize + fused-int8 detokenize — code
indices bit-identical to the bf16 path by construction (codes are a function
of the encode side only), int8 decode perceptually transparent (PESQ-WB at
the 4.64 ceiling vs bf16, STOI >= 0.997 — docs/TPU_NOTES.md), ~+15%
throughput.  ``bf16_x_realtime`` reports the pure-bf16 path; if the int8
section cannot run, the headline falls back to it (``headline_mode`` says
which).

The headline number is *pipelined* throughput: iterations chain through a
device-side loss accumulator (each round trip's output feeds the scalar
accumulator, so every program fully executes) and the host reads one scalar at
the end — the steady state of a corpus/serving run where chunks are kept in
flight.  ``latency_x_realtime`` is the per-iteration-synced variant (a host
readback every round trip, ~30 ms tunnel tax on axon hosts).

Wedge discipline (round-3 lesson): NOTHING here interrupts in-flight device
work — no SIGALRM, no mid-compile kill; abandoning an in-flight tunnel
operation wedges the device for everything that follows (TPU_NOTES quirk #5).
The int8 section instead checks its time budget *between* steps and skips the
remainder gracefully, and all programs AOT-serialize to ``BENCH_AOT_DIR``
(default ``.aot_cache/bench`` in the repo) so warm sessions skip the
45-260 s Mosaic compiles entirely.

The JSON line also carries MFU accounting (utils/flops.py — analytic
multiply-add ledger over the SURVEY §0 shape chain): flops_per_audio_sec,
achieved TFLOP/s, and mfu vs the chip's published bf16 peak (0 when the
device kind is unknown; override with BENCH_PEAK_TFLOPS).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial

import numpy as np


def _probe_backend(timeout_s: float = 300.0) -> None:
    """Fail fast (rc=3, clear message) when the device backend is unreachable.

    The axon tunnel can be down/wedged for reasons outside this process
    (round-3 postmortem); in that state ``jax.devices()`` blocks forever and
    the driver records an opaque rc=124.  Probing in a *subprocess* keeps this
    process's JAX uninitialized; killing a probe that never reached the device
    holds no in-flight work, so it cannot wedge anything further.
    """
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform, len(d))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if proc.returncode == 0:
            return
        detail = (proc.stderr or proc.stdout).strip()[-500:]
    except subprocess.TimeoutExpired:
        detail = f"jax.devices() still blocked after {timeout_s:.0f}s"
    print(f"bench: device backend unreachable ({detail}); "
          "cannot produce numbers — aborting cleanly", flush=True)
    raise SystemExit(3)


def main() -> None:
    if not os.environ.get("BENCH_SKIP_PROBE"):
        _probe_backend()

    import jax
    import jax.numpy as jnp

    # NOTE: do NOT enable jax_compilation_cache_dir on axon hosts — cache
    # *writes* succeed but warm-start *reads* hang the tunnel indefinitely
    # (measured: cold run 3-4 min total, warm run killed at 9+ min).  AOT
    # executable serialization (utils/aot.py) is the path that works there.
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simwhisper_codec_tpu.config import CodecConfig
    from simwhisper_codec_tpu.models.codec import (
        CodecConstants,
        detokenize,
        fast_mode_settings,
        init_params,
        tokenize,
    )
    from simwhisper_codec_tpu.utils.aot import warm_jit

    # the benchmarked program IS the serving program: one shared config
    fastkw = fast_mode_settings()
    cfg = dataclasses.replace(CodecConfig(), compute_dtype=fastkw["compute_dtype"])
    consts = CodecConstants(cfg)
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    n_samples = cfg.chunk_samples  # 30 s per utterance
    prec = fastkw["precision"]

    aot_dir = os.environ.get(
        "BENCH_AOT_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".aot_cache", "bench"),
    ) or None
    fingerprint = repr((cfg, fastkw, batch))

    def _warm(fn, tag):
        return warm_jit(fn, aot_dir=aot_dir, tag=tag, fingerprint=fingerprint)

    attn = fastkw["attn_impl"]  # MXU-aligned; see models/transformer.py::chunked_attention
    tok = _warm(partial(tokenize, cfg, consts, precision=prec, attn_impl=attn,
                        fused_ffn=fastkw["fused_ffn"]), "bench-tok")
    detok = _warm(partial(detokenize, cfg, consts, precision=prec, attn_impl=attn,
                          fused_vocos=fastkw["fused_vocos"], fused_ffn=fastkw["fused_ffn"]),
                  "bench-detok")

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n_samples)) * 0.1, jnp.float32)
    lengths = jnp.full((batch,), n_samples, jnp.int32)
    frame_valid = jnp.asarray(cfg.code_frames, jnp.int32)
    accum = jax.jit(lambda y, a: a + jnp.sum(jnp.abs(y)))

    def round_trip(w, a):
        t = tok(params, w, lengths)
        d = detok(params, t["codes"], t["codes_lengths"], frame_valid)
        # the accumulator depends on the full output: nothing can be skipped
        return accum(d["y"], a)

    float(round_trip(wav, jnp.zeros(())))  # compile/deserialize + warmup

    iters = int(os.environ.get("BENCH_ITERS", "10"))  # lower only for smoke runs
    # latency mode: host scalar readback every iteration
    start = time.perf_counter()
    for _ in range(iters):
        float(round_trip(wav, jnp.zeros(())))
    elapsed_sync = time.perf_counter() - start
    # pipelined mode: device-side accumulation, one readback at the end
    acc = jnp.zeros(())
    start = time.perf_counter()
    for _ in range(iters):
        acc = round_trip(wav, acc)
    assert np.isfinite(float(acc))
    elapsed_pipe = time.perf_counter() - start

    audio_seconds = iters * batch * (n_samples / cfg.input_sample_rate)
    bf16_x_realtime = audio_seconds / elapsed_pipe
    latency_x_realtime = audio_seconds / elapsed_sync

    # int8 serving modes (fused Pallas int8 FFN/ConvNeXt, ops/quant.py):
    #   mixed  = bf16 tokenize + int8 detokenize (the serving default:
    #            codes bit-identical to bf16, decode transparent, ~+15%)
    #   full   = int8 both sides (max throughput, ~97% code agreement)
    # Budget: checked BETWEEN steps only; a step in flight always completes.
    int8_x_realtime = int8_agreement = int8_mixed_x_realtime = None
    int8_deadline = time.perf_counter() + float(os.environ.get("BENCH_INT8_BUDGET", "1500"))

    def budget_ok(step: str) -> bool:
        left = int8_deadline - time.perf_counter()
        if left <= 0:
            print(f"int8 budget exhausted before {step}; skipping the rest", flush=True)
            return False
        return True

    try:
        if not os.environ.get("BENCH_SKIP_INT8"):
            from simwhisper_codec_tpu.ops.quant import (
                quantize_stacked_convnext,
                quantize_stacked_ffn,
            )

            qparams = dict(params)
            for part in ("encoder", "decoder"):
                qparams[part] = dict(qparams[part])
                qparams[part]["layers"] = quantize_stacked_ffn(qparams[part]["layers"])
            qparams["vocos"] = dict(qparams["vocos"])
            qparams["vocos"]["blocks"] = quantize_stacked_convnext(qparams["vocos"]["blocks"])
            qparams = jax.device_put(qparams)
            detok8 = _warm(
                partial(detokenize, cfg, consts, precision=prec, attn_impl=attn,
                        fused_vocos=fastkw["int8_vocos"] or fastkw["fused_vocos"],
                        fused_ffn=fastkw["fused_ffn"], ffn_impl=fastkw["int8_ffn_impl"]),
                "bench-detok8")

            # mixed mode first — it is the headline; int8-full can be skipped
            def round_trip8_mixed(w, a):
                t = tok(params, w, lengths)
                d = detok8(qparams, t["codes"], t["codes_lengths"], frame_valid)
                return accum(d["y"], a)

            if budget_ok("mixed-mode compile"):
                assert np.isfinite(float(round_trip8_mixed(wav, jnp.zeros(()))))
                acc = jnp.zeros(())
                start = time.perf_counter()
                for _ in range(iters):
                    acc = round_trip8_mixed(wav, acc)
                assert np.isfinite(float(acc))
                int8_mixed_x_realtime = round(audio_seconds / (time.perf_counter() - start), 2)

            if budget_ok("int8-full compile"):
                tok8 = _warm(
                    partial(tokenize, cfg, consts, precision=prec, attn_impl=attn,
                            fused_ffn=fastkw["fused_ffn"], ffn_impl=fastkw["int8_ffn_impl"]),
                    "bench-tok8")

                def round_trip8(w, a):
                    t = tok8(qparams, w, lengths)
                    d = detok8(qparams, t["codes"], t["codes_lengths"], frame_valid)
                    return accum(d["y"], a), t["codes"]

                a8, codes8 = round_trip8(wav, jnp.zeros(()))
                assert np.isfinite(float(a8))
                codes_bf = tok(params, wav, lengths)["codes"]
                int8_agreement = round(
                    float(np.mean(np.asarray(codes8) == np.asarray(codes_bf))), 4)
                if budget_ok("int8-full timing"):
                    acc = jnp.zeros(())
                    start = time.perf_counter()
                    for _ in range(iters):
                        acc, _ = round_trip8(wav, acc)
                    assert np.isfinite(float(acc))
                    int8_x_realtime = round(audio_seconds / (time.perf_counter() - start), 2)
    except Exception as e:  # int8 section is additive: never lose the JSON line
        print(f"int8 bench section failed: {e!r}", flush=True)

    if int8_mixed_x_realtime is not None:
        headline, headline_mode = int8_mixed_x_realtime, "fast-int8(mixed)"
    else:
        headline, headline_mode = bf16_x_realtime, "fast(bf16)"

    from simwhisper_codec_tpu.utils.flops import codec_flops, peak_tflops

    ledger = codec_flops(cfg)
    flops_per_audio_sec = ledger["total"] / (n_samples / cfg.input_sample_rate)
    achieved_tflops = flops_per_audio_sec * bf16_x_realtime / 1e12
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 0)) or peak_tflops(jax.devices()[0])
    mfu = achieved_tflops / peak if peak else 0.0
    print(
        json.dumps(
            {
                "metric": "codec_round_trip_throughput",
                "value": round(headline, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(headline / 10.0, 3),
                "headline_mode": headline_mode,
                "bf16_x_realtime": round(bf16_x_realtime, 2),
                "latency_x_realtime": round(latency_x_realtime, 2),
                "flops_per_audio_sec": round(flops_per_audio_sec / 1e9, 2),
                "flops_unit": "GFLOP_per_audio_sec",
                "achieved_tflops": round(achieved_tflops, 2),
                "device": jax.devices()[0].device_kind,
                "peak_tflops_bf16": peak,
                "mfu": round(mfu, 4),
                "int8_x_realtime": int8_x_realtime,
                "int8_code_agreement_vs_bf16": int8_agreement,
                "int8_mixed_x_realtime": int8_mixed_x_realtime,
            }
        )
    )


if __name__ == "__main__":
    main()
