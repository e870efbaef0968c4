"""Benchmark: full-size codec encode+decode round-trip throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no speed numbers (SURVEY.md §6); the driver target is
>= 10x real-time per chip on LibriSpeech-test-clean-like audio.  We measure
end-to-end audio-seconds processed per wall-second (encode -> codes ->
decode, fixed-shape 30 s chunks, batch of 8), report x-real-time, and
normalize vs_baseline against the 10x target.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from simwhisper_codec_tpu.config import CodecConfig
    from simwhisper_codec_tpu.models.codec import (
        CodecConstants,
        detokenize,
        init_params,
        tokenize,
    )

    cfg = CodecConfig()
    consts = CodecConstants(cfg)
    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))

    batch = 8
    n_samples = cfg.chunk_samples  # 30 s per utterance

    tok = jax.jit(lambda p, w, l: tokenize(cfg, consts, p, w, l))
    detok = jax.jit(
        lambda p, c, l, fv: detokenize(cfg, consts, p, c, l, fv)
    )

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, n_samples)) * 0.1, jnp.float32)
    lengths = jnp.full((batch,), n_samples, jnp.int32)
    frame_valid = jnp.asarray(cfg.code_frames, jnp.int32)

    def round_trip():
        t = tok(params, wav, lengths)
        d = detok(params, t["codes"], t["codes_lengths"], frame_valid)
        return d["y"]

    # compile + warmup
    y = round_trip()
    jax.block_until_ready(y)

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        y = round_trip()
    jax.block_until_ready(y)
    elapsed = time.perf_counter() - start

    audio_seconds = iters * batch * (n_samples / cfg.input_sample_rate)
    x_realtime = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "codec_round_trip_throughput",
                "value": round(x_realtime, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(x_realtime / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
