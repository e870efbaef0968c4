"""Codec adversarial training recipe (the reference's unreleased trainer).

Drives ``train/codec_gan.py``: manifests -> mel batches (in-graph mel from
random fixed-length audio crops) -> one jitted D-step/G-step program with the
frozen Whisper-style encoder, Orbax checkpointing with resume, JSONL metric
logs.  ``--smoke`` runs the full pipeline on synthetic audio.

Scale-out: pass ``--data_parallel`` to shard batches over all local devices
(params replicated, gradients all-reduced by XLA over ICI).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.config import CodecConfig
from simwhisper_codec_tpu.models.codec import CodecConstants, init_params
from simwhisper_codec_tpu.models.hifigan import init_discriminator
from simwhisper_codec_tpu.ops import mel as mel_ops
from simwhisper_codec_tpu.train import codec_gan
from simwhisper_codec_tpu.train.gan import make_mel_loss_constants, mel_loss_arrays
from simwhisper_codec_tpu.utils.audio_io import find_audio_files, load_audio, save_audio, set_logging
from simwhisper_codec_tpu.utils.checkpoint import load_orbax, save_orbax
from simwhisper_codec_tpu.utils.params import format_param_report

logger = logging.getLogger(__name__)


def crop_batch(rng, wavs, batch_size, segment_samples):
    idx = rng.integers(0, len(wavs), batch_size)
    out = np.zeros((batch_size, segment_samples), np.float32)
    for row, i in enumerate(idx):
        w = wavs[i]
        if len(w) > segment_samples:
            start = int(rng.integers(0, len(w) - segment_samples + 1))
            out[row] = w[start : start + segment_samples]
        else:
            out[row, : len(w)] = w
    return out


def main(argv=None) -> None:
    set_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default=None)
    p.add_argument("--output_folder", default="./results/codec_train")
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--segment_seconds", type=float, default=2.0)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--checkpoint_every", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--resume", default=None)
    p.add_argument("--init_checkpoint", default=None, help="torch .pt to start from")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="reduced-width production-shaped config (quality-curve runs)")
    p.add_argument("--eval_every", type=int, default=0,
                   help="score a held-out set (native STOI/SI-SNR/PESQ) every N steps "
                        "into quality_log.jsonl")
    p.add_argument("--eval_folder", default=None,
                   help="held-out wavs for --eval_every (synthetic voices without it)")
    p.add_argument("--device", default=None)
    p.add_argument("--aot_dir", default=None,
                   help="AOT executable cache (skips the ~15 min GAN-step compile)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all local devices (DP)")
    args = p.parse_args(argv)

    if args.device or args.smoke:
        jax.config.update("jax_platforms", args.device or "cpu")

    out = Path(args.output_folder)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    if args.smoke:
        from simwhisper_codec_tpu.config import (
            DecoderConfig,
            EncoderConfig,
            SampleStackConfig,
            VocosConfig,
        )

        cfg = CodecConfig(
            acoustic_encoder=EncoderConfig(
                d_model=64, encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=128
            ),
            acoustic_decoder=DecoderConfig(
                d_model=64, decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=128
            ),
            downsample=SampleStackConfig(in_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48),
            upsample=SampleStackConfig(out_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48),
            vocos=VocosConfig(input_channels=80, dim=64, intermediate_dim=128, num_layers=2),
        )
        if args.steps == 100000:  # keep an explicitly requested step count
            args.steps = 3
        if args.batch_size == 16:  # keep an explicitly requested batch size
            args.batch_size = 2
        args.segment_seconds = 0.5
        wavs = [rng.standard_normal(12000).astype(np.float32) * 0.1 for _ in range(4)]
    elif args.small:
        from simwhisper_codec_tpu.config import (
            DecoderConfig,
            EncoderConfig,
            SampleStackConfig,
            VocosConfig,
        )

        # production-shaped at reduced width: every stage present, ~4M params
        cfg = CodecConfig(
            acoustic_encoder=EncoderConfig(
                d_model=192, encoder_layers=4, encoder_attention_heads=4,
                encoder_ffn_dim=384,
            ),
            acoustic_decoder=DecoderConfig(
                d_model=192, decoder_layers=4, decoder_attention_heads=4,
                decoder_ffn_dim=384,
            ),
            downsample=SampleStackConfig(in_dim=192, latent_dim=32,
                                         stack_factor=4, hidden_dim=128),
            upsample=SampleStackConfig(out_dim=192, latent_dim=32,
                                       stack_factor=4, hidden_dim=128),
            vocos=VocosConfig(input_channels=80, dim=192,
                              intermediate_dim=384, num_layers=4),
        )
        if not args.data_folder:
            p.error("--data_folder required with --small")
        paths = find_audio_files(args.data_folder)
        logger.info("loading %d files", len(paths))
        wavs = [load_audio(path, cfg.input_sample_rate) for path in paths]
    else:
        cfg = CodecConfig()
        if not args.data_folder:
            p.error("--data_folder required (or --smoke)")
        paths = find_audio_files(args.data_folder)
        logger.info("loading %d files", len(paths))
        wavs = [load_audio(path, cfg.input_sample_rate) for path in paths]

    consts = CodecConstants(cfg)
    mel_consts = make_mel_loss_constants(sample_rate=cfg.input_sample_rate)

    if args.init_checkpoint:
        from simwhisper_codec_tpu.utils.checkpoint import load_codec_params

        params = load_codec_params(args.init_checkpoint, cfg)
    else:
        params = init_params(jax.random.PRNGKey(args.seed), cfg)
    d_params = init_discriminator(jax.random.PRNGKey(args.seed + 1))
    logger.info("codec params:\n%s", format_param_report(params))

    g_tx, d_tx = codec_gan.make_codec_gan_optimizers(cfg, args.learning_rate)
    if args.resume:
        # Restore against an ABSTRACT template and free the concrete init
        # params first.  Materializing the full state (params + both Adam
        # states, ~3.4 GB at 291M params) as a restore target holds TWO
        # copies on device while Orbax restores — the full-size on-chip soak
        # OOMed exactly there (RESOURCE_EXHAUSTED at the first post-resume
        # step) while fresh runs at the identical footprint were fine.
        template = jax.eval_shape(
            lambda p, d: codec_gan.init_codec_gan_state(cfg, p, d, g_tx, d_tx),
            params, d_params,
        )
        del params, d_params  # free ~1.2 GB of device HBM before the restore
        restored = load_orbax(args.resume, template._asdict())
        state = codec_gan.CodecGanState(**restored)
        logger.info("resumed from %s at step %d", args.resume, int(state.step))
    else:
        state = codec_gan.init_codec_gan_state(cfg, params, d_params, g_tx, d_tx)

    raw_step = codec_gan.make_codec_gan_step(cfg, consts, mel_consts, g_tx, d_tx)
    if args.aot_dir:
        # the full-size adversarial step compiles ~15.5 min through the
        # tunnel (docs/TPU_NOTES.md); the serialized executable warm-starts
        # later sessions in seconds
        from simwhisper_codec_tpu.utils.aot import warm_jit

        step_fn = warm_jit(raw_step, aot_dir=args.aot_dir, tag="codec_gan_step",
                           fingerprint=repr((cfg, args.batch_size, args.segment_seconds,
                                             args.learning_rate)))
    else:
        step_fn = jax.jit(raw_step)
    mel_arrays = mel_loss_arrays(mel_consts)

    data_sharding = None
    if args.data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("data",))
        data_sharding = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        nd = len(jax.devices())
        if args.batch_size % nd:
            args.batch_size = -(-args.batch_size // nd) * nd
            logger.info("batch_size rounded up to %d (device multiple)", args.batch_size)
        logger.info("data-parallel over %d devices", nd)

    segment_samples = int(args.segment_seconds * cfg.input_sample_rate)
    # keep mel frame count even so encoder stride-2 divides cleanly
    segment_samples = segment_samples // (cfg.mel_hop_length * 2) * (cfg.mel_hop_length * 2)
    mel_frames = segment_samples // cfg.mel_hop_length
    seg_mel_consts = _seg_mel(cfg, segment_samples)
    seg_log_mel = jax.jit(lambda w: mel_ops.log_mel(seg_mel_consts, w))

    quality_eval = None
    if args.eval_every:
        quality_eval = _make_quality_eval(
            cfg, consts, seg_log_mel, segment_samples, mel_frames,
            args.eval_folder, out, args.seed)
        if int(state.step) == 0:
            quality_eval(state.params, 0)  # the random-init baseline row

    log_path = out / "train_log.jsonl"
    t0 = time.time()
    start_step = int(state.step) + 1
    for step in range(start_step, args.steps + 1):
        # step-keyed rng: a resumed run sees the SAME crop sequence as a
        # continuous one (the seed-only rng restarted from crop #1 on resume,
        # silently breaking resumed-vs-continuous equivalence) — the same
        # epoch-keyed discipline as the reference's sampler (helpers.py:160-198)
        audio = crop_batch(np.random.default_rng((args.seed, step)),
                           wavs, args.batch_size, segment_samples)
        feats = seg_log_mel(jnp.asarray(audio))
        batch = {
            "mel": jnp.asarray(feats, jnp.float32),
            "mel_lens": jnp.full((args.batch_size,), mel_frames, jnp.int32),
            "audio": jnp.asarray(audio),
            "audio_lens": jnp.full((args.batch_size,), segment_samples, jnp.int32),
        }
        if data_sharding is not None:
            batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, mel_arrays)
        if step % args.log_every == 0 or step == args.steps:
            rec = {k: float(v) for k, v in metrics.items()}
            rec.update({"step": step, "time": round(time.time() - t0, 1)})
            logger.info("%s", json.dumps(rec))
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if quality_eval and (step % args.eval_every == 0 or step == args.steps):
            quality_eval(state.params, step)
        if step % args.checkpoint_every == 0 or step == args.steps:
            # full state (params + both optimizers + step counter) for exact resume
            save_orbax(str(out / f"ckpt_{step:07d}"), state._asdict())

    logger.info("done after %d steps", args.steps)


def synthetic_voice(seed: int, seconds: float, sr: int) -> np.ndarray:
    """Formant-modulated harmonic voice (held-out eval carriers)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = rng.uniform(90, 220) * (1.0 + 0.06 * np.sin(2 * np.pi * rng.uniform(1.5, 3.0) * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    x = sum(np.sin(h * phase + rng.uniform(0, 6)) / h ** rng.uniform(0.5, 0.9)
            for h in range(1, 24))
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(2.5, 4.0) * t + rng.uniform(0, 6))
    x *= np.clip(np.sin(2 * np.pi * rng.uniform(1.2, 2.2) * t) * 4.0, 0.0, 1.0)
    x = x + 0.005 * rng.standard_normal(len(t))
    return (0.2 * x / np.max(np.abs(x))).astype(np.float32)


def _make_quality_eval(cfg, consts, seg_log_mel, segment_samples: int,
                       mel_frames: int, eval_folder, out: Path, seed: int):
    """Held-out quality probe: reconstruct a fixed eval batch through the
    CURRENT generator params and score native STOI/SI-SNR/PESQ-WB, appending
    one row per call to quality_log.jsonl (the trainer-learns evidence the
    loss curve alone cannot give)."""
    from simwhisper_codec_tpu.eval import metrics as M
    from simwhisper_codec_tpu.models.codec import training_forward

    if eval_folder:
        paths = find_audio_files(eval_folder)
        raw = [load_audio(path, cfg.input_sample_rate) for path in paths]
    else:  # unseen-seed synthetic voices (disjoint from any training seed)
        raw = [synthetic_voice(10_000 + i, segment_samples / cfg.input_sample_rate,
                               cfg.input_sample_rate) for i in range(8)]
    batch = np.zeros((len(raw), segment_samples), np.float32)
    for i, w in enumerate(raw):  # deterministic center crop / zero pad
        if len(w) >= segment_samples:
            s = (len(w) - segment_samples) // 2
            batch[i] = w[s:s + segment_samples]
        else:
            batch[i, :len(w)] = w
    mel = jnp.asarray(np.asarray(seg_log_mel(jnp.asarray(batch))), jnp.float32)
    lens = jnp.full((len(raw),), mel_frames, jnp.int32)
    fwd = jax.jit(lambda params, m, l: training_forward(
        cfg, consts, params, m, l)["reconstructed_audio"])
    log_path = out / "quality_log.jsonl"

    def run(params, step: int) -> dict:
        y = np.asarray(fwd(params, mel, lens))[:, :segment_samples]
        rows = []
        for ref, deg in zip(batch, y):
            rows.append({
                "stoi": M.stoi(ref, deg, cfg.input_sample_rate),
                "si_snr": M.si_snr(ref, deg),
                "pesq_wb": M.pesq_score(ref.astype(np.float64),
                                        deg.astype(np.float64),
                                        cfg.input_sample_rate, "wb"),
            })
        rec = {"step": step, "n_eval": len(rows)}
        for k in ("stoi", "si_snr", "pesq_wb"):
            vals = [r[k] for r in rows if r[k] is not None and np.isfinite(r[k])]
            rec[k] = round(float(np.mean(vals)), 4) if vals else None
        logger.info("quality %s", json.dumps(rec))
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    return run


def _seg_mel(cfg: CodecConfig, segment_samples: int):
    """Mel constants sized to the training segment (not the 30 s chunk)."""
    import dataclasses

    fe = dataclasses.replace(
        cfg.feature_extractor,
        n_samples=segment_samples,
        nb_max_frames=segment_samples // cfg.feature_extractor.hop_length,
        chunk_length=max(1, segment_samples // cfg.feature_extractor.sampling_rate),
    )
    return mel_ops.make_constants(fe)


if __name__ == "__main__":
    main()
