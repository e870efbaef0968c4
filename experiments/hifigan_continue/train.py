"""Continuous-feature HiFi-GAN training recipe (whisper/hubert-style features).

Mirrors the reference recipe driver
(``hifigan_experiments/hifigan_continue_whisper/train.py:399-492``):
data prep -> offline feature extraction -> GAN training with two AdamW
optimizers, per-epoch ExponentialLR, per-epoch validation synthesis, and
checkpointing — rebuilt TPU-native: the whole D-step/G-step sequence is one
jitted program, checkpoints are Orbax, and batches shard over a data mesh.

Usable end-to-end on LJSpeech when features are extracted from a codec
checkpoint or a locally cached Whisper; `--smoke` runs the full pipeline on
synthetic data for CI.
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

from experiments.hifigan_continue.data_prepare import prepare_dataset
from experiments.hifigan_continue.extract_features import (
    FeatureExtractor,
    HubertFeatureExtractor,
    build_encoder_params,
    extract_manifest,
)
from simwhisper_codec_tpu.config import EncoderConfig
from simwhisper_codec_tpu.models import hifigan as hg
from simwhisper_codec_tpu.train import gan
from simwhisper_codec_tpu.utils.audio_io import load_audio, save_audio, set_logging
from simwhisper_codec_tpu.utils.checkpoint import load_orbax, save_orbax

logger = logging.getLogger(__name__)


def make_batches(manifest, feature_dir, batch_size, segment_size, feature_hop, rng, sample_rate):
    """Yield aligned (features, audio) segment batches from the manifest."""
    items = list(manifest.values())
    rng.shuffle(items)
    feats_batch, audio_batch = [], []
    for rec in items:
        feat_path = Path(feature_dir) / f"{rec['id']}.npy"
        if not feat_path.exists():
            continue
        feats = np.load(feat_path)[:, 0, :]  # [T, D]
        audio = load_audio(rec["wav"], target_sample_rate=sample_rate)
        a, f = gan.sample_segment(rng, audio, feats, segment_size, feature_hop)
        feats_batch.append(f)
        audio_batch.append(a)
        if len(feats_batch) == batch_size:
            yield {
                "features": jnp.asarray(np.stack(feats_batch), jnp.float32),
                "audio": jnp.asarray(np.stack(audio_batch), jnp.float32),
            }
            feats_batch, audio_batch = [], []


def main(argv=None) -> None:
    set_logging()
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default=None)
    p.add_argument("--output_folder", default="./results/continuous_hifigan")
    p.add_argument("--epochs", type=int, default=None,
                   help="training epochs (default 220; 2 under --smoke)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--segment_size", type=int, default=8960)
    p.add_argument("--feature_hop", type=int, default=320)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--lr_gamma", type=float, default=0.9999)
    p.add_argument("--layer_id", type=int, default=-1)
    p.add_argument("--feature_type", choices=["whisper", "hubert"], default="whisper",
                   help="whisper: codec/Whisper encoder features (E1, "
                        "hifigan_continue_whisper); hubert: HuBERT-base SSL "
                        "features (E2, hifigan_continue_hubert)")
    p.add_argument("--codec_checkpoint", default=None)
    p.add_argument("--whisper_model", default=None)
    p.add_argument("--hubert_model", default="facebook/hubert-base-ls960")
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--keep_checkpoint_interval", type=int, default=50)
    p.add_argument("--allow_random", action="store_true",
                   help="random-weight feature extractor (pipeline smoke runs)")
    p.add_argument("--smoke", action="store_true", help="tiny synthetic end-to-end run")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in --output_folder")
    p.add_argument("--device", default=None, help="JAX platform override (cpu/tpu)")
    args = p.parse_args(argv)

    if args.device or args.smoke:
        # --smoke defaults to CPU: tiny shapes, and the ambient platform
        # wrapper ignores the JAX_PLATFORMS env var
        jax.config.update("jax_platforms", args.device or "cpu")

    out = Path(args.output_folder)
    out.mkdir(parents=True, exist_ok=True)
    # persistent train log beside the checkpoints (the reference recipes use
    # SpeechBrain's FileTrainLogger; whisper/train.py:216-227)
    fh = logging.FileHandler(out / "train_log.txt")
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logging.getLogger().addHandler(fh)
    rng = np.random.default_rng(args.seed)

    if args.smoke:
        gcfg = hg.HifiGanConfig(in_channels=16, upsample_initial_channel=32)
        enc_dim = 16
        if args.epochs is None:  # keep an explicit --epochs (e.g. resume tests)
            args.epochs = 2
        args.batch_size, args.segment_size = 2, 2560
        save = out / "save"
        save.mkdir(exist_ok=True)
        manifest = {}
        feature_dir = save / "custom_features"
        feature_dir.mkdir(exist_ok=True)
        for i in range(4):
            utt = f"smoke{i}"
            wav = (rng.standard_normal(args.sample_rate) * 0.05).astype(np.float32)
            wav_path = save / f"{utt}.wav"
            save_audio(wav_path, wav, args.sample_rate)
            feats = rng.standard_normal((len(wav) // args.feature_hop, 1, enc_dim)).astype(np.float32)
            np.save(feature_dir / f"{utt}.npy", feats)
            manifest[utt] = {"id": utt, "wav": str(wav_path), "duration": 1.0}
        train_manifest = manifest
    else:
        if not args.data_folder:
            p.error("--data_folder is required (or use --smoke)")
        gcfg = hg.HifiGanConfig(in_channels=768, upsample_initial_channel=512)
        save = out / "save"
        manifests = prepare_dataset(args.data_folder, str(save), sample_rate=args.sample_rate)
        if args.feature_type == "hubert":
            extractor = HubertFeatureExtractor(
                layer_id=args.layer_id, model_name=args.hubert_model,
                allow_random=args.allow_random,
            )
        else:
            enc_cfg = EncoderConfig()
            enc_params = build_encoder_params(
                enc_cfg, args.codec_checkpoint, args.whisper_model,
                allow_random=args.allow_random,
            )
            extractor = FeatureExtractor(enc_cfg, enc_params, args.layer_id)
        feature_dir = save / "custom_features"
        for split in ("train", "valid"):
            extract_manifest(manifests[split], str(feature_dir), extractor, args.sample_rate)
        train_manifest = json.loads(Path(manifests["train"]).read_text())
    if args.epochs is None:
        args.epochs = 220  # reference recipe default (hparams/train.yaml)

    # -- model + optimizers --------------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    kg, kd = jax.random.split(key)
    g_params = hg.init_generator(kg, gcfg)
    d_params = hg.init_discriminator(kd)
    g_tx, d_tx = gan.make_gan_optimizers(args.learning_rate)
    state = gan.GanTrainState(
        g_params, d_params, g_tx.init(g_params), d_tx.init(d_params), jnp.zeros((), jnp.int32)
    )
    mel_consts = gan.make_mel_loss_constants(sample_rate=args.sample_rate)
    mel_arrays = gan.mel_loss_arrays(mel_consts)
    step = jax.jit(gan.make_gan_train_step(gcfg, mel_consts, g_tx, d_tx))

    ckpt_dir = out / "checkpoints"
    best_loss = float("inf")
    start_epoch = 1
    if args.resume and ckpt_dir.exists():
        epochs_saved = sorted(ckpt_dir.glob("epoch_*"))
        if epochs_saved:
            latest = epochs_saved[-1]
            restored = load_orbax(str(latest), state._asdict())
            state = gan.GanTrainState(**restored)
            start_epoch = int(latest.name.split("_")[1]) + 1
            logger.info("resumed from %s (next epoch %d)", latest.name, start_epoch)
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        n_batches, g_loss_sum = 0, 0.0
        for batch in make_batches(
            train_manifest, feature_dir, args.batch_size, args.segment_size,
            args.feature_hop, rng, args.sample_rate,
        ):
            state, metrics = step(state, batch, mel_arrays)
            g_loss_sum += float(metrics["g_loss"])
            n_batches += 1
        state = gan.decay_learning_rate(state, args.lr_gamma)
        avg = g_loss_sum / max(n_batches, 1)
        logger.info(
            "epoch %d: g_loss=%.4f batches=%d time=%.1fs", epoch, avg, n_batches, time.time() - t0
        )
        if avg < best_loss or epoch % args.keep_checkpoint_interval == 0:
            best_loss = min(best_loss, avg)
            # full state (G/D params + optimizers + step) for exact resume
            save_orbax(str(ckpt_dir / f"epoch_{epoch:04d}"), state._asdict())
            logger.info("saved checkpoint at epoch %d", epoch)

        # per-epoch progress sample synthesis (reference train.py:203-266)
        sample_rec = next(iter(train_manifest.values()))
        sample_feat = Path(feature_dir) / f"{sample_rec['id']}.npy"
        if sample_feat.exists():
            feats = np.load(sample_feat)[:, 0, :]
            wav = np.asarray(
                hg.generator_forward(gcfg, state.g_params, jnp.asarray(feats[None]))
            )[0]
            samples_dir = out / "samples"
            samples_dir.mkdir(exist_ok=True)
            save_audio(samples_dir / f"epoch_{epoch:04d}.wav", wav, args.sample_rate)

    logger.info("training complete; best g_loss %.4f", best_loss)


if __name__ == "__main__":
    main()
