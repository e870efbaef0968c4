"""Offline continuous-feature extraction: audio -> encoder hidden states -> .npy.

Mirrors the reference's offline stage (``extract_code.py:87-219`` +
``local_whisper_ssl.py:22-257``): run the frozen Whisper-style acoustic
encoder over each utterance, pick a layer (``layer_id`` -1 = final LN output),
save per-utterance ``.npy`` of shape [T, 1, d_model].  Idempotent via a
config-fingerprint skip-guard (extract_code.py:56-84).

Encoder weights come from (in priority order) a codec checkpoint, HF Whisper
(``--whisper_model``, needs local cache in zero-egress setups), or random
init (``--allow_random`` — for pipeline smoke tests only).
"""

from __future__ import annotations

import hashlib
import json
import sys
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.config import EncoderConfig, FeatureExtractorConfig
from simwhisper_codec_tpu.models import transformer
from simwhisper_codec_tpu.ops import mel as mel_ops
from simwhisper_codec_tpu.utils.audio_io import load_audio


class FeatureExtractor:
    """Jitted mel + encoder forward with layer pick (single 30 s window)."""

    def __init__(self, enc_cfg: EncoderConfig, params: dict, layer_id: int = -1):
        self.enc_cfg = enc_cfg
        self.fe_cfg = FeatureExtractorConfig(
            feature_size=enc_cfg.num_mel_bins, sampling_rate=enc_cfg.sampling_rate,
            hop_length=enc_cfg.hop_length,
        )
        self.mel_consts = mel_ops.make_constants(self.fe_cfg)
        self.params = jax.device_put(params)
        self.layer_id = layer_id

        def fwd(params, wav, lengths):
            feats = mel_ops.log_mel(self.mel_consts, wav)
            mel_lens = mel_ops.mel_lengths(lengths, self.fe_cfg.hop_length, self.mel_consts.n_frames)
            final, out_len, all_states = transformer.encoder_forward(
                enc_cfg, params, feats, mel_lens, output_hidden_states=True
            )
            return all_states, out_len

        self._fwd = jax.jit(fwd)

    def extract(self, wav: np.ndarray) -> np.ndarray:
        """wav (S,) -> features (T, d_model) for the configured layer."""
        n = self.fe_cfg.n_samples
        length = min(len(wav), n)
        padded = np.zeros((1, n), np.float32)
        padded[0, :length] = wav[:length]
        states, out_len = self._fwd(self.params, jnp.asarray(padded), jnp.asarray([length]))
        t = int(out_len[0])
        return np.asarray(states[self.layer_id][0, :t, :])


def extract_manifest(
    manifest_path: str,
    out_dir: str,
    extractor: FeatureExtractor,
    sample_rate: int = 16000,
) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fingerprint = hashlib.sha256(
        json.dumps(
            [manifest_path, extractor.layer_id, type(extractor).__name__]
        ).encode()
    ).hexdigest()[:16]
    guard = out / f".extract_{fingerprint}"
    if guard.exists():
        return

    manifest = json.loads(Path(manifest_path).read_text())
    for utt_id, rec in manifest.items():
        target = out / f"{utt_id}.npy"
        if target.exists():
            continue
        try:
            wav = load_audio(rec["wav"], target_sample_rate=sample_rate)
            feats = extractor.extract(wav)
            # reference layout [T, 1, D] (extract_code.py np.save)
            np.save(target, feats[:, None, :].astype(np.float32))
        except Exception as e:  # per-file resilience like extract_code.py:186-215
            print(f"skipping {utt_id}: {e}")
    guard.touch()


class HubertFeatureExtractor:
    """HuBERT continuous features (the reference's hubert variant, E2 —
    ``hifigan_continue_hubert/continuous_hubert_ssl.py:19-132``): hidden
    states at a chosen layer, 50 Hz, 768-d — run natively on the JAX SSL
    tower (``models/ssl.py``, parity-tested vs HF torch).  Weights convert
    from the local HF cache (zero-egress gating) or init randomly for
    pipeline smoke tests.
    """

    def __init__(self, ssl_cfg=None, params: dict = None, layer_id: int = -1,
                 model_name: str = "facebook/hubert-base-ls960",
                 allow_random: bool = False, seed: int = 0):
        from simwhisper_codec_tpu.models.ssl import (
            hubert_base_config,
            init_ssl_params,
            ssl_forward,
        )

        self.cfg = ssl_cfg or hubert_base_config()
        if params is None:
            if allow_random:
                params = init_ssl_params(jax.random.PRNGKey(seed), self.cfg)
            else:
                from transformers import HubertModel

                from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_hf_ssl

                hf = HubertModel.from_pretrained(model_name, local_files_only=True)
                sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
                params = convert_hf_ssl(sd, self.cfg)
        self.params = jax.device_put(params)
        self.layer_id = layer_id
        self._fwd = jax.jit(partial(ssl_forward, self.cfg))

    def extract(self, wav: np.ndarray) -> np.ndarray:
        """wav (S,) -> features (T, d) at the configured layer (50 Hz)."""
        n = len(wav)
        # geometric 1 s buckets bound compiled programs at ~log2(max_seconds)
        padded_len = 16000
        while padded_len < n:
            padded_len *= 2
        padded = np.zeros((1, padded_len), np.float32)
        padded[0, :n] = wav
        out = self._fwd(self.params, jnp.asarray(padded),
                        jnp.asarray([n], jnp.int32))
        t = int(out["frame_lengths"][0])
        return np.asarray(out["hidden_states"][self.layer_id][0, :t, :])


def build_encoder_params(
    enc_cfg: EncoderConfig,
    codec_checkpoint: str = None,
    whisper_model: str = None,
    allow_random: bool = False,
    seed: int = 0,
) -> dict:
    if codec_checkpoint:
        from simwhisper_codec_tpu.utils.checkpoint import convert_encoder, load_torch_state_dict

        sd = load_torch_state_dict(codec_checkpoint)
        return convert_encoder(sd, enc_cfg)
    if whisper_model:
        from simwhisper_codec_tpu.utils.whisper_init import load_whisper_encoder_params

        return load_whisper_encoder_params(enc_cfg, whisper_model)
    if allow_random:
        return transformer.init_encoder(jax.random.PRNGKey(seed), enc_cfg)
    raise RuntimeError("need --codec_checkpoint, --whisper_model, or --allow_random")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--feature_type", choices=["whisper", "hubert"], default="whisper",
                   help="whisper: codec/Whisper encoder features (E3); "
                        "hubert: HuBERT-base SSL features (E2)")
    p.add_argument("--layer_id", type=int, default=-1)
    p.add_argument("--codec_checkpoint", default=None)
    p.add_argument("--whisper_model", default=None)
    p.add_argument("--hubert_model", default="facebook/hubert-base-ls960")
    p.add_argument("--allow_random", action="store_true")
    p.add_argument("--device", default=None,
                   help="jax platform override, e.g. cpu (the axon TPU "
                        "plugin ignores JAX_PLATFORMS)")
    args = p.parse_args()

    if args.device:
        jax.config.update("jax_platforms", args.device)

    if args.feature_type == "hubert":
        extractor = HubertFeatureExtractor(
            layer_id=args.layer_id, model_name=args.hubert_model,
            allow_random=args.allow_random,
        )
        extract_manifest(args.manifest, args.out_dir, extractor)
        print("done")
        sys.exit(0)

    enc_cfg = EncoderConfig()
    params = build_encoder_params(
        enc_cfg, args.codec_checkpoint, args.whisper_model, args.allow_random
    )
    extractor = FeatureExtractor(enc_cfg, params, args.layer_id)
    extract_manifest(args.manifest, args.out_dir, extractor)
    print("done")
