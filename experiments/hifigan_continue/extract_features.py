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
        json.dumps([manifest_path, extractor.layer_id]).encode()
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
    ``hifigan_continue_hubert/continuous_hubert_ssl.py:19-132``): HF
    ``HubertModel`` hidden states at a chosen layer, 50 Hz, 768-d.

    Requires the model weights in the local HF cache (zero-egress gating).
    """

    def __init__(self, model_name: str = "facebook/hubert-base-ls960", layer_id: int = -1,
                 local_files_only: bool = True):
        import torch
        from transformers import HubertModel

        self.torch = torch
        self.model = HubertModel.from_pretrained(
            model_name, local_files_only=local_files_only
        ).eval()
        self.layer_id = layer_id

    def extract(self, wav: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            out = self.model(
                torch.from_numpy(wav[None, :].astype(np.float32)),
                output_hidden_states=True,
            )
        return out.hidden_states[self.layer_id][0].numpy()


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
    p.add_argument("--layer_id", type=int, default=-1)
    p.add_argument("--codec_checkpoint", default=None)
    p.add_argument("--whisper_model", default=None)
    p.add_argument("--allow_random", action="store_true")
    args = p.parse_args()

    enc_cfg = EncoderConfig()
    params = build_encoder_params(
        enc_cfg, args.codec_checkpoint, args.whisper_model, args.allow_random
    )
    extractor = FeatureExtractor(enc_cfg, params, args.layer_id)
    extract_manifest(args.manifest, args.out_dir, extractor)
    print("done")
