"""SimWhisper-Codec TPU: a TPU-native (JAX/XLA/Pallas) neural speech codec framework.

A from-scratch rebuild of the capabilities of ZhangXinWhut/SimWhisper-Codec
("Speaking Clearly: A Simplified Whisper-Based Codec for Low-Bitrate Speech
Coding", arXiv:2510.20504) designed TPU-first:

- the full pipeline (log-mel frontend, Whisper-style encoder, frame-stack
  down/upsampling, GroupFSQ quantizer, transformer decoder, Vocos vocoder with
  ISTFT head) lives inside a single fixed-shape jitted program;
- data-parallel corpus evaluation shards batches over a `jax.sharding.Mesh`;
- the checkpoint importer consumes the reference's PyTorch `SimWhisperCodec.pt`
  state dict (weight-norm folding, layout transposition) for bit-exact code
  index parity.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

from simwhisper_codec_tpu.config import CodecConfig, load_config  # noqa: F401


def load_codec(config_path: str, ckpt_path: str, **kwargs):
    """Convenience: build an AudioCodec from a config + checkpoint pair."""
    from simwhisper_codec_tpu.models.codec import AudioCodec

    return AudioCodec.load_from_checkpoint(config_path, ckpt_path, **kwargs)
