"""Whisper encoder weight initialization.

Reference: ``utils/weight_init.py:11-77`` — copies name-matching tensors from
HF ``WhisperModel.encoder`` into the codec encoder, skipping positional
embeddings, with a local-files-only retry.

Here the HF state dict feeds straight through the checkpoint importer's
encoder converter (the reference's encoder uses Whisper's exact module names),
yielding the channels-last stacked-layer pytree.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from simwhisper_codec_tpu.config import EncoderConfig
from simwhisper_codec_tpu.utils.checkpoint import convert_encoder

logger = logging.getLogger(__name__)


def load_whisper_encoder_params(
    cfg: EncoderConfig,
    whisper_model_name: str = "openai/whisper-small",
    local_files_only: bool = False,
) -> dict:
    """Load HF Whisper encoder weights -> encoder param tree.

    Raises RuntimeError when the model is unavailable (e.g. no network and no
    local cache) — callers should fall back to random init or a checkpoint.
    """
    try:
        from transformers import WhisperModel
    except ImportError as e:
        raise RuntimeError("transformers is required for Whisper init") from e

    try:
        model = WhisperModel.from_pretrained(whisper_model_name, local_files_only=local_files_only)
    except Exception as first_err:
        if not local_files_only:
            logger.warning(
                "Whisper load from %s failed (%s); retrying with local_files_only=True",
                whisper_model_name, first_err,
            )
            try:
                model = WhisperModel.from_pretrained(whisper_model_name, local_files_only=True)
            except Exception as second_err:
                raise RuntimeError(
                    f"Failed to load Whisper model from {whisper_model_name}: {second_err}"
                ) from second_err
        else:
            raise RuntimeError(
                f"Failed to load Whisper model from {whisper_model_name}: {first_err}"
            ) from first_err

    sd = {k: v.detach().cpu().numpy() for k, v in model.encoder.state_dict().items()}
    # embed_positions.weight is the learned-slot sinusoidal table; skipped like
    # the reference (both use recomputed sinusoids; the acoustic config adds none).
    sd.pop("embed_positions.weight", None)
    params = convert_encoder(sd, cfg, prefix="")
    logger.info("Loaded Whisper encoder weights from %s", whisper_model_name)
    return params
