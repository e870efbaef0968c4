"""UTMOS scorer backend (thin shim over the native JAX implementation).

Reference: ``tools/utmos/utmos.py:35-245`` — the UTMOS22-strong model:
wav2vec2-small SSL tower + domain/judge embeddings -> BLSTM -> projection,
per-frame scores averaged and rescaled ``* 2 + 3``.  The reference needs
fairseq + pytorch-lightning to deserialize and run the checkpoint; the
native implementation (``simwhisper_codec_tpu/eval/utmos.py``) runs the
whole model in JAX and only needs ``torch.load`` to read the ``.ckpt``.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.eval.utmos import (  # noqa: F401  (public shim)
    UTMOSConfig,
    UTMOSScorer,
    load_utmos_params,
)
