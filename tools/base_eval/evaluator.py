"""Pairwise metric functions with the reference evaluator's API shape.

Reference: ``tools/base_eval/evaluator.py:13-101`` — calculate_pesq_wb_nb and
calculate_stoi over length-matched, [-1,1]-clipped signal pairs.  Thin
wrappers over the native metric implementations (eval/metrics.py).
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from simwhisper_codec_tpu.eval import metrics as M


def _prepare(ref: np.ndarray, deg: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    m = min(len(ref), len(deg))
    return np.clip(ref[:m], -1, 1), np.clip(deg[:m], -1, 1)


def calculate_pesq_wb_nb(
    ref: np.ndarray, deg: np.ndarray, sample_rate: int = 16000
) -> Tuple[Optional[float], Optional[float]]:
    """(PESQ-WB, PESQ-NB); ITU wrapper when installed, else native P.862."""
    ref, deg = _prepare(ref, deg)
    return (
        M.pesq_score(ref, deg, sample_rate, "wb"),
        M.pesq_score(ref, deg, sample_rate, "nb"),
    )


def calculate_stoi(ref: np.ndarray, deg: np.ndarray, sample_rate: int = 16000) -> float:
    ref, deg = _prepare(ref, deg)
    return M.stoi(ref, deg, sample_rate)


def calculate_si_snr(ref: np.ndarray, deg: np.ndarray) -> float:
    ref, deg = _prepare(ref, deg)
    return M.si_snr(ref, deg)


def pair_metrics(ref: np.ndarray, deg: np.ndarray, sample_rate: int = 16000) -> dict:
    """All objective metrics for one (reference, degraded) pair.

    Length-matches and clips the pair, then returns
    stoi/pesq_wb/pesq_nb/si_snr/snr/lsd/mcd (PESQ entries may be None for
    unscorable pairs).  Shared by evaluate_model.py and
    tools/eval_corpus.py's --full-report so the metric set cannot diverge.
    """
    ref, deg = _prepare(ref, deg)
    return {
        "stoi": M.stoi(ref, deg, sample_rate),
        "pesq_wb": M.pesq_score(ref, deg, sample_rate, "wb"),
        "pesq_nb": M.pesq_score(ref, deg, sample_rate, "nb"),
        "si_snr": M.si_snr(ref, deg),
        "snr": M.snr(ref, deg),
        "lsd": M.log_spectral_distance(ref, deg),
        "mcd": M.mel_cepstral_distortion(ref, deg, sample_rate),
    }


def average_metrics(rows: list) -> dict:
    """Mean per metric over per-pair dicts, skipping None/NaN entries."""
    sums, counts = {}, {}
    for row in rows:
        for k, v in row.items():
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            sums[k] = sums.get(k, 0.0) + float(v)
            counts[k] = counts.get(k, 0) + 1
    return {k: sums[k] / counts[k] for k in sums}
