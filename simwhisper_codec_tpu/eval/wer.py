"""WER computation: text normalization, DP edit distance, CTC ASR transcription.

Reference: ``tools/wer/calculate_wer.py`` — HuBERT-large CTC greedy decoding
(:269-374), unicode/tag normalization, DP edit-distance ``Calculator``
(:97-227), aggregate WER for reconstructed and original audio.

The edit-distance and normalization are native; ASR transcription uses HF
``HubertForCTC`` when its weights are available (they require download or a
local cache — gated, like everything model-backed in the eval stack).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

_TAG_RE = re.compile(r"<[^>]+>|\[[^\]]+\]|\{[^}]+\}")
_PUNCT_CATEGORIES = ("P", "S")


def characterize(text: str) -> List[str]:
    """Tokenize: split latin words on whitespace, CJK into characters,
    strip tags/punctuation (calculate_wer.py normalization semantics)."""
    text = _TAG_RE.sub(" ", text)
    tokens: List[str] = []
    word = []

    def flush():
        if word:
            tokens.append("".join(word))
            word.clear()

    for ch in text:
        cat = unicodedata.category(ch)
        if ch.isspace():
            flush()
        elif cat[0] in _PUNCT_CATEGORIES and ch != "'":
            flush()
        elif 0x4E00 <= ord(ch) <= 0x9FFF or 0x3400 <= ord(ch) <= 0x4DBF:
            flush()
            tokens.append(ch)
        else:
            word.append(ch.upper())
    flush()
    return tokens


@dataclass
class EditStats:
    cor: int = 0
    sub: int = 0
    ins: int = 0
    dele: int = 0

    @property
    def errors(self) -> int:
        return self.sub + self.ins + self.dele

    @property
    def ref_words(self) -> int:
        return self.cor + self.sub + self.dele

    @property
    def wer(self) -> float:
        return self.errors / self.ref_words if self.ref_words else 0.0


def edit_distance(ref: List[str], hyp: List[str]) -> EditStats:
    """Levenshtein alignment with sub/ins/del attribution (Calculator parity)."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, cor, sub, ins, del)
    INF = 10**9
    cost = np.zeros((n + 1, m + 1), np.int64)
    op = np.zeros((n + 1, m + 1), np.int8)  # 0 diag-cor, 1 diag-sub, 2 up-del, 3 left-ins
    for i in range(1, n + 1):
        cost[i][0] = i
        op[i][0] = 2
    for j in range(1, m + 1):
        cost[0][j] = j
        op[0][j] = 3
    for i in range(1, n + 1):
        ri = ref[i - 1]
        for j in range(1, m + 1):
            if ri == hyp[j - 1]:
                c_diag, o_diag = cost[i - 1][j - 1], 0
            else:
                c_diag, o_diag = cost[i - 1][j - 1] + 1, 1
            c_del = cost[i - 1][j] + 1
            c_ins = cost[i][j - 1] + 1
            best = min(c_diag, c_del, c_ins)
            cost[i][j] = best
            op[i][j] = o_diag if best == c_diag else (2 if best == c_del else 3)

    stats = EditStats()
    i, j = n, m
    while i > 0 or j > 0:
        o = op[i][j]
        if o == 0:
            stats.cor += 1
            i, j = i - 1, j - 1
        elif o == 1:
            stats.sub += 1
            i, j = i - 1, j - 1
        elif o == 2:
            stats.dele += 1
            i -= 1
        else:
            stats.ins += 1
            j -= 1
    return stats


class Calculator:
    """Aggregate WER over utterances (tools/wer/calculate_wer.py:97-227 API)."""

    def __init__(self):
        self.total = EditStats()
        self.per_utt: Dict[str, EditStats] = {}

    def calculate(self, utt_id: str, ref_text: str, hyp_text: str) -> EditStats:
        s = edit_distance(characterize(ref_text), characterize(hyp_text))
        self.per_utt[utt_id] = s
        self.total.cor += s.cor
        self.total.sub += s.sub
        self.total.ins += s.ins
        self.total.dele += s.dele
        return s

    @property
    def wer(self) -> float:
        return self.total.wer

    def report(self) -> str:
        t = self.total
        return (
            f"utterances={len(self.per_utt)} WER={100*t.wer:.2f}% "
            f"(cor={t.cor} sub={t.sub} del={t.dele} ins={t.ins})"
        )


# ---------------------------------------------------------------------------
# ASR transcription (model-backed; gated on weight availability)
# ---------------------------------------------------------------------------


def have_asr(model_name: str = "facebook/hubert-large-ls960-ft") -> bool:
    try:
        from transformers import HubertForCTC  # noqa: F401
    except ImportError:
        return False
    try:
        from transformers import AutoConfig

        AutoConfig.from_pretrained(model_name, local_files_only=True)
        return True
    except Exception:
        return False


class CTCTranscriber:
    """Greedy CTC decoding with HubertForCTC (calculate_wer.py:269-374)."""

    def __init__(self, model_name: str = "facebook/hubert-large-ls960-ft", device: str = "cpu"):
        import torch
        from transformers import HubertForCTC, Wav2Vec2Processor

        self.torch = torch
        self.processor = Wav2Vec2Processor.from_pretrained(model_name)
        self.model = HubertForCTC.from_pretrained(model_name).to(device).eval()
        self.device = device

    def transcribe(self, wav: np.ndarray, sample_rate: int = 16000) -> str:
        torch = self.torch
        inputs = self.processor(wav, sampling_rate=sample_rate, return_tensors="pt")
        with torch.no_grad():
            logits = self.model(inputs.input_values.to(self.device)).logits
        ids = torch.argmax(logits, dim=-1)
        return self.processor.batch_decode(ids)[0]
