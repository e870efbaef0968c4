"""WER computation: text normalization, DP edit distance, CTC ASR transcription.

Reference: ``tools/wer/calculate_wer.py`` — HuBERT-large CTC greedy decoding
(:269-374), unicode/tag normalization, DP edit-distance ``Calculator``
(:97-227), aggregate WER for reconstructed and original audio.

Everything is native: edit distance, normalization, and the ASR itself — the
HuBERT-large tower runs on ``models/ssl.py`` with a CTC head and greedy
decode in JAX.  Only the cached HF weight files are needed (zero-egress gate,
same as the reference's download requirement).
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

# Exact behavioral parity with the reference text pipeline
# (tools/wer/calculate_wer.py:22-96): the published WER numbers were produced
# by these precise tokenization quirks, so the rebuild reproduces them
# faithfully (verified by the fuzz A/B in tests/test_wer_parity.py):
#   - the punctuation list is skipped only when a punct char *starts* a token;
#     a trailing "world!" keeps its '!' attached,
#   - category-Lo chars (CJK etc.) are emitted one char per token,
#   - a '<' opens a tag token grouped until '>' (inclusive); tags are later
#     removed by ``stripoff_tags`` inside ``normalize``,
#   - any char with ord >= 128 breaks a latin run.
_PUNCTS = frozenset("!,?、。！，；？：「」︰『』《》")
_SPACES = frozenset(" \t\r\n")


def characterize(text: str) -> List[str]:
    """Tokenize raw text (reference ``characterize``, calculate_wer.py:30-58)."""
    tokens: List[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in _PUNCTS:
            i += 1
            continue
        cat = unicodedata.category(ch)
        if cat in ("Zs", "Cn") or ch in _SPACES:
            i += 1
            continue
        if cat == "Lo":
            tokens.append(ch)
            i += 1
            continue
        sep = ">" if ch == "<" else " "
        j = i + 1
        while j < n:
            c = text[j]
            if ord(c) >= 128 or c in _SPACES or c == sep:
                break
            j += 1
        if j < n and text[j] == ">":
            j += 1
        tokens.append(text[i:j])
        i = j
    return tokens


def stripoff_tags(token: str) -> str:
    """Drop ``<...>`` spans, unclosed tails included (calculate_wer.py:61-75)."""
    out: List[str] = []
    i, n = 0, len(token)
    while i < n:
        if token[i] == "<":
            while i < n and token[i] != ">":
                i += 1
            i += 1
        else:
            out.append(token[i])
            i += 1
    return "".join(out)


def normalize(tokens: List[str], ignore_words=(), case_sensitive: bool = False,
              split: Dict[str, List[str]] = None, remove_tag: bool = True) -> List[str]:
    """Uppercase -> drop ignores -> strip tags -> expand splits
    (reference ``normalize``, calculate_wer.py:78-96)."""
    out: List[str] = []
    for tok in tokens:
        if not case_sensitive:
            tok = tok.upper()
        if tok in ignore_words:
            continue
        if remove_tag:
            tok = stripoff_tags(tok)
        if not tok:
            continue
        if split and tok in split:
            out.extend(split[tok])
        else:
            out.append(tok)
    return out


def normalize_text(text: str) -> List[str]:
    """The full reference pipeline: ``normalize(characterize(text), [], False)``."""
    return normalize(characterize(text))


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
            # reference tie-break (calculate_wer.py:146-170): del first, then
            # ins, then diag — each replacing only on strictly smaller cost.
            # Attribution (not total distance) depends on this order.
            best, o = c_del, 2
            if c_ins < best:
                best, o = c_ins, 3
            if c_diag < best:
                best, o = c_diag, o_diag
            cost[i][j] = best
            op[i][j] = o

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

    def calculate(self, utt_id: str, lab_text: str, rec_text: str) -> EditStats:
        """Normalize both texts and accumulate alignment stats.

        Argument order mirrors the reference harness, which passes the ASR
        *transcription* as ``lab`` and the ground-truth text as ``rec``
        (calculate_wer.py:339-343) — so the aggregate WER denominator is the
        transcription token count, exactly as published.
        """
        s = edit_distance(normalize_text(lab_text), normalize_text(rec_text))
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


def ctc_logits(cfg, params: dict, wav, lengths):
    """Waveform (B, S) -> CTC logits (B, T, V) + frame_lengths (B,).

    The SSL tower is ``models/ssl.py`` (parity-tested vs HF torch); the CTC
    head is the reference ASR's ``lm_head`` linear.  Replaces the torch
    ``HubertForCTC`` forward of ``calculate_wer.py:269-374`` with a jitted
    JAX program (params as arguments, never closure constants).
    """
    import jax.numpy as jnp

    from simwhisper_codec_tpu.models.ssl import ssl_forward

    out = ssl_forward(cfg, params["ssl"], wav, lengths)
    logits = out["x"] @ params["lm_head"]["w"] + params["lm_head"]["b"]
    frame_lengths = out.get("frame_lengths")
    if frame_lengths is None:  # unmasked run: every frame is valid
        frame_lengths = jnp.full((wav.shape[0],), logits.shape[1], jnp.int32)
    return logits, frame_lengths


def greedy_ctc_decode(ids: np.ndarray, vocab: Dict[int, str],
                      blank_id: int = 0, word_delimiter: str = "|") -> str:
    """Collapse repeats -> drop the blank -> map ids -> join.

    Matches the reference's default ``Wav2Vec2CTCTokenizer.decode``: collapse
    THEN remove blank; other special tokens are kept verbatim (the WER
    normalization later strips ``<...>`` spans *inside* tokens, so a special
    glued between letters must stay glued — ``CA<s>A`` normalizes to ``CAA``,
    not ``CA A``); the word delimiter becomes a space.
    """
    ids = np.asarray(ids).reshape(-1)
    collapsed = [int(i) for i, prev in zip(ids, np.concatenate([[-1], ids[:-1]]))
                 if i != prev]
    toks = [vocab[i] for i in collapsed if i != blank_id and i in vocab]
    return "".join(toks).replace(word_delimiter, " ").strip()


def load_hf_ctc_params(model_name: str = "facebook/hubert-large-ls960-ft",
                       cfg=None, local_files_only: bool = True):
    """HF HubertForCTC cache -> (param tree, id->token vocab, do_normalize).

    torch is used only to read the weight file; the forward runs in JAX.
    """
    from transformers import AutoFeatureExtractor, AutoTokenizer, HubertForCTC

    from simwhisper_codec_tpu.models.ssl import SSLConfig
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_hf_ssl

    hf = HubertForCTC.from_pretrained(model_name, local_files_only=local_files_only)
    hc = hf.config
    cfg = cfg or SSLConfig(
        d_model=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        num_heads=hc.num_attention_heads,
        ffn_dim=hc.intermediate_size,
        pre_ln=hc.do_stable_layer_norm,
        conv_dims=tuple(hc.conv_dim),
        conv_kernels=tuple(hc.conv_kernel),
        conv_strides=tuple(hc.conv_stride),
        conv_bias=hc.conv_bias,
        extract_norm=hc.feat_extract_norm,
        conv_pos_kernel=hc.num_conv_pos_embeddings,
        conv_pos_groups=hc.num_conv_pos_embedding_groups,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = {
        "ssl": convert_hf_ssl(sd, cfg, prefix="hubert."),
        "lm_head": {"w": sd["lm_head.weight"].T, "b": sd["lm_head.bias"]},
    }
    tok = AutoTokenizer.from_pretrained(model_name, local_files_only=local_files_only)
    vocab = {i: t for t, i in tok.get_vocab().items()}
    fe = AutoFeatureExtractor.from_pretrained(model_name, local_files_only=local_files_only)
    return params, vocab, bool(getattr(fe, "do_normalize", True)), cfg


class CTCTranscriber:
    """Greedy CTC ASR, native JAX (calculate_wer.py:269-374 semantics).

    Only the cached HF weight/tokenizer files are read (zero-egress gate);
    lengths pad to geometric power-of-two-second buckets (16000*2^k samples)
    so a corpus compiles a handful of programs.
    """

    def __init__(self, model_name: str = "facebook/hubert-large-ls960-ft",
                 device: str = None, params: dict = None, cfg=None,
                 vocab: Dict[int, str] = None, do_normalize: bool = True):
        import jax

        from simwhisper_codec_tpu.models.ssl import hubert_large_ft_config

        del device  # JAX picks the backend; kept for CLI-signature parity
        self.cfg = cfg
        if params is None:
            params, vocab, do_normalize, self.cfg = load_hf_ctc_params(
                model_name, cfg
            )
        elif self.cfg is None:
            self.cfg = hubert_large_ft_config()
        self.params = jax.device_put(params)
        self.vocab = vocab or {}
        self.do_normalize = do_normalize
        from functools import partial

        self._fwd = jax.jit(partial(ctc_logits, self.cfg))

    def transcribe(self, wav: np.ndarray, sample_rate: int = 16000) -> str:
        import jax.numpy as jnp

        if sample_rate != 16000:
            raise ValueError("resample to 16 kHz on load (audio_io.load_audio)")
        wav = np.asarray(wav, np.float32).reshape(-1)
        if self.do_normalize:  # Wav2Vec2FeatureExtractor zero-mean unit-var
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        n = max(len(wav), 800)
        # geometric 1 s buckets: a whole corpus compiles a handful of
        # programs (TPU compiles are ~tens of seconds each through the
        # tunnel; linear 0.25 s buckets would mean one per distinct length)
        padded_len = 16000
        while padded_len < n:
            padded_len *= 2
        padded = np.zeros((1, padded_len), np.float32)
        padded[0, : len(wav)] = wav
        logits, frame_lengths = self._fwd(self.params, jnp.asarray(padded),
                                          jnp.asarray([n], jnp.int32))
        t = int(frame_lengths[0])
        ids = np.argmax(np.asarray(logits)[0, :t], axis=-1)
        return greedy_ctc_decode(ids, self.vocab)
