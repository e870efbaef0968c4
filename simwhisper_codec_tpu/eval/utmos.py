"""UTMOS (UTMOS22-strong) MOS predictor, TPU-native (JAX).

Replaces the reference's vendored fairseq/pytorch-lightning scorer
(``tools/utmos/utmos.py:35-245``):

  wav2vec2-small SSL tower (features_only forward)          -> (B, T, 768)
  + domain embedding (3, 128), domain id 0                  -> broadcast over T
  + judge embedding (3000, 128), judge id 288               -> broadcast over T
  concat (B, T, 1024) -> BLSTM hidden 512 bidirectional     -> (B, T, 1024)
  -> Linear 1024->2048 -> ReLU -> Linear 2048->1            -> (B, T, 1)
  score = mean over T * 2 + 3                               (utmos.py:73)

The SSL tower is ``models/ssl.py`` (parity-tested vs HF torch); the fairseq
weights inside the lightning checkpoint convert through
``utils/ssl_checkpoint.convert_fairseq_wav2vec2``.  The BLSTM is a
``lax.scan`` pair matching torch ``nn.LSTM(bidirectional=True)`` semantics
(gate order i,f,g,o in the packed weight matrices).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.models.ssl import (
    SSLConfig,
    init_ssl_params,
    ssl_forward,
    wav2vec2_base_config,
)

DOMAIN_ID = 0  # utmos.py:67
JUDGE_ID = 288  # utmos.py:68
LSTM_HIDDEN = 512
EMB_DIM = 128
PROJ_HIDDEN = 2048


@dataclasses.dataclass(frozen=True)
class UTMOSConfig:
    ssl: SSLConfig = dataclasses.field(default_factory=wav2vec2_base_config)
    num_domains: int = 3
    num_judges: int = 3000
    lstm_hidden: int = LSTM_HIDDEN
    emb_dim: int = EMB_DIM
    proj_hidden: int = PROJ_HIDDEN


def _lstm_direction(
    p: dict, x: jnp.ndarray, reverse: bool, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """One direction of a torch-semantics LSTM over (B, T, F) -> (B, T, H).

    Packed weights: w_ih (F, 4H), w_hh (H, 4H), gates chunked [i, f, g, o]
    exactly like ``torch.nn.LSTM`` ``weight_ih_l0`` rows.

    ``valid`` (B, T) bool: padded steps hold the carry unchanged, so a
    right-padded batch reproduces exact-length outputs on the valid frames —
    critical for the *backward* direction, which otherwise runs through the
    padding before reaching real frames.
    """
    b = x.shape[0]
    h = p["w_hh"].shape[0]
    bias = p["b_ih"] + p["b_hh"]
    # hoist the input projection out of the scan: one big MXU matmul
    gates_in = x @ p["w_ih"] + bias  # (B, T, 4H)
    xs = (
        jnp.swapaxes(gates_in, 0, 1),
        None if valid is None else jnp.swapaxes(valid, 0, 1),
    )

    def step(carry, inp):
        g_in, ok = inp
        h_prev, c_prev = carry
        gates = g_in + h_prev @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_t = f * c_prev + i * g
        h_t = o * jnp.tanh(c_t)
        if ok is not None:
            keep = ok[:, None]
            h_t = jnp.where(keep, h_t, h_prev)
            c_t = jnp.where(keep, c_t, c_prev)
        return (h_t, c_t), h_t

    init = (jnp.zeros((b, h), x.dtype), jnp.zeros((b, h), x.dtype))
    _, ys = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm(p: dict, x: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch ``nn.LSTM(batch_first=True, bidirectional=True)`` forward."""
    fwd = _lstm_direction(p["fwd"], x, reverse=False, valid=valid)
    bwd = _lstm_direction(p["bwd"], x, reverse=True, valid=valid)
    return jnp.concatenate([fwd, bwd], axis=-1)


def utmos_head(
    params: dict,
    ssl_features: jnp.ndarray,
    domains: jnp.ndarray,
    judge_ids: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SSL features (B, T, D) + ids (B,) -> per-frame scores (B, T)."""
    b, t, _ = ssl_features.shape
    dom = params["domain_emb"][domains][:, None, :]  # (B, 1, 128)
    jud = params["judge_emb"][judge_ids][:, None, :]
    x = jnp.concatenate(
        [
            ssl_features,
            jnp.broadcast_to(dom, (b, t, dom.shape[-1])),
            jnp.broadcast_to(jud, (b, t, jud.shape[-1])),
        ],
        axis=-1,
    )
    x = bilstm(params["lstm"], x, valid)
    x = jax.nn.relu(x @ params["proj1"]["w"] + params["proj1"]["b"])
    x = x @ params["proj2"]["w"] + params["proj2"]["b"]  # (B, T, 1)
    return x[..., 0]


def utmos_forward(
    cfg: UTMOSConfig,
    params: dict,
    wav: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Waveform (B, S) 16 kHz -> MOS scores (B,).

    Matches ``UTMOSScore.score`` (utmos.py:49-73): frame scores are averaged
    over time (over the valid frames when ``lengths`` is given), then
    rescaled ``* 2 + 3``.
    """
    out = ssl_forward(cfg.ssl, params["ssl"], wav, lengths)
    feats = out["x"]
    b = wav.shape[0]
    domains = jnp.full((b,), DOMAIN_ID, jnp.int32)
    judges = jnp.full((b,), JUDGE_ID, jnp.int32)
    if lengths is not None:
        t = feats.shape[1]
        valid = jnp.arange(t)[None, :] < out["frame_lengths"][:, None]
        frame_scores = utmos_head(params, feats, domains, judges, valid)
        vf = valid.astype(jnp.float32)
        mean = jnp.sum(frame_scores * vf, axis=1) / jnp.maximum(vf.sum(axis=1), 1.0)
    else:
        frame_scores = utmos_head(params, feats, domains, judges)
        mean = jnp.mean(frame_scores, axis=1)
    return mean * 2.0 + 3.0


# ---------------------------------------------------------------------------
# Checkpoint conversion (UTMOS lightning ckpt layout, utmos.py:112-131)
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _lstm_dir_from_torch(sd: Dict[str, np.ndarray], prefix: str, suffix: str) -> dict:
    return {
        "w_ih": _np(sd[f"{prefix}.weight_ih_l0{suffix}"]).T,  # (4H, F) -> (F, 4H)
        "w_hh": _np(sd[f"{prefix}.weight_hh_l0{suffix}"]).T,
        "b_ih": _np(sd[f"{prefix}.bias_ih_l0{suffix}"]),
        "b_hh": _np(sd[f"{prefix}.bias_hh_l0{suffix}"]),
    }


def convert_utmos_head(sd: Dict[str, np.ndarray]) -> dict:
    """Head weights (everything but the SSL tower) from the lightning layout.

    Keys (utmos.py:119-131):
      feature_extractors.1.embedding.weight     domain embedding (3, 128)
      output_layers.0.judge_embedding.weight    judge embedding (3000, 128)
      output_layers.0.decoder_rnn.{weight,bias}_{ih,hh}_l0[_reverse]  BLSTM
      output_layers.1.net.{0,3}.{weight,bias}   projection MLP
    """
    rnn = "output_layers.0.decoder_rnn"
    return {
        "domain_emb": _np(sd["feature_extractors.1.embedding.weight"]),
        "judge_emb": _np(sd["output_layers.0.judge_embedding.weight"]),
        "lstm": {
            "fwd": _lstm_dir_from_torch(sd, rnn, ""),
            "bwd": _lstm_dir_from_torch(sd, rnn, "_reverse"),
        },
        "proj1": {
            "w": _np(sd["output_layers.1.net.0.weight"]).T,
            "b": _np(sd["output_layers.1.net.0.bias"]),
        },
        "proj2": {
            "w": _np(sd["output_layers.1.net.3.weight"]).T,
            "b": _np(sd["output_layers.1.net.3.bias"]),
        },
    }


def convert_utmos_checkpoint(sd: Dict[str, np.ndarray], cfg: UTMOSConfig = None) -> dict:
    """Lightning ``state_dict`` of BaselineLightningModule -> param tree.

    The SSL tower lives under ``feature_extractors.0.ssl_model.*`` in fairseq
    wav2vec2 layout (utmos.py:99-109); the head converts separately.
    """
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_fairseq_wav2vec2

    cfg = cfg or UTMOSConfig()
    params = convert_utmos_head(sd)
    params["ssl"] = convert_fairseq_wav2vec2(
        sd, cfg.ssl, prefix="feature_extractors.0.ssl_model."
    )
    return params


def init_utmos_params(key, cfg: UTMOSConfig = None) -> dict:
    """Random init (tests / smoke runs without the published checkpoint)."""
    cfg = cfg or UTMOSConfig()
    keys = jax.random.split(key, 12)
    d = cfg.ssl.d_model
    feat_in = d + 2 * cfg.emb_dim
    h = cfg.lstm_hidden

    def lstm_dir(k):
        k1, k2 = jax.random.split(k)
        s = 1.0 / np.sqrt(h)
        return {
            "w_ih": jax.random.uniform(k1, (feat_in, 4 * h), jnp.float32, -s, s),
            "w_hh": jax.random.uniform(k2, (h, 4 * h), jnp.float32, -s, s),
            "b_ih": jnp.zeros((4 * h,), jnp.float32),
            "b_hh": jnp.zeros((4 * h,), jnp.float32),
        }

    def lin(k, cin, cout):
        return {
            "w": jax.random.normal(k, (cin, cout), jnp.float32) / np.sqrt(cin),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    return {
        "ssl": init_ssl_params(keys[0], cfg.ssl),
        "domain_emb": jax.random.normal(keys[1], (cfg.num_domains, cfg.emb_dim), jnp.float32),
        "judge_emb": jax.random.normal(keys[2], (cfg.num_judges, cfg.emb_dim), jnp.float32),
        "lstm": {"fwd": lstm_dir(keys[3]), "bwd": lstm_dir(keys[4])},
        "proj1": lin(keys[5], 2 * h, cfg.proj_hidden),
        "proj2": lin(keys[6], cfg.proj_hidden, 1),
    }


class UTMOSScorer:
    """Directory-scoring convenience wrapper (tools/utmos CLI backend).

    Loads the published ``utmos22_strong`` lightning checkpoint with a plain
    ``torch.load`` of its ``state_dict`` (no fairseq / pytorch-lightning
    needed) and scores waveforms with the jitted JAX model, bucketing lengths
    to limit recompiles.
    """

    def __init__(self, ckpt_path: str = None, params: dict = None,
                 cfg: UTMOSConfig = None):
        self.cfg = cfg or UTMOSConfig()
        if params is None:
            if ckpt_path is None:
                raise ValueError("need ckpt_path or params")
            params = load_utmos_params(ckpt_path, self.cfg)
        self.params = jax.device_put(params)
        self._fwd = jax.jit(lambda p, w, l: utmos_forward(self.cfg, p, w, l))

    def score(self, wav: np.ndarray, sample_rate: int = 16000) -> float:
        if sample_rate != 16000:
            raise ValueError("UTMOS expects 16 kHz input (resample on load)")
        wav = np.asarray(wav, np.float32).reshape(-1)
        n = len(wav)
        # bucket to the next power-of-two second count: few compiles, padded
        # frames excluded from the mean via lengths
        bucket = 16000
        while bucket < n:
            bucket *= 2
        padded = np.zeros((1, bucket), np.float32)
        padded[0, :n] = wav
        score = self._fwd(self.params, jnp.asarray(padded),
                          jnp.asarray([max(n, 400)], jnp.int32))
        return float(score[0])


def load_utmos_params(ckpt_path: str, cfg: UTMOSConfig = None) -> dict:
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    sd = {k: v.detach().cpu().numpy() for k, v in state.items()
          if hasattr(v, "detach")}
    return convert_utmos_checkpoint(sd, cfg)
