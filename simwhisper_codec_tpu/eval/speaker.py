"""ECAPA-TDNN speaker embedder over WavLM-large features, TPU-native (JAX).

Reference: ``tools/speaker/utils/ecapa_tdnn.py:163-307`` — ``ECAPA_TDNN_SMALL
(feat_dim=1024, feat_type='wavlm_large')`` (``extract_spk_emb.py:14-18``),
the scorer behind the published 0.83 SIM.  Structure (the lawlict/UniSpeech
variant — NOT SpeechBrain's):

  features -> InstanceNorm (no affine)
  layer1: Conv1d k5 pad2 -> ReLU -> BN
  layer2..4: SE-Res2Block(512, k3, dil 2/3/4, scale 8):
      1x1 Conv-ReLU-BN -> Res2 (7 convs, each conv->ReLU->BN, LAST split
      passes through unchanged) -> 1x1 Conv-ReLU-BN -> SE -> + residual
  cat(out2,out3,out4) (1536) -> 1x1 conv -> ReLU
  AttentiveStatsPool (tanh(lin1) -> softmax(lin2), NO global context)
  BN -> Linear -> 256-d embedding

Feature frontends (``ecapa_tdnn.py:253-277``):
  * ``wavlm_large``: all 25 hidden states of WavLM-large (``models/ssl.py``),
    softmax-weighted sum (learned ``feature_weight``), +1e-6, InstanceNorm.
  * ``fbank``: torchaudio-style MelSpectrogram (n_fft 512, win 400, hop 160,
    HTK mel, no norm, power 2) +1e-6, natural log, InstanceNorm.

Weights convert from the published ``wavlm_large_finetune.pth`` via
``convert_ecapa_state_dict`` (+ ``utils/ssl_checkpoint.convert_msft_wavlm``
for the tower); parity is tested against the reference torch module with
random weights in ``tests/test_speaker.py``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.models.ssl import SSLConfig, ssl_forward, wavlm_large_config
from simwhisper_codec_tpu.ops.conv import conv1d

EMB_DIM = 256  # ECAPA_TDNN_SMALL default (ecapa_tdnn.py:295)
CHANNELS = 512
SCALE = 8
CAT_CHANNELS = 1536  # self.channels[-1] (ecapa_tdnn.py:227)


def _valid_mask(x: jnp.ndarray, frame_lengths: Optional[jnp.ndarray]):
    """(B, T, 1) float validity mask, or None."""
    if frame_lengths is None:
        return None
    t = x.shape[1]
    return (jnp.arange(t)[None, :] < frame_lengths[:, None])[..., None].astype(x.dtype)


def instance_norm(
    x: jnp.ndarray, eps: float = 1e-5,
    frame_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """torch ``nn.InstanceNorm1d`` (affine=False): per-channel norm over time.

    x: (B, T, C).  Note torch uses biased variance and eps inside the sqrt.
    With ``frame_lengths``, statistics cover valid frames only and pad frames
    are zeroed, so a right-padded batch reproduces exact-length runs — the
    reference always scores unpadded utterances (extract_spk_emb.py:72-77),
    and per-utterance shapes would recompile WavLM-large for every length.
    """
    valid = _valid_mask(x, frame_lengths)
    if valid is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
    else:
        x = x * valid
        cnt = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(x - mean) * valid, axis=1, keepdims=True) / cnt
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * valid if valid is not None else y


def _bn(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batch norm over trailing channel dim with stored stats."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def _conv_relu_bn(p: dict, x: jnp.ndarray, dilation: int = 1,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Conv1dReluBn (ecapa_tdnn.py:57-64): bn(relu(conv(x))), 'same' padding.

    Pad frames are re-zeroed (the BN shift leaks bias into them); with
    exactly-zero pads, same-padded convs at valid frames see the identical
    zero neighborhood an exact-length run's edge padding provides.
    """
    k = p["conv"]["w"].shape[0]
    pad = (k - 1) * dilation // 2
    h = conv1d(x, p["conv"]["w"], p["conv"]["b"], dilation=dilation, padding=pad)
    y = _bn(p["bn"], jax.nn.relu(h))
    return y * valid if valid is not None else y


def _res2_conv_relu_bn(p: dict, x: jnp.ndarray, dilation: int,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Res2Conv1dReluBn (ecapa_tdnn.py:14-50): scale-1 chained convs, each
    conv -> relu -> bn; the LAST split passes through unchanged."""
    parts = jnp.split(x, SCALE, axis=-1)
    outs = []
    sp = None
    for i in range(SCALE - 1):
        sp = parts[i] if i == 0 else sp + parts[i]
        k = p["convs"][i]["w"].shape[0]
        pad = (k - 1) * dilation // 2
        sp = conv1d(sp, p["convs"][i]["w"], p["convs"][i]["b"],
                    dilation=dilation, padding=pad)
        sp = _bn(p["bns"][i], jax.nn.relu(sp))
        if valid is not None:
            sp = sp * valid
        outs.append(sp)
    outs.append(parts[SCALE - 1])
    return jnp.concatenate(outs, axis=-1)


def _se(p: dict, x: jnp.ndarray, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SE_Connect (ecapa_tdnn.py:71-83); the squeeze mean masks pad frames."""
    if valid is None:
        s = jnp.mean(x, axis=1)  # (B, C)
    else:
        s = jnp.sum(x * valid, axis=1) / jnp.maximum(jnp.sum(valid, axis=1), 1.0)
    s = jax.nn.relu(s @ p["fc1"]["w"] + p["fc1"]["b"])
    s = jax.nn.sigmoid(s @ p["fc2"]["w"] + p["fc2"]["b"])
    return x * s[:, None, :]


def _se_res2_block(p: dict, x: jnp.ndarray, dilation: int,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SE_Res2Block (ecapa_tdnn.py:99-125); in==out channels => identity shortcut."""
    residual = x
    h = _conv_relu_bn(p["in"], x, valid=valid)
    h = _res2_conv_relu_bn(p["res2"], h, dilation, valid=valid)
    h = _conv_relu_bn(p["out"], h, valid=valid)
    h = _se(p["se"], h, valid=valid)
    return h + residual


def _attentive_stats(p: dict, x: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """AttentiveStatsPool, global_context_att=False (ecapa_tdnn.py:132-160)."""
    a = jnp.tanh(conv1d(x, p["att1"]["w"], p["att1"]["b"]))
    a = conv1d(a, p["att2"]["w"], p["att2"]["b"])
    if valid is not None:
        a = jnp.where(valid > 0, a, jnp.finfo(a.dtype).min)
    a = jax.nn.softmax(a, axis=1)
    mean = jnp.sum(a * x, axis=1)
    residuals = jnp.sum(a * x * x, axis=1) - mean * mean
    std = jnp.sqrt(jnp.clip(residuals, min=1e-9))
    return jnp.concatenate([mean, std], axis=-1)


def ecapa_forward(p: dict, feats: jnp.ndarray,
                  frame_lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Instance-normed features (B, T, F) -> embeddings (B, emb_dim).

    Mirrors ``ECAPA_TDNN.forward`` (ecapa_tdnn.py:279-292) minus get_feat.
    With ``frame_lengths``, a right-padded batch reproduces exact-length runs
    (masked statistics + zero pads), so arbitrary corpora run through a
    handful of compiled length buckets instead of one compile per length.
    """
    valid = _valid_mask(feats, frame_lengths)
    out1 = _conv_relu_bn(p["layer1"], feats, valid=valid)
    out2 = _se_res2_block(p["layer2"], out1, 2, valid=valid)
    out3 = _se_res2_block(p["layer3"], out2, 3, valid=valid)
    out4 = _se_res2_block(p["layer4"], out3, 4, valid=valid)
    cat = jnp.concatenate([out2, out3, out4], axis=-1)
    h = jax.nn.relu(conv1d(cat, p["mfa"]["w"], p["mfa"]["b"]))
    if valid is not None:
        h = h * valid
    pooled = _attentive_stats(p["pool"], h, valid=valid)
    pooled = _bn(p["bn"], pooled)
    return pooled @ p["fc"]["w"] + p["fc"]["b"]


# ---------------------------------------------------------------------------
# Feature frontends
# ---------------------------------------------------------------------------


def wavlm_weighted_features(
    ssl_cfg: SSLConfig,
    ssl_params: dict,
    feature_weight: jnp.ndarray,
    wav: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
):
    """WavLM hidden states -> softmax-weighted sum -> InstanceNorm.

    ``ECAPA_TDNN.get_feat`` for SSL upstreams (ecapa_tdnn.py:266-277).
    Returns (features, frame_lengths or None); with ``lengths``, valid frames
    equal an exact-length run (masked SSL + masked instance norm).
    """
    out = ssl_forward(ssl_cfg, ssl_params, wav, lengths)
    hs = out["hidden_states"]  # (L+1, B, T, D)
    w = jax.nn.softmax(feature_weight)
    x = jnp.einsum("l,lbtd->btd", w, hs) + 1e-6
    frame_lengths = out.get("frame_lengths")
    return instance_norm(x, frame_lengths=frame_lengths), frame_lengths


def _htk_mel_filter_bank(n_freqs: int, n_mels: int, sample_rate: int,
                         f_min: float, f_max: float) -> np.ndarray:
    """torchaudio ``melscale_fbanks`` (mel_scale='htk', norm=None): (F, M)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (F, M+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


class FbankFrontend:
    """torchaudio-style log-MelSpectrogram (the reference 'fbank' option,
    ecapa_tdnn.py:179-182,258-264): n_fft 512, win 400 (hann periodic,
    centered in the FFT window), hop 160, HTK mel, power 2, center/reflect."""

    N_FFT = 512
    WIN = 400
    HOP = 160

    def __init__(self, feat_dim: int = 80, sample_rate: int = 16000):
        window = np.hanning(self.WIN + 1)[:-1].astype(np.float32)  # periodic
        lpad = (self.N_FFT - self.WIN) // 2
        self.window = np.pad(window, (lpad, self.N_FFT - self.WIN - lpad))
        self.mel_fb = _htk_mel_filter_bank(
            self.N_FFT // 2 + 1, feat_dim, sample_rate, 0.0, sample_rate / 2
        )

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> instance-normed log-mel (B, T, M)."""
        half = self.N_FFT // 2
        x = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
        n_frames = 1 + wav.shape[1] // self.HOP
        idx = np.arange(n_frames)[:, None] * self.HOP + np.arange(self.N_FFT)[None, :]
        frames = x[:, idx] * jnp.asarray(self.window)
        spec = jnp.fft.rfft(frames, axis=-1)
        power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
        mel = power @ jnp.asarray(self.mel_fb)
        return instance_norm(jnp.log(mel + 1e-6))


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------


def _init_conv(key, k, cin, cout):
    bound = 1.0 / math.sqrt(cin * k)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (k, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _init_bn(c):
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _init_crb(key, k, cin, cout):
    return {"conv": _init_conv(key, k, cin, cout), "bn": _init_bn(cout)}


def _init_linear(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
    }


def _init_se_res2(key, c):
    keys = jax.random.split(key, SCALE + 4)
    width = c // SCALE
    return {
        "in": _init_crb(keys[SCALE], 1, c, c),
        "res2": {
            "convs": [_init_conv(keys[i], 3, width, width) for i in range(SCALE - 1)],
            "bns": [_init_bn(width) for _ in range(SCALE - 1)],
        },
        "out": _init_crb(keys[SCALE + 1], 1, c, c),
        "se": {
            "fc1": _init_linear(keys[SCALE + 2], c, 128),
            "fc2": _init_linear(keys[SCALE + 3], 128, c),
        },
    }


def init_ecapa(key, feat_dim: int = 1024, emb_dim: int = EMB_DIM) -> dict:
    keys = jax.random.split(key, 8)
    c = CHANNELS
    cat = CAT_CHANNELS
    return {
        "layer1": _init_crb(keys[0], 5, feat_dim, c),
        "layer2": _init_se_res2(keys[1], c),
        "layer3": _init_se_res2(keys[2], c),
        "layer4": _init_se_res2(keys[3], c),
        "mfa": _init_conv(keys[4], 1, 3 * c, cat),
        "pool": {
            "att1": _init_conv(keys[5], 1, cat, 128),
            "att2": _init_conv(keys[6], 1, 128, cat),
        },
        "bn": _init_bn(2 * cat),
        "fc": _init_linear(keys[7], 2 * cat, emb_dim),
    }


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _cv_conv(sd, prefix) -> dict:
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)  # (Cout,Cin,K)->(K,Cin,Cout)
    out = {"w": w}
    out["b"] = _np(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return out


def _cv_bn(sd, prefix) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }


def _cv_lin(sd, prefix) -> dict:
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def convert_ecapa_state_dict(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """torch ``ECAPA_TDNN`` state dict (ecapa_tdnn.py:163-239) -> param tree.

    The WavLM tower (``feature_extract.*``) and ``feature_weight`` convert
    separately (``ssl_checkpoint.convert_msft_wavlm``).
    """

    def key(name):
        return f"{prefix}{name}"

    def crb(name):
        return {"conv": _cv_conv(sd, key(f"{name}.conv")), "bn": _cv_bn(sd, key(f"{name}.bn"))}

    def se_res2(name):
        return {
            "in": crb(f"{name}.Conv1dReluBn1"),
            "res2": {
                "convs": [
                    _cv_conv(sd, key(f"{name}.Res2Conv1dReluBn.convs.{i}"))
                    for i in range(SCALE - 1)
                ],
                "bns": [
                    _cv_bn(sd, key(f"{name}.Res2Conv1dReluBn.bns.{i}"))
                    for i in range(SCALE - 1)
                ],
            },
            "out": crb(f"{name}.Conv1dReluBn2"),
            "se": {
                "fc1": _cv_lin(sd, key(f"{name}.SE_Connect.linear1")),
                "fc2": _cv_lin(sd, key(f"{name}.SE_Connect.linear2")),
            },
        }

    return {
        "layer1": crb("layer1"),
        "layer2": se_res2("layer2"),
        "layer3": se_res2("layer3"),
        "layer4": se_res2("layer4"),
        "mfa": _cv_conv(sd, key("conv")),
        "pool": {
            "att1": _cv_conv(sd, key("pooling.linear1")),
            "att2": _cv_conv(sd, key("pooling.linear2")),
        },
        "bn": _cv_bn(sd, key("bn")),
        "fc": _cv_lin(sd, key("linear")),
    }


def load_wavlm_ecapa_checkpoint(ckpt_path: str):
    """Published ``wavlm_large_finetune.pth`` -> (ecapa params, wavlm params,
    feature_weight).  Keys: ECAPA at top level, the WavLM tower under
    ``feature_extract.model.`` in microsoft/UniSpeech layout."""
    import torch

    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_msft_wavlm

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = raw.get("model", raw.get("state_dict", raw))
    sd = {k: v.detach().cpu().numpy() for k, v in state.items() if hasattr(v, "detach")}
    ecapa = convert_ecapa_state_dict(sd)
    wavlm = convert_msft_wavlm(sd, wavlm_large_config(), prefix="feature_extract.model.")
    feature_weight = _np(sd["feature_weight"])
    return ecapa, wavlm, feature_weight


class SpeakerEmbedder:
    """Reference-matching speaker embedder: WavLM-large (or fbank) -> ECAPA.

    ``embed(wav, sr)`` mirrors ``extract_spk_emb.py``'s per-utterance flow.
    Lengths are bucketed (powers of two of one second) so arbitrary corpora
    compile a handful of programs.
    """

    def __init__(self, ecapa_params: dict = None, feat_type: str = "fbank",
                 wavlm_params: dict = None, feature_weight=None,
                 ssl_cfg: SSLConfig = None, seed: int = 0):
        self.feat_type = feat_type
        if feat_type == "wavlm_large":
            self.ssl_cfg = ssl_cfg or wavlm_large_config()
            if wavlm_params is None:
                from simwhisper_codec_tpu.models.ssl import init_ssl_params

                wavlm_params = init_ssl_params(jax.random.PRNGKey(seed + 1), self.ssl_cfg)
            self.wavlm_params = jax.device_put(wavlm_params)
            self.feature_weight = (
                jnp.zeros((self.ssl_cfg.num_layers + 1,), jnp.float32)
                if feature_weight is None else jnp.asarray(feature_weight)
            )
            feat_dim = self.ssl_cfg.d_model
        elif feat_type == "fbank":
            self.frontend = FbankFrontend(80)
            feat_dim = 80
        else:
            raise ValueError(f"unsupported feat_type: {feat_type}")
        self.params = jax.device_put(
            ecapa_params if ecapa_params is not None
            else init_ecapa(jax.random.PRNGKey(seed), feat_dim)
        )
        # params travel as jit ARGUMENTS, never closure constants: a captured
        # WavLM-large tree would inline ~1.3 GB of literals into the HLO
        # (minutes to trace, un-compilable through the axon tunnel's payload
        # cap — docs/TPU_NOTES.md quirk #4)
        if feat_type == "wavlm_large":
            self._fwd = jax.jit(self._forward_wavlm)
        else:
            self._fwd = jax.jit(self._forward_fbank)

    @classmethod
    def from_checkpoint(cls, ckpt_path: str) -> "SpeakerEmbedder":
        ecapa, wavlm, fw = load_wavlm_ecapa_checkpoint(ckpt_path)
        return cls(ecapa, feat_type="wavlm_large", wavlm_params=wavlm,
                   feature_weight=fw)

    def _forward_wavlm(self, ecapa_params: dict, wavlm_params: dict,
                       feature_weight: jnp.ndarray, wav: jnp.ndarray,
                       lengths: jnp.ndarray) -> jnp.ndarray:
        feats, frame_lengths = wavlm_weighted_features(
            self.ssl_cfg, wavlm_params, feature_weight, wav, lengths
        )
        return ecapa_forward(ecapa_params, feats, frame_lengths)

    def _forward_fbank(self, ecapa_params: dict, wav: jnp.ndarray) -> jnp.ndarray:
        return ecapa_forward(ecapa_params, self.frontend(wav))

    def embed(self, wav: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        if sample_rate != 16000:
            raise ValueError("resample to 16 kHz on load (audio_io.load_audio)")
        wav = np.asarray(wav, np.float32).reshape(-1)
        n = max(len(wav), 800)
        if self.feat_type == "wavlm_large":
            # masked exact-length semantics: pad to geometric 1 s buckets so a
            # whole corpus compiles a handful of WavLM-large programs
            bucket = 16000
            while bucket < n:
                bucket *= 2
            padded = np.zeros((1, bucket), np.float32)
            padded[0, : len(wav)] = wav
            out = self._fwd(self.params, self.wavlm_params, self.feature_weight,
                            jnp.asarray(padded), jnp.asarray([n], jnp.int32))
            return np.asarray(out)[0]
        # fbank: reflect-centered STFT makes tail frames depend on the true
        # signal end — run at (hop-truncated) exact length, unmasked; the
        # model is tiny so per-length compiles are cheap.  Truncation (not
        # round-up padding) matches torchaudio's 1+floor(len/hop) frame count,
        # so no near-zero tail frame enters the instance-norm/pooling stats.
        hop = 160
        n = n // hop * hop
        padded = np.zeros((1, n), np.float32)
        padded[0, :] = wav[:n] if len(wav) >= n else np.pad(wav, (0, n - len(wav)))
        out = self._fwd(self.params, jnp.asarray(padded))
        return np.asarray(out)[0]
