"""Self-supervised speech towers (wav2vec 2.0 / HuBERT / WavLM) in JAX.

The reference evaluation toolchain leans on three SSL encoders it never
implements itself:

 - UTMOS scores with a fairseq **wav2vec2-small** tower
   (``/root/reference/tools/utmos/utmos.py:102-152``),
 - speaker SIM embeds with **WavLM-large** features through s3prl
   (``/root/reference/tools/speaker/utils/ecapa_tdnn.py:163-307``),
 - the HiFi-GAN ablation extracts **HuBERT-base** layer features
   (``/root/reference/hifigan_experiments/hifigan_continue_hubert/continuous_hubert_ssl.py:19-132``).

All three share one architecture family: a strided conv feature encoder, a
feature projection, a conv positional embedding, and a transformer stack —
differing only in norm placement (post-LN base vs pre-LN large), conv-stack
normalization, and WavLM's gated relative position bias.  This module
implements that family once, TPU-style: channels-last convs, `lax.scan` over
stacked layers, fixed shapes, no data-dependent control flow.  Weight
converters from HF / fairseq state dicts live in
``utils/ssl_checkpoint.py``; parity is tested against HF torch models with
random weights (no downloads needed).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.ops.conv import conv1d


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    pre_ln: bool = False  # HF do_stable_layer_norm (True for *-large)
    conv_dims: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    extract_norm: str = "group"  # "group": GroupNorm on layer 0; "layer": LN every layer
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    rel_pos_bias: bool = False  # WavLM gated relative position bias
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5


def wav2vec2_base_config() -> SSLConfig:
    """fairseq wav2vec2-small == HF facebook/wav2vec2-base-960h encoder shape."""
    return SSLConfig()


def hubert_base_config() -> SSLConfig:
    """HF facebook/hubert-base-ls960."""
    return SSLConfig()


def hubert_large_ft_config() -> SSLConfig:
    """HF facebook/hubert-large-ls960-ft (the reference's WER ASR model,
    ``tools/wer/calculate_wer.py:269-374``)."""
    return SSLConfig(
        d_model=1024,
        num_layers=24,
        num_heads=16,
        ffn_dim=4096,
        pre_ln=True,
        conv_bias=True,
        extract_norm="layer",
    )


def wavlm_large_config() -> SSLConfig:
    """HF microsoft/wavlm-large (s3prl 'wavlm_large' upstream)."""
    return SSLConfig(
        d_model=1024,
        num_layers=24,
        num_heads=16,
        ffn_dim=4096,
        pre_ln=True,
        conv_bias=True,
        extract_norm="layer",
        rel_pos_bias=True,
    )


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact erf GELU (HF "gelu")
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(np.float32)))


def _layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def feat_extract_output_length(cfg: SSLConfig, n_samples) -> jnp.ndarray:
    """Samples -> feature frames through the conv stack (HF semantics)."""
    length = n_samples
    for k, s in zip(cfg.conv_kernels, cfg.conv_strides):
        length = (length - k) // s + 1
    return length


def conv_feature_extractor(
    cfg: SSLConfig, params: dict, wav: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, S) float32 -> (B, T, conv_dims[-1]) features.

    With ``lengths``, valid frames reproduce an exact-length (unpadded) run
    bit-for-bit in structure: the GroupNorm statistics are computed over valid
    frames only and pad frames are re-zeroed after each layer.  (The HF
    frame-length formula guarantees a valid output frame's receptive field
    never crosses into padding, so masking the *stats* is the only leak.)
    The reference toolchain always runs unpadded utterances
    (tools/utmos/utmos.py:49-63, continuous_hubert_ssl.py:19-132); this is
    what makes right-padded batches equivalent to those runs.
    """
    x = wav[:, :, None]  # (B, S, 1), channels-last
    cur = lengths
    for i, (layer, k, s) in enumerate(
        zip(params["conv_layers"], cfg.conv_kernels, cfg.conv_strides)
    ):
        x = conv1d(x, layer["w"], layer.get("b"), stride=s)
        valid = None
        if cur is not None:
            cur = (cur - k) // s + 1
            valid = (jnp.arange(x.shape[1])[None, :] < cur[:, None])[..., None]
            x = x * valid.astype(x.dtype)
        if cfg.extract_norm == "group" and i == 0:
            # GroupNorm(groups == channels): per-channel norm over (valid) time
            if valid is None:
                mean = jnp.mean(x, axis=1, keepdims=True)
                var = jnp.var(x, axis=1, keepdims=True)
            else:
                cnt = jnp.maximum(cur[:, None, None].astype(jnp.float32), 1.0)
                mean = jnp.sum(x, axis=1, keepdims=True) / cnt
                var = jnp.sum(jnp.square(x - mean) * valid, axis=1, keepdims=True) / cnt
            x = (x - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
            x = x * layer["norm_scale"] + layer["norm_bias"]
        elif cfg.extract_norm == "layer":
            x = _layer_norm({"scale": layer["norm_scale"], "bias": layer["norm_bias"]}, x,
                            cfg.layer_norm_eps)
        x = _gelu(x)
        if valid is not None:
            x = x * valid.astype(x.dtype)  # norm/bias leak garbage into pads
    return x


def _grouped_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, padding: int,
                    groups: int) -> jnp.ndarray:
    """Grouped conv as per-group dense convs.

    The axon-tunneled TPU hangs on large ``feature_group_count`` convs
    (docs/TPU_NOTES.md quirk #2); G dense convs over channel slices compile
    reliably everywhere and XLA runs them in parallel.  w: (K, Cin/G, Cout).
    """
    cout = w.shape[-1]
    gsize_out = cout // groups
    gsize_in = x.shape[-1] // groups
    pieces = []
    for g in range(groups):
        xg = x[..., g * gsize_in : (g + 1) * gsize_in]
        wg = w[:, :, g * gsize_out : (g + 1) * gsize_out]
        pieces.append(conv1d(xg, wg, None, padding=padding))
    y = jnp.concatenate(pieces, axis=-1)
    return y + b if b is not None else y


def positional_conv_embedding(cfg: SSLConfig, params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Conv k=128 groups=16 pad=64 (weight-norm folded at load) + trim + GELU."""
    y = _grouped_conv1d(x, params["w"], params["b"], cfg.conv_pos_kernel // 2,
                        cfg.conv_pos_groups)
    if cfg.conv_pos_kernel % 2 == 0:
        y = y[:, :-1]  # SamePadLayer: even kernel over-pads by one frame
    return _gelu(y)


def _relative_position_buckets(cfg: SSLConfig, t: int) -> np.ndarray:
    """WavLM/T5 log-bucketed relative positions, computed host-side (static T)."""
    context = np.arange(t)[:, None]
    memory = np.arange(t)[None, :]
    rel = memory - context
    num_buckets = cfg.num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * num_buckets
    rel = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    rel_large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    rel_large = rel_large / math.log(cfg.max_distance / max_exact)
    rel_large = (max_exact + rel_large * (num_buckets - max_exact)).astype(np.int64)
    rel_large = np.minimum(rel_large, num_buckets - 1)
    buckets += np.where(is_small, rel, rel_large)
    return buckets


def _attention(
    cfg: SSLConfig,
    lp: dict,
    x: jnp.ndarray,
    pos_bias: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
    precision,
) -> jnp.ndarray:
    """Self-attention; optional WavLM gated relative position bias."""
    b, t, d = x.shape
    h = cfg.num_heads
    hd = d // h

    def heads(y):
        return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

    q = heads(x @ lp["q"]["w"] + lp["q"]["b"]) * (hd**-0.5)
    k = heads(x @ lp["k"]["w"] + lp["k"]["b"])
    v = heads(x @ lp["v"]["w"] + lp["v"]["b"])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision)

    if pos_bias is not None:
        # gate from the query activations (WavLMAttention.forward steps 1-4)
        gated = x.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        proj = gated @ lp["gru_w"] + lp["gru_b"]  # (b, h, t, 8)
        proj = proj.reshape(b, h, t, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # (b,h,t,1) each
        gate = gate_a * (gate_b * lp["gru_const"][None, :, None, None] - 1.0) + 2.0
        scores = scores + gate * pos_bias[None]

    if pad_mask is not None:
        scores = scores + pad_mask[:, None, None, :]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return out @ lp["o"]["w"] + lp["o"]["b"]


def _ffn(lp: dict, x: jnp.ndarray, precision) -> jnp.ndarray:
    y = _gelu(x @ lp["fc1"]["w"] + lp["fc1"]["b"])
    return y @ lp["fc2"]["w"] + lp["fc2"]["b"]


def encoder_forward(
    cfg: SSLConfig,
    params: dict,
    x: jnp.ndarray,
    frame_lengths: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projected features (B, T, D) -> (final, hidden_states (L+1, B, T, D)).

    hidden_states matches HF ``output_hidden_states=True`` exactly: entry 0 is
    the encoder input after pos-conv (+pre-layers LN in post-LN mode), entry
    L is the final output (after the trailing LN in pre-LN mode).
    """
    b, t, d = x.shape
    pad_mask = None
    if frame_lengths is not None:
        valid = jnp.arange(t)[None, :] < frame_lengths[:, None]
        x = x * valid[..., None].astype(x.dtype)
        pad_mask = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min).astype(x.dtype)

    x = x + positional_conv_embedding(cfg, params["pos_conv"], x)
    if not cfg.pre_ln:
        x = _layer_norm(params["encoder_ln"], x, cfg.layer_norm_eps)

    pos_bias = None
    if cfg.rel_pos_bias:
        buckets = _relative_position_buckets(cfg, t)
        # (t, t, H) -> (H, t, t); keep the table a jnp array — checkpoint
        # converters hand back numpy, and numpy fancy-indexed by a traced
        # index would call __array__ under jit
        pos_bias = jnp.transpose(
            jnp.asarray(params["rel_attn_embed"])[buckets], (2, 0, 1)
        )

    def layer_step(h, lp):
        if cfg.pre_ln:
            attn_out = _attention(cfg, lp, _layer_norm(lp["attn_ln"], h, cfg.layer_norm_eps),
                                  pos_bias, pad_mask, precision)
            h = h + attn_out
            h = h + _ffn(lp, _layer_norm(lp["final_ln"], h, cfg.layer_norm_eps), precision)
        else:
            attn_out = _attention(cfg, lp, h, pos_bias, pad_mask, precision)
            h = _layer_norm(lp["attn_ln"], h + attn_out, cfg.layer_norm_eps)
            h = _layer_norm(lp["final_ln"], h + _ffn(lp, h, precision), cfg.layer_norm_eps)
        return h, h

    final, per_layer = jax.lax.scan(layer_step, x, params["layers"])
    if cfg.pre_ln:
        final = _layer_norm(params["encoder_ln"], final, cfg.layer_norm_eps)
        per_layer = per_layer.at[-1].set(final)
    hidden = jnp.concatenate([x[None], per_layer], axis=0)
    return final, hidden


def ssl_forward(
    cfg: SSLConfig,
    params: dict,
    wav: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> dict:
    """Raw waveform (B, S) -> {"x": (B,T,D), "hidden_states": (L+1,B,T,D),
    "frame_lengths": (B,)}.

    Equivalent to HF ``Wav2Vec2Model/HubertModel/WavLMModel.forward`` with
    ``output_hidden_states=True`` (minus dropout, eval mode), and to fairseq's
    ``w2v_model(wav, mask=False, features_only=True)["x"]`` for the base
    config.  With ``lengths``, valid frames match an exact-length run (see
    ``conv_feature_extractor``), not HF's masked-batch semantics (HF leaves
    the GroupNorm stats unmasked).
    """
    feats = conv_feature_extractor(cfg, params, wav, lengths)
    feats = _layer_norm(params["feat_ln"], feats, cfg.layer_norm_eps)
    x = feats @ params["feat_proj"]["w"] + params["feat_proj"]["b"]
    frame_lengths = None
    if lengths is not None:
        frame_lengths = feat_extract_output_length(cfg, lengths)
    final, hidden = encoder_forward(cfg, params, x, frame_lengths, precision)
    out = {"x": final, "hidden_states": hidden}
    if frame_lengths is not None:
        out["frame_lengths"] = frame_lengths
    return out


# ---------------------------------------------------------------------------
# Random init (tests / smoke runs without checkpoints)
# ---------------------------------------------------------------------------


def init_ssl_params(key, cfg: SSLConfig) -> dict:
    k_iter = iter(jax.random.split(key, 64))

    def dense(cin, cout, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(cin))
        return {
            "w": jax.random.normal(next(k_iter), (cin, cout), jnp.float32) * scale,
            "b": jnp.zeros((cout,), jnp.float32),
        }

    conv_layers = []
    cin = 1
    for i, (cout, k) in enumerate(zip(cfg.conv_dims, cfg.conv_kernels)):
        layer = {
            "w": jax.random.normal(next(k_iter), (k, cin, cout), jnp.float32)
            * (0.5 / np.sqrt(k * cin))
        }
        if cfg.conv_bias:
            layer["b"] = jnp.zeros((cout,), jnp.float32)
        if (cfg.extract_norm == "group" and i == 0) or cfg.extract_norm == "layer":
            layer["norm_scale"] = jnp.ones((cout,), jnp.float32)
            layer["norm_bias"] = jnp.zeros((cout,), jnp.float32)
        conv_layers.append(layer)
        cin = cout

    d, f, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers
    hd = d // cfg.num_heads

    def stacked(shape, scale):
        return jax.random.normal(next(k_iter), (L,) + shape, jnp.float32) * scale

    layers = {
        "q": {"w": stacked((d, d), 1 / np.sqrt(d)), "b": jnp.zeros((L, d))},
        "k": {"w": stacked((d, d), 1 / np.sqrt(d)), "b": jnp.zeros((L, d))},
        "v": {"w": stacked((d, d), 1 / np.sqrt(d)), "b": jnp.zeros((L, d))},
        "o": {"w": stacked((d, d), 1 / np.sqrt(d)), "b": jnp.zeros((L, d))},
        "attn_ln": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
        "fc1": {"w": stacked((d, f), 1 / np.sqrt(d)), "b": jnp.zeros((L, f))},
        "fc2": {"w": stacked((f, d), 1 / np.sqrt(f)), "b": jnp.zeros((L, d))},
        "final_ln": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
    }
    if cfg.rel_pos_bias:
        layers["gru_w"] = stacked((hd, 8), 1 / np.sqrt(hd))
        layers["gru_b"] = jnp.zeros((L, 8))
        layers["gru_const"] = jnp.ones((L, cfg.num_heads))

    params = {
        "conv_layers": conv_layers,
        "feat_ln": {"scale": jnp.ones((cfg.conv_dims[-1],)), "bias": jnp.zeros((cfg.conv_dims[-1],))},
        "feat_proj": dense(cfg.conv_dims[-1], d),
        "pos_conv": {
            "w": jax.random.normal(
                next(k_iter),
                (cfg.conv_pos_kernel, d // cfg.conv_pos_groups, d),
                jnp.float32,
            )
            * 0.02,
            "b": jnp.zeros((d,), jnp.float32),
        },
        "encoder_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "layers": layers,
    }
    if cfg.rel_pos_bias:
        params["rel_attn_embed"] = (
            jax.random.normal(next(k_iter), (cfg.num_buckets, cfg.num_heads), jnp.float32) * 0.02
        )
    return params
