"""Whisper-style transformer encoder/decoder, TPU-first.

Reference: ``audiocodec/nn/modules.py`` — VarLenAttention (:85-187),
OmniWhisperTransformerLayer (:190-232), OmniAudioEncoder (:236-376),
OmniAudioDecoder (:380-474), sinusoids (:52-58).

TPU-first notes
---------------
- Layers are stacked along a leading axis and driven by ``lax.scan``: one
  compiled layer body instead of 12 unrolled (the torch reference Python-loops
  modules).
- Attention is dense batched SDPA on the MXU with an additive variable-length
  bias, exactly replicating the reference's mask arithmetic (valid pairs get
  +1.0, invalid pairs get float32 min — modules.py:126-143 — so softmax output
  matches bit-for-bit at f32).
- Everything is channels-last (B, T, D); masks are built once per forward and
  closed over by the scan body.
- ``compute_dtype`` bf16 keeps LN/softmax accumulation in f32 (parity mode is
  pure f32 with HIGHEST matmul precision).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simwhisper_codec_tpu.config import DecoderConfig, EncoderConfig
from simwhisper_codec_tpu.ops.conv import conv1d, conv_transpose1d


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal positional embedding (modules.py:52-58). Returns (length, channels)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the trailing dim, f32 accumulation."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def attention_bias(
    lengths: jnp.ndarray, max_len: int, causal: bool = False, dtype=jnp.float32
) -> jnp.ndarray:
    """Additive attention bias (B, 1, T, T) replicating modules.py:111-143.

    Valid query/key pairs get +1.0 (the reference's mask arithmetic leaves 1.0
    on valid positions, which cancels in softmax), invalid pairs get the dtype
    minimum (exact zero after softmax).
    """
    pos = jnp.arange(max_len)
    valid = pos[None, :] < lengths[:, None]  # (B, T)
    pair = valid[:, None, :, None] & valid[:, None, None, :]  # (B, 1, T, T)
    if causal:
        tri = pos[:, None] >= pos[None, :]  # lower-triangular keep
        pair = pair & tri[None, None, :, :]
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(pair, jnp.asarray(1.0, dtype), neg)


def varlen_attention(
    p: dict,
    x: jnp.ndarray,
    bias: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Dense SDPA with additive variable-length bias (modules.py:145-187)."""
    b, t, d = x.shape
    hd = d // num_heads
    scale = hd ** -0.5

    q = (jnp.matmul(x, p["q"]["w"].astype(x.dtype), precision=precision) + p["q"]["b"].astype(x.dtype)) * scale
    k = jnp.matmul(x, p["k"]["w"].astype(x.dtype), precision=precision)
    v = jnp.matmul(x, p["v"]["w"].astype(x.dtype), precision=precision) + p["v"]["b"].astype(x.dtype)

    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision,
                        preferred_element_type=jnp.float32)
    scores = scores + bias.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.matmul(out, p["o"]["w"].astype(x.dtype), precision=precision) + p["o"]["b"].astype(x.dtype)


def chunked_attention(
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.DEFAULT,
    block_q: int = 128,
    score_dtype=jnp.float32,
) -> jnp.ndarray:
    """Memory-efficient attention in pure XLA: scan over query blocks.

    Materializes only a (B, H, block_q, T) score tile per scan step instead of
    the full (B, H, T, T) tensor — flash-attention memory behavior without a
    custom kernel (the serving path on backends without Mosaic support).
    Same variable-length bias semantics as ``varlen_attention``.

    ``score_dtype=jnp.bfloat16`` halves score-tensor HBM traffic (the dominant
    cost at T=1536); softmax max-subtraction keeps it stable.
    """
    b, t, d = x.shape
    hd = d // num_heads
    scale = hd**-0.5
    t_pad = -(-t // block_q) * block_q

    q = (jnp.matmul(x, p["q"]["w"].astype(x.dtype), precision=precision) + p["q"]["b"].astype(x.dtype)) * scale
    k = jnp.matmul(x, p["k"]["w"].astype(x.dtype), precision=precision)
    v = jnp.matmul(x, p["v"]["w"].astype(x.dtype), precision=precision) + p["v"]["b"].astype(x.dtype)

    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)  # (B, H, T, hd)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    if t_pad != t:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, t_pad - t), (0, 0)])

    key_valid = jnp.arange(t)[None, :] < lengths[:, None]  # (B, T)
    neg = jnp.finfo(score_dtype).min
    kbias = jnp.where(key_valid, jnp.asarray(1.0, score_dtype), jnp.asarray(neg, score_dtype))

    qb = q.reshape(b, num_heads, t_pad // block_q, block_q, hd).transpose(2, 0, 1, 3, 4)

    def body(_, q_block):  # q_block: (B, H, block_q, hd)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q_block, k, precision=precision,
                            preferred_element_type=score_dtype)
        scores = scores + kbias[:, None, None, :]
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return None, jnp.einsum("bhqk,bhkd->bhqd", w, v, precision=precision)

    _, ob = jax.lax.scan(body, None, qb)
    o = ob.transpose(1, 2, 0, 3, 4).reshape(b, num_heads, t_pad, hd)[:, :, :t, :]
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.matmul(o, p["o"]["w"].astype(x.dtype), precision=precision) + p["o"]["b"].astype(x.dtype)


def packed_attention(
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.DEFAULT,
    score_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Single-matmul QKV attention (serving path).

    The three (D, D) projections concatenate into one (D, 3D) matmul —
    mathematically identical outputs (each output column is the same dot
    product).  Measured ~44% faster than the scanned-block form on the
    *isolated* encoder stack, but ~16% SLOWER inside the full codec graph
    (XLA schedules the unblocked (B,H,T,T) score tensor worse there) — so
    ``chunked:1536:bf16`` stays the serving default and this impl is
    experimental (docs/TPU_NOTES.md round 2).  Variable-length masking
    matches ``varlen_attention`` (key-side bias; +1.0 valid / dtype-min
    invalid).
    """
    b, t, d = x.shape
    hd = d // num_heads
    scale = hd ** -0.5
    w = jnp.concatenate(
        [p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=-1
    ).astype(x.dtype)
    qkv = jnp.matmul(x.reshape(b * t, d), w, precision=precision).reshape(b, t, 3 * d)
    q = (qkv[..., :d] + p["q"]["b"].astype(x.dtype)) * scale
    k = qkv[..., d:2 * d]
    v = qkv[..., 2 * d:] + p["v"]["b"].astype(x.dtype)
    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    key_valid = jnp.arange(t)[None, :] < lengths[:, None]
    neg = jnp.finfo(score_dtype).min
    kbias = jnp.where(key_valid, jnp.asarray(1.0, score_dtype),
                      jnp.asarray(neg, score_dtype))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision,
                        preferred_element_type=score_dtype)
    scores = scores + kbias[:, None, None, :]
    wts = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", wts, v, precision=precision)
    o = o.transpose(0, 2, 1, 3).reshape(b * t, d)
    o = jnp.matmul(o, p["o"]["w"].astype(x.dtype), precision=precision)
    return o.reshape(b, t, d) + p["o"]["b"].astype(x.dtype)


def transformer_layer(
    p: dict,
    x: jnp.ndarray,
    bias: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.HIGHEST,
    lengths: Optional[jnp.ndarray] = None,
    attn_impl: str = "dense",
    fused_ffn: bool = False,
    ffn_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Pre-LN block: LN->attn->res, LN->fc1->gelu->fc2->res (modules.py:214-232).

    ffn_impl: "dense" | "fused" (Pallas LN+FFN kernel) | "int8" (dynamic
    int8 matmuls, requires ops.quant.quantize_stacked_ffn'd params); None
    derives from ``fused_ffn`` for backward compatibility.
    """
    h = layer_norm(p["attn_ln"], x)
    if attn_impl.startswith("pflash"):
        from simwhisper_codec_tpu.ops.flash_attention import varlen_attention_pflash

        parts = attn_impl.split(":")
        block_q = int(parts[1]) if len(parts) > 1 else 256
        x = x + varlen_attention_pflash(p, h, lengths, num_heads,
                                        block_q=block_q)
    elif attn_impl == "flash":
        from simwhisper_codec_tpu.ops.flash_attention import varlen_attention_flash

        x = x + varlen_attention_flash(p, h, lengths, num_heads)
    elif attn_impl.startswith("packed"):
        parts = attn_impl.split(":")
        score_dtype = jnp.bfloat16 if len(parts) > 1 and parts[1] == "bf16" else jnp.float32
        x = x + packed_attention(p, h, lengths, num_heads, precision,
                                 score_dtype=score_dtype)
    elif attn_impl.startswith("chunked"):
        parts = attn_impl.split(":")
        block_q = int(parts[1]) if len(parts) > 1 else 128
        score_dtype = jnp.bfloat16 if len(parts) > 2 and parts[2] == "bf16" else jnp.float32
        x = x + chunked_attention(
            p, h, lengths, num_heads, precision, block_q=block_q, score_dtype=score_dtype
        )
    else:
        x = x + varlen_attention(p, h, bias, num_heads, precision)
    b, t, d = x.shape
    impl = ffn_impl or ("fused" if fused_ffn else "dense")
    if impl == "fused":
        # whole FFN sublayer as one Pallas kernel (serving path; tanh-GELU)
        from simwhisper_codec_tpu.ops.fused_convnext import fused_ln_ffn

        xf = x.reshape(b * t, d)
        x = fused_ln_ffn(
            xf, xf,
            p["final_ln"]["scale"], p["final_ln"]["bias"],
            p["fc1"]["w"], p["fc1"]["b"], p["fc2"]["w"], p["fc2"]["b"],
            eps=1e-5,
        ).reshape(b, t, d)
    elif impl == "int8-fused":
        # whole int8 FFN sublayer in one Pallas kernel: 2x MXU rate without
        # the HBM quantize passes that sink the XLA int8 path
        from simwhisper_codec_tpu.ops.fused_convnext import fused_ln_ffn_int8

        xf = x.reshape(b * t, d)
        x = fused_ln_ffn_int8(
            xf, xf,
            p["final_ln"]["scale"], p["final_ln"]["bias"],
            p["fc1_q"], p["fc1_s"], p["fc1"]["b"],
            p["fc2_q"], p["fc2_s"], p["fc2"]["b"],
            eps=1e-5,
        ).reshape(b, t, d)
    elif impl == "int8":
        # dynamic int8 FFN: 2x MXU rate on v5e (ops/quant.py)
        from simwhisper_codec_tpu.ops.quant import int8_dynamic_matmul

        h = layer_norm(p["final_ln"], x).reshape(b * t, d)
        h = int8_dynamic_matmul(h, p["fc1_q"], p["fc1_s"]) + p["fc1"]["b"].astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
        h = int8_dynamic_matmul(h, p["fc2_q"], p["fc2_s"]) + p["fc2"]["b"].astype(jnp.float32)
        x = x + h.astype(x.dtype).reshape(b, t, d)
    else:
        # FFN on a flattened (B*T, D) view (2-D matmuls tile better on the MXU)
        h = layer_norm(p["final_ln"], x).reshape(b * t, d)
        h = jnp.matmul(h, p["fc1"]["w"].astype(x.dtype), precision=precision) + p["fc1"]["b"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.matmul(h, p["fc2"]["w"].astype(x.dtype), precision=precision) + p["fc2"]["b"].astype(x.dtype)
        x = x + h.reshape(b, t, d)
    if x.dtype == jnp.bfloat16:
        # half-precision inf/nan clamp (modules.py:228-231).  For bf16,
        # max - 1000 rounds back to max, so the reference's conditional
        # "clamp only if any inf/nan" is exactly an unconditional clip
        # (finite values unchanged, +-inf -> +-max, nan stays nan) — which
        # drops the two full any(isinf)/any(isnan) reduction passes per layer.
        clamp = float(jnp.finfo(x.dtype).max)
        x = jnp.clip(x, -clamp, clamp)
    elif x.dtype == jnp.float16:
        # fp16: max - 1000 is representable, so the conditional matters
        clamp = float(jnp.finfo(x.dtype).max) - 1000.0
        bad = jnp.logical_or(jnp.any(jnp.isinf(x)), jnp.any(jnp.isnan(x)))
        x = jnp.where(bad, jnp.clip(x, -clamp, clamp), x)
    return x


def run_layers(
    stacked: dict,
    x: jnp.ndarray,
    bias: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.HIGHEST,
    collect: bool = False,
    lengths: Optional[jnp.ndarray] = None,
    attn_impl: str = "dense",
    fused_ffn: bool = False,
    ffn_impl: Optional[str] = None,
):
    """Scan the transformer stack (stacked params with leading layer axis).

    With ``collect=True`` also returns the per-layer outputs stacked along a
    leading axis (L, B, T, D) — the scan's ys, used for the reference's
    ``output_hidden_states`` layer-pick path (modules.py:343-355).
    """

    def body(carry, lp):
        out = transformer_layer(
            lp, carry, bias, num_heads, precision, lengths, attn_impl, fused_ffn,
            ffn_impl,
        )
        return out, (out if collect else None)

    out, ys = jax.lax.scan(body, x, stacked)
    return (out, ys) if collect else out


def seq_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, T, 1) bool validity mask (modules.py:61-68)."""
    pos = jnp.arange(max_len)
    return (pos[None, :] < lengths[:, None])[..., None]


def encoder_forward(
    cfg: EncoderConfig,
    p: dict,
    mel: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    pos_emb: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
    output_hidden_states: bool = False,
    attn_impl: str = "dense",
    fused_ffn: bool = False,
    ffn_impl=None,
):
    """OmniAudioEncoder forward (modules.py:287-376).

    Args:
        mel: (B, T_mel, n_mels) channels-last log-mel.
        mel_lengths: (B,) valid mel frames.
        pos_emb: (max_source_positions, d_model) — only used when
            ``is_acoustic=False`` (the production config omits it,
            modules.py:308-338).

    Returns: hidden (B, T_mel//stride, d_model), lengths (B,).
    """
    x = conv1d(mel, p["conv1"]["w"], p["conv1"]["b"], padding=1, precision=precision)
    if not cfg.is_acoustic:
        x = jax.nn.gelu(x, approximate=False)
    x = conv1d(x, p["conv2"]["w"], p["conv2"]["b"], stride=cfg.stride_size, padding=1, precision=precision)
    if not cfg.is_acoustic:
        x = jax.nn.gelu(x, approximate=False)

    out_lengths = mel_lengths // cfg.stride_size
    t = x.shape[1]

    if not cfg.is_acoustic:
        assert pos_emb is not None
        x = (x.astype(jnp.float32) + pos_emb[:t].astype(jnp.float32)).astype(x.dtype)

    bias = None if attn_impl != "dense" else attention_bias(out_lengths, t, causal=False)
    if not output_hidden_states:
        x = run_layers(
            p["layers"], x, bias, cfg.encoder_attention_heads, precision,
            lengths=out_lengths, attn_impl=attn_impl, fused_ffn=fused_ffn,
            ffn_impl=ffn_impl,
        )
        x = layer_norm(p["ln"], x)
        x = jnp.where(seq_mask(out_lengths, t), x, 0)
        return x, out_lengths

    # reference semantics (modules.py:343-371): states are [input-to-layer-1,
    # ..., input-to-layer-L, final-LN output], each masked.
    x0 = x
    x, ys = run_layers(
        p["layers"], x, bias, cfg.encoder_attention_heads, precision, collect=True,
        lengths=out_lengths, attn_impl=attn_impl,
    )
    final = layer_norm(p["ln"], x)
    mask = seq_mask(out_lengths, t)
    pre_layer = jnp.concatenate([x0[None], ys[:-1]], axis=0)
    all_states = jnp.concatenate([pre_layer, final[None]], axis=0)
    all_states = jnp.where(mask[None], all_states, 0)
    return jnp.where(mask, final, 0), out_lengths, all_states


def decoder_forward(
    cfg: DecoderConfig,
    p: dict,
    h: jnp.ndarray,
    lengths: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    attn_impl: str = "dense",
    fused_ffn: bool = False,
    ffn_impl=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """OmniAudioDecoder forward (modules.py:437-474).

    h: (B, T, d_model) -> mel (B, 2T, n_mels); positional embedding is
    registered but never added in the reference (modules.py:441-448), and the
    layers are non-causal despite the comment (modules.py:431).
    """
    t = h.shape[1]
    bias = None if attn_impl != "dense" else attention_bias(lengths, t, causal=False)
    x = run_layers(
        p["layers"], h, bias, cfg.decoder_attention_heads, precision,
        lengths=lengths, attn_impl=attn_impl, fused_ffn=fused_ffn,
        ffn_impl=ffn_impl,
    )
    x = layer_norm(p["ln"], x)
    x = jnp.where(seq_mask(lengths, t), x, 0)

    # deconv1: k3 s2 p0 -> 2T+1; deconv2: k3 s1 p0 -> 2T+3; trim to exactly 2T
    x = conv_transpose1d(x, p["deconv1"]["w"], p["deconv1"]["b"], stride=cfg.stride_size, precision=precision)
    x = conv_transpose1d(x, p["deconv2"]["w"], p["deconv2"]["b"], stride=1, precision=precision)
    expected = t * cfg.stride_size
    x = x[:, :expected, :]
    return x, lengths * cfg.stride_size


def generic_transformer_forward(
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    pos_emb: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    output_hidden_states: bool = False,
):
    """Generic Transformer encoder (reference modules.py:637-734).

    x: (B, T, D) channels-last; always adds the sinusoidal positional
    embedding (unlike the acoustic encoder) and preserves sequence length.
    """
    t = x.shape[1]
    x = (x.astype(jnp.float32) + pos_emb[:t].astype(jnp.float32)).astype(x.dtype)
    bias = attention_bias(lengths, t, causal=False)
    mask = seq_mask(lengths, t)
    if not output_hidden_states:
        x = run_layers(p["layers"], x, bias, num_heads, precision)
        x = jnp.where(mask, layer_norm(p["ln"], x), 0)
        return x, lengths
    x0 = x
    x, ys = run_layers(p["layers"], x, bias, num_heads, precision, collect=True)
    final = layer_norm(p["ln"], x)
    pre_layer = jnp.concatenate([x0[None], ys[:-1]], axis=0)
    all_states = jnp.concatenate([pre_layer, final[None]], axis=0)
    return jnp.where(mask, final, 0), lengths, all_states


# ---------------------------------------------------------------------------
# Random initialization (matches torch defaults closely enough for training;
# checkpoint import is the parity path).
# ---------------------------------------------------------------------------


def _init_linear(key, fan_in, fan_out, bias=True):
    wk, bk = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound)
    return p


def _init_conv(key, w, cin, cout, groups=1):
    wk, bk = jax.random.split(key)
    fan_in = cin // groups * w
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wk, (w, cin // groups, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound),
    }


def _init_layer(key, d, ffn):
    keys = jax.random.split(key, 6)
    return {
        "attn_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "q": _init_linear(keys[0], d, d),
        "k": _init_linear(keys[1], d, d, bias=False),
        "v": _init_linear(keys[2], d, d),
        "o": _init_linear(keys[3], d, d),
        "final_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "fc1": _init_linear(keys[4], d, ffn),
        "fc2": _init_linear(keys[5], ffn, d),
    }


def _stack_layers(keys, d, ffn):
    layers = [_init_layer(k, d, ffn) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def init_encoder(key, cfg: EncoderConfig) -> dict:
    keys = jax.random.split(key, cfg.encoder_layers + 2)
    return {
        "conv1": _init_conv(keys[0], cfg.kernel_size, cfg.num_mel_bins, cfg.d_model),
        "conv2": _init_conv(keys[1], cfg.kernel_size, cfg.d_model, cfg.d_model),
        "layers": _stack_layers(keys[2:], cfg.d_model, cfg.encoder_ffn_dim),
        "ln": {"scale": jnp.ones((cfg.d_model,)), "bias": jnp.zeros((cfg.d_model,))},
    }


def init_decoder(key, cfg: DecoderConfig) -> dict:
    keys = jax.random.split(key, cfg.decoder_layers + 2)
    d = cfg.d_model
    # torch ConvTranspose1d default init uses fan_in = out_channels*k
    dk1 = _init_conv(keys[0], cfg.kernel_size, d, d)
    dk2 = _init_conv(keys[1], cfg.kernel_size, d, cfg.num_mel_bins)
    return {
        "layers": _stack_layers(keys[2:], d, cfg.decoder_ffn_dim),
        "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "deconv1": dk1,
        "deconv2": dk2,
    }
