"""Dynamic int8 matmuls for the serving path.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 T/s peak).  Weights
quantize once at load time (symmetric, per-output-channel); activations
quantize per row on the fly (symmetric, absmax), so no calibration data is
needed.  Accumulation is int32 on the MXU; the rescale is a fused VPU
epilogue.

Two consumers (measured end-to-end in docs/TPU_NOTES.md):
- the *unfused* XLA path here (``ffn_impl="int8"``) — correct but SLOWER
  than the fused-bf16 serving path (breaking the Pallas LN+FFN fusion costs
  more HBM traffic than the 2x MXU rate saves);
- the *fused* Pallas kernel ``ops/fused_convnext.fused_ln_ffn_int8``
  (``ffn_impl="int8-fused"`` + int8 Vocos pointwise) — the serving winner:
  2897x vs 2484x real-time at batch 16, codes 96.9% agree with bf16.

The reference has no quantized path; this is a TPU-native serving capability
on top of its behavior (``AudioCodec(mode="fast-int8")``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = -2) -> tuple:
    """Symmetric per-output-channel int8 weights.

    w: (..., K, N) -> (int8 (..., K, N), f32 scales (..., N)); columns with
    all-zero weights get scale 1 to avoid 0/0.
    """
    s = jnp.max(jnp.abs(w), axis=axis, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
    wq = jnp.round(w / s).astype(jnp.int8)
    return wq, jnp.squeeze(s, axis=axis)


def int8_dynamic_matmul(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """(M, K) x (K, N) with per-row dynamic activation quantization -> f32.

    x may be bf16/f32; rows with absmax 0 quantize with scale 1 (output 0).
    """
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return y.astype(jnp.float32) * xs * ws[None, :]


def quantize_stacked_ffn(layers: dict) -> dict:
    """Augment a stacked transformer-layer dict (fc1/fc2 (L, K, N)) with
    int8 weights + scales for ffn_impl="int8".  Idempotent."""
    if "fc1_q" in layers:
        return layers
    out = dict(layers)
    out["fc1_q"], out["fc1_s"] = quantize_weight(layers["fc1"]["w"])
    out["fc2_q"], out["fc2_s"] = quantize_weight(layers["fc2"]["w"])
    return out


def quantize_stacked_convnext(blocks: dict) -> dict:
    """Augment stacked Vocos ConvNeXt blocks (pw1/pw2 (L, K, N)) with int8
    weights + scales for the fused int8 pointwise chain.  Idempotent."""
    if "pw1_q" in blocks:
        return blocks
    out = dict(blocks)
    out["pw1_q"], out["pw1_s"] = quantize_weight(blocks["pw1"]["w"])
    out["pw2_q"], out["pw2_s"] = quantize_weight(blocks["pw2"]["w"])
    return out
