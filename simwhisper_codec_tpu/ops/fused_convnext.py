"""Fused ConvNeXt pointwise chain as a Pallas TPU kernel.

Fuses LN -> pw1 (C -> I) -> GELU -> pw2 (I -> C) -> layer-scale -> residual
into one VMEM-resident pass: activations never round-trip to HBM between the
two matmuls, and both weight matrices stay pinned in VMEM across the M-tile
grid (C=512, I=4096 bf16 -> ~8 MB, well under the 16 MB budget).

The depthwise k7 conv stays in XLA (shift-FMAs fuse fine there); this kernel
covers the matmul chain that dominates Vocos (ops/vocos.py) — measured at
only ~30% MXU utilization as separate XLA matmuls.

Used opt-in (``use_fused_convnext``): Mosaic compiles are 10-100x slower
through the tunneled backend (docs/TPU_NOTES.md), so the default serving
path remains pure XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xdw_ref, res_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            gamma_ref, o_ref, *, eps: float):
    x = xdw_ref[...].astype(jnp.float32)  # (block_m, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(jnp.float32)

    h = jax.lax.dot_general(
        xn.astype(w1_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    # tanh-approximate GELU: Mosaic lowers neither erf nor erfc; the approximation
    # error (<3e-3 absolute) is below bf16 activation resolution
    h3 = h * h * h
    h = (0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h3)))).astype(w2_ref.dtype)

    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)

    y = gamma_ref[...].astype(jnp.float32) * y
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def fused_ln_ffn(
    x: jnp.ndarray,
    residual: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    gamma: jnp.ndarray = None,
    eps: float = 1e-6,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused residual + gamma*(LN(x) @ w1 -> GELU -> @ w2) over (M, C) inputs.

    Covers both ConvNeXt pointwise chains (gamma = layer scale) and
    transformer FFN sublayers (gamma = ones).  Returns (M, C).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    m, c = x.shape
    inter = w1.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))
    if gamma is None:
        gamma = jnp.ones((c,), x.dtype)

    dtype = x.dtype
    grid = (m_pad // block_m,)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inter), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inter,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), dtype),
        interpret=interpret,
    )(
        x,
        residual,
        ln_scale.astype(dtype),
        ln_bias.astype(dtype),
        w1.astype(dtype),
        b1.astype(dtype),
        w2.astype(dtype),
        b2.astype(dtype),
        gamma.astype(dtype),
    )
    return out[:m]


def fused_convnext_ffn(
    xdw: jnp.ndarray,
    residual: jnp.ndarray,
    p: dict,
    eps: float = 1e-6,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """ConvNeXt-block wrapper over fused_ln_ffn (p: norm/pw1/pw2/gamma)."""
    return fused_ln_ffn(
        xdw, residual,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw1"]["w"], p["pw1"]["b"], p["pw2"]["w"], p["pw2"]["b"],
        p["gamma"], eps=eps, block_m=block_m, interpret=interpret,
    )


def _kernel_int8(xdw_ref, res_ref, ln_s_ref, ln_b_ref, w1q_ref, s1_ref, b1_ref,
                 w2q_ref, s2_ref, b2_ref, gamma_ref, o_ref, *, eps: float):
    """int8 variant: LN -> rowquant -> s8s8s32 dot -> rescale -> GELU ->
    rowquant -> s8s8s32 dot -> rescale -> gamma -> residual, all in VMEM.

    The doubled MXU rate only pays if the quantize passes never touch HBM —
    which is exactly what this fusion guarantees (the XLA int8 path loses
    end-to-end for that reason, docs/TPU_NOTES.md)."""
    x = xdw_ref[...].astype(jnp.float32)  # (block_m, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(jnp.float32)

    xs = jnp.max(jnp.abs(xn), axis=-1, keepdims=True) / 127.0
    xs = jnp.where(xs == 0, 1.0, xs)
    xq = jnp.round(xn / xs).astype(jnp.int8)
    h = jax.lax.dot_general(
        xq, w1q_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * xs * s1_ref[...] + b1_ref[...].astype(jnp.float32)

    h3 = h * h * h
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h3)))

    hs = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
    hs = jnp.where(hs == 0, 1.0, hs)
    hq = jnp.round(h / hs).astype(jnp.int8)
    y = jax.lax.dot_general(
        hq, w2q_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...].astype(jnp.float32)

    y = gamma_ref[...].astype(jnp.float32) * y
    o_ref[...] = (res_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def fused_ln_ffn_int8(
    x: jnp.ndarray,
    residual: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1q: jnp.ndarray,
    s1: jnp.ndarray,
    b1: jnp.ndarray,
    w2q: jnp.ndarray,
    s2: jnp.ndarray,
    b2: jnp.ndarray,
    gamma: jnp.ndarray = None,
    eps: float = 1e-6,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 ``fused_ln_ffn``: weights pre-quantized (ops/quant.py), dynamic
    per-row activation quantization inside the kernel.  Returns (M, C)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    m, c = x.shape
    inter = w1q.shape[1]
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))
    if gamma is None:
        gamma = jnp.ones((c,), x.dtype)

    dtype = x.dtype
    grid = (m_pad // block_m,)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_int8, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            vec(c), vec(c),
            pl.BlockSpec((c, inter), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(inter), vec(inter),
            pl.BlockSpec((inter, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(c), vec(c), vec(c),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), dtype),
        interpret=interpret,
    )(
        x,
        residual,
        ln_scale.astype(dtype),
        ln_bias.astype(dtype),
        w1q,
        s1.astype(jnp.float32),
        b1.astype(dtype),
        w2q,
        s2.astype(jnp.float32),
        b2.astype(dtype),
        gamma.astype(dtype),
    )
    return out[:m]
