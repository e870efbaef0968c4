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
    # tanh-approximate GELU inside (_ln_ffn_body): Mosaic lowers neither erf
    # nor erfc; the approximation error (<3e-3 absolute) is below bf16
    # activation resolution
    o_ref[...] = _ln_ffn_body(
        xdw_ref[...].astype(jnp.float32), res_ref[...].astype(jnp.float32),
        ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref,
        eps, o_ref.dtype)


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


def _ln_ffn_body(xdw, res, ln_s_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 gamma_ref, eps: float, out_dtype):
    """Shared LN -> pw1 -> tanh-GELU -> pw2 -> gamma -> +res chain (f32 in,
    rows already materialized in VMEM)."""
    mean = jnp.mean(xdw, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xdw - mean), axis=-1, keepdims=True)
    xn = (xdw - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_s_ref[...].astype(jnp.float32) + ln_b_ref[...].astype(jnp.float32)

    h = jax.lax.dot_general(
        xn.astype(w1_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h3 = h * h * h
    h = (0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h3)))).astype(w2_ref.dtype)

    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b2_ref[...].astype(jnp.float32)
    y = gamma_ref[...].astype(jnp.float32) * y
    return (res + y).astype(out_dtype)


def _kernel_dw(fv_ref, x_ref, dww_ref, dwb_ref, ln_s_ref, ln_b_ref, w1_ref,
               b1_ref, w2_ref, b2_ref, gamma_ref, o_ref, scratch, sem,
               *, eps: float, block_t: int, t_total: int):
    """Whole ConvNeXt block in one pass: halo-DMA the (block_t + 6)-row input
    window from HBM, depthwise k7 as 7 static shifted FMAs in VMEM, then the
    LN -> FFN -> layer-scale -> residual chain — the input activation is read
    from HBM exactly once and serves as both dwconv source and residual
    (vs dwconv-in-XLA: write x_dw + read x_dw + re-read x = ~2 extra HBM
    passes of the (B, T, C) activation per block; TPU_NOTES "MFU lever
    accounting" candidate 1).

    Scratch layout: scratch row r holds global time t = t0 + r - 6, where
    t0 = i * block_t; the DMA window [start, start + block_t + 6) lands at
    dst offset 6 - (t0 - start), so tap k of output row j always reads the
    STATIC slice [k + 3, k + 3 + block_t).  Rows outside [0, frame_valid)
    are masked with where() (pre-conv edge mask, vocos.py:61-62).
    """
    b, i = pl.program_id(0), pl.program_id(1)
    t0 = i * block_t
    start = jnp.clip(t0 - 3, 0, t_total - (block_t + 6))
    dst_off = 6 - (t0 - start)

    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(start, block_t + 6), :],
        scratch.at[pl.ds(dst_off, block_t + 6), :],
        sem,
    )
    dma.start()
    dma.wait()

    fv = fv_ref[0]
    t_of_r = t0 + jax.lax.broadcasted_iota(jnp.int32, (block_t + 12, 1), 0) - 6
    valid = jnp.logical_and(t_of_r >= 0, t_of_r < fv)
    xs = jnp.where(valid, scratch[...].astype(jnp.float32), 0.0)

    xdw = dwb_ref[...].astype(jnp.float32)  # (C,) broadcast
    for k in range(7):
        xdw = xdw + xs[k + 3:k + 3 + block_t] * dww_ref[k].astype(jnp.float32)

    res = scratch[6:6 + block_t].astype(jnp.float32)  # residual is UNMASKED x
    o_ref[0] = _ln_ffn_body(xdw, res, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
                            w2_ref, b2_ref, gamma_ref, eps, o_ref.dtype)


def pick_block_t(t: int, target: int = 256, lo: int = 64):
    """Largest divisor of t in [lo, target] (the halo index arithmetic needs
    uniform blocks), or None -> caller falls back to the two-step path."""
    for d in range(min(target, t - 6), lo - 1, -1):
        if t % d == 0:
            return d
    return None


def fused_convnext_block_dw(
    x: jnp.ndarray,
    p: dict,
    frame_valid: jnp.ndarray = None,
    eps: float = 1e-6,
    block_t: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole ConvNeXt block (dwconv k7 + LN + FFN + layer-scale + residual)
    as ONE Pallas kernel over (B, T, C) — single HBM read of the activation.

    ``frame_valid`` (traced int scalar or None): pre-conv edge mask bound, as
    in vocos.convnext_block.  Requires a uniform block_t dividing T with
    T >= block_t + 6 (pick_block_t); callers fall back for odd geometries.
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    bsz, t, c = x.shape
    if block_t is None:
        block_t = pick_block_t(t)
    assert block_t and t % block_t == 0 and t >= block_t + 6, (t, block_t)
    n_t = t // block_t
    fv = jnp.full((1,), t if frame_valid is None else frame_valid, jnp.int32)

    dtype = x.dtype
    grid = (bsz, n_t)
    inter = p["pw1"]["w"].shape[1]
    rep = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_dw, eps=eps, block_t=block_t, t_total=t),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # frame_valid scalar
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM; halo-DMA'd
            rep((7, c)), rep((c,)),                 # dwconv w, b
            rep((c,)), rep((c,)),                   # LN scale, bias
            rep((c, inter)), rep((inter,)),         # pw1
            rep((inter, c)), rep((c,)),             # pw2
            rep((c,)),                              # gamma
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((block_t + 12, c), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        fv,
        x,
        p["dwconv"]["w"][:, 0, :].astype(dtype),
        p["dwconv"]["b"].astype(dtype),
        p["norm"]["scale"].astype(dtype),
        p["norm"]["bias"].astype(dtype),
        p["pw1"]["w"].astype(dtype),
        p["pw1"]["b"].astype(dtype),
        p["pw2"]["w"].astype(dtype),
        p["pw2"]["b"].astype(dtype),
        p["gamma"].astype(dtype),
    )
    return out


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
