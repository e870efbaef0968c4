"""Pallas blockwise attention kernel for the encoder/decoder hot path.

The dense path (models/transformer.py) materializes (B, H, T, T) score
tensors in HBM — at T=1500, B=8, H=12 that is ~860 MB of f32 traffic per
layer.  This kernel tiles queries into VMEM-resident blocks and streams
K/V once, so HBM traffic is O(T*D) per head: the standard flash-attention
memory shape, specialized to this model's variable-length additive bias.

Semantics match ``VarLenAttention`` (reference modules.py:111-187): the bias
adds +1.0 to valid key positions and float32-min to invalid ones, so
fully-padded query rows degrade to uniform attention exactly like the
reference (their outputs are masked downstream).  Not bit-identical to the
dense path (different accumulation order) — parity mode keeps dense f32;
this kernel serves the throughput path.

Grid: (B*H, T/block_q); K/V for one (batch, head) live in VMEM (T=1536,
D=64 f32 -> ~400 KB each), scores per block are (block_q, T) -> ~800 KB.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = float(np.finfo(np.float32).min)


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, heads: int, block_q: int):
    # lengths live in SMEM as a full (B*H, 1) block: scalar-prefetch grids
    # (PrefetchScalarGridSpec) compile ~100x slower through Mosaic here
    seq_len = len_ref[pl.program_id(0), 0]

    q = q_ref[0]  # (block_q, D), already scaled by head_dim**-0.5
    k = k_ref[0]  # (T, D)
    v = v_ref[0]  # (T, D)
    t = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, T)

    key_pos = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], t), dimension=1)
    bias = jnp.where(key_pos < seq_len, jnp.float32(1.0), jnp.float32(NEG_BIG))
    scores = scores + bias

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)

    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Variable-length attention. q/k/v: (B, H, T, D) with q pre-scaled.

    Returns (B, H, T, D).  T is padded to a multiple of ``block_q`` internally;
    rows beyond the original T are garbage and must be cropped (done here).
    """
    b, h, t, d = q.shape
    t_pad = -(-t // block_q) * block_q
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(b * h, t_pad, d)
    kf = k.reshape(b * h, t_pad, d)
    vf = v.reshape(b * h, t_pad, d)

    grid = (b * h, t_pad // block_q)
    kernel = functools.partial(_attn_kernel, heads=h, block_q=block_q)
    lens_bh = jnp.repeat(lengths.astype(jnp.int32), h).reshape(b * h, 1)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b * h, 1), lambda bh, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(lens_bh, qf, kf, vf)

    return out.reshape(b, h, t_pad, d)[:, :, :t, :]


def _pflash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, heads_per_block: int,
                   head_dim: int):
    """One (batch, head-group, q-block) cell on head-group slices of packed QKV.

    Mosaic requires block last dims divisible by 128, so the block carries a
    group of heads (2 x 64 for the Whisper shape); the group unrolls inside.
    """
    seq_len = len_ref[pl.program_id(0), 0]

    qg = q_ref[0]  # (block_q, G*hd), pre-scaled
    kg = k_ref[0]  # (T, G*hd)
    vg = v_ref[0]  # (T, G*hd)
    t = kg.shape[0]

    key_pos = jax.lax.broadcasted_iota(jnp.int32, (qg.shape[0], t), dimension=1)
    valid = key_pos < seq_len

    outs = []
    for g in range(heads_per_block):
        sl = slice(g * head_dim, (g + 1) * head_dim)
        scores = jax.lax.dot_general(
            qg[:, sl], kg[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, T)
        # softmax is shift-invariant, so the reference's +1.0 valid-key bias
        # cancels — only the mask matters (fully-padded query rows still
        # degrade to uniform attention, as in VarLenAttention)
        scores = jnp.where(valid, scores, jnp.float32(NEG_BIG))
        m = jnp.max(scores, axis=-1, keepdims=True)
        # unnormalized weights go straight to the MXU; the 1/sum normalization
        # is deferred to the (block_q, hd) output — T/hd x fewer elements than
        # dividing the (block_q, T) probability block (the VPU passes over
        # (block_q, T) f32 are this kernel's measured bottleneck)
        e = jnp.exp(scores - m).astype(vg.dtype)
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o_un = jax.lax.dot_general(
            e, vg[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o_un * (1.0 / s))
    # one full-width aligned store for the whole head group
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def pflash_supported(d_model: int, num_heads: int) -> bool:
    """True when ``fused_qkv_attention`` can 128-align this head geometry
    (Mosaic last-dim tiling constraint).  Production 768d/12h (hd=64) passes;
    tiny test configs (e.g. hd=16 with 4 heads) cannot group to 128 and must
    use an XLA attention path instead."""
    hd = d_model // num_heads
    group = max(1, 128 // hd) if hd < 128 else 1
    return num_heads % group == 0 and (hd * group) % 128 == 0


def fused_qkv_attention(
    qkv: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    block_q: int = 256,
    interpret: bool = False,
    head_group: int = None,
) -> jnp.ndarray:
    """Attention core on a packed (B, T, 3D) QKV tensor, zero transposes.

    The kernel's block index maps slice each head-group's q/k/v column range
    directly out of the packed projection output ((B, T, [q|k|v]*D) layout),
    and each output block writes its group's column slice of the (B, T, D)
    result — so the surrounding graph never materializes a (B, H, T, hd)
    transpose in either direction.  Heads are grouped so the block's last dim
    is a 128 multiple (Mosaic tiling constraint).  Grid (B, H/G, T/block_q)
    with the q-block axis fastest: K/V group blocks stay VMEM-resident
    across q blocks.

    q must already be scaled and biased; masking semantics are the
    VarLenAttention additive bias (+1.0 valid keys / f32-min invalid).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    b, t, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    if head_group is not None:
        group = head_group  # explicit override (tests exercise grouped paths)
    elif interpret:
        group = 1  # the interpreter has no tiling constraint (tiny test shapes)
    else:
        group = max(1, 128 // hd) if hd < 128 else 1
        if num_heads % group or (hd * group) % 128:
            raise ValueError(f"cannot 128-align heads: hd={hd}, heads={num_heads}")
    gd = hd * group
    n_groups = num_heads // group
    t_pad = -(-t // block_q) * block_q
    if t_pad != t:
        # pad time; padded key rows are masked by the length bias
        qkv = jnp.pad(qkv, [(0, 0), (0, t_pad - t), (0, 0)])

    lens = lengths.astype(jnp.int32).reshape(b, 1)
    grid = (b, n_groups, t_pad // block_q)
    kernel = functools.partial(_pflash_kernel, heads_per_block=group,
                               head_dim=hd)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda bb, h, i: (0, 0), memory_space=pltpu.SMEM),
            # q block: rows [i*block_q, ...), cols [h*gd, ...)
            pl.BlockSpec((1, block_q, gd), lambda bb, h, i: (bb, i, h)),
            # k group block: cols [D + h*gd, ...)
            pl.BlockSpec((1, t_pad, gd),
                         lambda bb, h, i, _n=n_groups: (bb, 0, _n + h)),
            # v group block: cols [2D + h*gd, ...)
            pl.BlockSpec((1, t_pad, gd),
                         lambda bb, h, i, _n=n_groups: (bb, 0, 2 * _n + h)),
        ],
        out_specs=pl.BlockSpec((1, block_q, gd), lambda bb, h, i: (bb, i, h)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), qkv.dtype),
        interpret=interpret,
    )(lens, qkv, qkv, qkv)

    return out[:, :t, :]


def varlen_attention_pflash(
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    precision=jax.lax.Precision.DEFAULT,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full attention sublayer: packed single-matmul QKV (XLA, peak MXU) ->
    Pallas head-sliced attention core (no transposes) -> XLA output proj.

    The round-2 A/Bs showed packed QKV wins 44% isolated and the flash core
    wins 2x per layer isolated, but each lost end-to-end when paired with the
    other half in XLA; this combines both wins and removes the (B,H,T,hd)
    transposes that sank the original flash path.
    """
    b, t, d = x.shape
    hd = d // num_heads
    scale = hd ** -0.5
    w = jnp.concatenate(
        [p["q"]["w"] * scale, p["k"]["w"], p["v"]["w"]], axis=-1
    ).astype(x.dtype)
    bias = jnp.concatenate(
        [p["q"]["b"] * scale, jnp.zeros_like(p["q"]["b"]), p["v"]["b"]], axis=-1
    ).astype(x.dtype)
    qkv = (jnp.matmul(x.reshape(b * t, d), w, precision=precision)
           .reshape(b, t, 3 * d) + bias)
    o = fused_qkv_attention(qkv, lengths, num_heads, block_q=block_q,
                            interpret=interpret)
    o2 = jnp.matmul(o.reshape(b * t, d), p["o"]["w"].astype(x.dtype),
                    precision=precision)
    return o2.reshape(b, t, d) + p["o"]["b"].astype(x.dtype)


def varlen_attention_flash(
    p: dict,
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for models.transformer.varlen_attention using the
    Pallas kernel (serving path; use dense f32 for bit parity)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # Pallas TPU kernels need the interpreter on CPU
    b, t, d = x.shape
    hd = d // num_heads
    scale = hd**-0.5
    q = (x @ p["q"]["w"].astype(x.dtype) + p["q"]["b"].astype(x.dtype)) * scale
    k = x @ p["k"]["w"].astype(x.dtype)
    v = x @ p["v"]["w"].astype(x.dtype) + p["v"]["b"].astype(x.dtype)
    q = q.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    o = flash_attention(q, k, v, lengths, interpret=interpret)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ p["o"]["w"].astype(x.dtype) + p["o"]["b"].astype(x.dtype)
