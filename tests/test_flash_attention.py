"""Pallas blockwise attention vs the dense reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simwhisper_codec_tpu.models import transformer as jt
from simwhisper_codec_tpu.ops import flash_attention as fa


def dense_reference(q, k, v, lengths):
    b, h, t, d = q.shape
    bias = jt.attention_bias(lengths, t)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + bias
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def test_flash_matches_dense():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 3, 200, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    lengths = jnp.array([200, 77])

    ref = dense_reference(q, k, v, lengths)
    out = fa.flash_attention(q, k, v, lengths, block_q=64, interpret=True)
    # valid regions match; padded query rows are unconstrained
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for bi, ln in enumerate([200, 77]):
        np.testing.assert_allclose(out_np[bi, :, :ln], ref_np[bi, :, :ln], atol=1e-5)


def test_flash_full_layer_matches_dense_path():
    rng = np.random.default_rng(1)
    b, t, dm, heads = 2, 96, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, dm)) * 0.3, jnp.float32)
    lengths = jnp.array([96, 50])

    def init_lin(key, din, dout, bias=True):
        ks = jax.random.split(key)
        p = {"w": 0.1 * jax.random.normal(ks[0], (din, dout))}
        if bias:
            p["b"] = 0.1 * jax.random.normal(ks[1], (dout,))
        return p

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    p = {
        "q": init_lin(keys[0], dm, dm),
        "k": init_lin(keys[1], dm, dm, bias=False),
        "v": init_lin(keys[2], dm, dm),
        "o": init_lin(keys[3], dm, dm),
    }
    bias = jt.attention_bias(lengths, t)
    ref = jt.varlen_attention(p, x, bias, heads)
    out = fa.varlen_attention_flash(p, x, lengths, heads, interpret=True)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for bi, ln in enumerate([96, 50]):
        np.testing.assert_allclose(out_np[bi, :ln], ref_np[bi, :ln], atol=2e-5)


def test_chunked_attention_matches_dense():
    rng = np.random.default_rng(2)
    b, t, dm, heads = 2, 200, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, dm)) * 0.3, jnp.float32)
    lengths = jnp.array([200, 131])

    def init_lin(key, din, dout, bias=True):
        ks = jax.random.split(key)
        p = {"w": 0.1 * jax.random.normal(ks[0], (din, dout))}
        if bias:
            p["b"] = 0.1 * jax.random.normal(ks[1], (dout,))
        return p

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    p = {
        "q": init_lin(keys[0], dm, dm),
        "k": init_lin(keys[1], dm, dm, bias=False),
        "v": init_lin(keys[2], dm, dm),
        "o": init_lin(keys[3], dm, dm),
    }
    bias = jt.attention_bias(lengths, t)
    ref = jt.varlen_attention(p, x, bias, heads)
    out = jt.chunked_attention(p, x, lengths, heads, precision=jax.lax.Precision.HIGHEST)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for bi, ln in enumerate([200, 131]):
        np.testing.assert_allclose(out_np[bi, :ln], ref_np[bi, :ln], atol=2e-5)


def test_pflash_full_layer_matches_dense_path():
    """Packed-QKV + head-sliced Pallas core == dense reference on valid rows."""
    rng = np.random.default_rng(5)
    b, t, dm, heads = 2, 200, 64, 4  # t not a block_q multiple -> padding path
    x = jnp.asarray(rng.standard_normal((b, t, dm)) * 0.3, jnp.float32)
    lengths = jnp.array([200, 77])

    def init_lin(key, din, dout, bias=True):
        ks = jax.random.split(key)
        p = {"w": 0.1 * jax.random.normal(ks[0], (din, dout))}
        if bias:
            p["b"] = 0.1 * jax.random.normal(ks[1], (dout,))
        return p

    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    p = {
        "q": init_lin(keys[0], dm, dm),
        "k": init_lin(keys[1], dm, dm, bias=False),
        "v": init_lin(keys[2], dm, dm),
        "o": init_lin(keys[3], dm, dm),
    }
    bias = jt.attention_bias(lengths, t)
    ref = jt.varlen_attention(p, x, bias, heads)
    out = fa.varlen_attention_pflash(p, x, lengths, heads, block_q=64,
                                     interpret=True)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for bi, ln in enumerate([200, 77]):
        np.testing.assert_allclose(out_np[bi, :ln], ref_np[bi, :ln], atol=2e-5)


def test_pflash_layer_impl_dispatch():
    """attn_impl='pflash:64' through transformer_layer matches dense."""
    rng = np.random.default_rng(6)
    b, t, dm, heads = 2, 128, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, dm)) * 0.3, jnp.float32)
    lengths = jnp.array([128, 70])
    key = jax.random.PRNGKey(3)
    p = jt._init_layer(key, dm, dm * 4)
    bias = jt.attention_bias(lengths, t)
    ref = jt.transformer_layer(p, x, bias, heads)
    out = jt.transformer_layer(p, x, None, heads, lengths=lengths,
                               attn_impl="pflash:64")
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for bi, ln in enumerate([128, 70]):
        np.testing.assert_allclose(out_np[bi, :ln], ref_np[bi, :ln], atol=3e-5)


def test_pflash_head_group_unroll():
    """The grouped (2-heads-per-block) kernel path == dense (interpret mode)."""
    rng = np.random.default_rng(7)
    b, h, t, d = 2, 4, 128, 16
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h * d)) * 0.3, jnp.float32)
    lengths = jnp.array([128, 90])
    out1 = fa.fused_qkv_attention(qkv, lengths, h, block_q=64, interpret=True,
                                  head_group=1)
    out2 = fa.fused_qkv_attention(qkv, lengths, h, block_q=64, interpret=True,
                                  head_group=2)
    np.testing.assert_allclose(np.asarray(out1)[0, :128], np.asarray(out2)[0, :128],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1)[1, :90], np.asarray(out2)[1, :90],
                               atol=1e-5)
