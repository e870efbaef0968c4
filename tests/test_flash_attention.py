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
