"""FSQ / GroupFSQ bit-exactness tests.

The FSQ is pure arithmetic (no weights), so we demand exact integer parity:
 - self-consistency: encode -> decode -> encode round-trips exactly;
 - oracle parity vs the reference PyTorch implementation
   (audiocodec/nn/quantizer.py) when /root/reference is mounted.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from simwhisper_codec_tpu.config import QuantizerConfig
from simwhisper_codec_tpu.ops import fsq

from conftest import HAS_REFERENCE, add_reference_to_path

CFG = QuantizerConfig(num_groups=8, num_levels_per_group=(8, 7, 6, 6), eps=1e-3)


def rand_latent(b=3, t=17, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, t, CFG.codebook_dim)) * 2.0).astype(np.float32)


def test_codebook_arithmetic():
    consts = fsq.make_constants(CFG)
    assert CFG.codebook_size_per_group == 8 * 7 * 6 * 6 == 2016
    assert consts.num_levels.shape == (32,)
    # 8 groups x log2(2016) bits x 12.5 Hz ~= 1098 bps (README.md:25 "1.1 kbps")
    bitrate = fsq.bits_per_frame(CFG) * 12.5
    assert 1090 < bitrate < 1100


def test_round_trip_exact():
    consts = fsq.make_constants(CFG)
    x = jnp.asarray(rand_latent())
    lengths = jnp.array([17, 5, 0])
    deq, idx = fsq.group_fsq_forward(consts, x, lengths)
    assert idx.shape == (8, 3, 17)
    assert idx.dtype == jnp.int32
    # indices within codebook range
    assert int(idx.max()) < 2016 and int(idx.min()) >= 0
    # decode(encode(x)) == dequantized
    deq2 = fsq.group_fsq_decode(consts, idx, lengths)
    np.testing.assert_allclose(np.asarray(deq2), np.asarray(deq), atol=1e-6)
    # masking: frames beyond lengths are zero
    assert np.all(np.asarray(idx)[:, 1, 5:] == 0)
    assert np.all(np.asarray(deq)[1, 5:, :] == 0)
    assert np.all(np.asarray(idx)[:, 2, :] == 0)


def test_grad_is_straight_through():
    import jax

    consts = fsq.make_constants(CFG)
    x = jnp.asarray(rand_latent(b=1, t=4))

    def loss(x):
        deq, _ = fsq.group_fsq_forward(consts, x, jnp.array([4]))
        return jnp.sum(deq**2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_parity_vs_reference_torch():
    add_reference_to_path()
    import torch
    from audiocodec.nn.quantizer import GroupFiniteScalarQuantizer

    ref = GroupFiniteScalarQuantizer(num_groups=8, num_levels_per_group=[8, 7, 6, 6], eps=1e-3)
    x = rand_latent(b=4, t=23, seed=7)
    lengths = np.array([23, 11, 1, 0])

    with torch.no_grad():
        # reference layout: (B, D, T)
        deq_t, idx_t = ref(torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(lengths))
    consts = fsq.make_constants(CFG)
    deq_j, idx_j = fsq.group_fsq_forward(consts, jnp.asarray(x), jnp.asarray(lengths))

    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    np.testing.assert_allclose(
        np.asarray(deq_j), deq_t.permute(0, 2, 1).numpy(), atol=1e-6
    )

    # decode parity
    dec_t = ref.decode(idx_t, torch.from_numpy(lengths))
    dec_j = fsq.group_fsq_decode(consts, idx_j, jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.permute(0, 2, 1).numpy(), atol=1e-6)
