"""Conv primitives, alias-free Snake stack, and FrameStack module parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from simwhisper_codec_tpu.config import SampleStackConfig
from simwhisper_codec_tpu.ops import conv as jconv
from simwhisper_codec_tpu.ops import snake as jsnake

from conftest import HAS_REFERENCE, add_reference_to_path

torch = pytest.importorskip("torch")


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 50, 16)).astype(np.float32)
    for stride, dil, pad in [(1, 1, 0), (2, 1, 1), (1, 3, 9), (1, 9, 27)]:
        m = torch.nn.Conv1d(16, 24, kernel_size=7, stride=stride, dilation=dil, padding=pad)
        with torch.no_grad():
            ref = m(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        w = m.weight.detach().numpy().transpose(2, 1, 0)
        b = m.bias.detach().numpy()
        ours = np.asarray(
            jconv.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, dilation=dil, padding=pad)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 30, 12)).astype(np.float32)
    for stride, pad, k in [(2, 0, 3), (1, 0, 3), (2, 1, 4)]:
        m = torch.nn.ConvTranspose1d(12, 8, kernel_size=k, stride=stride, padding=pad)
        with torch.no_grad():
            ref = m(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        w = m.weight.detach().numpy().transpose(2, 0, 1)  # (I,O,W) -> (W,I,O)
        b = m.bias.detach().numpy()
        ours = np.asarray(
            jconv.conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=pad)
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_alias_free_resample_parity():
    add_reference_to_path()
    from audiocodec.nn.alias_free_torch.resample import DownSample1d, UpSample1d

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 40, 6)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)

    up, down = UpSample1d(2), DownSample1d(2)
    with torch.no_grad():
        up_ref = up(xt).permute(0, 2, 1).numpy()
        down_ref = down(up(xt)).permute(0, 2, 1).numpy()

    af = jsnake.make_alias_free_constants()
    np.testing.assert_allclose(np.asarray(up.filter).reshape(-1), af.up_taps, atol=1e-6)

    up_ours = np.asarray(jsnake.upsample2x(af, jnp.asarray(x)))
    assert up_ours.shape == up_ref.shape
    np.testing.assert_allclose(up_ours, up_ref, atol=1e-5)

    down_ours = np.asarray(jsnake.downsample2x(af, jnp.asarray(up_ours)))
    np.testing.assert_allclose(down_ours, down_ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_snake_beta_parity():
    add_reference_to_path()
    from audiocodec.nn import activations

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    m = activations.SnakeBeta(8, alpha_logscale=True)
    with torch.no_grad():
        m.alpha.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
        m.beta.copy_(torch.from_numpy(rng.standard_normal(8).astype(np.float32)))
        ref = m(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    ours = np.asarray(
        jsnake.snake_beta(
            jnp.asarray(x),
            jnp.asarray(m.alpha.detach().numpy()),
            jnp.asarray(m.beta.detach().numpy()),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_frame_stack_down_up_parity():
    """Full FrameStackDownConv/UpConv vs reference, weights via the importer."""
    add_reference_to_path()
    from audiocodec.nn.modules import FrameStackDownConv, FrameStackUpConv

    from simwhisper_codec_tpu.models import sampling
    from simwhisper_codec_tpu.utils import checkpoint as ckpt

    torch.manual_seed(0)
    cfg = SampleStackConfig(in_dim=64, out_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48)

    down_t = FrameStackDownConv(in_dim=64, latent_dim=32, stack_factor=4, hidden_dim=48)
    up_t = FrameStackUpConv(latent_dim=32, out_dim=64, stack_factor=4, hidden_dim=48)

    sd_down = {k: v.detach().numpy() for k, v in down_t.state_dict().items()}
    sd_up = {k: v.detach().numpy() for k, v in up_t.state_dict().items()}
    p_down = ckpt.convert_frame_stack_down(sd_down, cfg, prefix="")
    p_up = ckpt.convert_frame_stack_up(sd_up, cfg, prefix="")

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 22, 64)).astype(np.float32)
    lengths = np.array([22, 13])

    with torch.no_grad():
        z_ref, zl_ref = down_t(torch.from_numpy(x).permute(0, 2, 1), torch.from_numpy(lengths))
        y_ref, yl_ref = up_t(z_ref, zl_ref)

    af = jsnake.make_alias_free_constants()
    z, zl = sampling.frame_stack_down(cfg, af, p_down, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(zl), zl_ref.numpy())
    np.testing.assert_allclose(np.asarray(z), z_ref.permute(0, 2, 1).numpy(), atol=2e-5)

    y, yl = sampling.frame_stack_up(cfg, af, p_up, z, zl)
    np.testing.assert_array_equal(np.asarray(yl), yl_ref.numpy())
    np.testing.assert_allclose(np.asarray(y), y_ref.permute(0, 2, 1).numpy(), atol=2e-5)
