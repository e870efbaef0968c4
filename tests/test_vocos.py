"""Vocos vocoder + ISTFT parity tests vs the reference torch modules."""

import numpy as np
import pytest

import jax.numpy as jnp

from simwhisper_codec_tpu.config import VocosConfig
from simwhisper_codec_tpu.models import vocos as jvocos
from simwhisper_codec_tpu.ops import stft as jstft
from simwhisper_codec_tpu.utils import checkpoint as ckpt

from conftest import HAS_REFERENCE, add_reference_to_path

torch = pytest.importorskip("torch")

CFG = VocosConfig(input_channels=20, dim=64, intermediate_dim=128, num_layers=3, n_fft=640, hop_size=160)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_istft_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import ISTFT

    rng = np.random.default_rng(8)
    t = 20
    re = rng.standard_normal((2, 321, t)).astype(np.float32)
    im = rng.standard_normal((2, 321, t)).astype(np.float32)
    ref_mod = ISTFT(n_fft=640, hop_length=160, win_length=640, padding="same")
    with torch.no_grad():
        spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
        y_ref = ref_mod(spec).numpy()

    consts = jstft.make_istft_constants(640, 160)
    y = np.asarray(
        jstft.istft_same(consts, jnp.asarray(re.transpose(0, 2, 1)), jnp.asarray(im.transpose(0, 2, 1)))
    )
    assert y.shape == y_ref.shape == (2, 160 * t)
    np.testing.assert_allclose(y, y_ref, atol=2e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_istft_virtual_edge_matches_short_run():
    """A fixed-T run with frame_valid=S must equal a reference run on S frames."""
    add_reference_to_path()
    from audiocodec.nn.modules import ISTFT

    rng = np.random.default_rng(9)
    t_full, s = 24, 15
    re = rng.standard_normal((1, 321, t_full)).astype(np.float32)
    im = rng.standard_normal((1, 321, t_full)).astype(np.float32)

    ref_mod = ISTFT(n_fft=640, hop_length=160, win_length=640, padding="same")
    with torch.no_grad():
        spec_s = torch.complex(torch.from_numpy(re[:, :, :s]), torch.from_numpy(im[:, :, :s]))
        y_ref = ref_mod(spec_s).numpy()  # (1, 160*s)

    consts = jstft.make_istft_constants(640, 160)
    y = np.asarray(
        jstft.istft_same(
            consts,
            jnp.asarray(re.transpose(0, 2, 1)),
            jnp.asarray(im.transpose(0, 2, 1)),
            frame_valid=jnp.asarray(s),
        )
    )
    np.testing.assert_allclose(y[:, : 160 * s], y_ref, atol=2e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_vocos_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import Vocos

    torch.manual_seed(4)
    ref = Vocos(
        input_channels=20, dim=64, intermediate_dim=128, num_layers=3, n_fft=640, hop_size=160
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_vocos(sd, CFG, prefix="")

    rng = np.random.default_rng(10)
    t = 30
    mel = rng.standard_normal((2, 20, t)).astype(np.float32)
    lens = np.array([t, 18])
    with torch.no_grad():
        y_ref, l_ref = ref(torch.from_numpy(mel), torch.from_numpy(lens))

    consts = jvocos.make_constants(CFG)
    y, l = jvocos.vocos_forward(CFG, consts, params, jnp.asarray(mel.transpose(0, 2, 1)), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(l), l_ref.numpy())
    assert y.shape == (2, 160 * t)
    np.testing.assert_allclose(np.asarray(y), y_ref[:, 0, :].numpy(), atol=3e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_vocos_virtual_edge_matches_short_run():
    add_reference_to_path()
    from audiocodec.nn.modules import Vocos

    torch.manual_seed(5)
    ref = Vocos(
        input_channels=20, dim=64, intermediate_dim=128, num_layers=3, n_fft=640, hop_size=160
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = ckpt.convert_vocos(sd, CFG, prefix="")

    rng = np.random.default_rng(11)
    t_full, s = 30, 21
    mel = rng.standard_normal((1, 20, t_full)).astype(np.float32)
    # junk beyond the edge must not affect the valid region
    mel_padded = mel.copy()
    mel_padded[:, :, s:] += 100.0

    with torch.no_grad():
        y_ref, _ = ref(torch.from_numpy(mel[:, :, :s]), torch.from_numpy(np.array([s])))

    consts = jvocos.make_constants(CFG)
    y, _ = jvocos.vocos_forward(
        CFG, consts, params, jnp.asarray(mel_padded.transpose(0, 2, 1)), jnp.asarray(np.array([s])),
        frame_valid=jnp.asarray(s),
    )
    np.testing.assert_allclose(np.asarray(y)[:, : 160 * s], y_ref[:, 0, :].numpy(), atol=3e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_mdct_imdct_parity():
    add_reference_to_path()
    import scipy.signal

    if not hasattr(scipy.signal, "cosine"):  # removed in scipy>=1.13
        scipy.signal.cosine = scipy.signal.windows.cosine
    from audiocodec.nn.modules import IMDCT, MDCT

    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    for padding in ("same", "center"):
        ref_mdct = MDCT(frame_len=64, padding=padding)
        ref_imdct = IMDCT(frame_len=64, padding=padding)
        with torch.no_grad():
            X_ref = ref_mdct(torch.from_numpy(x)).numpy()
            y_ref = ref_imdct(torch.from_numpy(X_ref)).numpy()
        consts = jstft.make_mdct_constants(64, padding)
        X = np.asarray(jstft.mdct(consts, jnp.asarray(x)))
        np.testing.assert_allclose(X, X_ref, atol=1e-4)
        y = np.asarray(jstft.imdct(consts, jnp.asarray(X)))
        np.testing.assert_allclose(y, y_ref, atol=1e-4)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
def test_stft_log_mag_phase_parity():
    add_reference_to_path()
    from audiocodec.nn.modules import STFT

    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 3200)).astype(np.float32) * 0.3
    for center in (True, False):
        ref_mod = STFT(n_fft=512, hop_length=128, win_length=512, center=center)
        with torch.no_grad():
            lm_ref, ph_ref = ref_mod(torch.from_numpy(x))
        consts = jstft.make_stft_constants(512, 128, 512, center=center)
        lm, ph = jstft.stft_log_mag_phase(consts, jnp.asarray(x))
        # reference returns (B, F, T); ours (B, T, F)
        lm_np = np.asarray(lm).transpose(0, 2, 1)
        ph_np = np.asarray(ph).transpose(0, 2, 1)
        assert lm_np.shape == lm_ref.shape, (center, lm_np.shape, lm_ref.shape)
        np.testing.assert_allclose(lm_np, lm_ref.numpy(), atol=1e-3)
        # compare phase via sin/cos (wrap-around safe); skip near-zero magnitude bins
        mask = lm_ref.numpy() > -6
        np.testing.assert_allclose(
            np.cos(ph_np)[mask], np.cos(ph_ref.numpy())[mask], atol=1e-2
        )
