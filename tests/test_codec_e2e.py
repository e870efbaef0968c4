"""End-to-end codec parity vs the reference AudioCodec (chunked encode/decode).

Uses a narrow (but full-rate: 16 kHz, 30 s chunks, stride-2, stack-4) model so
the CPU oracle stays fast.  Weights flow through the checkpoint importer, so
this also covers the full state-dict conversion path.
"""

import numpy as np
import pytest

from conftest import HAS_REFERENCE, add_reference_to_path

torch = pytest.importorskip("torch")

GENERATOR_PARAMS = {
    "input_sample_rate": 16000,
    "output_sample_rate": 16000,
    "mel_hop_length": 160,
    "encoder_downsample_rate": 1280,
    "decoder_upsample_rate": 1280,
    "feature_extractor": {
        "chunk_length": 30, "feature_size": 80, "sampling_rate": 16000,
        "hop_length": 160, "n_fft": 400, "n_samples": 480000,
        "nb_max_frames": 3000, "padding_side": "right", "padding_value": 0.0,
        "return_attention_mask": False,
    },
    "acoustic_encoder": {
        "num_mel_bins": 80, "sampling_rate": 16000, "hop_length": 160,
        "stride_size": 2, "kernel_size": 3, "d_model": 64,
        "scale_embedding": False, "max_audio_seconds": 30,
        "encoder_layers": 2, "encoder_attention_heads": 4,
        "encoder_ffn_dim": 128, "is_acoustic": True, "freeze": False,
    },
    "downsample": {"in_dim": 64, "latent_dim": 32, "stack_factor": 4, "hidden_dim": 48},
    "quantizer": {"num_groups": 8, "num_levels_per_group": [8, 7, 6, 6], "eps": 0.001},
    "upsample": {"latent_dim": 32, "out_dim": 64, "stack_factor": 4, "hidden_dim": 48},
    "acoustic_decoder": {
        "num_mel_bins": 80, "sampling_rate": 16000, "hop_length": 160,
        "stride_size": 2, "kernel_size": 3, "d_model": 64,
        "scale_embedding": False, "max_audio_seconds": 30,
        "decoder_layers": 2, "decoder_attention_heads": 4,
        "decoder_ffn_dim": 128, "activation_function": "gelu",
    },
    "vocos": {
        "input_channels": 80, "dim": 64, "intermediate_dim": 128,
        "num_layers": 3, "n_fft": 640, "hop_size": 160, "padding": "same",
    },
}


@pytest.fixture(scope="module")
def models():
    if not HAS_REFERENCE:
        pytest.skip("reference repo not mounted")
    add_reference_to_path()
    from audiocodec.model import AudioCodec as RefCodec

    from simwhisper_codec_tpu.config import CodecConfig
    from simwhisper_codec_tpu.models.codec import AudioCodec
    from simwhisper_codec_tpu.utils.checkpoint import convert_state_dict

    torch.manual_seed(0)
    ref = RefCodec(GENERATOR_PARAMS).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = CodecConfig.from_dict(GENERATOR_PARAMS)
    ours = AudioCodec(cfg, convert_state_dict(sd, cfg))
    return ref, ours


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.default_rng(20)
    # 47 s (3 chunks), 13.3 s (1 partial chunk) — exercises the chunk loop
    lens = [47 * 16000, 213000]
    return [(rng.standard_normal(l) * 0.1).astype(np.float32) for l in lens]


def test_encode_code_parity(models, wavs):
    ref, ours = models
    with torch.no_grad():
        ref_out = ref.encode([torch.from_numpy(w) for w in wavs], overlap_seconds=10,
                             device=torch.device("cpu"))
    our_out = ours.encode(wavs, overlap_seconds=10)

    for i, (rc, oc) in enumerate(zip(ref_out["codes_list"], our_out["codes_list"])):
        rc = rc.numpy()
        oc = np.asarray(oc)
        assert rc.shape == oc.shape, f"sample {i}: {rc.shape} vs {oc.shape}"
        np.testing.assert_array_equal(oc, rc, err_msg=f"sample {i}: code indices not bit-exact")


def test_decode_waveform_parity(models, wavs):
    """Decode the REFERENCE's codes with both decoders -> waveform tolerance."""
    ref, ours = models
    with torch.no_grad():
        ref_codes = ref.encode([torch.from_numpy(w) for w in wavs], overlap_seconds=10,
                               device=torch.device("cpu"))["codes_list"]
        ref_wavs = ref.decode(ref_codes, overlap_seconds=10, device=torch.device("cpu"))["syn_wav_list"]

    our_wavs = ours.decode([c.numpy() for c in ref_codes], overlap_seconds=10)["syn_wav_list"]

    for i, (rw, ow) in enumerate(zip(ref_wavs, our_wavs)):
        rw = rw.numpy()
        ow = np.asarray(ow)
        assert rw.shape == ow.shape, f"sample {i}: {rw.shape} vs {ow.shape}"
        err = np.abs(rw - ow).max()
        assert err < 5e-3, f"sample {i}: waveform max err {err:.2e}"
        # tight relative agreement in energy
        denom = np.sqrt(np.mean(rw**2)) + 1e-9
        rel = np.sqrt(np.mean((rw - ow) ** 2)) / denom
        assert rel < 1e-2, f"sample {i}: rel RMS err {rel:.2e}"


def test_round_trip_shapes(models, wavs):
    _, ours = models
    enc = ours.encode(wavs, overlap_seconds=10)
    dec = ours.decode(enc["codes_list"], overlap_seconds=10)
    for w, c, y in zip(wavs, enc["codes_list"], dec["syn_wav_list"]):
        assert c.shape == (8, len(w) // 1280)
        assert y.shape == (len(w) // 1280 * 1280,)


def test_fixed_batch_compilation(models, wavs):
    """Small/tail batches pad to batch_size: one executable per direction."""
    _, ours = models
    rng = np.random.default_rng(5)
    before = ours.trace_counts["tokenize"]
    for n in [1, 2, 3]:
        batch = [(rng.standard_normal(20000) * 0.1).astype(np.float32) for _ in range(n)]
        enc = ours.encode(batch, overlap_seconds=10)
        assert len(enc["codes_list"]) == n
        ours.decode(enc["codes_list"], overlap_seconds=10)
    # batches of size 1, 2, 3 (all < batch_size=8) share one compiled program
    assert ours.trace_counts["tokenize"] == max(before, 1)
    assert ours.trace_counts["detokenize"] >= 1


def test_sub_frame_utterance(models):
    """Utterances shorter than one code frame (1280 samples) -> zero codes."""
    _, ours = models
    rng = np.random.default_rng(6)
    enc = ours.encode([(rng.standard_normal(400) * 0.1).astype(np.float32)])
    assert enc["codes_list"][0].shape == (8, 0)
    dec = ours.decode(enc["codes_list"])
    assert dec["syn_wav_list"][0].shape == (0,)


def test_fuzz_code_parity(models):
    """Randomized lengths: code indices stay bit-exact vs the reference."""
    ref, ours = models
    rng = np.random.default_rng(7)
    lens = [int(v) for v in rng.integers(1500, 700000, size=4)]
    wavs = [(rng.standard_normal(n) * 0.2).astype(np.float32) for n in lens]
    with torch.no_grad():
        ref_out = ref.encode([torch.from_numpy(w) for w in wavs], overlap_seconds=10,
                             device=torch.device("cpu"))["codes_list"]
    our_out = ours.encode(wavs, overlap_seconds=10)["codes_list"]
    for i, (rc, oc) in enumerate(zip(ref_out, our_out)):
        np.testing.assert_array_equal(
            np.asarray(oc), rc.numpy(), err_msg=f"fuzz sample {i} len={lens[i]}"
        )


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_fuzz_overlap_settings(models):
    """Different overlap_seconds values keep bit-exact chunk arithmetic."""
    ref, ours = models
    rng = np.random.default_rng(8)
    wavs = [(rng.standard_normal(750000) * 0.1).astype(np.float32)]
    for overlap in (5, 15, 25):
        with torch.no_grad():
            rc = ref.encode([torch.from_numpy(wavs[0])], overlap_seconds=overlap,
                            device=torch.device("cpu"))["codes_list"][0]
        oc = ours.encode(wavs, overlap_seconds=overlap)["codes_list"][0]
        np.testing.assert_array_equal(np.asarray(oc), rc.numpy(), err_msg=f"overlap={overlap}")
