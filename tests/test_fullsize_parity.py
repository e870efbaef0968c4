"""Full-size oracle parity: the PRODUCTION config (768d/12L, 24-block Vocos)
against the torch reference with random weights.

The narrow-width e2e tests (test_codec_e2e.py) prove the algorithms; this
proves them where fp accumulation differences are largest — the published
model scale (~290M params, config/SimWhisperCodec.yaml).  It is slow
(two ~290M CPU forwards over multi-chunk audio), so it is gated on
RUN_SLOW=1 and run at least once per round; the recorded result lives in
docs/FULLSIZE_PARITY.md.

Reference oracle: /root/reference/audiocodec/model.py:15-396 (encode
:244-308, decode :310-373) executed as-is on CPU.
"""

import os

import numpy as np
import pytest
import yaml

from conftest import HAS_REFERENCE, REPO_ROOT, add_reference_to_path

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="full-size oracle parity is slow; set RUN_SLOW=1 (run once per round)",
)


@pytest.fixture(scope="module")
def models():
    if not HAS_REFERENCE:
        pytest.skip("reference repo not mounted")
    add_reference_to_path()
    from audiocodec.model import AudioCodec as RefCodec

    from simwhisper_codec_tpu.config import CodecConfig
    from simwhisper_codec_tpu.models.codec import AudioCodec
    from simwhisper_codec_tpu.utils.checkpoint import convert_state_dict

    with open(REPO_ROOT / "config" / "SimWhisperCodec.yaml") as f:
        generator_params = yaml.safe_load(f)["generator_params"]
    # random full-width init on the reference side (no published weights in
    # this environment); freeze/init flags are constructor-time only
    generator_params["acoustic_encoder"]["freeze"] = False
    generator_params.pop("init_from_whisper", None)
    generator_params.pop("whisper_model_path", None)

    torch.manual_seed(0)
    ref = RefCodec(generator_params).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = CodecConfig.from_dict(generator_params)
    ours = AudioCodec(cfg, convert_state_dict(sd, cfg), batch_size=2)
    return ref, ours


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.default_rng(20)
    # 47 s (2 full chunks + partial via 20 s stride) and 13.3 s (single
    # partial chunk): exercises the chunk loop at production scale
    lens = [47 * 16000, 213000]
    return [(rng.standard_normal(l) * 0.1).astype(np.float32) for l in lens]


def test_fullsize_code_parity(models, wavs):
    ref, ours = models
    with torch.no_grad():
        ref_out = ref.encode(
            [torch.from_numpy(w) for w in wavs], overlap_seconds=10,
            device=torch.device("cpu"),
        )
    our_out = ours.encode(wavs, overlap_seconds=10)

    for i, (rc, oc) in enumerate(zip(ref_out["codes_list"], our_out["codes_list"])):
        rc = rc.numpy()
        oc = np.asarray(oc)
        assert rc.shape == oc.shape, f"sample {i}: {rc.shape} vs {oc.shape}"
        mismatches = int((rc != oc).sum())
        assert mismatches == 0, (
            f"sample {i}: {mismatches}/{rc.size} code indices differ at full width"
        )


def test_fullsize_decode_waveform_parity(models, wavs):
    ref, ours = models
    with torch.no_grad():
        ref_codes = ref.encode(
            [torch.from_numpy(w) for w in wavs], overlap_seconds=10,
            device=torch.device("cpu"),
        )["codes_list"]
        ref_wavs = ref.decode(ref_codes, overlap_seconds=10, device=torch.device("cpu"))[
            "syn_wav_list"
        ]

    our_wavs = ours.decode([c.numpy() for c in ref_codes], overlap_seconds=10)["syn_wav_list"]

    for i, (rw, ow) in enumerate(zip(ref_wavs, our_wavs)):
        rw = rw.numpy()
        ow = np.asarray(ow)
        assert rw.shape == ow.shape, f"sample {i}: {rw.shape} vs {ow.shape}"
        err = np.abs(rw - ow).max()
        denom = np.sqrt(np.mean(rw**2)) + 1e-9
        rel = np.sqrt(np.mean((rw - ow) ** 2)) / denom
        print(f"fullsize sample {i}: waveform max err {err:.3e}, rel RMS {rel:.3e}")
        assert err < 5e-3, f"sample {i}: waveform max err {err:.2e}"
        assert rel < 1e-2, f"sample {i}: rel RMS err {rel:.2e}"
