"""CLI integration: torch checkpoint + YAML -> inference.py -> output WAVs."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import yaml

from conftest import HAS_REFERENCE, REPO_ROOT, add_reference_to_path

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo used to build the ckpt")
def test_inference_cli_end_to_end(tmp_path):
    add_reference_to_path()
    from audiocodec.model import AudioCodec as RefCodec

    from simwhisper_codec_tpu.utils.audio_io import load_audio, save_audio

    from test_codec_e2e import GENERATOR_PARAMS

    # synthesize a checkpoint in the reference's format ({'model': state_dict})
    torch.manual_seed(0)
    ref = RefCodec(GENERATOR_PARAMS)
    ckpt_path = tmp_path / "ckpt.pt"
    torch.save({"model": ref.state_dict()}, ckpt_path)
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.safe_dump({"generator_params": GENERATOR_PARAMS}))

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i, n in enumerate([33000, 16000]):
        save_audio(in_dir / f"utt{i}.wav", rng.standard_normal(n).astype(np.float32) * 0.1, 16000)

    result = subprocess.run(
        [
            sys.executable, str(REPO_ROOT / "inference.py"),
            "--config_path", str(config_path),
            "--checkpoint_path", str(ckpt_path),
            "--input_dir", str(in_dir),
            "--output_dir", str(out_dir),
            "--device", "cpu",
            "--batch_size", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd=REPO_ROOT,
    )
    assert result.returncode == 0, result.stderr[-2000:]

    for i, n in enumerate([33000, 16000]):
        out_file = out_dir / f"utt{i}.wav"
        assert out_file.exists()
        wav = load_audio(out_file, 16000)
        assert wav.shape == (n // 1280 * 1280,)
        assert np.isfinite(wav).all()
