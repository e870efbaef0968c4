"""Tests: eval metrics sanity, WER calculator, data utils, audio I/O, params."""

import numpy as np
import pytest

from simwhisper_codec_tpu.eval import metrics as M
from simwhisper_codec_tpu.eval.wer import Calculator, characterize, edit_distance  # noqa: F401
from simwhisper_codec_tpu.utils import data as D
from simwhisper_codec_tpu.utils.audio_io import load_audio, save_audio
from simwhisper_codec_tpu.utils.params import count_params_by_module


def make_speechlike(n=32000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    f0 = 120 + 20 * np.sin(2 * np.pi * 3 * t)
    sig = np.zeros(n)
    for h in range(1, 8):
        sig += np.sin(2 * np.pi * h * np.cumsum(f0) / 16000) / h
    envelope = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t) ** 2
    return (sig * envelope * 0.1 + 0.001 * rng.standard_normal(n)).astype(np.float32)


def test_stoi_identity_and_monotonicity():
    x = make_speechlike()
    assert M.stoi(x, x, 16000) > 0.99
    rng = np.random.default_rng(1)
    mild = x + 0.01 * rng.standard_normal(len(x)).astype(np.float32)
    heavy = x + 0.2 * rng.standard_normal(len(x)).astype(np.float32)
    s_mild, s_heavy = M.stoi(x, mild, 16000), M.stoi(x, heavy, 16000)
    # narrowband synthetic signal in white noise: absolute values are modest,
    # but ordering must hold
    assert s_mild > s_heavy > 0.0
    assert s_mild > 0.5


def test_si_snr_and_snr():
    x = make_speechlike()
    assert M.si_snr(x, x) > 50
    assert M.si_snr(x, 0.5 * x) > 50  # scale invariant
    assert M.snr(x, 0.5 * x) < 10     # not scale invariant
    noisy = x + 0.1 * np.std(x) * np.random.default_rng(2).standard_normal(len(x)).astype(np.float32)
    assert 10 < M.si_snr(x, noisy) < 30


def test_mcd_lsd_sane():
    x = make_speechlike()
    assert M.mel_cepstral_distortion(x, x, 16000) < 1e-6
    assert M.log_spectral_distance(x, x) < 1e-6
    y = make_speechlike(seed=3) + 0.05
    assert M.mel_cepstral_distortion(x, y, 16000) > 0.5


# test_wer_calculator moved to tests/test_wer_parity.py (reference-faithful
# semantics + fuzz A/B against the imported reference oracle)


def test_manifest_roundtrip(tmp_path):
    recs = [{"id": "a", "duration": 1.5}, {"id": "b", "duration": 35.0}, {"id": "c"}]
    p = tmp_path / "m.jsonl"
    D.write_jsonl_manifest(p, recs)
    back = D.read_jsonl_manifest(p)
    assert back == recs
    kept = D.filter_manifest(back, min_duration=1.0, max_duration=30.0)
    assert [r["id"] for r in kept] == ["a", "c"]


def test_distributed_sampler_coverage():
    weights = np.ones(100)
    shards = []
    for rank in range(4):
        s = D.DistributedWeightedSampler(weights, 40, num_replicas=4, rank=rank, seed=7)
        s.set_epoch(3)
        shards.append(list(s))
    all_idx = sum(shards, [])
    assert len(all_idx) == 40
    # same epoch+seed -> identical global draw across ranks (disjoint strides)
    s2 = D.DistributedWeightedSampler(weights, 40, num_replicas=4, rank=0, seed=7)
    s2.set_epoch(3)
    assert list(s2) == shards[0]
    # different epoch -> different draw
    s2.set_epoch(4)
    assert list(s2) != shards[0]


def test_length_bucketing():
    batches = D.length_bucket_batches([100, 5, 50, 7, 99, 51], 2)
    flat = sum(batches, [])
    assert sorted(flat) == list(range(6))
    assert set(batches[0]) == {1, 3}  # two shortest together


def test_audio_io_roundtrip(tmp_path):
    x = make_speechlike()
    p = tmp_path / "x.wav"
    save_audio(p, x, 16000)
    y = load_audio(p, target_sample_rate=16000)
    assert y.shape == x.shape
    assert np.abs(x - y).max() < 1e-3  # 16-bit quantization
    # resample path
    z = load_audio(p, target_sample_rate=8000)
    assert abs(len(z) - len(x) // 2) <= 1


def test_param_counting():
    tree = {"enc": {"w": np.zeros((3, 4))}, "dec": {"a": np.zeros(5), "b": np.zeros((2, 2))}}
    counts = count_params_by_module(tree)
    assert counts == {"enc": 12, "dec": 9, "total": 21}


def test_ecapa_speaker_embedder():
    import jax

    from simwhisper_codec_tpu.eval.speaker import (
        EMB_DIM,
        SpeakerEmbedder,
        ecapa_forward,
        init_ecapa,
    )

    params = init_ecapa(jax.random.PRNGKey(0), feat_dim=80)
    import jax.numpy as jnp

    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 80)), jnp.float32)
    emb = ecapa_forward(params, feats)
    assert emb.shape == (2, EMB_DIM)
    assert np.isfinite(np.asarray(emb)).all()

    embedder = SpeakerEmbedder(params, feat_type="fbank")
    e1 = embedder.embed(make_speechlike(16000, seed=0), 16000)
    e2 = embedder.embed(make_speechlike(16000, seed=0), 16000)
    assert e1.shape == (EMB_DIM,)
    np.testing.assert_array_equal(e1, e2)  # deterministic


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax

    from simwhisper_codec_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3), "b": {"c": np.ones(4, np.float32)}}
    save_orbax(str(tmp_path / "ckpt"), tree)
    back = load_orbax(str(tmp_path / "ckpt"), tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), tree["b"]["c"])


def test_whisper_init_key_mapping(tmp_path):
    """Whisper init path with a locally constructed (tiny) HF Whisper model."""
    pytest.importorskip("transformers")
    import torch
    from transformers import WhisperConfig, WhisperModel

    from simwhisper_codec_tpu.config import EncoderConfig
    from simwhisper_codec_tpu.utils.whisper_init import load_whisper_encoder_params

    hf_cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=64,
        num_mel_bins=80, max_source_positions=1500, vocab_size=100,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
    )
    model = WhisperModel(hf_cfg)
    local = tmp_path / "whisper_tiny"
    model.save_pretrained(local)

    enc_cfg = EncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
    )
    params = load_whisper_encoder_params(enc_cfg, str(local), local_files_only=True)
    # spot-check a mapped tensor: conv1 weight (O,I,W) -> (W,I,O)
    w_ref = model.encoder.conv1.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params["conv1"]["w"]), w_ref.transpose(2, 1, 0))
    q_ref = model.encoder.layers[1].self_attn.q_proj.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params["layers"]["q"]["w"][1]), q_ref.T)


def test_evaluator_wrappers():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools" / "base_eval"))
    import evaluator

    x = make_speechlike()
    assert evaluator.calculate_stoi(x, x, 16000) > 0.99
    wb, nb = evaluator.calculate_pesq_wb_nb(x, x, 16000)
    assert wb is None or wb > 4.0  # None without pesq package


def test_seed_everything():
    from simwhisper_codec_tpu.utils.seeding import seed_everything

    seed_everything(123)
    a = np.random.rand(3)
    seed_everything(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # >15 s on the 1-CPU CI host; full tier runs it
def test_corpus_evaluator(tmp_path):
    import jax

    from simwhisper_codec_tpu.eval.corpus import evaluate_corpus
    from simwhisper_codec_tpu.models.codec import AudioCodec, init_params

    from test_parallel import TINY

    in_dir = tmp_path / "corpus"
    out_dir = tmp_path / "recon"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i, n in enumerate([24000, 40000]):
        save_audio(in_dir / f"u{i}.wav", (rng.standard_normal(n) * 0.1).astype(np.float32), 16000)

    codec = AudioCodec(TINY, init_params(jax.random.PRNGKey(0), TINY))
    stats = evaluate_corpus(codec, str(in_dir), str(out_dir), batch_size=2)
    assert stats["files"] == 2
    assert stats["x_realtime"] > 0
    assert (out_dir / "u0.wav").exists() and (out_dir / "u1.wav").exists()
    assert abs(stats["audio_seconds"] - 4.0) < 0.1


def test_codebook_stats():
    from simwhisper_codec_tpu.config import QuantizerConfig
    from simwhisper_codec_tpu.eval.codebook import CodebookStats

    cfg = QuantizerConfig()
    stats = CodebookStats(cfg)
    rng = np.random.default_rng(0)
    # uniform codes -> entropy near max, usage near 1
    stats.update(rng.integers(0, 2016, (8, 5000)).astype(np.int32))
    rep = stats.report()
    assert rep["frames"] == 5000
    assert all(10.5 < h <= 11.0 for h in rep["entropy_bits_per_group"])
    assert all(u > 0.9 for u in rep["usage_per_group"])
    assert abs(rep["max_bitrate_bps"] - 8 * np.log2(2016) * 12.5) < 1

    # degenerate codes -> zero entropy
    stats2 = CodebookStats(cfg)
    stats2.update(np.zeros((8, 100), np.int32))
    rep2 = stats2.report()
    assert all(h == 0.0 for h in rep2["entropy_bits_per_group"])
