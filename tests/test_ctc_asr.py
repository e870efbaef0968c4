"""Native CTC ASR parity: JAX HuBERT+lm_head vs torch HubertForCTC oracle.

The reference transcribes with ``HubertForCTC`` greedy decode
(``tools/wer/calculate_wer.py:269-374``); here a tiny random-weight torch
oracle checks logits parity through the real HF converter, CTC greedy-decode
semantics vs ``Wav2Vec2CTCTokenizer``, and the end-to-end ``CTCTranscriber``
path (z-norm, bucketing, masking).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.slow  # heavy torch-oracle tests; core tier skips
transformers = pytest.importorskip("transformers")

from simwhisper_codec_tpu.eval import wer as jwer
from simwhisper_codec_tpu.models import ssl as jssl

VOCAB = {0: "<pad>", 1: "<s>", 2: "</s>", 3: "<unk>", 4: "|",
         5: "A", 6: "B", 7: "C", 8: "D"}

TINY_KW = dict(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
    conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, layerdrop=0.0, hidden_dropout=0.0,
    attention_dropout=0.0, feat_proj_dropout=0.0, activation_dropout=0.0,
    final_dropout=0.0, vocab_size=len(VOCAB),
)
TINY_CFG = dict(
    d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
    conv_dims=(32, 32, 32), conv_kernels=(10, 3, 2), conv_strides=(5, 2, 2),
    conv_pos_kernel=16, conv_pos_groups=4,
)


def _tiny_oracle(stable_ln: bool):
    from transformers import HubertConfig, HubertForCTC

    torch.manual_seed(7)
    hf = HubertForCTC(HubertConfig(
        do_stable_layer_norm=stable_ln,
        feat_extract_norm="layer" if stable_ln else "group",
        conv_bias=stable_ln, **TINY_KW,
    )).eval()
    cfg = jssl.SSLConfig(
        pre_ln=stable_ln, extract_norm="layer" if stable_ln else "group",
        conv_bias=stable_ln, **TINY_CFG,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_hf_ssl

    params = {
        "ssl": convert_hf_ssl(sd, cfg, prefix="hubert."),
        "lm_head": {"w": sd["lm_head.weight"].T, "b": sd["lm_head.bias"]},
    }
    return hf, cfg, params


@pytest.mark.parametrize("stable_ln", [False, True])
def test_ctc_logits_match_torch_oracle(stable_ln):
    hf, cfg, params = _tiny_oracle(stable_ln)
    wav = (np.random.default_rng(0).standard_normal((2, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wav)).logits.numpy()
    got, frame_lengths = jax.jit(lambda p, w: jwer.ctc_logits(cfg, p, w, None))(
        params, jnp.asarray(wav)
    )
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_greedy_ctc_decode_matches_hf_tokenizer(tmp_path):
    import json

    from transformers import Wav2Vec2CTCTokenizer

    (tmp_path / "vocab.json").write_text(json.dumps({t: i for i, t in VOCAB.items()}))
    tok = Wav2Vec2CTCTokenizer(str(tmp_path / "vocab.json"))
    rng = np.random.default_rng(3)
    for _ in range(20):
        ids = rng.integers(0, len(VOCAB), size=rng.integers(1, 40))
        # the WER surface: reference = default decode (collapse -> drop
        # blank, specials kept) -> normalize(characterize(...)) (strips
        # <...> tags); the native decode must normalize to the same tokens
        assert jwer.normalize_text(jwer.greedy_ctc_decode(ids, VOCAB)) == \
            jwer.normalize_text(tok.decode(ids))


def test_transcriber_end_to_end_and_bucketing():
    """Padded/bucketed transcription == exact-length transcription, and the
    decoded text comes out of the tiny oracle identically to torch greedy."""
    hf, cfg, params = _tiny_oracle(True)
    t = jwer.CTCTranscriber(params=params, cfg=cfg, vocab=VOCAB, do_normalize=True)
    wav = (np.random.default_rng(5).standard_normal(6500) * 0.3).astype(np.float32)

    # torch greedy on the same z-normed wav
    z = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
    with torch.no_grad():
        logits = hf(torch.from_numpy(z[None])).logits[0]
    want = jwer.greedy_ctc_decode(np.argmax(logits.numpy(), axis=-1), VOCAB)

    assert t.transcribe(wav, 16000) == want
    # different pad bucket, same result (masked exact-length semantics)
    wav2 = np.concatenate([wav, np.zeros(1, np.float32)])
    assert t.transcribe(wav2[: len(wav)], 16000) == want


def test_hubert_large_ft_config_shape():
    cfg = jssl.hubert_large_ft_config()
    assert (cfg.d_model, cfg.num_layers, cfg.num_heads, cfg.ffn_dim) == (1024, 24, 16, 4096)
    assert cfg.pre_ln and cfg.conv_bias and cfg.extract_norm == "layer"
