"""Generate real-shaped SYNTHETIC checkpoints for the weight-gated metric towers.

The three evaluation towers (WER HuBERT-CTC, speaker-SIM WavLM-ECAPA, UTMOS)
are implemented natively and parity-tested, but their published weights cannot
be downloaded in a zero-egress environment — so the corpus-scale plumbing
(batching, padding, bucketing, caching, aggregation) needs checkpoints that
are *layout- and shape-identical* to the published files with meaningless
values.  This tool writes exactly those:

  <out>/hubert_ctc/              HF dir: random HubertForCTC at the
                                 facebook/hubert-large-ls960-ft config +
                                 CTC tokenizer + feature extractor
                                 (load_hf_ctc_params reads it by path)
  <out>/wavlm_large_finetune.pth torch {"model": ...}: msft-layout WavLM-large
                                 under feature_extract.model.* + reference
                                 ECAPA trunk keys + feature_weight
                                 (eval/speaker.load_wavlm_ecapa_checkpoint)
  <out>/utmos22_strong.ckpt      lightning {"state_dict": ...}: fairseq-layout
                                 wav2vec2-base under feature_extractors.0.
                                 ssl_model.* + head keys
                                 (eval/utmos.load_utmos_params)

Every synthetic file is ROUND-TRIP VERIFIED here: the emitted torch layout is
converted back through the real production converters and asserted leaf-exact
against the source JAX tree, so a file this tool writes is loadable by the
same code path the published checkpoints use (reference provenance:
tools/wer/calculate_wer.py:269-374, tools/speaker/utils/utils.py:38-77,
tools/utmos/utmos.py:99-131).

Usage: python tools/make_synthetic_tower_weights.py --out /tmp/tower_weights
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32).copy())


def _unstack(tree, i):
    """Slice layer ``i`` out of a lax.scan-stacked subtree."""
    if isinstance(tree, dict):
        return {k: _unstack(v, i) for k, v in tree.items()}
    return np.asarray(tree)[i]


# ---------------------------------------------------------------------------
# inverse converters: JAX param tree -> torch-layout state dict
# ---------------------------------------------------------------------------

def ssl_tree_to_fairseq(tree: dict, cfg, prefix: str = "", msft: bool = False) -> dict:
    """Inverse of ssl_checkpoint.convert_fairseq_wav2vec2 / convert_msft_wavlm."""
    sd = {}
    for i, layer in enumerate(tree["conv_layers"]):
        sd[f"{prefix}feature_extractor.conv_layers.{i}.0.weight"] = _t(
            np.asarray(layer["w"]).transpose(2, 1, 0))
        if "b" in layer and layer["b"] is not None:
            sd[f"{prefix}feature_extractor.conv_layers.{i}.0.bias"] = _t(layer["b"])
        if "norm_scale" in layer:
            nk = (f"{prefix}feature_extractor.conv_layers.{i}.2.1"
                  if msft and cfg.extract_norm == "layer"
                  else f"{prefix}feature_extractor.conv_layers.{i}.2")
            sd[f"{nk}.weight"] = _t(layer["norm_scale"])
            sd[f"{nk}.bias"] = _t(layer["norm_bias"])
    sd[f"{prefix}layer_norm.weight"] = _t(tree["feat_ln"]["scale"])
    sd[f"{prefix}layer_norm.bias"] = _t(tree["feat_ln"]["bias"])
    sd[f"{prefix}post_extract_proj.weight"] = _t(np.asarray(tree["feat_proj"]["w"]).T)
    sd[f"{prefix}post_extract_proj.bias"] = _t(tree["feat_proj"]["b"])
    # pos conv emitted pre-folded (converter's 'already folded' branch)
    sd[f"{prefix}encoder.pos_conv.0.weight"] = _t(
        np.asarray(tree["pos_conv"]["w"]).transpose(2, 1, 0))
    sd[f"{prefix}encoder.pos_conv.0.bias"] = _t(tree["pos_conv"]["b"])
    sd[f"{prefix}encoder.layer_norm.weight"] = _t(tree["encoder_ln"]["scale"])
    sd[f"{prefix}encoder.layer_norm.bias"] = _t(tree["encoder_ln"]["bias"])
    for i in range(cfg.num_layers):
        L = _unstack(tree["layers"], i)
        lp = f"{prefix}encoder.layers.{i}"
        for name, leaf in (("q_proj", L["q"]), ("k_proj", L["k"]),
                           ("v_proj", L["v"]), ("out_proj", L["o"])):
            sd[f"{lp}.self_attn.{name}.weight"] = _t(np.asarray(leaf["w"]).T)
            sd[f"{lp}.self_attn.{name}.bias"] = _t(leaf["b"])
        sd[f"{lp}.self_attn_layer_norm.weight"] = _t(L["attn_ln"]["scale"])
        sd[f"{lp}.self_attn_layer_norm.bias"] = _t(L["attn_ln"]["bias"])
        sd[f"{lp}.fc1.weight"] = _t(np.asarray(L["fc1"]["w"]).T)
        sd[f"{lp}.fc1.bias"] = _t(L["fc1"]["b"])
        sd[f"{lp}.fc2.weight"] = _t(np.asarray(L["fc2"]["w"]).T)
        sd[f"{lp}.fc2.bias"] = _t(L["fc2"]["b"])
        sd[f"{lp}.final_layer_norm.weight"] = _t(L["final_ln"]["scale"])
        sd[f"{lp}.final_layer_norm.bias"] = _t(L["final_ln"]["bias"])
        if cfg.rel_pos_bias:
            sd[f"{lp}.self_attn.grep_linear.weight"] = _t(np.asarray(L["gru_w"]).T)
            sd[f"{lp}.self_attn.grep_linear.bias"] = _t(L["gru_b"])
            sd[f"{lp}.self_attn.grep_a"] = _t(
                np.asarray(L["gru_const"]).reshape(1, -1, 1, 1))
    if cfg.rel_pos_bias:
        sd[f"{prefix}encoder.layers.0.self_attn.relative_attention_bias.weight"] = _t(
            tree["rel_attn_embed"])
    return sd


def _conv_to_torch(sd, prefix, leaf):
    sd[f"{prefix}.weight"] = _t(np.asarray(leaf["w"]).transpose(2, 1, 0))
    if leaf.get("b") is not None:
        sd[f"{prefix}.bias"] = _t(leaf["b"])


def _bn_to_torch(sd, prefix, leaf):
    sd[f"{prefix}.weight"] = _t(leaf["scale"])
    sd[f"{prefix}.bias"] = _t(leaf["bias"])
    sd[f"{prefix}.running_mean"] = _t(leaf["mean"])
    sd[f"{prefix}.running_var"] = _t(leaf["var"])


def _lin_to_torch(sd, prefix, leaf):
    sd[f"{prefix}.weight"] = _t(np.asarray(leaf["w"]).T)
    sd[f"{prefix}.bias"] = _t(leaf["b"])


def ecapa_tree_to_torch(tree: dict) -> dict:
    """Inverse of eval/speaker.convert_ecapa_state_dict (reference ECAPA keys)."""
    from simwhisper_codec_tpu.eval.speaker import SCALE

    sd = {}

    def crb(name, leaf):
        _conv_to_torch(sd, f"{name}.conv", leaf["conv"])
        _bn_to_torch(sd, f"{name}.bn", leaf["bn"])

    def se_res2(name, leaf):
        crb(f"{name}.Conv1dReluBn1", leaf["in"])
        for i in range(SCALE - 1):
            _conv_to_torch(sd, f"{name}.Res2Conv1dReluBn.convs.{i}", leaf["res2"]["convs"][i])
            _bn_to_torch(sd, f"{name}.Res2Conv1dReluBn.bns.{i}", leaf["res2"]["bns"][i])
        crb(f"{name}.Conv1dReluBn2", leaf["out"])
        _lin_to_torch(sd, f"{name}.SE_Connect.linear1", leaf["se"]["fc1"])
        _lin_to_torch(sd, f"{name}.SE_Connect.linear2", leaf["se"]["fc2"])

    crb("layer1", tree["layer1"])
    se_res2("layer2", tree["layer2"])
    se_res2("layer3", tree["layer3"])
    se_res2("layer4", tree["layer4"])
    _conv_to_torch(sd, "conv", tree["mfa"])
    _conv_to_torch(sd, "pooling.linear1", tree["pool"]["att1"])
    _conv_to_torch(sd, "pooling.linear2", tree["pool"]["att2"])
    _bn_to_torch(sd, "bn", tree["bn"])
    _lin_to_torch(sd, "linear", tree["fc"])
    return sd


def utmos_tree_to_lightning(tree: dict, cfg) -> dict:
    """Inverse of eval/utmos.convert_utmos_checkpoint."""
    sd = ssl_tree_to_fairseq(tree["ssl"], cfg.ssl, prefix="feature_extractors.0.ssl_model.")
    sd["feature_extractors.1.embedding.weight"] = _t(tree["domain_emb"])
    sd["output_layers.0.judge_embedding.weight"] = _t(tree["judge_emb"])
    rnn = "output_layers.0.decoder_rnn"
    for suffix, d in (("", tree["lstm"]["fwd"]), ("_reverse", tree["lstm"]["bwd"])):
        sd[f"{rnn}.weight_ih_l0{suffix}"] = _t(np.asarray(d["w_ih"]).T)
        sd[f"{rnn}.weight_hh_l0{suffix}"] = _t(np.asarray(d["w_hh"]).T)
        sd[f"{rnn}.bias_ih_l0{suffix}"] = _t(d["b_ih"])
        sd[f"{rnn}.bias_hh_l0{suffix}"] = _t(d["b_hh"])
    _lin_to_torch(sd, "output_layers.1.net.0", tree["proj1"])
    _lin_to_torch(sd, "output_layers.1.net.3", tree["proj2"])
    return sd


# ---------------------------------------------------------------------------
# round-trip verification against the real converters
# ---------------------------------------------------------------------------

def _assert_trees_equal(a, b, where: str) -> None:
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb), f"{where}: leaf count {len(la)} != {len(lb)}"
    for (pa, va), (pb, vb) in zip(la, lb):
        ka, kb = jax.tree_util.keystr(pa), jax.tree_util.keystr(pb)
        assert ka == kb, f"{where}: {ka} != {kb}"
        np.testing.assert_array_equal(
            np.asarray(va, np.float32), np.asarray(vb, np.float32),
            err_msg=f"{where}: {ka}")


def make_wavlm_ecapa(out_path: Path, seed: int = 0) -> None:
    import jax
    import torch

    from simwhisper_codec_tpu.eval.speaker import (
        convert_ecapa_state_dict,
        init_ecapa,
        wavlm_large_config,
    )
    from simwhisper_codec_tpu.models.ssl import init_ssl_params
    from simwhisper_codec_tpu.utils.ssl_checkpoint import convert_msft_wavlm

    cfg = wavlm_large_config()
    wavlm = init_ssl_params(jax.random.PRNGKey(seed + 1), cfg)
    ecapa = init_ecapa(jax.random.PRNGKey(seed), feat_dim=cfg.d_model)
    fw = np.linspace(-0.1, 0.1, cfg.num_layers + 1).astype(np.float32)

    sd = ecapa_tree_to_torch(ecapa)
    sd.update(ssl_tree_to_fairseq(wavlm, cfg, prefix="feature_extract.model.", msft=True))
    sd["feature_weight"] = _t(fw)

    npsd = {k: v.numpy() for k, v in sd.items()}
    _assert_trees_equal(convert_ecapa_state_dict(npsd), ecapa, "ecapa")
    _assert_trees_equal(
        convert_msft_wavlm(npsd, cfg, prefix="feature_extract.model."), wavlm, "wavlm")
    torch.save({"model": sd}, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")


def make_utmos(out_path: Path, seed: int = 0) -> None:
    import jax
    import torch

    from simwhisper_codec_tpu.eval.utmos import (
        UTMOSConfig,
        convert_utmos_checkpoint,
        init_utmos_params,
    )

    cfg = UTMOSConfig()
    tree = init_utmos_params(jax.random.PRNGKey(seed), cfg)
    sd = utmos_tree_to_lightning(tree, cfg)
    npsd = {k: v.numpy() for k, v in sd.items()}
    _assert_trees_equal(convert_utmos_checkpoint(npsd, cfg), tree, "utmos")
    torch.save({"state_dict": sd}, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")


def make_hubert_ctc(out_dir: Path, seed: int = 0) -> None:
    import json
    import tempfile

    import torch
    from transformers import (
        HubertConfig,
        HubertForCTC,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
    )

    torch.manual_seed(seed)
    # facebook/hubert-large-ls960-ft geometry (calculate_wer.py:269-374)
    hf_cfg = HubertConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True, vocab_size=32,
    )
    model = HubertForCTC(hf_cfg)
    model.save_pretrained(out_dir)
    # the published CTC vocab (wav2vec2/hubert character set)
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "E": 5,
             "T": 6, "A": 7, "O": 8, "N": 9, "I": 10, "H": 11, "S": 12,
             "R": 13, "D": 14, "L": 15, "U": 16, "M": 17, "W": 18, "C": 19,
             "F": 20, "G": 21, "Y": 22, "P": 23, "B": 24, "V": 25, "K": 26,
             "'": 27, "X": 28, "J": 29, "Q": 30, "Z": 31}
    with tempfile.TemporaryDirectory() as td:
        vp = Path(td) / "vocab.json"
        vp.write_text(json.dumps(vocab))
        tok = Wav2Vec2CTCTokenizer(str(vp), unk_token="<unk>", pad_token="<pad>",
                                   word_delimiter_token="|")
        tok.save_pretrained(out_dir)
    Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=True,
    ).save_pretrained(out_dir)
    # verify the production loader consumes the dir
    from simwhisper_codec_tpu.eval.wer import load_hf_ctc_params

    params, vocab_map, do_norm, _ = load_hf_ctc_params(str(out_dir))
    assert len(vocab_map) == 32 and do_norm
    assert params["lm_head"]["w"].shape == (1024, 32)
    print(f"wrote {out_dir} (HubertForCTC large-ls960-ft shape)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", choices=["hubert", "wavlm", "utmos"], default=None)
    args = ap.parse_args()
    # weight generation is pure CPU work: never initialize the ambient
    # accelerator backend (a wedged axon tunnel hangs on first jax call)
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.only in (None, "hubert"):
        make_hubert_ctc(out / "hubert_ctc", args.seed)
    if args.only in (None, "wavlm"):
        make_wavlm_ecapa(out / "wavlm_large_finetune.pth", args.seed)
    if args.only in (None, "utmos"):
        make_utmos(out / "utmos22_strong.ckpt", args.seed)


if __name__ == "__main__":
    main()
