"""State-dict converters for the SSL towers (HF + fairseq layouts).

Sources being replaced:
 - HF ``Wav2Vec2Model`` / ``HubertModel`` / ``WavLMModel`` checkpoints
   (speaker SIM's WavLM-large, E2's hubert-base-ls960),
 - fairseq wav2vec2-small inside the UTMOS lightning checkpoint
   (``/root/reference/tools/utmos/utmos.py:102-110``).

All converters produce the param tree consumed by ``models/ssl.py``:
channels-last conv kernels (K, Cin, Cout), linear weights (in, out), layers
stacked with a leading L axis for ``lax.scan``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from simwhisper_codec_tpu.models.ssl import SSLConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _lin(sd, prefix) -> dict:
    return {"w": _np(sd[f"{prefix}.weight"]).T, "b": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _conv_w(sd, key) -> np.ndarray:
    # torch Conv1d (Cout, Cin, K) -> (K, Cin, Cout)
    return _np(sd[key]).transpose(2, 1, 0)


def _stack(trees):
    out = {}
    for k in trees[0]:
        if isinstance(trees[0][k], dict):
            out[k] = _stack([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def _fold_pos_conv(sd, prefix: str) -> dict:
    """Weight-normed positional conv (dim=2: per-tap norm over (Cout, Cin/g))."""
    for g_key, v_key in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (
            f"{prefix}.parametrizations.weight.original0",
            f"{prefix}.parametrizations.weight.original1",
        ),
    ):
        if g_key in sd:
            g = _np(sd[g_key])  # (1, 1, K)
            v = _np(sd[v_key])  # (Cout, Cin/g, K)
            norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
            w = g * v / np.maximum(norm, 1e-12)
            return {"w": w.transpose(2, 1, 0), "b": _np(sd[f"{prefix}.bias"])}
    # already folded
    return {"w": _conv_w(sd, f"{prefix}.weight"), "b": _np(sd[f"{prefix}.bias"])}


def convert_hf_ssl(sd: Dict[str, np.ndarray], cfg: SSLConfig, prefix: str = "") -> dict:
    """HF Wav2Vec2Model / HubertModel / WavLMModel state dict -> param tree."""

    def key(name):
        return f"{prefix}{name}"

    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        layer = {"w": _conv_w(sd, key(f"feature_extractor.conv_layers.{i}.conv.weight"))}
        if key(f"feature_extractor.conv_layers.{i}.conv.bias") in sd:
            layer["b"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.conv.bias")])
        norm_key = key(f"feature_extractor.conv_layers.{i}.layer_norm.weight")
        if norm_key in sd:
            layer["norm_scale"] = _np(sd[norm_key])
            layer["norm_bias"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.layer_norm.bias")])
        conv_layers.append(layer)

    layers = []
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layers.{i}")
        layer = {
            "q": _lin(sd, f"{lp}.attention.q_proj"),
            "k": _lin(sd, f"{lp}.attention.k_proj"),
            "v": _lin(sd, f"{lp}.attention.v_proj"),
            "o": _lin(sd, f"{lp}.attention.out_proj"),
            "attn_ln": _ln(sd, f"{lp}.layer_norm"),
            "fc1": _lin(sd, f"{lp}.feed_forward.intermediate_dense"),
            "fc2": _lin(sd, f"{lp}.feed_forward.output_dense"),
            "final_ln": _ln(sd, f"{lp}.final_layer_norm"),
        }
        if cfg.rel_pos_bias:
            gru = _lin(sd, f"{lp}.attention.gru_rel_pos_linear")
            layer["gru_w"] = gru["w"]
            layer["gru_b"] = gru["b"]
            layer["gru_const"] = _np(sd[f"{lp}.attention.gru_rel_pos_const"]).reshape(-1)
        layers.append(layer)

    params = {
        "conv_layers": conv_layers,
        "feat_ln": _ln(sd, key("feature_projection.layer_norm")),
        "feat_proj": _lin(sd, key("feature_projection.projection")),
        "pos_conv": _fold_pos_conv(sd, key("encoder.pos_conv_embed.conv")),
        "encoder_ln": _ln(sd, key("encoder.layer_norm")),
        "layers": _stack(layers),
    }
    if cfg.rel_pos_bias:
        params["rel_attn_embed"] = _np(sd[key("encoder.layers.0.attention.rel_attn_embed.weight")])
    return params


def convert_fairseq_wav2vec2(sd: Dict[str, np.ndarray], cfg: SSLConfig, prefix: str = "") -> dict:
    """fairseq Wav2Vec2Model state dict (e.g. wav2vec_small.pt inside the UTMOS
    lightning ckpt) -> param tree.  fairseq layout:

      feature_extractor.conv_layers.{i}.0.weight        conv
      feature_extractor.conv_layers.0.2.{weight,bias}   GroupNorm (layer 0 only)
      layer_norm.{weight,bias}                          feature LN
      post_extract_proj.{weight,bias}
      encoder.pos_conv.0.{weight_g,weight_v,bias}
      encoder.layers.{i}.self_attn.{q,k,v,out}_proj     post-LN transformer
      encoder.layers.{i}.{self_attn_layer_norm,fc1,fc2,final_layer_norm}
      encoder.layer_norm.{weight,bias}
    """

    def key(name):
        return f"{prefix}{name}"

    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        layer = {"w": _conv_w(sd, key(f"feature_extractor.conv_layers.{i}.0.weight"))}
        if key(f"feature_extractor.conv_layers.{i}.0.bias") in sd:
            layer["b"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.0.bias")])
        if i == 0 and key("feature_extractor.conv_layers.0.2.weight") in sd:
            layer["norm_scale"] = _np(sd[key("feature_extractor.conv_layers.0.2.weight")])
            layer["norm_bias"] = _np(sd[key("feature_extractor.conv_layers.0.2.bias")])
        conv_layers.append(layer)

    layers = []
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layers.{i}")
        layers.append(
            {
                "q": _lin(sd, f"{lp}.self_attn.q_proj"),
                "k": _lin(sd, f"{lp}.self_attn.k_proj"),
                "v": _lin(sd, f"{lp}.self_attn.v_proj"),
                "o": _lin(sd, f"{lp}.self_attn.out_proj"),
                "attn_ln": _ln(sd, f"{lp}.self_attn_layer_norm"),
                "fc1": _lin(sd, f"{lp}.fc1"),
                "fc2": _lin(sd, f"{lp}.fc2"),
                "final_ln": _ln(sd, f"{lp}.final_layer_norm"),
            }
        )

    return {
        "conv_layers": conv_layers,
        "feat_ln": _ln(sd, key("layer_norm")),
        "feat_proj": _lin(sd, key("post_extract_proj")),
        "pos_conv": _fold_pos_conv(sd, key("encoder.pos_conv.0")),
        "encoder_ln": _ln(sd, key("encoder.layer_norm")),
        "layers": _stack(layers),
    }


def convert_msft_wavlm(sd: Dict[str, np.ndarray], cfg: SSLConfig, prefix: str = "") -> dict:
    """microsoft/UniSpeech WavLM state dict -> param tree.

    This is the layout inside the published ``wavlm_large_finetune.pth``
    speaker checkpoint (the s3prl ``UpstreamExpert`` wraps the original
    microsoft implementation; keys live under ``feature_extract.model.``,
    ``/root/reference/tools/speaker/utils/utils.py:38-77``).  Relative to the
    fairseq wav2vec2 layout it adds:

      feature_extractor.conv_layers.{i}.2.1.{weight,bias}   per-layer LN
      encoder.layers.{i}.self_attn.grep_linear.{weight,bias} gate (HF
        ``gru_rel_pos_linear``)
      encoder.layers.{i}.self_attn.grep_a                   gate const
      encoder.layers.0.self_attn.relative_attention_bias.weight  bucket table
    """

    def key(name):
        return f"{prefix}{name}"

    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        layer = {"w": _conv_w(sd, key(f"feature_extractor.conv_layers.{i}.0.weight"))}
        if key(f"feature_extractor.conv_layers.{i}.0.bias") in sd:
            layer["b"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.0.bias")])
        if key(f"feature_extractor.conv_layers.{i}.2.1.weight") in sd:
            layer["norm_scale"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.2.1.weight")])
            layer["norm_bias"] = _np(sd[key(f"feature_extractor.conv_layers.{i}.2.1.bias")])
        elif i == 0 and key("feature_extractor.conv_layers.0.2.weight") in sd:
            layer["norm_scale"] = _np(sd[key("feature_extractor.conv_layers.0.2.weight")])
            layer["norm_bias"] = _np(sd[key("feature_extractor.conv_layers.0.2.bias")])
        conv_layers.append(layer)

    layers = []
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layers.{i}")
        layer = {
            "q": _lin(sd, f"{lp}.self_attn.q_proj"),
            "k": _lin(sd, f"{lp}.self_attn.k_proj"),
            "v": _lin(sd, f"{lp}.self_attn.v_proj"),
            "o": _lin(sd, f"{lp}.self_attn.out_proj"),
            "attn_ln": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "fc1": _lin(sd, f"{lp}.fc1"),
            "fc2": _lin(sd, f"{lp}.fc2"),
            "final_ln": _ln(sd, f"{lp}.final_layer_norm"),
        }
        if cfg.rel_pos_bias:
            gru = _lin(sd, f"{lp}.self_attn.grep_linear")
            layer["gru_w"] = gru["w"]
            layer["gru_b"] = gru["b"]
            layer["gru_const"] = _np(sd[f"{lp}.self_attn.grep_a"]).reshape(-1)
        layers.append(layer)

    params = {
        "conv_layers": conv_layers,
        "feat_ln": _ln(sd, key("layer_norm")),
        "feat_proj": _lin(sd, key("post_extract_proj")),
        "pos_conv": _fold_pos_conv(sd, key("encoder.pos_conv.0")),
        "encoder_ln": _ln(sd, key("encoder.layer_norm")),
        "layers": _stack(layers),
    }
    if cfg.rel_pos_bias:
        params["rel_attn_embed"] = _np(
            sd[key("encoder.layers.0.self_attn.relative_attention_bias.weight")]
        )
    return params
