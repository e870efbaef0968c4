"""Checkpoint import: reference PyTorch state dict -> TPU param pytree.

Consumes the published ``SimWhisperCodec.pt`` (reference
``audiocodec/model.py:375-396``: ``torch.load`` with optional ``'model'`` key)
and produces the channels-last parameter tree used by this framework:

 - Linear:           torch (O, I)       -> (I, O)
 - Conv1d:           torch (O, I, W)    -> (W, I, O)
 - ConvTranspose1d:  torch (I, O, W)    -> (W, I, O)
 - depthwise Conv1d: torch (C, 1, W)    -> (W, 1, C)
 - weight-norm convs are folded: w = g * v / ||v||_(per out-channel)
   (reference removes weight norm at inference anyway, model.py:101-110)
 - transformer layers / ConvNeXt blocks are stacked along a leading axis for
   ``lax.scan`` (compile-time win the torch reference has no equivalent of)

Buffers (positional embeddings, FSQ level constants, kaiser filters, ISTFT
windows) are recomputed host-side, not imported.

Orbax save/load for native checkpoints lives here too.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from simwhisper_codec_tpu.config import CodecConfig, DecoderConfig, EncoderConfig, SampleStackConfig, VocosConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pt`` checkpoint into a flat {name: np.ndarray} dict."""
    import torch  # local import: torch is only needed for conversion

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items() if hasattr(v, "detach")}


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _get(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"missing checkpoint tensor: {key}")
    return np.asarray(sd[key])


def _linear(sd, prefix, bias=True) -> dict:
    p = {"w": _get(sd, _join(prefix, "weight")).T.astype(np.float32)}
    if bias:
        p["b"] = _get(sd, _join(prefix, "bias")).astype(np.float32)
    return p


def _layer_norm(sd, prefix) -> dict:
    return {
        "scale": _get(sd, _join(prefix, "weight")).astype(np.float32),
        "bias": _get(sd, _join(prefix, "bias")).astype(np.float32),
    }


def _fold_weight_norm(sd, prefix) -> np.ndarray:
    """Fold weight_g/weight_v (old API) or parametrizations (new API) to a dense weight."""
    if _join(prefix, "weight_g") in sd:
        g = _get(sd, _join(prefix, "weight_g"))
        v = _get(sd, _join(prefix, "weight_v"))
    elif _join(prefix, "parametrizations.weight.original0") in sd:
        g = _get(sd, _join(prefix, "parametrizations.weight.original0"))
        v = _get(sd, _join(prefix, "parametrizations.weight.original1"))
    else:
        # plain conv (weight norm already removed before export)
        return _get(sd, _join(prefix, "weight"))
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(np.float32)


def _conv1d(sd, prefix, weight_norm=False) -> dict:
    w = _fold_weight_norm(sd, prefix) if weight_norm else _get(sd, _join(prefix, "weight"))
    return {
        "w": np.transpose(w, (2, 1, 0)).astype(np.float32),  # (O,I,W) -> (W,I,O)
        "b": _get(sd, _join(prefix, "bias")).astype(np.float32),
    }


def _conv_transpose1d(sd, prefix) -> dict:
    w = _get(sd, _join(prefix, "weight"))  # (I, O, W)
    return {
        "w": np.transpose(w, (2, 0, 1)).astype(np.float32),  # -> (W, I, O)
        "b": _get(sd, _join(prefix, "bias")).astype(np.float32),
    }


def _transformer_layer(sd, prefix) -> dict:
    a = _join(prefix, "self_attn")
    return {
        "attn_ln": _layer_norm(sd, _join(prefix, "self_attn_layer_norm")),
        "q": _linear(sd, f"{a}.q_proj"),
        "k": _linear(sd, f"{a}.k_proj", bias=False),  # Whisper convention: no k bias
        "v": _linear(sd, f"{a}.v_proj"),
        "o": _linear(sd, f"{a}.out_proj"),
        "final_ln": _layer_norm(sd, _join(prefix, "final_layer_norm")),
        "fc1": _linear(sd, _join(prefix, "fc1")),
        "fc2": _linear(sd, _join(prefix, "fc2")),
    }


def _stack(trees: list) -> dict:
    """Stack a list of identical param trees along a new leading axis (for scan)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_encoder(sd, cfg: EncoderConfig, prefix="acoustic_encoder") -> dict:
    layers = [_transformer_layer(sd, _join(prefix, f"layers.{i}")) for i in range(cfg.encoder_layers)]
    return {
        "conv1": _conv1d(sd, _join(prefix, "conv1")),
        "conv2": _conv1d(sd, _join(prefix, "conv2")),
        "layers": _stack(layers),
        "ln": _layer_norm(sd, _join(prefix, "layer_norm")),
    }


def convert_decoder(sd, cfg: DecoderConfig, prefix="acoustic_decoder") -> dict:
    layers = [_transformer_layer(sd, _join(prefix, f"layers.{i}")) for i in range(cfg.decoder_layers)]
    return {
        "layers": _stack(layers),
        "ln": _layer_norm(sd, _join(prefix, "layer_norm")),
        "deconv1": _conv_transpose1d(sd, _join(prefix, "deconv1")),
        "deconv2": _conv_transpose1d(sd, _join(prefix, "deconv2")),
    }


def _residual_unit(sd, prefix) -> dict:
    """ResidualUnit: block.0/2 = Activation1d(SnakeBeta), block.1/3 = WN convs."""
    return {
        "snake1": {
            "alpha": _get(sd, _join(prefix, "block.0.act.alpha")).astype(np.float32),
            "beta": _get(sd, _join(prefix, "block.0.act.beta")).astype(np.float32),
        },
        "conv1": _conv1d(sd, _join(prefix, "block.1"), weight_norm=True),
        "snake2": {
            "alpha": _get(sd, _join(prefix, "block.2.act.alpha")).astype(np.float32),
            "beta": _get(sd, _join(prefix, "block.2.act.beta")).astype(np.float32),
        },
        "conv2": _conv1d(sd, _join(prefix, "block.3"), weight_norm=True),
    }


def convert_frame_stack_down(sd, cfg: SampleStackConfig, prefix="downsample") -> dict:
    return {
        "in_proj": _conv1d(sd, _join(prefix, "in_proj"), weight_norm=True),
        "res_blocks": [
            _residual_unit(sd, _join(prefix, f"res_blocks.{i}")) for i in range(len(cfg.dilations))
        ],
        "to_latent": _conv1d(sd, _join(prefix, "to_latent"), weight_norm=True),
    }


def convert_frame_stack_up(sd, cfg: SampleStackConfig, prefix="upsample") -> dict:
    return {
        "from_latent": _conv1d(sd, _join(prefix, "from_latent"), weight_norm=True),
        "res_blocks": [
            _residual_unit(sd, _join(prefix, f"res_blocks.{i}")) for i in range(len(cfg.dilations))
        ],
        "to_stacked": _conv1d(sd, _join(prefix, "to_stacked"), weight_norm=True),
    }


def _convnext_block(sd, prefix) -> dict:
    dw = _get(sd, _join(prefix, "dwconv.weight"))  # (C, 1, 7)
    return {
        "dwconv": {
            "w": np.transpose(dw, (2, 1, 0)).astype(np.float32),  # (7, 1, C)
            "b": _get(sd, _join(prefix, "dwconv.bias")).astype(np.float32),
        },
        "norm": _layer_norm(sd, _join(prefix, "norm")),
        "pw1": _linear(sd, _join(prefix, "pwconv1")),
        "pw2": _linear(sd, _join(prefix, "pwconv2")),
        "gamma": _get(sd, _join(prefix, "gamma")).astype(np.float32),
    }


def convert_vocos(sd, cfg: VocosConfig, prefix="vocos") -> dict:
    blocks = [
        _convnext_block(sd, _join(prefix, f"backbone.convnext.{i}")) for i in range(cfg.num_layers)
    ]
    return {
        "embed": _conv1d(sd, _join(prefix, "backbone.embed")),
        "norm": _layer_norm(sd, _join(prefix, "backbone.norm")),
        "blocks": _stack(blocks),
        "final_ln": _layer_norm(sd, _join(prefix, "backbone.final_layer_norm")),
        "head": _linear(sd, _join(prefix, "head.out")),
    }


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: CodecConfig) -> dict:
    """Full reference AudioCodec state dict -> TPU codec param tree."""
    return {
        "encoder": convert_encoder(sd, cfg.acoustic_encoder),
        "downsample": convert_frame_stack_down(sd, cfg.downsample),
        "upsample": convert_frame_stack_up(sd, cfg.upsample),
        "decoder": convert_decoder(sd, cfg.acoustic_decoder),
        "vocos": convert_vocos(sd, cfg.vocos),
    }


def param_checksum_report(params: dict) -> str:
    """Per-tensor integrity report: path, shape, mean/std, and a checksum.

    Emitted on checkpoint load so parity against the published
    ``SimWhisperCodec.pt`` is a one-command check (compare reports between
    hosts/frameworks; reference load: model.py:375-396).
    """
    import jax

    lines = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        a = np.asarray(leaf, np.float64)
        crc = np.uint32(
            np.bitwise_xor.reduce(np.frombuffer(np.asarray(leaf, np.float32).tobytes(), np.uint32))
        ) if a.size else np.uint32(0)
        lines.append(
            f"{jax.tree_util.keystr(path):64s} {str(list(np.shape(leaf))):20s} "
            f"mean={a.mean() if a.size else 0.0:+.6e} std={a.std() if a.size else 0.0:.6e} "
            f"xor32={int(crc):08x}"
        )
    return "\n".join(lines)


def load_codec_params(ckpt_path: str, cfg: CodecConfig, report: bool = True) -> dict:
    """One-call loader: torch .pt -> params pytree (numpy leaves).

    Logs the per-tensor checksum report (INFO) unless ``report=False``.
    """
    params = convert_state_dict(load_torch_state_dict(ckpt_path), cfg)
    if report:
        import logging

        logging.getLogger(__name__).info(
            "checkpoint %s tensor report:\n%s", ckpt_path, param_checksum_report(params)
        )
    return params


# ---------------------------------------------------------------------------
# Native (Orbax) checkpointing for the TPU framework itself.
# ---------------------------------------------------------------------------

def save_orbax(path: str, params) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), params, force=True)


def load_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), like)
