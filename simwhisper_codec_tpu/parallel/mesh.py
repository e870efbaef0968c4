"""Mesh construction and sharding rules for the codec.

The reference has no parallelism beyond DDP scaffolding for an unreleased
trainer (SURVEY.md §2.5; ``utils/helpers.py:113-207``, NCCL implied at
``modules.py:911-913``).  The TPU-native replacement is single-controller
JAX over a ``Mesh``:

 - ``data``  axis: batch-sharded (DP) — gradients all-reduce over ICI.
 - ``model`` axis: tensor parallel — attention heads and FFN/intermediate
   dims are sharded; XLA inserts the all-reduces after ``o``-proj / ``fc2``.

Sequence-parallel regions fall out of the activation sharding constraints on
(B, T, D) tensors; expert/pipeline parallelism do not apply to this densely
connected 290M codec (no MoE, 12-layer stacks too shallow to pipeline
usefully — DP x TP covers the scaling story).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """Create a (data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_axis != 0:
        raise ValueError(f"n_devices {n} not divisible by model_axis {model_axis}")
    if len(devices) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but only {len(devices)} are visible "
            f"({devices[0].platform}); on a single-chip host, bootstrap a virtual CPU "
            "platform first (XLA_FLAGS=--xla_force_host_platform_device_count=N in a "
            "fresh process — see __graft_entry__.dryrun_multichip)"
        )
    arr = np.array(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def param_sharding_rules(path_str: str) -> P:
    """PartitionSpec for a parameter identified by its tree path.

    Transformer (stacked with leading layer axis L):
      q/k/v.w (L, D, D)   -> shard output dim (heads)   over 'model'
      o.w     (L, D, D)   -> shard input dim            over 'model'
      fc1.w   (L, D, F)   -> shard F                    over 'model'
      fc2.w   (L, F, D)   -> shard F                    over 'model'
    Vocos ConvNeXt (stacked):
      pw1.w   (L, D, I)   -> shard I over 'model';  pw2.w (L, I, D) likewise.
    Everything else is replicated (conv stems, norms, biases are tiny).
    """
    parts = path_str.split("/")
    leaf = parts[-1]
    if leaf != "w":
        # small vectors: replicate (biases, norms, snake alphas, gammas)
        return P()
    name = parts[-2]
    if name in ("q", "k", "v", "fc1", "pw1"):
        return P(None, None, "model") if "layers" in parts or "blocks" in parts else P(None, "model")
    if name in ("o", "fc2", "pw2"):
        return P(None, "model", None) if "layers" in parts or "blocks" in parts else P("model", None)
    return P()


def _path_to_str(path) -> str:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return "/".join(out)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh according to the sharding rules."""

    def place(path, x):
        spec = param_sharding_rules(_path_to_str(path))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree matching ``shard_params`` (for jit in/out specs)."""

    def spec(path, x):
        return NamedSharding(mesh, param_sharding_rules(_path_to_str(path)))

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over 'data' (activations replicated over 'model')."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
