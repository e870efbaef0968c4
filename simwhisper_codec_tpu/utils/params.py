"""Parameter accounting (reference utils/helpers.py:12-51 count_params_by_module)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def count_params_by_module(params: dict) -> Dict[str, int]:
    """Per-top-level-module parameter counts, plus 'total'."""
    out = {k: count_params(v) for k, v in params.items()}
    out["total"] = sum(out.values())
    return out


def format_param_report(params: dict) -> str:
    counts = count_params_by_module(params)
    total = counts.pop("total")
    lines = [f"{'module':<16}{'params':>14}"]
    for k in sorted(counts, key=lambda k: -counts[k]):
        lines.append(f"{k:<16}{counts[k]:>14,}")
    lines.append(f"{'total':<16}{total:>14,}")
    return "\n".join(lines)
