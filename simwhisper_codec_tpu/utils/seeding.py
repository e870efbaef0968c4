"""Deterministic seeding (reference: speechbrain seed_everything at
hparams/train.yaml:12-13; the codec repo seeds nothing — SURVEY §5.2)."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42) -> int:
    """Seed python/numpy (and torch if importable); return the seed.

    JAX needs no global seeding — all randomness flows through explicit
    PRNG keys derived from this seed.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return seed
