"""AOT warm-start: serialize compiled executables to disk and reload them.

Full-size program compiles through the tunneled backend cost ~23 s per
codec direction and ~15 min for the GAN train step (docs/TPU_NOTES.md), and
the standard JAX compilation cache is unusable there (cache *reads* hang the
tunnel — quirk #11 area).  This module sidesteps the cache path entirely
with PjRt executable serialization (``jax.experimental.serialize_executable``):
``warm_jit`` compiles once, writes the loaded executable to disk, and later
sessions deserialize it directly — no XLA compile at all.

The artifact is backend- and version-specific, so the cache key hashes the
jaxlib version, device kind + count, and a caller-supplied config fingerprint
alongside the input avals; a mismatch or a failed deserialize falls back to a
fresh compile (and refreshes the artifact).  Set the environment variable
``SIMWHISPER_AOT_DIR`` (or pass ``aot_dir``) to opt in; without it behavior
is exactly ``jax.jit``.
"""

from __future__ import annotations

import hashlib
import logging
import pickle
from pathlib import Path
from typing import Any, Callable, Optional

import jax

logger = logging.getLogger(__name__)


def _cache_key(tag: str, fingerprint: str, args, kwargs) -> str:
    import numpy as np

    avals = jax.tree.map(
        lambda x: (tuple(np.shape(x)), str(getattr(x, "dtype", type(x).__name__))),
        (args, kwargs),
    )
    dev = jax.devices()[0]
    blob = repr((tag, fingerprint, avals, jax.__version__,
                 dev.device_kind, len(jax.devices()))).encode()
    return hashlib.sha256(blob).hexdigest()[:24]


def dump_compiled(compiled, path: Path) -> None:
    """Serialize a loaded executable (+ in/out trees) to ``path``."""
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump({"payload": payload, "in_tree": in_tree, "out_tree": out_tree}, f)
    tmp.rename(path)


def load_compiled(path: Path):
    """Deserialize an executable written by :func:`dump_compiled`."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as f:
        blob = pickle.load(f)
    return se.deserialize_and_load(blob["payload"], blob["in_tree"], blob["out_tree"])


class warm_jit:
    """``jax.jit`` with disk-backed executable warm start.

    >>> tok = warm_jit(tokenize_fn, aot_dir="~/.cache/simwhisper",
    ...                tag="tokenize", fingerprint=cfg_fingerprint)
    >>> tok(params, wav, lengths)   # loads from disk if present, else compiles

    The first call resolves the executable (deserialize or trace+compile+dump);
    later calls dispatch straight to it.  Donated/static args are not
    supported — the codec's serving programs use neither.
    """

    def __init__(self, fn: Callable, aot_dir: Optional[str] = None,
                 tag: str = "fn", fingerprint: str = ""):
        self._fn = fn
        self._jitted = jax.jit(fn)
        self._aot_dir = Path(aot_dir).expanduser() if aot_dir else None
        self._tag = tag
        self._fingerprint = fingerprint
        self._compiled = None
        self.source: Optional[str] = None  # "warm" | "cold" | None (plain jit)

    def _resolve(self, args, kwargs):
        key = _cache_key(self._tag, self._fingerprint, args, kwargs)
        path = self._aot_dir / f"{self._tag}-{key}.jaxexe"
        if path.exists():
            try:
                self._compiled = load_compiled(path)
                self.source = "warm"
                logger.info("AOT warm start for %s from %s", self._tag, path)
                return
            except Exception as e:
                logger.warning("AOT artifact %s unusable (%s); recompiling", path, e)
        lowered = self._jitted.lower(*args, **kwargs)
        self._compiled = lowered.compile()
        self.source = "cold"
        try:
            self._aot_dir.mkdir(parents=True, exist_ok=True)
            dump_compiled(self._compiled, path)
            logger.info("AOT artifact written: %s", path)
        except Exception as e:  # serialization unsupported on this backend
            logger.warning("executable serialization unavailable (%s)", e)

    def __call__(self, *args, **kwargs):
        if self._aot_dir is None:
            return self._jitted(*args, **kwargs)
        if self._compiled is None:
            self._resolve(args, kwargs)
        try:
            return self._compiled(*args, **kwargs)
        except Exception as e:
            # aval mismatch vs the resolved executable: fall back to jit
            logger.warning("AOT executable rejected the call (%s); using jit", e)
            self._compiled = None
            self._aot_dir = None
            return self._jitted(*args, **kwargs)
