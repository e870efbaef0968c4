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


_REPO_VERSION: Optional[str] = None


def _repo_version() -> str:
    """Current source identity (git HEAD + a digest of any uncommitted diff),
    so artifacts invalidate on code changes — without it a stale executable
    would silently serve pre-fix numerics, including from a dirty working
    tree.  Falls back to the package dir mtime hash outside a checkout."""
    global _REPO_VERSION
    if _REPO_VERSION is None:
        import subprocess

        root = Path(__file__).resolve().parents[2]
        try:
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=root, capture_output=True,
                text=True, timeout=10, check=True,
            ).stdout.strip()
            # restrict the dirty digest to files that can affect numerics —
            # a full-tree diff would invalidate the cache on every unrelated
            # change (PROGRESS.jsonl is appended by the round driver every
            # few minutes, docs artifacts churn constantly)
            diff = subprocess.run(
                ["git", "diff", "HEAD", "--", "*.py", "*.cpp", "*.cc", "*.h",
                 "*.hpp", "*.yaml"],
                cwd=root, capture_output=True, text=True, timeout=10, check=True,
            ).stdout
            if diff:
                head += "+" + hashlib.sha256(diff.encode()).hexdigest()[:12]
            _REPO_VERSION = head
        except Exception:
            stamps = sorted(
                (p.name, p.stat().st_mtime_ns)
                for p in (root / "simwhisper_codec_tpu").rglob("*.py")
            )
            _REPO_VERSION = hashlib.sha256(repr(stamps).encode()).hexdigest()[:16]
    return _REPO_VERSION


def _cache_key(tag: str, fingerprint: str, args, kwargs) -> str:
    import numpy as np

    avals = jax.tree.map(
        lambda x: (tuple(np.shape(x)), str(getattr(x, "dtype", type(x).__name__))),
        (args, kwargs),
    )
    dev = jax.devices()[0]
    blob = repr((tag, fingerprint, avals, jax.__version__, _repo_version(),
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
        self._by_key: dict = {}  # aval-signature key -> loaded executable
        self.source: Optional[str] = None  # last resolve: "warm" | "cold"

    def _try_load(self, path: Path):
        if not path.exists():
            return None
        try:
            compiled = load_compiled(path)
            logger.info("AOT warm start for %s from %s", self._tag, path)
            return compiled
        except Exception as e:
            logger.warning("AOT artifact %s unusable (%s); recompiling", path, e)
            return None

    def _compile_fresh(self, path: Path, args, kwargs):
        compiled = self._jitted.lower(*args, **kwargs).compile()
        self.source = "cold"
        try:
            self._aot_dir.mkdir(parents=True, exist_ok=True)
            dump_compiled(compiled, path)
            logger.info("AOT artifact written: %s", path)
        except Exception as e:  # serialization unsupported on this backend
            logger.warning("executable serialization unavailable (%s)", e)
        return compiled

    @staticmethod
    def _aval_sig(args, kwargs):
        """Cheap per-call signature: leaf shapes/dtypes (no hashing/repr —
        the sha256 key costs ~1-2 ms on a full params tree, which would bias
        timed serving loops; this is a ~50 us traversal)."""
        import numpy as np

        return tuple(
            (np.shape(x), str(getattr(x, "dtype", type(x).__name__)))
            for x in jax.tree_util.tree_leaves((args, kwargs))
        )

    def __call__(self, *args, **kwargs):
        if self._aot_dir is None:
            return self._jitted(*args, **kwargs)
        # per-signature executables: a new batch shape resolves its own
        # artifact instead of disabling AOT
        sig = self._aval_sig(args, kwargs)
        compiled = self._by_key.get(sig)
        if compiled is not None:
            return compiled(*args, **kwargs)
        key = _cache_key(self._tag, self._fingerprint, args, kwargs)
        path = self._aot_dir / f"{self._tag}-{key}.jaxexe"
        compiled = self._try_load(path)
        if compiled is not None:
            self.source = "warm"
            # validate the deserialized executable on its first call: a
            # platform whose device topology can't execute the artifact
            # (e.g. forced multi-device host platforms) raises here —
            # recompile once and refresh the artifact.  Later calls run
            # the executable directly, so real runtime errors propagate.
            try:
                out = compiled(*args, **kwargs)
                self._by_key[sig] = compiled
                return out
            except Exception as e:
                logger.warning(
                    "warm executable for %s not runnable here (%s); "
                    "recompiling", self._tag, e)
        compiled = self._compile_fresh(path, args, kwargs)
        self._by_key[sig] = compiled
        return compiled(*args, **kwargs)
