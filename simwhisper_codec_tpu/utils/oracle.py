"""Import helpers for the read-only upstream reference oracle.

The reference package (`/root/reference/audiocodec`) imports torchaudio at
module scope for two mel helpers it never calls in the production classes
(`audiocodec/nn/modules.py:21`); torchaudio is not installed in this image,
so importing the oracle needs a minimal shim.  Shared by the test harness
(`tests/conftest.py`) and the release-readiness drill
(`tools/release_check.py`).
"""

from __future__ import annotations

import sys
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def add_reference_to_path(reference_root: Path = REFERENCE_ROOT) -> bool:
    """Make the upstream reference importable as an oracle; returns whether
    the reference tree is mounted."""
    if not reference_root.exists():
        return False
    if str(reference_root) not in sys.path:
        sys.path.insert(0, str(reference_root))
    try:
        import torchaudio  # noqa: F401
    except ImportError:
        _install_torchaudio_shim()
    return True


def _install_torchaudio_shim() -> None:
    import importlib.machinery
    import math
    import types

    ta = types.ModuleType("torchaudio")
    functional = types.ModuleType("torchaudio.functional")
    inner = types.ModuleType("torchaudio.functional.functional")

    def _hz_to_mel(freq, mel_scale="htk"):
        return 2595.0 * math.log10(1.0 + freq / 700.0)

    def _mel_to_hz(mels, mel_scale="htk"):
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)

    for mod in (ta, functional, inner):
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, loader=None)
    inner._hz_to_mel = _hz_to_mel
    inner._mel_to_hz = _mel_to_hz
    functional.functional = inner
    ta.functional = functional
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = functional
    sys.modules["torchaudio.functional.functional"] = inner
