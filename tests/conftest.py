"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

This substitutes for multi-chip TPU hardware when testing `jax.sharding`
layouts (the reference has no distributed tests at all; see SURVEY.md §4).
"""

import os
import sys
from pathlib import Path

# Must run before any jax import anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = REFERENCE_ROOT.exists()


def add_reference_to_path():
    """Make the read-only upstream reference importable as a test oracle."""
    if HAS_REFERENCE and str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))
