"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

This substitutes for multi-chip TPU hardware when testing `jax.sharding`
layouts (the reference has no distributed tests at all; see SURVEY.md §4).
"""

import os
import sys
from pathlib import Path

# Must run before any jax import anywhere in the test session.  The ambient
# environment may pin JAX_PLATFORMS to a TPU platform — tests always run on
# the virtual multi-device CPU backend, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The ambient axon/TPU platform wrapper ignores JAX_PLATFORMS; pin via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")
HAS_REFERENCE = REFERENCE_ROOT.exists()


def add_reference_to_path():
    """Make the read-only upstream reference importable as a test oracle
    (shim shared with tools/release_check.py)."""
    from simwhisper_codec_tpu.utils.oracle import add_reference_to_path as _add

    _add(REFERENCE_ROOT)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy oracle/e2e tests (>30 s); core tier = -m 'not slow'",
    )
