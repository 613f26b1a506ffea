"""Test harness configuration.

Runs all tests on the CPU backend with 8 virtual devices so sharding tests
exercise multi-chip code paths without TPU hardware. Must set the
environment before the first ``import jax`` anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_sample_file(name: str) -> str | None:
    """Path to a recorded IF fixture from the reference repo, if present."""
    path = os.path.join(REFERENCE_DIR, "src/tests/signal_samples", name)
    return path if os.path.exists(path) else None
