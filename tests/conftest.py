"""Test harness configuration.

Runs all tests on the CPU backend with 8 virtual devices so sharding tests
exercise multi-chip code paths without TPU hardware. The ambient
environment preloads JAX with a tunneled TPU platform ("axon") via
sitecustomize, so the env-var route is too late — use jax.config before any
backend is initialized instead.
"""

import os
import sys

import jax

if os.environ.get("GNSS_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_sample_file(name: str) -> str | None:
    """Path to a recorded IF fixture from the reference repo, if present."""
    path = os.path.join(REFERENCE_DIR, "src/tests/signal_samples", name)
    return path if os.path.exists(path) else None
