"""Test harness config.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding story is
exercised without TPU hardware (the reference had no multi-device tests at
all — its multi-GPU path was documented broken, README.md:120). Must set the
XLA flags before jax initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
