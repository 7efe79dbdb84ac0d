"""Test harness config.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding story is
exercised without TPU hardware (the reference had no multi-device tests at
all — its multi-GPU path was documented broken, README.md:120).

Note: this image's axon sitecustomize calls jax.config.update('jax_platforms',
'axon,cpu') at interpreter start, overriding the JAX_PLATFORMS env var — so
the CPU override must go through jax.config too, before any backend init.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-compile tests (detector graphs, goldens)")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_spmd_latch():
    """make_mesh latches a process-global SPMD flag (ops/runtime.py) —
    correct in production (one mesh per process), but in the shared pytest
    process a mesh-creating test would silently flip later kernel-gate
    tests to their fallback paths. Reset before every test."""
    from imagetranslate_tpu.ops import runtime

    runtime.set_spmd_lowering(False)
    yield
