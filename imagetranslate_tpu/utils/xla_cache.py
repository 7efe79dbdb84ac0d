"""Persistent-XLA-cache enablement that works under eager-jax-import hosts.

Round-3 shipped a ``force_enable()`` latch for jax's platform-allowlist
gate, flagged "NOT yet validated". Round-4 validation on the axon TPU found
the premise obsolete and the real bug elsewhere:

- the axon backend reports ``platform == "tpu"``, ``runtime_type ==
  "pjrt_ifrt"`` and ``supports_executable_serialization == True`` — jax
  0.9.0's ``is_cache_used`` gate passes with no latch at all;
- the cache never engaged because this image's sitecustomize imports jax at
  interpreter start, so ``JAX_COMPILATION_CACHE_DIR`` set from Python (the
  ``os.environ.setdefault`` pattern in bench/CLIs) arrives AFTER jax's
  config captured its env — ``config.compilation_cache_dir`` stays None and
  every write logs "cache is disabled/not initialized" at DEBUG. This is
  why every round-3 process recompiled everything (70-147 s per program).

``enable_persistent_cache(path)`` fixes it the supported way: a runtime
``jax.config.update``, valid at any point before (or even after) the first
compile. Measured on the axon TPU: cold 1.97 s -> warm 0.62 s on a small
probe program, entries written and reloaded across processes.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "imagetranslate_tpu_xla")


def enable_persistent_cache(path: Optional[str] = None) -> str:
    """Point jax's persistent compilation cache at `path` via runtime
    config (immune to the env-var capture-timing trap above). Honors an
    explicit argument over $JAX_COMPILATION_CACHE_DIR over the package
    default. Returns the directory in effect.

    jax latches BOTH the one-shot "is the cache used" decision and the
    cache OBJECT (pinned to whatever dir was configured at the process's
    first compile) — so on a process that already compiled anything, a
    config update alone silently writes nowhere, or to the OLD directory
    (caught by the full-suite ordering of tests/test_xla_cache.py).
    reset_cache() clears both; the next compile re-evaluates against the
    current config. Resetting an already-correct cache only drops its
    in-memory handle, which jax rebuilds on the next compile.

    The directory is PARTITIONED by the process's platform profile
    (`jax.config.jax_platforms`, read without initializing a backend):
    jax's cache key does not capture the CPU target-feature set, and CPU
    executables compiled in a TPU-plugin process ("axon,cpu") loaded into
    a pure-CPU process ("cpu") carry mismatched feature profiles — the
    loader warns about SIGILL, and in practice a poisoned 8-device
    collective DEADLOCKED the test suite in an XLA CHECK failure
    (xla::cpu::InProcessCommunicator::AllReduce rendezvous timeout).
    Same-profile processes still share entries, which is the case that
    pays (TPU bench/CLI reruns)."""
    import jax

    base = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_DIR)
    try:
        plats = jax.config.jax_platforms
    except Exception:
        plats = None
    tag = (plats or "default").replace(",", "-").replace("/", "_")
    full = os.path.join(base, tag)
    os.makedirs(full, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", full)
    try:
        from jax._src import compilation_cache as cc

        cc.reset_cache()
    except Exception as e:  # jax internals moved — config update stands
        logger.warning("could not reset the XLA cache latch (jax internals "
                       "changed?): %s", e)
    return full


def maybe_enable_from_env() -> Optional[str]:
    """enable_persistent_cache() iff $JAX_COMPILATION_CACHE_DIR is set —
    the caller expressed intent through the env var; mirroring it into
    jax.config makes that intent effective under sitecustomize hosts.
    Never imports jax otherwise."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return enable_persistent_cache()
    return None


def force_enable() -> bool:  # pragma: no cover - compatibility shim
    """Deprecated round-3 latch, kept so old call sites don't crash:
    the allowlist gate it patched passes naturally on this jax/backend
    (see module docstring). Now simply enables the cache."""
    enable_persistent_cache()
    return True


def maybe_force_enable_from_env() -> bool:
    """Back-compat: IMAGETRANSLATE_FORCE_XLA_CACHE=1 now routes to
    enable_persistent_cache()."""
    if os.environ.get("IMAGETRANSLATE_FORCE_XLA_CACHE") == "1":
        return force_enable()
    return False
