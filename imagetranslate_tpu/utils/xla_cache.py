"""Persistent-XLA-cache enablement for non-allowlisted PJRT platforms.

jax gates the persistent compilation cache on ``backend.platform in
{"tpu", "gpu", "cpu", "neuron"}`` (jax._src.compilation_cache.is_cache_used).
Experimental platform plugins — like the tunneled ``axon`` TPU used in this
environment — report a different platform name, so every process silently
recompiles every program (70-147 s each for the big jitted steps) even with
``JAX_COMPILATION_CACHE_DIR`` set.

``force_enable()`` flips the module's one-shot "is the cache usable" latch
to True before the first compile, which makes jax treat the backend like
any other cache-supported platform. It is deliberately opt-in — call it
directly, or set ``IMAGETRANSLATE_FORCE_XLA_CACHE=1`` in the environment
(checked by ``maybe_force_enable_from_env()``, which the package
``__init__`` invokes). If the plugin's executables do not support
serialization the cache write degrades into a logged warning per program,
and a corrupted/stale entry can be cleared by deleting the cache dir.

NOT yet validated on the axon TPU (the tunnel was down when this landed);
treat as experimental until a two-process warm-start test confirms
executables serialize and reload on this plugin.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def force_enable() -> bool:
    """Mark the persistent compilation cache usable regardless of the
    backend's platform name. Returns True if the latch was set. Must run
    before the first jit compile of the process (later calls are no-ops
    because jax caches the decision at first use)."""
    try:
        from jax._src import compilation_cache as cc

        # Attribute assignment can't fail, so verify the latch variables
        # actually exist — a jax rename would otherwise create orphan
        # attributes and falsely report success.
        if not (hasattr(cc, "_cache_checked") and hasattr(cc, "_cache_used")
                and hasattr(cc, "_cache_initialized_mutex")):
            raise AttributeError(
                "compilation_cache latch variables not found")
        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = True
        return True
    except Exception as e:  # jax internals moved — degrade to default
        logger.warning("could not force-enable the XLA persistent cache "
                       "(jax internals changed?): %s", e)
        return False


def maybe_force_enable_from_env() -> bool:
    """force_enable() iff IMAGETRANSLATE_FORCE_XLA_CACHE=1 is set."""
    import os

    if os.environ.get("IMAGETRANSLATE_FORCE_XLA_CACHE") == "1":
        return force_enable()
    return False
