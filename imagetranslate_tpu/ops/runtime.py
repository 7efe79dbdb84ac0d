"""Lowering-target detection for backend-gated kernels.

Pallas kernels and their call-site gates need to know whether the code is
being lowered FOR a TPU. `jax.default_backend()` answers "what backend
does this process execute on", which is the right default — but it is
wrong under device-free AOT compilation (utils/aot.py): there the process
backend is CPU while the lowering target is the real XLA:TPU/Mosaic
compiler via a PJRT topology. `force_tpu_lowering()` lets the AOT
compile-checks (tests/test_aot_mosaic.py, tools) assert the TPU paths so
Mosaic actually validates the kernels instead of tracing interpret-mode
fallbacks.
"""

from __future__ import annotations

import contextlib

import jax

_FORCE_TPU = False


def tpu_lowering() -> bool:
    """True when tracing/lowering should take the TPU kernel paths."""
    return _FORCE_TPU or jax.default_backend() == "tpu"


@contextlib.contextmanager
def force_tpu_lowering():
    """Treat the lowering target as TPU regardless of the process backend
    (device-free AOT compiles). Affects trace-time decisions only.

    CAVEAT: the flag is consulted at trace time but is NOT part of any
    jit trace-cache key. Traces of module-level jitted functions created
    inside this context bake the TPU paths in; call `.clear_cache()` on
    any such function before it can be re-entered by normal CPU execution
    in the same process (see tests/test_aot_mosaic.py)."""
    global _FORCE_TPU
    prev = _FORCE_TPU
    _FORCE_TPU = True
    try:
        yield
    finally:
        _FORCE_TPU = prev
