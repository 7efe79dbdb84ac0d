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
_SPMD = False


def tpu_lowering() -> bool:
    """True when tracing/lowering should take the TPU kernel paths."""
    return _FORCE_TPU or jax.default_backend() == "tpu"


def spmd_lowering() -> bool:
    """True when programs are being lowered for a multi-device mesh.

    Mosaic (Pallas) custom calls cannot be automatically partitioned by
    GSPMD — XLA raises `NotImplementedError: Mosaic kernels cannot be
    automatically partitioned` the moment a sharded program containing one
    compiles (found by tests/test_aot_multichip.py against a v5e-8
    topology; invisible on the CPU dryrun, where the kernels gate off).
    Every kernel call site therefore also gates on `not spmd_lowering()`
    and falls back to its XLA formulation under a mesh. Set by
    parallel.mesh.make_mesh (any mesh larger than one device) and the
    `translate --dp` path — i.e. before any step function is traced.
    shard_map-wrapping the kernels over the data axis would re-enable
    them; until that lands, multi-chip runs use the XLA paths."""
    return _SPMD


_MESH = None


def set_spmd_lowering(on, mesh=None):
    """Latch (or clear) the multi-device-lowering flag; returns the
    previous state. `mesh` (optional) registers the active mesh so kernel
    call sites can shard_map themselves instead of falling back — see
    data_shard_mesh().

    The return value is an opaque state token: pass it back as `on` to
    restore BOTH the flag and the registered mesh (`prev =
    set_spmd_lowering(True); ...; set_spmd_lowering(prev)`). A bare
    boolean `on` without `mesh` clears the mesh registration, so the
    token — not a bool — is what makes the save/restore idiom safe in a
    process that already latched a mesh."""
    global _SPMD, _MESH
    prev = (_SPMD, _MESH)
    if isinstance(on, tuple):
        _SPMD, _MESH = bool(on[0]), on[1]
    else:
        _SPMD = bool(on)
        _MESH = mesh if on else None
    return prev


def dp_shard_map(fn, in_specs, out_specs, mesh=None):
    """shard_map `fn` over `mesh` (default: the active pure-dp mesh,
    data_shard_mesh()). Manual over ALL mesh axes — the condition Mosaic
    custom calls require — so batch-parallel kernels keep running under
    data-parallel meshes (and head-parallel ones under tensor-parallel
    meshes, see head_shard_mesh)."""
    mesh = mesh if mesh is not None else data_shard_mesh()
    assert mesh is not None, "no shard_map-able mesh active"
    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
    return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_vma=False)


def data_shard_mesh():
    """The active mesh IF kernels can be shard_mapped over it: every axis
    must shard only the batch dim (pure data parallelism — a 1-D ("data",)
    serving mesh or an N x 1 ("data", "model") training mesh). Pallas
    kernels are embarrassingly parallel over batch, so under such a mesh
    the call sites wrap themselves in shard_map (manual over ALL axes,
    which is what Mosaic requires) and keep their speed-of-light paths;
    under a real model/tensor-parallel axis they fall back to XLA
    (spmd_lowering). Returns None when no such mesh is active."""
    if _MESH is None:
        return None
    sizes = dict(zip(_MESH.axis_names, _MESH.devices.shape))
    non_data = [a for a, n in sizes.items() if a != "data" and n > 1]
    return None if non_data else _MESH


def head_shard_mesh():
    """The active mesh IF the attention-kernel call site can shard_map over
    it with batch on "data" and attention HEADS on "model" — i.e. only the
    canonical ("data",) / ("data", "model") axis layouts (any other axis
    name means a mesh this framework didn't build; fall back). The "model"
    axis carrying heads is specific to the transformer attention call site
    (parallel/mesh.py TP rules shard QKV kernels on the head dim);
    LongDocLM — which uses "model" for sequence/context parallelism —
    computes its own block attention and never reaches that call site.
    The caller still checks batch/head divisibility by the axis sizes."""
    if _MESH is None:
        return None
    if any(a not in ("data", "model") for a in _MESH.axis_names):
        return None
    return _MESH


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
