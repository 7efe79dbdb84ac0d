"""Device mesh + sharding story.

Replaces the reference's parallelism layer wholesale:
- parallel.py's single-process scatter/no-gather DataParallel (parallel.py:70-195)
  and threaded per-replica criterion (parallel.py:151-254) -> batch-dim
  sharding over a named mesh; the loss stays sharded and reduces via the jit
  program itself (sum + count, see ops/losses.py).
- the NCCL DistributedDataParallel path (utils.py:93-97, known broken,
  README.md:120) -> XLA collectives over ICI, inserted by the compiler from
  sharding annotations. No hand-written communication code exists anywhere in
  this framework.

Axes:
- "data": batch-dim data parallelism (gradients all-reduce over ICI)
- "model": tensor parallelism over attention heads and FFN hidden — a new
  capability, the reference has nothing comparable (SURVEY §2.8). The same
  axis doubles as the SEQUENCE axis for the long-document LM's context
  parallelism (models/longdoc.py) and as the PIPELINE-stage axis under
  `--pp-microbatches` (parallel/pipeline.py).
"""

from __future__ import annotations

import os
import re
import warnings
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_UP = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up: `jax.distributed.initialize` gated on explicit
    arguments or the standard env vars. Replaces the reference's NCCL
    process-group init (utils.py:93-97, driven by --local_rank) — after this
    `jax.devices()` spans every host in the slice and the same mesh/pjit code
    runs unchanged; XLA routes collectives over ICI/DCN.

    Called automatically by the training CLIs. Returns True when a
    multi-process runtime was initialized, False for single-process runs.
    On TPU pods (JAX_COORDINATOR_ADDRESS or TPU metadata present) the
    argument-less initialize() autodetects everything.
    """
    global _DISTRIBUTED_UP
    if _DISTRIBUTED_UP:
        return True
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False  # single process — nothing to do
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _DISTRIBUTED_UP = True
    return True


def parse_mesh(spec: Optional[str]) -> Optional[Mesh]:
    """CLI `--mesh` parser: "4x2" -> 4-way data x 2-way model mesh;
    "8" or "8x1" -> pure data parallel; "" / None -> no mesh (single chip).
    "auto" -> all devices on the data axis."""
    if not spec:
        return None
    if spec == "auto":
        return make_mesh()
    m = re.fullmatch(r"(\d+)(?:x(\d+))?", spec)
    if not m:
        raise ValueError(f"bad --mesh spec {spec!r}; expected e.g. 8, 4x2, auto")
    n_data = int(m.group(1))
    n_model = int(m.group(2) or 1)
    return make_mesh(n_data, n_model)


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    mesh = Mesh(arr, ("data", "model"))
    if n_data * n_model > 1:
        # Mosaic kernels can't be GSPMD-partitioned; latch BEFORE any step
        # function is traced. Registering the mesh lets kernel call sites
        # shard_map themselves over pure-dp meshes instead of falling back
        # (ops/runtime.py::spmd_lowering / data_shard_mesh).
        from imagetranslate_tpu.ops import runtime

        runtime.set_spmd_lowering(True, mesh=mesh)
    return mesh


# Parameter partitioning by path, matched against the flax param path string.
# DenseGeneral QKV kernels are [E, H, D] (shard heads), attention out kernels
# are [H, D, E], FFN kernels [E, F]/[F, E] shard the hidden F dim, embeddings
# and vocab projections shard the vocab dim.
_TP_RULES = [
    (r"(query|key|value)/kernel$", P(None, "model", None)),
    (r"(query|key|value)/bias$", P("model", None)),
    (r"self_attn/out/kernel$|cross_attn/out/kernel$", P("model", None, None)),
    (r"attn/out/bias$", P()),
    (r"intermediate/kernel$", P(None, "model")),
    (r"intermediate/bias$", P("model")),
    (r"ffn/output/kernel$", P("model", None)),
    (r"ffn/output/bias$", P()),
    # Expert parallelism (models/moe.py): stacked expert banks shard the
    # leading EXPERT dim over "model"; GSPMD lowers the one-hot dispatch
    # einsum as an all-to-all. The fp32 router stays replicated (default).
    (r"ffn/wi$|ffn/wo$", P("model", None, None)),
    (r"ffn/bi$|ffn/bo$", P("model", None)),
    (r"embeddings/word/embedding$", P("model", None)),
    (r"output_layers?_?\d*/proj/kernel$", P(None, "model")),
    (r"proj/bias$", P("model")),
]


def param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the model param tree."""

    def to_path_str(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)

    fallbacks = []

    def assign(path, leaf):
        p = to_path_str(path)
        spec = param_spec(p)
        # Guard: dims not divisible by the mesh axis fall back to replication
        # — LOUDLY, so "TP" can't silently degrade to pure DP.
        sizes = dict(mesh.shape)
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % sizes.get(axis, 1) != 0:
                if spec != P():
                    fallbacks.append((p, leaf.shape, spec))
                return NamedSharding(mesh, P())
        if len(spec) > len(leaf.shape):
            if spec != P():
                fallbacks.append((p, leaf.shape, spec))
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    out = jax.tree_util.tree_map_with_path(assign, params)
    if fallbacks:
        lines = "\n".join(f"  {p} shape={s} wanted {spec}"
                          for p, s, spec in fallbacks[:8])
        warnings.warn(
            f"{len(fallbacks)} tensor-parallel params fell back to "
            f"replication (dims not divisible by the model axis); this mesh "
            f"runs those layers as pure data parallel:\n{lines}",
            stacklevel=2)
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data sharding for every batch array."""
    return NamedSharding(mesh, P("data"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, sequence) sharding for context parallelism: the "model"
    axis shards the SEQUENCE dim of activations (params stay replicated
    on it). Used by the long-document LM, whose block-local attention
    makes the per-layer halo a single neighbor-block collective-permute
    (models/longdoc.py::LongDocLM.seq_sharding)."""
    return NamedSharding(mesh, P("data", "model"))


def model_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape.get("model", 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sh: NamedSharding):
    """Place a host-GLOBAL value onto a (possibly multi-process) sharding.

    Single process: plain device_put. Multi-process: device_put with a
    sharding that spans other hosts' devices both relies on every process
    holding a bit-identical copy and uploads nothing less than what a
    callback would — `jax.make_array_from_callback` instead materializes
    ONLY this process's addressable shards (each host H2Ds 1/P of the
    batch), which is the host-side input scaling a multi-host run needs.
    Every process must still hold the full global value (the batchers are
    deterministic per epoch_seed, so all ranks build identical batches);
    only the device transfer is per-process.

    Arrays that already carry the requested sharding pass through — the
    trainers stage image tensors in the prefetch worker (already sharded)
    and the consumer re-shards the assembled batch dict; without the
    pass-through that second call would np.asarray a non-addressable
    global Array and crash every multi-host multimodal run."""
    if isinstance(x, jax.Array) and x.sharding == sh:
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    import numpy as np

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        raise ValueError(
            "put_global: cannot reshard a cross-process array from "
            f"{x.sharding} to {sh}; stage host values once, or reshard "
            "inside a jitted computation.")
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    if jax.process_count() == 1:
        return jax.device_put(params, shardings)
    return jax.tree.map(put_global, params, shardings)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)

    def put(x):
        return put_global(x, sh) if getattr(x, "ndim", 0) >= 1 else x

    return {k: put(v) for k, v in batch.items()}


_REPLICATION_WARNED: set = set()


def shard_batch_safe(batch: dict, mesh: Mesh) -> dict:
    """shard_batch, but arrays whose leading dim does not divide the data
    axis are replicated instead (always semantically correct — e.g. the
    >=30-row contrastive negative pool). Replicating a LARGE array loses
    data parallelism for that batch, so it warns once per (key, rows)
    pair — same loudness principle as param_shardings' fallback."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n_data = mesh.shape.get("data", 1)

    def put(k, v):
        if getattr(v, "ndim", 0) < 1:
            return v
        if v.shape[0] % n_data == 0:
            return put_global(v, sh)
        if v.ndim >= 2 and (k, v.shape[0]) not in _REPLICATION_WARNED:
            _REPLICATION_WARNED.add((k, v.shape[0]))
            import warnings

            warnings.warn(
                f"shard_batch_safe: batch[{k!r}] has {v.shape[0]} rows, not "
                f"divisible by the data axis ({n_data}); replicating — data "
                "parallelism is lost for this shape (memory-capped bucket? "
                "see loader._batch_rows).", stacklevel=2)
        return put_global(v, rep)

    return {k: put(k, v) for k, v in batch.items()}


def zero_shard_opt_state(opt_state, mesh: Mesh, min_size: int = 4096):
    """ZeRO-1: shard optimizer-state tensors (Adam mu/nu, MultiSteps grad-
    accumulation buffers) over the DATA axis. The reference has nothing
    comparable (SURVEY §2.8 lists ZeRO as absent); on TPU it is pure
    placement: annotate the moments' shardings and XLA turns the gradient
    all-reduce into reduce-scatter (to update the local moment shard) +
    all-gather (to rebuild the replicated params) — the classic ZeRO-1
    dataflow, no step-code changes.

    Per array leaf: add "data" to the first dim that is currently unsharded
    and divisible by the data-axis size, keeping existing tensor-parallel /
    pipeline-stage placements intact. Scalars, small leaves (< min_size
    elements, e.g. LayerNorm moment vectors) and leaves with no divisible
    dim stay as they are — replication is always semantically correct.

    Saves ~2·P·(1 - 1/D) fp32 bytes per device of Adam state (plus the
    accumulation buffer under --acc)."""
    specs = zero_opt_shardings(opt_state, mesh, min_size=min_size)

    def put(leaf, sh):
        return jax.device_put(leaf, sh) if isinstance(sh, NamedSharding) \
            else leaf

    return jax.tree.map(put, opt_state, specs)


def zero_opt_shardings(opt_state, mesh: Mesh, min_size: int = 4096):
    """The sharding tree zero_shard_opt_state applies: a NamedSharding for
    every leaf that gains the data axis, the string "keep" for leaves left
    alone (a non-None sentinel keeps the pytree structures aligned). Works
    on concrete arrays or jax.ShapeDtypeStructs (AOT compile checks)."""
    n_data = mesh.shape.get("data", 1)

    def spec_of(leaf):
        if n_data <= 1:
            return "keep"
        shape = getattr(leaf, "shape", ())
        if len(shape) < 1 or int(np.prod(shape)) < min_size:
            return "keep"
        spec = (list(leaf.sharding.spec)
                if isinstance(getattr(leaf, "sharding", None), NamedSharding)
                else [])
        spec += [None] * (len(shape) - len(spec))
        if any(a is not None and "data" in (a if isinstance(a, tuple)
                                            else (a,)) for a in spec):
            return "keep"
        for d in range(len(shape)):
            if spec[d] is None and shape[d] % n_data == 0:
                spec[d] = "data"
                return NamedSharding(mesh, P(*spec))
        return "keep"

    return jax.tree.map(spec_of, opt_state)
