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
  capability, the reference has nothing comparable (SURVEY §2.8).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


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

    def assign(path, leaf):
        spec = param_spec(to_path_str(path))
        # Guard: dims not divisible by the mesh axis fall back to replication.
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % sizes.get(axis, 1) != 0:
                return NamedSharding(mesh, P())
        if len(spec) > len(leaf.shape):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data sharding for every batch array."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh) if getattr(x, "ndim", 0) >= 1 else x

    return {k: put(v) for k, v in batch.items()}
