"""Device-free TPU AOT compile-checking.

The axon-tunneled TPU in this environment compiles remotely, serves one
client at a time, and — learned the hard way in round 3 — a Mosaic
compile crash can wedge the tunnel for hours (docs/PERF.md "Decode step
anatomy"). But `libtpu.so` ships in the image, and PJRT supports
topology-only AOT compilation: we can run the REAL Mosaic/XLA:TPU
compiler locally against a v5e topology descriptor with no device, no
tunnel, and no risk. Every Pallas kernel and every jitted flagship
program can therefore be compile-validated at its exact production
shapes before it ever touches hardware (tests/test_aot_mosaic.py).

Usage:
    sh = replicated_sharding()           # NamedSharding on the topology
    aot_compile(fn, arg_specs)           # raises on compile failure

Works only under JAX_PLATFORMS=cpu (the axon plugin must not own the
"tpu" platform in-process); skip when get_tpu_topology() returns None.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax

_TOPOLOGY_NAME = "v5e:1x1x1"


def _cpu_only_process() -> bool:
    """True when this process is pinned to the CPU backend (JAX_PLATFORMS
    / jax_platforms == cpu). Checked WITHOUT initializing any backend:
    touching jax.default_backend() here could register a real device
    plugin (e.g. claim the tunneled axon TPU) — the exact side effect
    this module exists to avoid."""
    try:
        platforms = jax.config.jax_platforms
    except AttributeError:
        import os

        platforms = os.environ.get("JAX_PLATFORMS")
    return platforms is not None and \
        [p.strip() for p in platforms.split(",") if p.strip()] == ["cpu"]


@functools.lru_cache(maxsize=None)
def get_tpu_topology(topology_name: str = _TOPOLOGY_NAME):
    """A local PJRT TPU topology descriptor, or None if unavailable
    (no libtpu in the image, the plugin refuses topology-only init, or
    the process is not pinned to the CPU backend — initializing the tpu
    plugin in a device-attached process could claim the device)."""
    if not _cpu_only_process():
        return None
    try:
        from jax.experimental import topologies

        return topologies.get_topology_desc(
            platform="tpu", topology_name=topology_name,
            chips_per_host_bounds=[1, 1, 1])
    except Exception:
        return None


@functools.lru_cache(maxsize=None)
def replicated_sharding(topology_name: str = _TOPOLOGY_NAME):
    """A fully-replicated NamedSharding over the topology's (single)
    device, for building jax.ShapeDtypeStruct compile-only arguments.
    Cached: callers build one of these per argument leaf."""
    topo = get_tpu_topology(topology_name)
    if topo is None:
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    return NamedSharding(Mesh(topo.devices, ("d",)), PartitionSpec())


def topology_mesh(n_data: int, n_model: int = 1,
                  topology_name: str = "v5e:4x2x1"):
    """A ("data", "model") mesh over a MULTI-CHIP topology descriptor —
    no devices attached. Programs compiled against it get the real
    XLA:TPU SPMD lowering, ICI collectives included, so the multi-chip
    sharding story is compile-validated without a pod (the CPU dryrun
    executes the math but lowers through the CPU backend). Returns None
    when topology init is unavailable."""
    topo = get_tpu_topology(topology_name)
    if topo is None:
        return None
    import numpy as np
    from jax.sharding import Mesh

    devs = topo.devices
    if n_data * n_model > len(devs):
        return None
    arr = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shape_spec(x: Any, sharding=None):
    """Map an array (or shape/dtype carrier) to a compile-only
    ShapeDtypeStruct on the topology."""
    sh = sharding if sharding is not None else replicated_sharding()
    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)


def aot_compile(fn, *args, static_argnames=(), **kwargs):
    """Lower + compile `fn` for TPU with no device attached.

    `args`/`kwargs` are ShapeDtypeStructs carrying topology shardings
    (build them with shape_spec / jax.tree.map(shape_spec, tree)), or
    static python values. Returns the jax Compiled object; raises
    XlaRuntimeError on any XLA/Mosaic compile failure. `fn` may already
    be a jitted callable (its .lower is used directly; pass statics the
    way its own jit declared them — static_argnames is rejected there
    rather than silently dropped)."""
    if hasattr(fn, "lower"):
        if static_argnames:
            raise ValueError(
                "fn is already jitted; its own static_argnames apply — "
                "passing static_argnames here would be silently ignored")
        return fn.lower(*args, **kwargs).compile()
    jitted = jax.jit(fn, static_argnames=static_argnames)
    return jitted.lower(*args, **kwargs).compile()
