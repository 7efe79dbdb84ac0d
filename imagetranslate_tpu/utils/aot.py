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


@functools.lru_cache(maxsize=None)
def get_tpu_topology(topology_name: str = _TOPOLOGY_NAME):
    """A local PJRT TPU topology descriptor, or None if unavailable
    (no libtpu in the image, or the plugin refuses topology-only init)."""
    try:
        from jax.experimental import topologies

        return topologies.get_topology_desc(
            platform="tpu", topology_name=topology_name,
            chips_per_host_bounds=[1, 1, 1])
    except Exception:
        return None


def replicated_sharding(topology_name: str = _TOPOLOGY_NAME):
    """A fully-replicated NamedSharding over the topology's (single)
    device, for building jax.ShapeDtypeStruct compile-only arguments."""
    topo = get_tpu_topology(topology_name)
    if topo is None:
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    return NamedSharding(Mesh(topo.devices, ("d",)), PartitionSpec())


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
    be a jitted callable (its .lower is used directly)."""
    if hasattr(fn, "lower"):
        return fn.lower(*args, **kwargs).compile()
    jitted = jax.jit(fn, static_argnames=static_argnames)
    return jitted.lower(*args, **kwargs).compile()
