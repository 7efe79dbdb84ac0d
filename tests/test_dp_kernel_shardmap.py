"""Numeric parity of the shard_map'd kernel paths on the CPU mesh.

tests/test_aot_multichip.py proves the pure-dp shard_map'd kernels
COMPILE for real TPU; these tests prove the wrapping is semantically
transparent by EXECUTING the kernels (interpret mode) under shard_map on
the 8-device CPU mesh and comparing against the unsharded call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _dp_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def test_project_topk_shard_map_matches_unsharded():
    from imagetranslate_tpu.ops import topk_project as tkp

    M, E, V, K = 256, 128, 512, 4
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(M, E), jnp.float32)
    w = jnp.asarray(rng.randn(E, V) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(V) * 0.1, jnp.float32)

    ref = tkp.project_topk(h, w, b, K, w_layout="ev", interpret=True)
    mesh = _dp_mesh()
    fn = jax.shard_map(
        lambda h, w, b: tkp.project_topk(h, w, b, K, w_layout="ev",
                                         interpret=True),
        mesh=mesh, in_specs=(P("data", None), P(None, None), P(None)),
        out_specs=(P("data", None), P("data", None), P("data")),
        check_vma=False)
    h_sh = jax.device_put(h, NamedSharding(mesh, P("data", None)))
    out = jax.jit(fn)(h_sh, w, b)

    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]),
                               rtol=1e-6)


def test_fused_dropout_attention_head_shard_map_rate0_matches():
    """dp x tp mesh: batch shards over "data", attention heads over
    "model" — exactly how ops/attention.py wraps the kernel under a
    tensor-parallel mesh (runtime.head_shard_mesh). rate=0 output and
    grads must equal the unsharded kernel exactly."""
    from imagetranslate_tpu.ops.train_attention import (
        fused_dropout_attention,
    )

    B, T, S, H, D = 8, 8, 8, 4, 64
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, T, H, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(B, 1, 1, S) * 0.5, jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    ref = fused_dropout_attention(q, k, v, bias, 0.0, seed)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    n_tp = 2
    sp4 = P("data", None, "model", None)
    spb = P("data", None, None, None)

    def local_fn(q, k, v, bias, seed):
        idx = (jax.lax.axis_index("data") * n_tp
               + jax.lax.axis_index("model"))
        seed = seed + idx.astype(seed.dtype)
        return fused_dropout_attention(q, k, v, bias, 0.0, seed)

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(sp4, sp4, sp4, spb, P()),
                       out_specs=sp4, check_vma=False)
    out = jax.jit(fn)(q, k, v, bias, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    g_ref = jax.grad(lambda q: jnp.sum(
        fused_dropout_attention(q, k, v, bias, 0.0, seed)))(q)
    g = jax.grad(lambda q: jnp.sum(jax.jit(fn)(q, k, v, bias, seed)))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)

    # Bias is REPLICATED over "model" while heads are sharded over it, so
    # its cotangent needs a cross-shard sum over the model axis. shard_map's
    # transpose inserts that psum even with check_vma=False on current jax;
    # this pins it (a silent partial head-sum here would corrupt any future
    # learned/relative attention bias trained under TP).
    gb_ref = jax.grad(lambda b: jnp.sum(
        fused_dropout_attention(q, k, v, b, 0.0, seed)))(bias)
    gb = jax.grad(lambda b: jnp.sum(jax.jit(fn)(q, k, v, b, seed)))(bias)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_dropout_attention_shard_map_rate0_matches():
    """rate=0 makes the kernel deterministic (the CPU interpreter can't
    draw hardware random bits anyway) — shard_map'd output must equal the
    unsharded kernel exactly, including through the custom_vjp."""
    from imagetranslate_tpu.ops.train_attention import (
        fused_dropout_attention,
    )

    B, T, S, H, D = 16, 8, 8, 2, 64
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, T, H, D) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D) * 0.3, jnp.float32)
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)
    seed = jnp.zeros((), jnp.int32)

    ref = fused_dropout_attention(q, k, v, bias, 0.0, seed)

    mesh = _dp_mesh()
    sp4 = P("data", None, None, None)

    def local_fn(q, k, v, bias, seed):
        seed = seed + jax.lax.axis_index("data").astype(seed.dtype)
        return fused_dropout_attention(q, k, v, bias, 0.0, seed)

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(sp4, sp4, sp4, sp4, P()),
                       out_specs=sp4, check_vma=False)
    out = jax.jit(fn)(q, k, v, bias, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # grads flow through the shard_map'd custom_vjp
    g_ref = jax.grad(lambda q: jnp.sum(
        fused_dropout_attention(q, k, v, bias, 0.0, seed)))(q)
    g = jax.grad(lambda q: jnp.sum(jax.jit(fn)(q, k, v, bias, seed)))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_spmd_latch_token_restores_mesh():
    """Regression: set_spmd_lowering returns a state token; passing it
    back must restore the REGISTERED MESH too, not just the flag —
    otherwise a nested save/restore leaves _SPMD=True with no mesh and
    every later-traced step silently drops its shard_mapped kernels."""
    from imagetranslate_tpu.ops import runtime
    from imagetranslate_tpu.parallel.mesh import make_mesh

    make_mesh(8, 1)                        # latches (True, mesh)
    assert runtime.data_shard_mesh() is not None
    prev = runtime.set_spmd_lowering(True)  # nested scope, no mesh arg
    assert runtime.data_shard_mesh() is None
    runtime.set_spmd_lowering(prev)
    assert runtime.spmd_lowering()
    assert runtime.data_shard_mesh() is not None
