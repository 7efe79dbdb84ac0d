"""Pallas flash-attention vs the XLA reference path (interpreter mode on the
CPU test mesh; the same kernel compiles on TPU where it measured *closer* to
an fp64 reference than the XLA default-precision path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
)
from imagetranslate_tpu.ops.flash_attention import flash_attention


def make_qkv(B=2, T=32, S=32, H=2, D=16):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), jnp.float32)
    return q, k, v


def test_matches_xla_with_padding_bias():
    q, k, v = make_qkv()
    mask = jnp.ones((2, 32), bool).at[1, 20:].set(False)
    bias = make_attention_bias(mask[:, None, None, :])
    ref = dot_product_attention(q, k, v, bias, use_pallas=False)
    out = flash_attention(q, k, v, bias)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_matches_xla_no_bias():
    q, k, v = make_qkv()
    ref = dot_product_attention(q, k, v, None, use_pallas=False)
    out = flash_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_multi_tile_streaming():
    """S spanning several K/V tiles exercises the online-softmax rescale."""
    q, k, v = make_qkv(B=1, T=64, S=256, H=2, D=16)
    mask = jnp.ones((1, 256), bool).at[0, 200:].set(False)
    bias = make_attention_bias(mask[:, None, None, :])
    ref = dot_product_attention(q, k, v, bias, use_pallas=False)
    out = flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fallback_on_unsupported_bias():
    q, k, v = make_qkv()
    causal = jnp.zeros((2, 1, 32, 32), jnp.float32)
    assert flash_attention(q, k, v, causal) is None


def test_grad_through_flash_path():
    """Differentiating an eval-mode (deterministic, Pallas-routed) attention
    must work and match the XLA path's gradients — the raw kernel has no
    JVP, so the custom_vjp (XLA-math backward) covers it. Regression for a
    round-2 crash: jax.grad over a deterministic apply raised AssertionError
    inside pallas_call's jvp rule. S >= 1024 so the length gate actually
    routes to the kernel."""
    q, k, v = make_qkv(B=1, T=16, S=1024, H=1, D=16)
    mask = jnp.ones((1, 1024), bool).at[0, 1000:].set(False)
    bias = make_attention_bias(mask[:, None, None, :])

    def f(use_pallas):
        def loss(q, k, v):
            out = dot_product_attention(q, k, v, bias=bias,
                                        use_pallas=use_pallas)
            return jnp.sum(out ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    g_flash = f(True)
    g_xla = f(False)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
