"""Fused training attention (ops/train_attention.py).

CPU (interpret mode) covers the rate=0 path: exact forward parity with the
XLA attention and full-gradient parity through the custom_vjp. The rate>0
paths need the TPU hardware PRNG (the Pallas interpreter has no prng
primitives) and are validated on-device: unbiasedness, mask rate,
seed determinism, and the fwd/bwd same-mask property via an exact
finite-difference on dv (out is linear in v for a fixed mask) — see
docs/PERF.md round-3 for the recorded results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.ops.attention import (
    dot_product_attention,
    make_attention_bias,
)
from imagetranslate_tpu.ops.train_attention import (
    fused_attention_supported,
    fused_dropout_attention,
)


@pytest.fixture(scope="module")
def qkv():
    B, T, S, H, D = 2, 16, 24, 3, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), jnp.float32)
    mask = jnp.ones((B, S), bool).at[1, -5:].set(False)
    bias = make_attention_bias(mask[:, None, None, :])
    return q, k, v, bias


def test_rate0_matches_xla_forward(qkv):
    q, k, v, bias = qkv
    out = fused_dropout_attention(q, k, v, bias, 0.0, jnp.int32(7))
    ref = dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rate0_row_bias_matches_xla(qkv):
    """Causal [B, 1, T, S] bias path (decoder self-attention in training)."""
    q, k, v, _ = qkv
    B, T = q.shape[:2]
    S = k.shape[1]
    keep = (jnp.arange(S)[None, :] <= (jnp.arange(T) * S // T)[:, None])
    bias = make_attention_bias(jnp.broadcast_to(keep, (B, T, S))
                               [:, None, :, :])
    out = fused_dropout_attention(q, k, v, bias, 0.0, jnp.int32(7))
    ref = dot_product_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rate0_grads_match_xla(qkv):
    q, k, v, bias = qkv

    def f_fused(q_, k_, v_):
        return jnp.sum(fused_dropout_attention(q_, k_, v_, bias, 0.0,
                                               jnp.int32(7)) ** 2)

    def f_ref(q_, k_, v_):
        return jnp.sum(dot_product_attention(q_, k_, v_, bias) ** 2)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_supported_gate(qkv):
    q, k, v, bias = qkv
    assert fused_attention_supported(q, k, bias)
    # bias=None is supported: the dispatch synthesizes a zero [B, 1, 1, S]
    # (fully-packed rows with no padding should still take the kernel).
    assert fused_attention_supported(q, k, None)
    # S beyond the full-tile VMEM budget
    k_big = jnp.zeros((2, 1024, 3, 8))
    bias_big = jnp.zeros((2, 1, 1, 1024))
    assert not fused_attention_supported(q, k_big, bias_big)
    # bias with a head axis is not the supported layout
    assert not fused_attention_supported(
        q, k, jnp.zeros((2, 3, 1, k.shape[1])))


def test_dispatch_from_dot_product_attention(qkv):
    """use_fused_dropout routes through the kernel only on TPU; on CPU the
    XLA path must be taken (and produce dropout output) rather than
    crashing in the interpreter."""
    q, k, v, bias = qkv
    out = dot_product_attention(
        q, k, v, bias, dropout_rate=0.3, deterministic=False,
        dropout_rng=jax.random.PRNGKey(0), use_fused_dropout=True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_rate0_bias_grad_matches_xla(qkv):
    """Regression: the backward used to return a hardcoded ZERO bias
    cotangent — correct for the constant pad masks this framework feeds
    it, but a silent wrong-gradient trap for any learned/relative bias.
    The kernel now accumulates the true dbias over the head grid dim,
    for both bias layouts ([B,1,1,S] and [B,1,T,S])."""
    q, k, v, bias = qkv

    def f_fused(b_):
        return jnp.sum(fused_dropout_attention(q, k, v, b_, 0.0,
                                               jnp.int32(7)) ** 2)

    def f_ref(b_):
        return jnp.sum(dot_product_attention(q, k, v, b_) ** 2)

    for b in (bias, jnp.broadcast_to(bias, (bias.shape[0], 1, q.shape[1],
                                            bias.shape[3])) * 1.0):
        db_f = jax.grad(f_fused)(b)
        db_r = jax.grad(f_ref)(b)
        assert float(jnp.abs(db_r).max()) > 0  # non-trivial cotangent
        np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r),
                                   rtol=2e-4, atol=2e-4)
