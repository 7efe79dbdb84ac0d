"""Fused label-smoothed xent kernel vs the XLA reference (interpret mode on
CPU; compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagetranslate_tpu.ops.losses import smoothed_nll_loss
from imagetranslate_tpu.ops.xent_pallas import (
    smoothed_nll_loss_pallas,
    smoothed_xent_rows,
)


def make(N=32, V=256, seed=0):
    rng = jax.random.PRNGKey(seed)
    logits = jax.random.normal(rng, (N, V), jnp.float32) * 2
    targets = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, V)
    mask = jnp.asarray(np.random.RandomState(2).rand(N) > 0.3)
    return logits, targets, mask


def test_forward_matches_xla():
    logits, targets, mask = make()
    got_sum, got_n = smoothed_nll_loss_pallas(logits, targets, mask)
    ref_sum, ref_n = smoothed_nll_loss(logits, targets, mask)
    np.testing.assert_allclose(float(got_sum), float(ref_sum), rtol=1e-5)
    assert float(got_n) == float(ref_n)


def test_gradient_matches_xla():
    logits, targets, mask = make()

    def f_pallas(x):
        s, n = smoothed_nll_loss_pallas(x, targets, mask)
        return s / n

    def f_xla(x):
        s, n = smoothed_nll_loss(x, targets, mask)
        return s / n

    g1 = jax.grad(f_pallas)(logits)
    g2 = jax.grad(f_xla)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-6, rtol=1e-4)


def test_odd_shapes_fall_back():
    logits = jax.random.normal(jax.random.PRNGKey(0), (7, 101), jnp.float32)
    targets = jnp.zeros((7,), jnp.int32)
    rows = smoothed_xent_rows(logits, targets, 0.1)
    assert rows.shape == (7,)
    assert np.isfinite(np.asarray(rows)).all()
