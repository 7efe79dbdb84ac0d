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


def test_mt_step_with_pallas_xent():
    """The fused loss slots into the jitted MT train step (tiny cfg,
    interpret mode on CPU) and trains identically in expectation."""
    from imagetranslate_tpu.models.config import tiny_config
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mt_train_step,
    )

    cfg = tiny_config(vocab_size=128).replace(use_pallas_xent=True)
    model = Seq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 8, 16
    src = jax.random.randint(rng, (B, S), 5, cfg.vocab_size)
    batch = {
        "src": src, "src_mask": jnp.ones((B, S), bool),
        "dst": jax.random.randint(jax.random.PRNGKey(1), (B, S), 5,
                                  cfg.vocab_size),
        "dst_mask": jnp.ones((B, S), bool),
        "src_langs": jnp.zeros((B,), jnp.int32),
        "dst_langs": jnp.zeros((B,), jnp.int32),
        "row_mask": jnp.ones((B,), bool),
    }
    params = model.init(rng, batch["src"], batch["src_mask"], batch["dst"],
                        batch["dst_mask"], batch["src_langs"],
                        batch["dst_langs"])
    opt = build_optimizer(lr=1e-3, warmup_updates=5)
    state = create_train_state(params, opt)
    step = make_mt_train_step(model, opt, donate=False)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    loss = float(m["sum_loss"]) / float(m["ntokens"])
    assert np.isfinite(loss)
    # equals the XLA-loss step's value on the same inputs
    cfg2 = cfg.replace(use_pallas_xent=False)
    model2 = Seq2Seq(cfg2)
    step2 = make_mt_train_step(model2, opt, donate=False)
    state2 = create_train_state(params, opt)
    state2, m2 = step2(state2, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(loss,
                               float(m2["sum_loss"]) / float(m2["ntokens"]),
                               rtol=1e-4)


def test_pallas_xent_gates_off_under_mesh():
    """use_pallas_xent must fall back to the XLA loss under a multi-device
    mesh: Mosaic custom calls cannot be GSPMD-partitioned, and this was
    the one kernel call site left ungated on spmd_lowering()."""
    from imagetranslate_tpu.models.config import tiny_config
    from imagetranslate_tpu.models.seq2seq import Seq2Seq
    from imagetranslate_tpu.ops import runtime
    from imagetranslate_tpu.ops.losses import smoothed_nll_loss
    from imagetranslate_tpu.train.step import _loss_impl

    model = Seq2Seq(tiny_config(use_pallas_xent=True))
    prev = runtime.set_spmd_lowering(True)
    try:
        assert _loss_impl(model) is smoothed_nll_loss
    finally:
        runtime.set_spmd_lowering(prev)
    assert _loss_impl(model) is not smoothed_nll_loss
