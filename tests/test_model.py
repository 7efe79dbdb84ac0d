"""Model-layer unit tests (mirrors the spirit of reference
src/tests/test_model.py:53-74 but with real numeric/shape invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagetranslate_tpu.models.config import tiny_config
from imagetranslate_tpu.models.seq2seq import Seq2Seq
from imagetranslate_tpu.ops.losses import smoothed_nll_loss


def make_batch(rng, cfg, B=2, S=9, T=7):
    k1, k2 = jax.random.split(rng)
    src = jax.random.randint(k1, (B, S), 5, cfg.vocab_size)
    tgt = jax.random.randint(k2, (B, T), 5, cfg.vocab_size)
    # Row 1 has trailing pads on both sides.
    src = src.at[1, S - 3:].set(cfg.pad_id)
    tgt = tgt.at[1, T - 2:].set(cfg.pad_id)
    src_mask = src != cfg.pad_id
    tgt_mask = tgt != cfg.pad_id
    langs = jnp.array([0, 1], jnp.int32)[:B]
    return src, src_mask, tgt, tgt_mask, langs


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def model_and_params(cfg):
    model = Seq2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    params = model.init(rng, src, src_mask, tgt, tgt_mask, langs, langs)
    return model, params


def test_forward_shapes(cfg, model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    logits = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs)
    assert logits.shape == (2, tgt.shape[1] - 1, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_pad_invariance(cfg, model_and_params):
    """Changing a padded source token must not change non-pad logits —
    the additive -10000 mask must actually mask."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(2)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    logits1 = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs)
    src2 = src.at[1, -1].set(17)  # pad slot, mask still says pad
    logits2 = model.apply(params, src2, src_mask, tgt, tgt_mask, langs, langs)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=2e-3)


def test_causality(cfg, model_and_params):
    """Changing target token t must not affect logits at positions < t."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    logits1 = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs)
    tgt2 = tgt.at[0, 4].set((tgt[0, 4] + 1) % cfg.vocab_size)
    logits2 = model.apply(params, src, src_mask, tgt2, tgt_mask, langs, langs)
    # positions 0..2 predict from inputs tgt[0..3]... position i uses inputs
    # <= i, so logits[:, :4] depend only on tgt[:, :4] and must be unchanged.
    np.testing.assert_allclose(np.asarray(logits1[0, :4]),
                               np.asarray(logits2[0, :4]), atol=2e-3)
    assert not np.allclose(np.asarray(logits1[0, 4:]), np.asarray(logits2[0, 4:]))


def test_smoothed_loss_matches_reference_math(cfg):
    """Fused loss == explicit log-softmax form of loss.py:10-27."""
    rng = jax.random.PRNGKey(4)
    V = 11
    logits = jax.random.normal(rng, (3, 5, V))
    targets = jax.random.randint(jax.random.PRNGKey(5), (3, 5), 0, V)
    mask = jnp.array(np.random.RandomState(0).rand(3, 5) > 0.3)

    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
    smooth = -jnp.sum(lp, axis=-1)
    eps = 0.1
    ref = (1 - eps) * nll + (eps / V) * smooth
    ref_sum = jnp.sum(ref * mask)

    got_sum, got_n = smoothed_nll_loss(logits, targets, mask, epsilon=eps)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum), rtol=1e-5)
    assert int(got_n) == int(mask.sum())


def test_decode_step_matches_forward(cfg, model_and_params):
    """KV-cached single-token decoding must reproduce the teacher-forced
    logits exactly — this is the correctness contract that lets us replace
    seq_gen.py's re-encode-the-prefix loop."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(6)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    B, T = tgt.shape
    # Use a fully non-pad target to compare all steps.
    tgt = jnp.where(tgt == cfg.pad_id, 7, tgt)
    tgt_mask = jnp.ones_like(tgt_mask)

    full_logits = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs)

    enc = model.apply(params, src, src_mask, langs, method=Seq2Seq.encode)
    cache = model.apply(params, enc, B, T, method=Seq2Seq.init_cache)
    from imagetranslate_tpu.models.transformer import pad_bias
    cross_bias = pad_bias(src_mask)

    step_logits = []
    for i in range(T - 1):
        logits_i, cache = model.apply(
            params, tgt[:, i:i + 1], cache, i, cross_bias, langs,
            method=Seq2Seq.decode_step)
        step_logits.append(logits_i)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full_logits),
                               atol=2e-3, rtol=1e-3)


def test_lang_dec_variant(cfg):
    """Per-language decoders: different target language -> different params
    actually selected (outputs differ for identical inputs)."""
    cfg2 = cfg.replace(lang_dec=True)
    model = Seq2Seq(cfg2)
    rng = jax.random.PRNGKey(7)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg2)
    l0 = jnp.zeros_like(langs)
    l1 = jnp.ones_like(langs)
    params = model.init(rng, src, src_mask, tgt, tgt_mask, l0, l0)
    out0 = model.apply(params, src, src_mask, tgt, tgt_mask, l0, l0)
    out1 = model.apply(params, src, src_mask, tgt, tgt_mask, l0, l1)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_tie_embed_variant(cfg):
    cfg2 = cfg.replace(tie_embed=True)
    model = Seq2Seq(cfg2)
    rng = jax.random.PRNGKey(8)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg2)
    params = model.init(rng, src, src_mask, tgt, tgt_mask, langs, langs)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    # No independent output-projection kernel when tied.
    assert not any("output_layers" in n for n in names)
    logits = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs)
    assert logits.shape[-1] == cfg2.vocab_size


def test_mass_positions_affect_output(cfg, model_and_params):
    """MASS decoding passes explicit span positions (mass_seq2seq.py:47-50);
    supplying different tgt_positions must change logits."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(9)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg)
    B, T = tgt.shape
    pos1 = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    pos2 = pos1 + 3
    out1 = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs,
                       tgt_positions=pos1)
    out2 = model.apply(params, src, src_mask, tgt, tgt_mask, langs, langs,
                       tgt_positions=pos2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_remat_variant(cfg):
    """cfg.remat wraps encoder+decoder layers; forward, grads, and the
    KV-cache decode path must all still work."""
    cfg2 = cfg.replace(remat=True)
    model = Seq2Seq(cfg2)
    rng = jax.random.PRNGKey(11)
    src, src_mask, tgt, tgt_mask, langs = make_batch(rng, cfg2)
    params = model.init(rng, src, src_mask, tgt, tgt_mask, langs, langs)

    def loss(p):
        logits = model.apply(p, src, src_mask, tgt, tgt_mask, langs, langs)
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
    # decode path unaffected
    enc = model.apply(params, src, src_mask, langs, method=Seq2Seq.encode)
    cache = model.apply(params, enc, src.shape[0], 4, method=Seq2Seq.init_cache)
    from imagetranslate_tpu.models.transformer import pad_bias
    logits, _ = model.apply(params, tgt[:, :1], cache, 0, pad_bias(src_mask),
                            langs, method=Seq2Seq.decode_step)
    assert logits.shape == (src.shape[0], cfg2.vocab_size)


def test_atomic_checkpoint_write(tmp_path):
    """Checkpoint files write via temp+rename: no .tmp litter, full content,
    and an existing file is replaced atomically (regression for a wall-clock
    kill that left a 0-byte params.msgpack in the best-BLEU slot)."""
    import os

    from imagetranslate_tpu.train.checkpoint import _atomic_write

    p = str(tmp_path / "params.msgpack")
    _atomic_write(p, b"first-content")
    assert open(p, "rb").read() == b"first-content"
    _atomic_write(p, b"second-content-longer")
    assert open(p, "rb").read() == b"second-content-longer"
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))
