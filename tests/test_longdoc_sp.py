"""Sequence (context) parallelism for the long-document LM.

The reference's 4096-position document LM (HF Reformer,
reformer_lm.py:15-47) was single-GPU only. Here the "model" mesh axis
shards the SEQUENCE dim of LongDocLM's activations — block-local
attention needs only a one-neighbor-block halo per layer, which GSPMD
lowers to collective-permutes — while params stay replicated (pure CP).
These tests run on the conftest 8-device CPU mesh and check (a) the
seq-sharded forward matches the unsharded one, (b) the sharding is real
(activations/logits carry the "model" axis on the sequence dim, shard
shapes strictly smaller than global), and (c) a full MLM train step runs
sharded with the same loss as unsharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from imagetranslate_tpu.models.longdoc import LongDocLM, longdoc_config
from imagetranslate_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    seq_sharding,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _setup(T=512, B=4):
    cfg = longdoc_config(vocab_size=211, num_languages=2, size=1)
    cfg = cfg.replace(dropout=0.0, attention_dropout=0.0, dtype="float32")
    model = LongDocLM(cfg)   # block=128 -> 4 blocks, one per model shard
    r = jax.random.PRNGKey(0)
    texts = jax.random.randint(r, (B, T), 5, cfg.vocab_size)
    # ragged pad tail crossing a shard boundary
    pad_mask = jnp.arange(T)[None, :] < jnp.asarray([T, T - 200, 384, 131])[:, None]
    langs = jnp.zeros((B,), jnp.int32)
    params = model.init(r, texts, pad_mask, langs)
    return cfg, model, params, texts, pad_mask, langs


def test_seq_sharded_forward_matches_unsharded():
    cfg, model, params, texts, pad_mask, langs = _setup()
    ref = jax.jit(lambda p, t, m, l: model.apply(p, t, m, l))(
        params, texts, pad_mask, langs)

    mesh = make_mesh(2, 4)
    sp_model = LongDocLM(cfg, seq_sharding=seq_sharding(mesh))
    p_sh = jax.device_put(params, replicated(mesh))
    s2 = seq_sharding(mesh)
    t_sh = jax.device_put(texts, s2)
    m_sh = jax.device_put(pad_mask, s2)
    l_sh = jax.device_put(langs, jax.sharding.NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, t, m, l: sp_model.apply(p, t, m, l))(
        p_sh, t_sh, m_sh, l_sh)

    # (b) the sharding is real: logits inherit (data, model) on (B, T) and
    # each shard holds a strict sequence slice.
    spec = out.sharding.spec
    assert len(spec) >= 2 and spec[0] == "data" and spec[1] == "model", spec
    shard_shape = out.sharding.shard_shape(out.shape)
    assert shard_shape[1] == out.shape[1] // 4

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_parallel_mlm_train_step_matches_unsharded():
    from imagetranslate_tpu.train.optimizer import build_optimizer
    from imagetranslate_tpu.train.step import (
        create_train_state,
        make_mlm_train_step,
    )

    cfg, model, params, texts, pad_mask, langs = _setup()
    batch = {"texts": texts, "pad_mask": pad_mask, "langs": langs,
             "row_mask": jnp.ones((texts.shape[0],), bool)}
    rng = jax.random.PRNGKey(7)
    optimizer = build_optimizer(lr=1e-3, warmup_updates=10)

    st = create_train_state(params, optimizer)
    step = make_mlm_train_step(model, optimizer, cfg, donate=False)
    _, m_ref = step(st, batch, rng)
    ref_loss = float(m_ref["sum_loss"]) / float(m_ref["ntokens"])

    mesh = make_mesh(2, 4)
    sp_model = LongDocLM(cfg, seq_sharding=seq_sharding(mesh))
    p_sh = jax.device_put(params, replicated(mesh))
    s2, s1 = seq_sharding(mesh), jax.sharding.NamedSharding(mesh, P("data"))
    b_sh = {k: jax.device_put(v, s2 if v.ndim == 2 else s1)
            for k, v in batch.items()}
    st_sh = create_train_state(p_sh, optimizer)
    step_sh = make_mlm_train_step(sp_model, optimizer, cfg, donate=False)
    new_state, m = step_sh(st_sh, b_sh, rng)
    loss = float(m["sum_loss"]) / float(m["ntokens"])

    assert np.isfinite(loss)
    # same rng -> identical masking -> identical loss up to reduction order
    assert abs(loss - ref_loss) < 1e-5, (loss, ref_loss)
    assert int(new_state.step) == 1


def test_longdoc_trainer_wires_seq_parallel(tmp_path):
    """LongDocTrainer.from_options on a model-axis mesh: params replicated,
    batches seq-sharded, a real step executes."""
    import types

    import numpy as _np

    from imagetranslate_tpu.text.processor import TextProcessor
    from imagetranslate_tpu.train.trainer_longdoc import LongDocTrainer

    corpus = tmp_path / "c.txt"
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    rs = _np.random.RandomState(0)
    corpus.write_text("\n".join(
        " ".join(words[j] for j in rs.randint(0, 6, rs.randint(2, 6)))
        for _ in range(120)))
    t = TextProcessor()
    t.train_tokenizer([str(corpus)], 160, str(tmp_path / "model"),
                      {"<aa>": 0})
    tp = TextProcessor(str(tmp_path / "model"))
    options = types.SimpleNamespace(
        model_size=1, dropout=0.0, dtype="float32", learning_rate=1e-3,
        warmup=10, clip=1.0, mask_prob=0.15)
    mesh = make_mesh(2, 4)
    trainer = LongDocTrainer.from_options(options, tp, mesh=mesh)
    assert trainer.seq_parallel

    # every param is replicated on the mesh (pure CP, no TP sharding)
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert leaf.sharding.is_fully_replicated

    B, T = 4, 512
    batch = trainer._shard({
        "texts": jnp.ones((B, T), jnp.int32),
        "pad_mask": jnp.ones((B, T), bool),
        "langs": jnp.zeros((B,), jnp.int32),
        "row_mask": jnp.ones((B,), bool),
    })
    assert batch["texts"].sharding.spec[1] == "model"
    state, m = trainer.step_fn(trainer.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["sum_loss"]))
